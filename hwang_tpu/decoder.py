"""High-level Decoder: index + span planning + decode in one object.

Parity with the reference Python convenience API
(python/hwang/decoder.py:5-69): auto-index on open, pick a backend by
device, and `retrieve(rows)` the requested frames — reading only the byte
ranges of the minimal decode spans from the file.

Improvement over the reference: all spans are passed to a single
DecoderAutomata.initialize (like the reference's C++ tests,
decoder_automata_test.cpp:193) instead of re-initializing per interval.
"""

from __future__ import annotations

import io
import os
from typing import Optional, Sequence

import numpy as np

from .automata import DecoderAutomata, EncodedData
from .backends.interface import VideoDecoderType
from .common import CPU_DEVICE, DeviceHandle, DeviceType, HwangError
from .intervals import slice_into_video_intervals
from .mp4_index import index_video
from .video_index import VideoIndex


class Decoder:
    def __init__(
        self,
        f_or_path,
        video_index: Optional[VideoIndex] = None,
        device_type: DeviceType = DeviceType.CPU,
        device_id: int = 0,
        decoder_type: Optional[VideoDecoderType] = None,
        num_devices: int = 1,
        output_format: str = "rgb",
    ):
        if isinstance(f_or_path, (str, bytes, os.PathLike)):
            self._f = open(f_or_path, "rb")
            self._owns_file = True
        else:
            self._f = f_or_path
            self._owns_file = False
        self.video_index = video_index or index_video(self._f)
        if decoder_type is None:
            decoder_type = (
                VideoDecoderType.TPU
                if device_type == DeviceType.TPU
                else VideoDecoderType.SOFTWARE
            )
        device = DeviceHandle(device_type, device_id)
        self._automata = DecoderAutomata.make_instance(
            device, num_devices, decoder_type, output_format=output_format
        )
        self._output_format = output_format
        self._device = device
        self._num_devices = num_devices
        self._decoder_type = decoder_type
        if decoder_type == VideoDecoderType.TPU:
            # Fail over to the software backend for streams the TPU codec
            # does not cover yet (CABAC/HEVC/...), keeping retrieve() usable
            # on any input. Parity note: the reference factory had no
            # fallback — unsupported streams just errored mid-decode.
            try:
                from .backends.interface import codec_name_for_format
                from .backends.tpu import HevcSpanDecoder, TpuSpanDecoder

                codec = codec_name_for_format(self.video_index.format)
                if codec == "h264":
                    TpuSpanDecoder(self.video_index.metadata_bytes)
                elif codec == "hevc":
                    HevcSpanDecoder(self.video_index.metadata_bytes)
                else:
                    raise HwangError(
                        f"TPU path supports H.264/HEVC (stream is "
                        f"{self.video_index.format})"
                    )
            except Exception as e:
                import warnings

                warnings.warn(
                    f"TPU decode path unavailable for this stream "
                    f"({e}); falling back to SOFTWARE"
                )
                self._automata = DecoderAutomata.make_instance(
                    device, num_devices, VideoDecoderType.SOFTWARE,
                    output_format=output_format,
                )
                self._decoder_type = VideoDecoderType.SOFTWARE

    # ------------------------------------------------------------------
    def retrieve(self, rows: Sequence[int]) -> list[np.ndarray]:
        """Decode the requested frame numbers (sorted ascending).

        Returns one HxWx3 uint8 RGB array per requested frame (or packed
        planar YUV420 when output_format='yuv420').
        Parity: python/hwang/decoder.py:30-67.
        """
        rows = [int(r) for r in rows]
        unique_rows = sorted(set(rows))
        # Span trimming is only valid when sample (decode) order == display
        # order.  Trim only when the mp4 index positively says there is no
        # reordering (ctts); indexes loaded from file don't know -> no trim.
        trim = (
            self._decoder_type == VideoDecoderType.TPU
            and self.video_index.has_reorder is False
        )
        spans = self.build_spans(unique_rows, trim=trim)
        if not spans:
            return []
        if self._decoder_type == VideoDecoderType.TPU:
            # Early feature probe (first slice header per sample, host,
            # microseconds): decide SOFTWARE fallback BEFORE dispatching
            # a device decode that the decode-time failover would throw
            # away (SP/SI slices and HEVC multi-slice pictures are not
            # detectable from the avcC/hvcC at configure time).  The
            # decode-time retry below stays as the correctness net.
            reason = self._probe_fallback_features(spans)
            if reason is not None:
                import warnings

                warnings.warn(
                    f"TPU decode path unavailable for this stream "
                    f"({reason}, span probe); falling back to SOFTWARE"
                )
                self._automata.close()
                self._decoder_type = VideoDecoderType.SOFTWARE
                self._automata = DecoderAutomata.make_instance(
                    self._device, self._num_devices,
                    VideoDecoderType.SOFTWARE,
                    output_format=self._output_format,
                )
                spans = self.build_spans(unique_rows, trim=False)
        try:
            self._automata.initialize(spans, self.video_index.metadata_bytes)
            total = sum(len(s.valid_frames) for s in spans)
            frames = self._automata.get_frames(total)
        except Exception as e:
            # The TPU codec rejects stream features it does not cover
            # (interlaced PAFF/MBAFF, FMO, SP/SI slices) with a decode-time
            # error — possibly mid-stream, past the configure-time probe.
            # Fail over to SOFTWARE once and retry; later retrieves stay
            # on the software automata.
            if self._decoder_type != VideoDecoderType.TPU:
                raise
            import warnings

            if "RASL" in str(e):
                # Open-GOP span whose leading CRA has RASL pictures: their
                # references live in the PREVIOUS GOP.  Starting the span
                # one keyframe earlier makes them decodable natively (the
                # skip in the front-end is reference-driven) — and is the
                # only correct route: libavcodec DROPS undecodable RASL
                # outputs, so the SOFTWARE fallback would misalign every
                # frame of the span.
                try:
                    spans = self.build_spans(unique_rows, trim=False,
                                             extend_back=True)
                    self._automata.initialize(
                        spans, self.video_index.metadata_bytes)
                    total = sum(len(s.valid_frames) for s in spans)
                    frames = self._automata.get_frames(total)
                    by_row = dict(zip(unique_rows, frames))
                    return [by_row[r] for r in rows]
                except Exception as e2:  # pragma: no cover - CRA@0 etc.
                    e = e2
            warnings.warn(
                f"TPU decode failed for this stream ({e}); "
                "falling back to SOFTWARE"
            )
            self._automata.close()
            self._decoder_type = VideoDecoderType.SOFTWARE
            self._automata = DecoderAutomata.make_instance(
                self._device, self._num_devices, VideoDecoderType.SOFTWARE,
                output_format=self._output_format,
            )
            # rebuild untrimmed: the failure may be a B/reordered stream,
            # where trimmed spans drop mid-display-order frames
            spans = self.build_spans(unique_rows, trim=False)
            self._automata.initialize(spans, self.video_index.metadata_bytes)
            total = sum(len(s.valid_frames) for s in spans)
            frames = self._automata.get_frames(total)
        by_row = dict(zip(unique_rows, frames))
        return [by_row[r] for r in rows]

    def _probe_fallback_features(self, spans) -> Optional[str]:
        """Cheap host scan of each sample's NAL headers / first slice
        header for features the TPU codec rejects only at decode time:
        H.264 SP/SI slices, HEVC multi-slice pictures and dependent
        slice segments.  Returns a reason string or None."""
        from .backends.interface import codec_name_for_format

        vi = self.video_index
        try:
            codec = codec_name_for_format(vi.format)
        except Exception:
            return None
        meta = bytes(vi.metadata_bytes or b"")

        def ue(bits):
            """(value, bits_consumed) of one Exp-Golomb from a bit list."""
            lz = 0
            i = 0
            while i < len(bits) and bits[i] == 0:
                lz += 1
                i += 1
            i += 1
            v = 0
            for _ in range(lz):
                if i >= len(bits):
                    return None, i
                v = (v << 1) | bits[i]
                i += 1
            return (1 << lz) - 1 + v, i

        def head_bits(nal, skip_bytes, n=10):
            """First n bytes of RBSP after the NAL header, de-escaped,
            as a bit list."""
            raw = nal[skip_bytes:skip_bytes + n + 2]
            rbsp = bytearray()
            zeros = 0
            for b in raw:
                if zeros >= 2 and b == 3:
                    zeros = 0
                    continue
                rbsp.append(b)
                zeros = zeros + 1 if b == 0 else 0
            out = []
            for b in rbsp[:n]:
                for k in range(7, -1, -1):
                    out.append((b >> k) & 1)
            return out

        if codec == "h264":
            nls = ((meta[4] & 3) + 1) if len(meta) > 4 else 4
        elif codec == "hevc":
            nls = ((meta[21] & 3) + 1) if len(meta) > 21 else 4
        else:
            return None
        for sp in spans:
            data = sp.encoded_video
            for off, size in zip(sp.sample_offsets, sp.sample_sizes):
                p, end = int(off), int(off) + int(size)
                vcl_seen = 0
                while p + nls <= end:
                    ln = int.from_bytes(data[p:p + nls], "big")
                    p += nls
                    if ln <= 0 or p + ln > end:
                        break
                    nal = data[p:p + ln]
                    p += ln
                    if codec == "h264":
                        nt = nal[0] & 0x1F
                        if nt in (1, 5):
                            bits = head_bits(nal, 1)
                            _, i = ue(bits)            # first_mb_in_slice
                            st, _ = ue(bits[i:])       # slice_type
                            if st in (3, 4, 8, 9):
                                return f"SP/SI slice (slice_type {st})"
                            break  # first VCL per sample suffices
                    else:
                        nt = (nal[0] >> 1) & 0x3F
                        if nt <= 31:                   # VCL NAL
                            vcl_seen += 1
                            if vcl_seen > 1:
                                return "multi-slice HEVC picture"
        return None

    def build_spans(self, sorted_rows: Sequence[int],
                    trim: bool = True,
                    extend_back: bool = False) -> list[EncodedData]:
        """Plan spans and read only their byte ranges from the file.

        Parity: python/hwang/decoder.py:32-63 (offsets rebased to the span
        buffer, keyframes filtered to the span).

        extend_back=True starts every span one keyframe EARLIER than the
        planner chose — used for open-GOP streams where a span-leading
        CRA's RASL pictures reference the previous GOP.
        """
        vi = self.video_index
        intervals = slice_into_video_intervals(vi, sorted_rows)
        if extend_back:
            import bisect

            kp = [int(k) for k in vi.keyframe_indices]
            intervals = [
                ((kp[max(bisect.bisect_left(kp, start) - 1, 0)], end), valid)
                for (start, end), valid in intervals
            ]
        spans: list[EncodedData] = []
        kf_set = set(int(k) for k in vi.keyframe_indices)
        for (start, end), valid in intervals:
            # Trim the span at the last requested frame: samples after it
            # are never consumed (the reference's feeder also never reaches
            # them — the retriever stops and the watermark blocks).  Only
            # valid when decode order == display order (no B reordering);
            # callers pass trim=False otherwise.
            if trim:
                end = min(end, max(valid) + 1)
            start_off = int(vi.sample_offsets[start])
            last = end - 1
            end_off = int(vi.sample_offsets[last]) + int(vi.sample_sizes[last])
            self._f.seek(start_off)
            data = self._f.read(end_off - start_off)
            offsets = [
                int(vi.sample_offsets[s]) - start_off for s in range(start, end)
            ]
            sizes = [int(vi.sample_sizes[s]) for s in range(start, end)]
            keyframes = [s for s in range(start, end) if s in kf_set]
            spans.append(
                EncodedData(
                    encoded_video=data,
                    width=vi.frame_width,
                    height=vi.frame_height,
                    format=vi.format,
                    start_keyframe=start,
                    end_keyframe=end,
                    sample_offsets=offsets,
                    sample_sizes=sizes,
                    keyframes=keyframes,
                    valid_frames=list(valid),
                )
            )
        return spans

    def close(self) -> None:
        self._automata.close()
        if self._owns_file:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
