"""TPU decode backend: host entropy decode + on-device reconstruction.

Replaces the reference's FFmpeg/NVDEC backends behind the same
VideoDecoderInterface contract (video_decoder_interface.h:30-49).  Where
those fed one packet at a time into a hardware pipeline, the TPU path is
span-granular: fed samples are buffered; end-of-span (empty feed / flush)
triggers one batched decode — sequential CAVLC on the host emitting SoA
tensors, then `models/h264/recon.decode_gop` reconstructs every frame of
the span on-device.

The per-sample interface exists for DecoderAutomata parity; the
high-performance path for batched multi-clip workloads is
`TpuSpanDecoder.decode_span` / `pipeline.decode_clips`, which keeps
frames device-resident (HBM) for the fused YUV->RGB/resize epilogue.
"""

from __future__ import annotations

import collections

import numpy as np

from ..common import HwangError
from .interface import FrameInfo, VideoDecoderInterface, codec_name_for_format

# frame-count padding buckets: spans compile per bucket, not per length
_F_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def _bucket(n: int) -> int:
    for b in _F_BUCKETS:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


class TpuSpanDecoder:
    """Span-level H.264 decoder for one stream geometry (one avcC)."""

    def __init__(self, extradata: bytes, n_refs: int | None = None):
        from ..models.h264.entropy import H264EntropyDecoder

        self.entropy = H264EntropyDecoder(extradata)
        # ring size: the stream's DPB requirement (SPS max_num_ref_frames)
        self.n_refs = n_refs or max(1, min(self.entropy.max_num_ref_frames, 8))
        self.entropy.set_ring_slots(self.n_refs)
        self.mb_width = self.entropy.mb_width
        self.mb_height = self.entropy.mb_height
        self.crop = self.entropy.crop  # (left, top, right, bottom)

    @property
    def coded_w(self) -> int:
        return self.mb_width * 16

    @property
    def coded_h(self) -> int:
        return self.mb_height * 16

    @property
    def display_size(self) -> tuple[int, int]:
        l, t, r, b = self.crop
        return (self.coded_w - l - r, self.coded_h - t - b)

    def decode_span(self, data, sample_offsets, sample_sizes):
        """Decode one span; returns device YUV arrays (coded size, DECODE
        order) plus the display permutation:
        (Y [F,H,W], U, V, n_frames, perm) — display position d is decode
        frame perm[d] (identity without B reordering)."""
        import jax.numpy as jnp
        import numpy as np

        from ..models.h264.packed import fuse_packed, pack_gop_batch
        from ..models.h264.recon_batched import decode_gop_fused

        t = self.entropy.decode_gop(data, sample_offsets, sample_sizes)
        g = pack_gop_batch([t], _bucket(t.n_frames), to_device=False)
        buf, layout = fuse_packed(g)
        Ys, Us, Vs = decode_gop_fused(
            jnp.asarray(buf), layout, self.mb_width, self.mb_height,
            self.entropy.chroma_qp_offset, n_refs=self.n_refs,
        )
        perm = np.argsort(t.poc[: t.n_frames], kind="stable")
        return Ys[0], Us[0], Vs[0], t.n_frames, perm


class HevcSpanDecoder:
    """Span-level HEVC decoder: owned I-slice entropy front-end
    (native/src/hevc/) + the matmul device recon (models/hevc/recon_jax).

    Streams outside the supported envelope (inter slices, TUs > 16)
    raise HwangError, which Decoder turns into the audited SOFTWARE
    fallback.  The reference decoded HEVC only through FFmpeg/NVDEC
    (software_video_decoder.cpp:122-136)."""

    def __init__(self, extradata: bytes, n_refs: int | None = None):
        from ..models.hevc.entropy import HevcEntropyDecoder

        del n_refs  # I-slice scope: no DPB
        try:
            self.entropy = HevcEntropyDecoder(extradata)
        except ValueError as e:
            raise HwangError(str(e)) from e
        left, right, top, bottom = self.entropy.crop
        self.crop = (left, top, right, bottom)  # H.264-span field order
        self.coded_w = self.entropy.width
        self.coded_h = self.entropy.height

    @property
    def display_size(self) -> tuple[int, int]:
        l, t, r, b = self.crop
        return (self.coded_w - l - r, self.coded_h - t - b)

    def decode_span(self, data, sample_offsets, sample_sizes):
        from ..models.hevc.prep import UnsupportedStream
        from ..models.hevc.recon_jax import decode_gop_frames

        try:
            t = self.entropy.decode_gop(data, sample_offsets, sample_sizes)
        except ValueError as e:
            raise HwangError(str(e)) from e
        # Open-GOP CRA spans: RASL pictures reference frames before the
        # span and are undecodable here (frame_type == 3 marks them
        # skipped).  Returning them as black frames would silently place
        # wrong pixels at the first display positions — take the audited
        # SOFTWARE fallback instead (libavcodec drops RASL outputs, so
        # the fallback keeps sample->frame alignment correct).
        if t.frame_type is not None and np.any(
                np.asarray(t.frame_type[: t.n_frames]) == 3):
            raise HwangError(
                "open-GOP span with skipped RASL pictures: falling back "
                "(undecodable leading pictures)")
        try:
            Y, U, V = decode_gop_frames(t)
        except UnsupportedStream as e:
            raise HwangError(str(e)) from e
        # decode -> display mapping via POC (B-frame reorder; I-only
        # spans have monotonically increasing POC so perm is identity)
        if t.poc is not None:
            perm = np.argsort(t.poc[: t.n_frames], kind="stable")
        else:
            perm = np.arange(t.n_frames)
        return Y, U, V, t.n_frames, perm


class TpuVideoDecoder(VideoDecoderInterface):
    """DecoderAutomata-compatible wrapper around TpuSpanDecoder."""

    def __init__(self, output_format: str = "rgb", n_refs: int = 4):
        if output_format not in ("rgb", "yuv420"):
            raise ValueError(f"bad output_format {output_format}")
        self._output_format = output_format
        self._n_refs = n_refs
        self._span: TpuSpanDecoder | None = None
        self._pending: list[bytes] = []
        self._queue: collections.deque[np.ndarray] = collections.deque()

    def configure(self, info: FrameInfo, extradata: bytes) -> None:
        codec = codec_name_for_format(info.format)
        if codec == "h264":
            self._span = TpuSpanDecoder(extradata, n_refs=self._n_refs)
        elif codec == "hevc":
            self._span = HevcSpanDecoder(extradata)
        else:
            raise HwangError(
                f"TPU decode path supports H.264/HEVC (got {codec}); use "
                "the SOFTWARE backend"
            )
        self._pending.clear()
        self._queue.clear()

    def feed(self, data: bytes, keyframe: bool) -> None:
        if self._span is None:
            raise HwangError("decoder not configured")
        if data:
            self._pending.append(bytes(data))
        else:
            self._decode_pending()

    def flush(self) -> None:
        if self._pending:
            self._decode_pending()

    def decoded_frames_buffered(self) -> int:
        return len(self._queue)

    def get_frame(self) -> np.ndarray:
        if not self._queue:
            raise HwangError("get_frame with no buffered frame")
        return self._queue.popleft()

    def discard_frame(self) -> None:
        if not self._queue:
            raise HwangError("discard_frame with no buffered frame")
        self._queue.popleft()

    def close(self) -> None:
        self._pending.clear()
        self._queue.clear()

    # ------------------------------------------------------------------
    def _decode_pending(self) -> None:
        import jax.numpy as jnp

        from ..ops.yuv import yuv420_to_rgb

        if not self._pending:
            return
        span = self._span
        sizes = np.array([len(s) for s in self._pending], np.uint64)
        offsets = np.concatenate(([0], np.cumsum(sizes)[:-1])).astype(np.uint64)
        blob = b"".join(self._pending)
        self._pending.clear()

        Ys, Us, Vs, n, perm = span.decode_span(blob, offsets, sizes)
        left, top, right, bottom = span.crop
        W = span.coded_w - left - right
        H = span.coded_h - top - bottom
        if self._output_format == "rgb":
            rgb = yuv420_to_rgb(Ys, Us, Vs)
            rgb = rgb[:, top : top + H, left : left + W, :]
            host = np.asarray(rgb[:n])
            for d in range(n):  # emit in display order
                self._queue.append(host[perm[d]])
        else:
            # packed planar YUV at coded size cropped: emit Y then U,V
            # (crop chroma at half res).  Concatenate on-device so the
            # span costs ONE D2H fetch (the relay charges fixed latency
            # per transfer).
            y = Ys[:n, top : top + H, left : left + W]
            u = Us[:n, top // 2 : (top + H + 1) // 2,
                   left // 2 : (left + W + 1) // 2]
            v = Vs[:n, top // 2 : (top + H + 1) // 2,
                   left // 2 : (left + W + 1) // 2]
            yuv = np.asarray(jnp.concatenate(
                [y.reshape(n, -1), u.reshape(n, -1), v.reshape(n, -1)],
                axis=1,
            ))
            for d in range(n):  # emit in display order
                self._queue.append(yuv[perm[d]])
