"""DecoderAutomata: span-by-span sparse decode state machine.

Drives a stateful decoder backend over a sequence of decode spans
(EncodedData), producing exactly the requested valid frames and discarding
the rest.  Behavioral parity with the reference automata
(hwang/decoder_automata.{h,cpp}):

  - EncodedData carries one keyframe-bounded span: the span's bytes, sample
    offsets/sizes rebased to that buffer, and absolute frame numbers for
    keyframes and requested (valid) frames (decoder_automata.h:43-66).
  - initialize() accepts ALL spans at once; get_frames(n) may cross span
    boundaries; span transitions flush/reset the backend
    (decoder_automata.cpp:192-226).
  - Feeding is throttled by an in-flight watermark (8 frames, matching
    decoder_automata.cpp:288-293) so memory stays bounded while the backend's
    internal pipeline stays busy.

The reference used a dedicated feeder thread + condvars; here the feed side
runs inline (plus an optional prefetch thread in the TPU pipeline layer) —
the backends already parallelize internally (libavcodec frame threads / TPU
async dispatch), so a Python feeder thread would only add GIL contention.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from .backends.interface import (
    FrameInfo,
    VideoDecoderInterface,
    VideoDecoderType,
    make_decoder,
)
from .common import DeviceHandle, HwangError

MAX_BUFFERED_FRAMES = 8  # parity: decoder_automata.h:79


@dataclasses.dataclass
class EncodedData:
    """One decode span. Parity: hwang/decoder_automata.h:43-66."""

    encoded_video: bytes = b""
    width: int = 0
    height: int = 0
    format: str = ""
    start_keyframe: int = 0          # absolute sample number of span start
    end_keyframe: int = 0            # absolute sample number of span end (excl)
    sample_offsets: list = dataclasses.field(default_factory=list)  # rebased
    sample_sizes: list = dataclasses.field(default_factory=list)
    keyframes: list = dataclasses.field(default_factory=list)        # absolute
    valid_frames: list = dataclasses.field(default_factory=list)     # absolute


class DecoderAutomata:
    def __init__(
        self,
        device_handle: DeviceHandle,
        num_devices: int = 1,
        decoder_type: VideoDecoderType = VideoDecoderType.SOFTWARE,
        output_format: str = "rgb",
        decoder: Optional[VideoDecoderInterface] = None,
        profiler=None,
    ):
        from .utils.profiler import PROFILER

        # Metric names mirror the reference's stubbed Profiler intervals
        # (decoder_automata.cpp:163-165,246-249,282-284).
        self.profiler = profiler or PROFILER
        self._device = device_handle
        self._decoder = decoder or make_decoder(
            device_handle, decoder_type, num_devices, output_format
        )
        self._output_format = output_format
        self._spans: list[EncodedData] = []
        self._extradata = b""
        # cursors
        self._span_idx = 0
        self._fed = 0          # samples fed within current span
        self._out_count = 0    # frames consumed (copied or discarded) in span
        self._valid_idx = 0    # index into current span's valid_frames
        self._fed_eos = False

    @staticmethod
    def make_instance(
        device_handle: DeviceHandle,
        num_devices: int = 1,
        decoder_type: VideoDecoderType = VideoDecoderType.SOFTWARE,
        **kwargs,
    ) -> "DecoderAutomata":
        """Parity: DecoderAutomata::make_instance (decoder_automata.h:38)."""
        return DecoderAutomata(device_handle, num_devices, decoder_type, **kwargs)

    # ------------------------------------------------------------------
    def initialize(
        self, encoded_data: Sequence[EncodedData], extradata: bytes
    ) -> None:
        """Configure the backend and reset cursors for a new span batch.

        Parity: decoder_automata.cpp:80-118.
        """
        if not encoded_data:
            raise HwangError("initialize with no spans")
        self._spans = list(encoded_data)
        self._extradata = bytes(extradata)
        first = self._spans[0]
        self._decoder.configure(
            FrameInfo(first.width, first.height, first.format), self._extradata
        )
        self._span_idx = 0
        self._fed = 0
        self._out_count = 0
        self._valid_idx = 0
        self._fed_eos = False

    def get_frames(self, n: int) -> list[np.ndarray]:
        """Return the next `n` requested frames (may cross spans).

        Parity: DecoderAutomata::get_frames (decoder_automata.cpp:120-252);
        the Python binding shape — a list of arrays — matches
        hwang_python.cpp:80-97.
        """
        out: list[np.ndarray] = []
        prof_span = self.profiler.span("get_frames")
        prof_span.__enter__()
        while len(out) < n:
            span = self._current_span_with_pending_valid()
            if span is None:
                raise HwangError(
                    f"requested {n} frames but only {len(out)} remain in spans"
                )
            target = span.valid_frames[self._valid_idx]
            self._ensure_buffered(span)
            # The next output frame's absolute display number.
            current = span.start_keyframe + self._out_count
            if current == target:
                frame = self._decoder.get_frame()
                out.append(frame)
                self._valid_idx += 1
                # Duplicate requests for the same frame alias one decode.
                while (
                    self._valid_idx < len(span.valid_frames)
                    and span.valid_frames[self._valid_idx] == target
                    and len(out) < n
                ):
                    out.append(frame)
                    self._valid_idx += 1
            else:
                self._decoder.discard_frame()
            self._out_count += 1
        self._decoder.wait_until_frames_copied()
        prof_span.__exit__(None, None, None)
        self.profiler.increment("frames_used", len(out))
        return out

    def frames_remaining(self) -> int:
        rem = 0
        for i in range(self._span_idx, len(self._spans)):
            if i == self._span_idx:
                rem += len(self._spans[i].valid_frames) - self._valid_idx
            else:
                rem += len(self._spans[i].valid_frames)
        return rem

    def close(self) -> None:
        self._decoder.close()

    # ------------------------------------------------------------------
    def _current_span_with_pending_valid(self) -> Optional[EncodedData]:
        """Advance across exhausted spans (flush-seek handshake) and return
        the span still owing valid frames, or None."""
        while self._span_idx < len(self._spans):
            span = self._spans[self._span_idx]
            if self._valid_idx < len(span.valid_frames):
                return span
            # Span exhausted: reset the backend for the next span's seek.
            # Parity: span-transition handshake, decoder_automata.cpp:192-226.
            self._decoder.flush()
            while self._decoder.decoded_frames_buffered() > 0:
                self._decoder.discard_frame()
            self._span_idx += 1
            self._fed = 0
            self._out_count = 0
            self._valid_idx = 0
            self._fed_eos = False
        return None

    def _ensure_buffered(self, span: EncodedData) -> None:
        """Feed samples until at least one decoded frame is available.

        Keeps up to MAX_BUFFERED_FRAMES in flight (parity:
        decoder_automata.cpp:288-293).
        """
        n_samples = len(span.sample_offsets)
        mv = memoryview(span.encoded_video)
        while True:
            buffered = self._decoder.decoded_frames_buffered()
            if buffered > 0 and (buffered >= MAX_BUFFERED_FRAMES or self._fed >= n_samples):
                return
            if self._fed < n_samples:
                off = int(span.sample_offsets[self._fed])
                size = int(span.sample_sizes[self._fed])
                sample_abs = span.start_keyframe + self._fed
                keyframe = sample_abs in span.keyframes
                self._decoder.feed(bytes(mv[off : off + size]), keyframe)
                self.profiler.increment("frames_fed")
                self._fed += 1
            elif not self._fed_eos:
                # All samples fed: signal end-of-span so the codec drains.
                # Parity: empty packet -> flush (decoder_automata.cpp:383-397).
                self._decoder.feed(b"", False)
                self._fed_eos = True
            else:
                if buffered > 0:
                    return
                raise HwangError(
                    f"decoder produced no frame (span {self._span_idx}, "
                    f"fed {self._fed}/{n_samples})"
                )
