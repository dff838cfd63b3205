"""Software (CPU) decode backend over the system libavcodec.

Behavioral analog of the reference FFmpeg backend
(hwang/impls/software/software_video_decoder.cpp): a stateful send/receive
decoder with a decoded-frame queue, configured from avcC/hvcC extradata,
consuming MP4-framed samples.  Conversion to RGB24 uses swscale with
SWS_BILINEAR exactly like the reference (cpp:292-328); "yuv420" output
returns the decoder's bit-exact planes.

This is the correctness oracle for the TPU decode path.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..common import HwangError
from ..native import as_u8p, get_lib
from .interface import FrameInfo, VideoDecoderInterface, codec_name_for_format


class SoftwareVideoDecoder(VideoDecoderInterface):
    def __init__(self, n_threads: int = 1, output_format: str = "rgb"):
        if output_format not in ("rgb", "yuv420"):
            raise ValueError(f"bad output_format {output_format}")
        self._lib = get_lib()
        self._handle = None
        self._n_threads = max(1, int(n_threads))
        self._output_format = output_format
        self._info: FrameInfo | None = None

    # -- interface --------------------------------------------------------
    def configure(self, info: FrameInfo, extradata: bytes) -> None:
        self.close()
        codec = codec_name_for_format(info.format)
        err = ctypes.create_string_buffer(512)
        ptr, owner = as_u8p(extradata) if extradata else (None, None)
        handle = self._lib.hw_dec_open(
            codec.encode(), ptr, len(extradata or b""), self._n_threads,
            err, len(err),
        )
        del owner
        if not handle:
            raise HwangError(f"decoder open failed: {err.value.decode()}")
        self._handle = handle
        self._info = info

    def feed(self, data: bytes, keyframe: bool) -> None:
        self._check()
        if data:
            ptr, owner = as_u8p(data)
            rc = self._lib.hw_dec_feed(self._handle, ptr, len(data), int(keyframe))
            del owner
        else:
            rc = self._lib.hw_dec_feed(self._handle, None, 0, 0)
        if rc != 0:
            raise HwangError(self._err())

    def flush(self) -> None:
        self._check()
        if self._lib.hw_dec_flush(self._handle) != 0:
            raise HwangError(self._err())

    def decoded_frames_buffered(self) -> int:
        self._check()
        return self._lib.hw_dec_frames_buffered(self._handle)

    def get_frame(self) -> np.ndarray:
        self._check()
        w = ctypes.c_int()
        h = ctypes.c_int()
        if self._lib.hw_dec_frame_dims(self._handle, ctypes.byref(w), ctypes.byref(h)) != 0:
            raise HwangError("get_frame with no buffered frame")
        w, h = w.value, h.value
        if self._output_format == "rgb":
            out = np.empty((h, w, 3), np.uint8)
            rc = self._lib.hw_dec_get_frame(self._handle, as_u8p(out)[0], 0)
        else:
            cw, ch = (w + 1) // 2, (h + 1) // 2
            out = np.empty(h * w + 2 * cw * ch, np.uint8)
            rc = self._lib.hw_dec_get_frame(self._handle, as_u8p(out)[0], 1)
        if rc != 0:
            raise HwangError(self._err())
        return out

    def discard_frame(self) -> None:
        self._check()
        if self._lib.hw_dec_discard_frame(self._handle) != 0:
            raise HwangError("discard_frame with no buffered frame")

    def close(self) -> None:
        if self._handle is not None:
            self._lib.hw_dec_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # -- helpers ----------------------------------------------------------
    def _check(self) -> None:
        if self._handle is None:
            raise HwangError("decoder not configured")

    def _err(self) -> str:
        return self._lib.hw_dec_error(self._handle).decode()
