"""Video encode path (re-encode capability).

The reference shipped a vestigial encoder that never compiled (namespace
`scanner` leftovers: video_encoder.{h,cpp}, impls/software/
software_video_encoder.{h,cpp} — see SURVEY.md §2.2).  Its intended
surface was EncodeOptions{quality(crf), bitrate, keyframe_distance} and a
configure/feed/flush stateful encoder (video_encoder.h:34-65).  This is a
working equivalent over the system libx264/libx265 via the native shim:
frames in (RGB24 or planar YUV420), an MP4 file out (muxing included —
the reference's packet-level API had no muxer at all, so callers would
have needed one anyway).
"""

from __future__ import annotations

import ctypes
import dataclasses
from typing import Optional

import numpy as np

from .common import HwangError
from .native import as_u8p, get_lib


@dataclasses.dataclass
class EncodeOptions:
    """Parity: reference EncodeOptions (video_encoder.h:34-38)."""

    quality: int = 23           # CRF; -1 = use bitrate
    bitrate: int = -1           # bits/sec (ABR), used when quality < 0
    keyframe_distance: int = 120  # parity default: gop_size 120
    codec: str = "h264"         # h264 | hevc
    profile: str = "high"
    fps: int = 24
    b_frames: int = 0
    fragmented_mp4: bool = False
    extra_params: str = ""      # raw x264-params / x265-params


class VideoEncoder:
    """Stateful frame encoder. Parity shape: configure/feed/flush
    (video_encoder.h:53-65), with the output muxed straight to MP4."""

    _CODECS = {"h264": "libx264", "hevc": "libx265"}

    def __init__(self):
        self._lib = get_lib()
        self._h = None
        self._w = 0
        self._ht = 0

    def configure(self, path: str, width: int, height: int,
                  options: Optional[EncodeOptions] = None) -> None:
        self.close()
        opts = options or EncodeOptions()
        codec = self._CODECS.get(opts.codec)
        if codec is None:
            raise HwangError(f"unsupported encode codec {opts.codec}")
        err = ctypes.create_string_buffer(512)
        self._h = self._lib.hw_enc_open(
            path.encode(), width, height, opts.fps, codec.encode(),
            opts.profile.encode(), opts.keyframe_distance, opts.b_frames,
            opts.quality, opts.bitrate, int(opts.fragmented_mp4),
            opts.extra_params.encode(), err, len(err),
        )
        if not self._h:
            raise HwangError(f"encoder open failed: {err.value.decode()}")
        self._w, self._ht = width, height

    def feed(self, frame: np.ndarray) -> None:
        """Encode one frame: HxWx3 uint8 RGB, or packed planar YUV420
        (1-D array of w*h*3/2 bytes)."""
        if self._h is None:
            raise HwangError("encoder not configured")
        frame = np.ascontiguousarray(frame, np.uint8)
        if frame.ndim == 3:
            if frame.shape != (self._ht, self._w, 3):
                raise HwangError(
                    f"expected {(self._ht, self._w, 3)}, got {frame.shape}"
                )
            rc = self._lib.hw_enc_write_rgb(self._h, as_u8p(frame)[0])
        else:
            w, h = self._w, self._ht
            if frame.size != w * h * 3 // 2:
                raise HwangError("bad planar YUV420 size")
            y = frame[: w * h]
            u = frame[w * h : w * h + w * h // 4]
            v = frame[w * h + w * h // 4 :]
            rc = self._lib.hw_enc_write_yuv(
                self._h, as_u8p(y)[0], as_u8p(u)[0], as_u8p(v)[0]
            )
        if rc != 0:
            raise HwangError(
                f"encode failed: {self._lib.hw_enc_error(self._h).decode()}"
            )

    def flush(self) -> None:
        """Drain the codec and finalize the MP4 (trailer + sample tables)."""
        if self._h is None:
            return
        rc = self._lib.hw_enc_close(self._h)
        self._h = None
        if rc != 0:
            raise HwangError("encoder flush/close failed")

    def close(self) -> None:
        if self._h is not None:
            self._lib.hw_enc_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()


def encode_clip(path: str, frames, options: Optional[EncodeOptions] = None
                ) -> str:
    """Encode an iterable of HxWx3 RGB frames to an MP4. Returns path."""
    it = iter(frames)
    first = np.ascontiguousarray(next(it), np.uint8)
    enc = VideoEncoder()
    enc.configure(path, first.shape[1], first.shape[0], options)
    enc.feed(first)
    for f in it:
        enc.feed(f)
    enc.flush()
    return path
