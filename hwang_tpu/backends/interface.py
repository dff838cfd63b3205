"""Decoder backend abstraction.

Parity with the reference's stateful push/pull decoder contract
(hwang/video_decoder_interface.h:30-49) and factory
(hwang/video_decoder_factory.h:23-38):

  - configure(FrameInfo, extradata): prepare for a stream
  - feed(data, keyframe): push one MP4-framed (AVCC) sample
  - flush(): end the current decode span; drain pending frames into the
    output queue and reset so the next fed sample may start at any keyframe
  - decoded_frames_buffered(): frames ready to consume
  - get_frame()/discard_frame(): consume in output order

Output formats: "rgb" (HxWx3 uint8, swscale-compatible) or "yuv420"
(planar, bit-exact codec output) — the latter is the TPU-native contract
where the fused YUV->RGB epilogue runs on-device.
"""

from __future__ import annotations

import abc
import dataclasses
import enum

import numpy as np

from ..common import DeviceHandle, DeviceType


class VideoDecoderType(enum.Enum):
    """Parity: hwang/video_decoder_factory.h:23-27 (+ TPU addition)."""

    SOFTWARE = 0
    NVIDIA = 1   # kept for API parity; not available on TPU hosts
    INTEL = 2    # kept for API parity; never compiled in the reference either
    TPU = 3      # Pallas/JAX decode path


@dataclasses.dataclass
class FrameInfo:
    """Parity: hwang/video_decoder_interface.h FrameInfo."""

    width: int = 0
    height: int = 0
    format: str = ""  # sample entry fourcc: avc1/hvc1/hev1/...


def codec_name_for_format(fmt: str) -> str:
    """Map a sample-entry fourcc to a codec family name.

    Parity with the reference's format dispatch
    (software_video_decoder.cpp:122-136: h264/avc1 -> H264,
    hevc/hev1/h265 -> HEVC).
    """
    f = fmt.lower()
    if f in ("h264", "avc1", "avc2", "avc3", "avc4"):
        return "h264"
    if f in ("hevc", "hev1", "hvc1", "h265"):
        return "hevc"
    raise ValueError(f"unsupported video format '{fmt}'")


class VideoDecoderInterface(abc.ABC):
    @abc.abstractmethod
    def configure(self, info: FrameInfo, extradata: bytes) -> None: ...

    @abc.abstractmethod
    def feed(self, data: bytes, keyframe: bool) -> None: ...

    @abc.abstractmethod
    def flush(self) -> None: ...

    @abc.abstractmethod
    def decoded_frames_buffered(self) -> int: ...

    @abc.abstractmethod
    def get_frame(self) -> np.ndarray: ...

    @abc.abstractmethod
    def discard_frame(self) -> None: ...

    def wait_until_frames_copied(self) -> None:
        """Synchronize any async output copies (no-op for sync backends)."""

    def close(self) -> None:
        pass


def make_decoder(
    device: DeviceHandle,
    decoder_type: VideoDecoderType = VideoDecoderType.SOFTWARE,
    num_devices: int = 1,
    output_format: str = "rgb",
) -> VideoDecoderInterface:
    """Decoder factory. Parity: hwang/video_decoder_factory.cpp:44-99."""
    if decoder_type == VideoDecoderType.SOFTWARE:
        from .software import SoftwareVideoDecoder

        return SoftwareVideoDecoder(
            n_threads=num_devices, output_format=output_format
        )
    if decoder_type == VideoDecoderType.TPU:
        from .tpu import TpuVideoDecoder

        return TpuVideoDecoder(output_format=output_format)
    raise ValueError(f"decoder type {decoder_type} not available on this host")


def supported_decoder_types() -> list[VideoDecoderType]:
    """Capability listing. Parity: video_decoder_factory.cpp:31-42."""
    types = [VideoDecoderType.SOFTWARE]
    try:
        import jax

        if jax.devices():
            types.append(VideoDecoderType.TPU)
    except Exception:
        pass
    return types
