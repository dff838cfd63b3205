"""hwang-tpu: TPU-native sparse video decode framework.

Public API parity with the reference scanner-research/hwang Python package
(python/hwang/__init__.py, decoder.py, video_index.py):

    import hwang_tpu as hwang
    index = hwang.index_video("clip.mp4")       # or hwang.VideoIndex.from_file
    decoder = hwang.Decoder("clip.mp4")
    frames = decoder.retrieve([0, 30, 60, 250])  # list of HxWx3 uint8 RGB

Lower layers (also public, mirroring the reference C++/pybind surface):
    MP4IndexCreator          incremental pull-parser over MP4 sample tables
    slice_into_video_intervals   sparse-gather span planner
    DecoderAutomata / EncodedData    span decode state machine
    DeviceType / DeviceHandle / VideoDecoderType
"""

from .utils.jaxcache import enable_if_requested as _jaxcache_fix

# JAX_COMPILATION_CACHE_DIR is dead-on-arrival in this image (sitecustomize
# imports jax before user code); re-apply the user's intent if they set it.
_jaxcache_fix()

from .automata import DecoderAutomata, EncodedData, MAX_BUFFERED_FRAMES
from .backends.interface import (
    FrameInfo,
    VideoDecoderInterface,
    VideoDecoderType,
    make_decoder,
    supported_decoder_types,
)
from .common import (
    CPU_DEVICE,
    TPU_DEVICE,
    DeviceHandle,
    DeviceType,
    HwangError,
    Result,
)
from .decoder import Decoder
from .encoder import EncodeOptions, VideoEncoder, encode_clip
from .intervals import VideoIntervals, slice_into_video_intervals
from .mp4_index import MP4IndexCreator, index_video, index_video_bytes
from .video_index import VideoIndex

__version__ = "0.1.0"

__all__ = [
    "CPU_DEVICE",
    "TPU_DEVICE",
    "Decoder",
    "DecoderAutomata",
    "DeviceHandle",
    "DeviceType",
    "EncodeOptions",
    "EncodedData",
    "FrameInfo",
    "HwangError",
    "MAX_BUFFERED_FRAMES",
    "MP4IndexCreator",
    "Result",
    "VideoDecoderInterface",
    "VideoEncoder",
    "VideoDecoderType",
    "VideoIndex",
    "VideoIntervals",
    "encode_clip",
    "index_video",
    "index_video_bytes",
    "make_decoder",
    "slice_into_video_intervals",
    "supported_decoder_types",
]
