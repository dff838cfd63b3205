"""Full-resolution geometry coverage: real 1920x1088 and 3840x2160 coded
sizes through the production TPU path (BASELINE.md rows 2/5 evidence).

The Pallas intra/deblock kernels switch to their ring-DMA variants when a
frame batch no longer fits VMEM (`fits_vmem`), and until round 3 that
boundary was only exercised at synthetic sizes — never the actual HD/4K
MB geometry the bench presets use.  These decode a FEW frames (the cost
is geometry, not length) and compare bit-exactly against libavcodec.

Slow-marked: XLA compiles the full decoder at each geometry on the CPU
test mesh.  Run: python -m pytest tests/test_geometry_fullres.py -m slow
"""

import numpy as np
import pytest

from hwang_tpu import Decoder, VideoDecoderType
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all

pytestmark = [
    pytest.mark.slow,
    # a TPU-path failure must fail, not silently fall back to SOFTWARE
    pytest.mark.filterwarnings("error:TPU decode failed"),
    pytest.mark.filterwarnings("error:TPU decode path unavailable"),
]


def _assert_yuv_exact(path, rows, out):
    oracle = oracle_decode_all(path, fmt="yuv")
    for got, r in zip(out, rows):
        oy, ou, ov = oracle[r]
        want = np.concatenate(
            [oy.reshape(-1), ou.reshape(-1), ov.reshape(-1)]
        )
        assert np.array_equal(got, want), f"frame {r} differs"


def test_ring_kernels_engage_at_1080p():
    """The variant selector must choose the ring-DMA path at 1080p MB
    geometry (120x68) — pins the `fits_vmem` boundary the bench relies
    on, independent of the decode test below."""
    from hwang_tpu.ops import deblock_pallas, intra_pallas

    assert not intra_pallas.fits_vmem(120, 68)
    assert not deblock_pallas.fits_vmem(120, 68)
    # and stays on the resident path at the bench's 640x368 (40x23)
    assert intra_pallas.fits_vmem(40, 23)
    assert deblock_pallas.fits_vmem(40, 23)


def test_tpu_1080p_bit_exact(tmp_path):
    """Real 1920x1088 coded geometry (config-2/3 shape: main profile,
    CABAC) through the TPU path with the ring-DMA kernels engaged."""
    p = str(tmp_path / "hd.mp4")
    encode_video(
        p, 4, 1920, 1088, profile="main", gop_size=4, crf=28,
        extra_opts="keyint=4:min-keyint=4:no-scenecut=1:ref=2"
                   ":subme=2:me=hex:trellis=0",
    )
    rows = [0, 3]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


def test_tpu_4k_high_bframes_bit_exact(tmp_path):
    """3840x2160 High profile with B-frames + CABAC (config-5 shape):
    8x8 transform, B reordering, implicit bipred, at 4K MB geometry
    (240x135 MBs — odd mb_height exercises kernel padding)."""
    p = str(tmp_path / "uhd.mp4")
    encode_video(
        p, 4, 3840, 2160, profile="high", gop_size=4, crf=30, b_frames=2,
        extra_opts="keyint=4:min-keyint=4:no-scenecut=1:ref=2"
                   ":subme=2:me=hex:trellis=0",
    )
    rows = [0, 2, 3]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)
