"""HEVC host entropy decoder + numpy reference recon vs libavcodec.

Validates the TPU-path HEVC front-end (I-slice CTU CABAC entropy decode,
native/src/hevc/hevc_decode.cpp) and the spec-faithful reconstruction
model (models/hevc/ref_recon.py) bit-exactly against the independent
libavformat+libavcodec oracle on real x265 streams.

Reference parity: the upstream reference has no HEVC decoder of its own —
it selects the codec into FFmpeg/NVDEC (software_video_decoder.cpp:122-136)
and its test fixture set is HEVC (videos.h:26-36).  Here HEVC gets the
same owned front-end treatment as H.264.
"""

import numpy as np
import pytest

from hwang_tpu import index_video
from hwang_tpu.models.hevc.entropy import HevcEntropyDecoder
from hwang_tpu.models.hevc.ref_recon import reconstruct_frame
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all

# x265 knobs shared by every fixture: I-only closed GOP, single thread,
# no in-loop filters (ref_recon does not model deblock/SAO yet), 16x16
# CTUs so tiny frames still hold several CTUs.
_BASE = ("keyint=1:min-keyint=1:no-open-gop=1:ctu=16:no-deblock=1:"
         "no-sao=1:no-wpp=1:frame-threads=1:aq-mode=0")


def _mk(tmp_path, name, n, w, h, signhide=False, crf=23, seed=0):
    p = str(tmp_path / f"{name}.mp4")
    opts = _BASE if signhide else _BASE + ":no-signhide=1"
    encode_video(p, n, w, h, codec="libx265", profile="main", gop_size=1,
                 crf=crf, seed=seed, extra_opts=opts)
    return p


def assert_exact(path):
    with open(path, "rb") as f:
        idx = index_video(f)
        f.seek(idx.sample_offsets[0])
        nb = int(idx.sample_offsets[-1] + idx.sample_sizes[-1]
                 - idx.sample_offsets[0])
        data = f.read(nb)
    offs = [int(o - idx.sample_offsets[0]) for o in idx.sample_offsets]
    sizes = [int(s) for s in idx.sample_sizes]
    dec = HevcEntropyDecoder(idx.metadata_bytes)
    t = dec.decode_gop(data, offs, sizes)
    truth = oracle_decode_all(path, fmt="yuv")
    assert t.n_frames == len(truth)
    for f in range(t.n_frames):
        planes = reconstruct_frame(t, f)
        for pi, (a, b) in enumerate(zip(planes, truth[f])):
            d = np.abs(a.astype(int) - b.astype(int))
            assert d.max() == 0, (
                f"frame {f} plane {pi}: maxdiff {d.max()} "
                f"ndiff {(d > 0).sum()}"
            )


@pytest.mark.parametrize("w,h", [(16, 16), (32, 16), (48, 48)])
def test_sizes(tmp_path, w, h):
    # multiple CTU geometries incl. partial right/bottom CTUs (48 = 3 CTUs)
    assert_exact(_mk(tmp_path, f"sz{w}x{h}", 2, w, h, crf=28))


@pytest.mark.parametrize("crf", [18, 35])
def test_qp_extremes(tmp_path, crf):
    # dense coefficients (crf 18) and sparse/DC-heavy blocks (crf 35)
    assert_exact(_mk(tmp_path, f"crf{crf}", 2, 32, 32, crf=crf))


def test_sign_data_hiding(tmp_path):
    # x265 default signhide=1: subblocks with sig-span > 3 omit the first
    # sign bin and infer it from the level-sum parity (9.3.3.1.3)
    assert_exact(_mk(tmp_path, "sdh", 3, 64, 64, signhide=True, crf=20))


def test_multiframe_gop(tmp_path):
    # several I-frames through one decoder handle: per-frame context
    # reset, slice QP changes between frames
    assert_exact(_mk(tmp_path, "gop4", 4, 64, 48, signhide=True, crf=26))


def test_deblock_ref(tmp_path):
    """Numpy reference deblock (8.7.2) on a deblock-enabled stream."""
    from hwang_tpu.models.hevc.deblock_ref import deblock_frame

    p = str(tmp_path / "db.mp4")
    encode_video(p, 3, 64, 48, codec="libx265", profile="main", gop_size=1,
                 crf=20,
                 extra_opts="keyint=1:min-keyint=1:no-open-gop=1:ctu=16:"
                            "no-sao=1:no-wpp=1:frame-threads=1")
    with open(p, "rb") as f:
        idx = index_video(f)
        f.seek(idx.sample_offsets[0])
        nb = int(idx.sample_offsets[-1] + idx.sample_sizes[-1]
                 - idx.sample_offsets[0])
        data = f.read(nb)
    offs = [int(o - idx.sample_offsets[0]) for o in idx.sample_offsets]
    sizes = [int(s) for s in idx.sample_sizes]
    t = HevcEntropyDecoder(idx.metadata_bytes).decode_gop(data, offs, sizes)
    assert not t.deblock_disabled.any()
    truth = oracle_decode_all(p, fmt="yuv")
    for f in range(t.n_frames):
        planes = deblock_frame(*reconstruct_frame(t, f), t, f)
        for pi, (a, b) in enumerate(zip(planes, truth[f])):
            d = np.abs(a.astype(int) - b.astype(int))
            assert d.max() == 0, f"frame {f} plane {pi}"
