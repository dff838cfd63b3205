"""HEVC inter (P/B) DEVICE decode vs libavcodec.

Extends the test_hevc_jax.py ground-truth chain to inter spans: the
frame-sequential JAX path (recon_jax.decode_gop_frames_seq — MC from a
subpel-plane reference ring, batched inter residuals, intra level scan,
bs-aware deblock + SAO) must be bit-exact against the libavcodec oracle
on x265 streams, including full-default encodes.

Reference parity: the reference's accelerated backends decode arbitrary
HEVC by delegation (software_video_decoder.cpp:122-136); this is the
owned-TPU-path equivalent.
"""

import numpy as np
import pytest

from hwang_tpu import index_video
from hwang_tpu.models.hevc.entropy import HevcEntropyDecoder
from hwang_tpu.models.hevc.recon_jax import decode_gop_frames
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all

_BASE = "no-open-gop=1:no-wpp=1:frame-threads=1:aq-mode=0"


def _fade_frame(i, w, h, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h * 2, w * 2, 3), np.uint8)
    dx, dy = (3 * i) % w, (2 * i) % h
    f = base[dy:dy + h, dx:dx + w].astype(np.int32)
    f = np.clip(f * (10 + i) // 16, 0, 255)
    return f.astype(np.uint8)


def assert_device_exact(path):
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
    Y, U, V = (np.asarray(a) for a in decode_gop_frames(t))
    order = np.argsort(t.poc[:t.n_frames], kind="stable")
    for disp in range(t.n_frames):
        d = int(order[disp])
        for pi, (a, b) in enumerate(zip((Y[d], U[d], V[d]), truth[disp])):
            df = np.abs(a.astype(int) - b.astype(int))
            assert df.max() == 0, (
                f"display {disp} (decode {d}) plane {pi}: "
                f"maxdiff {df.max()} ndiff {(df > 0).sum()}"
            )


def _mk(tmp_path, name, n, w, h, opts, frame_fn=None):
    p = str(tmp_path / f"{name}.mp4")
    kw = {"frame_fn": frame_fn} if frame_fn else {}
    encode_video(p, n, w, h, codec="libx265", profile="main", gop_size=250,
                 crf=26, extra_opts=_BASE + ":" + opts, **kw)
    return p


def test_p_filters(tmp_path):
    """P slices with deblock + SAO on (bs-aware inter deblocking)."""
    p = _mk(tmp_path, "pf", 8, 96, 64, "bframes=0:ref=2:ctu=16")
    assert_device_exact(p)


def test_p_nofilter_multiref(tmp_path):
    p = _mk(tmp_path, "pm", 10, 64, 64,
            "bframes=0:ref=3:no-deblock=1:no-sao=1:ctu=16:no-signhide=1")
    assert_device_exact(p)


def test_b_frames_device(tmp_path):
    """B + b-pyramid with filters, 32x32 CTU."""
    p = _mk(tmp_path, "bf", 12, 96, 64, "bframes=3:ref=2:ctu=32")
    assert_device_exact(p)


def test_weightp_device(tmp_path):
    p = _mk(tmp_path, "wp", 10, 96, 64, "bframes=0:ref=2:ctu=16",
            frame_fn=_fade_frame)
    assert_device_exact(p)


def test_weightb_device(tmp_path):
    """Explicit WP in B slices: uni-directional L1 PUs carry weights in
    pu_wp1 only (pu_wp0 == 255) — the device path must gate weighted
    prediction per list, not on wp0 alone."""
    p = _mk(tmp_path, "wb", 16, 128, 96,
            "bframes=3:ref=2:weightb=1:b-adapt=0", frame_fn=_fade_frame)
    assert_device_exact(p)


@pytest.mark.slow
def test_x265_full_defaults_device(tmp_path):
    """Everything x265 defaults pick (ctu64, TU32, B/b-pyramid, tmvp,
    weightp, deblock, SAO, WPP, signhide, AQ) on the device path."""
    p = str(tmp_path / "dflt.mp4")
    encode_video(p, 16, 112, 80, codec="libx265", profile="main",
                 gop_size=250, crf=26,
                 extra_opts="no-open-gop=1:frame-threads=1",
                 frame_fn=_fade_frame)
    assert_device_exact(p)
