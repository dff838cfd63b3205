"""HEVC inter (P/B) host entropy + numpy recon vs libavcodec.

Extends test_hevc_entropy.py's ground-truth chain to inter slices: the
native front-end (native/src/hevc/hevc_decode.cpp) parses P/B CU syntax
and derives final motion on the host (merge/AMVP/TMVP, 8.5.3.2), and
models/hevc/ref_recon.py applies 8-tap/4-tap MC with weighted
combination (8.5.3.3).  Each fixture turns on one more tool, so a
failure localizes the stage.

Reference parity: the upstream reference decodes arbitrary HEVC through
FFmpeg/NVDEC (software_video_decoder.cpp:122-136); its fixture trio is
HEVC (videos.h:26-36).
"""

import numpy as np
import pytest

from hwang_tpu import index_video
from hwang_tpu.models.hevc.entropy import HevcEntropyDecoder
from hwang_tpu.models.hevc.ref_recon import reconstruct_gop
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all

# no in-loop filters (ref_recon models none), single thread, 16x16 CTUs
_BASE = ("no-open-gop=1:ctu=16:no-deblock=1:no-sao=1:no-wpp=1:"
         "frame-threads=1:aq-mode=0:no-signhide=1")


def _fade_frame(i, w, h, seed=0):
    """Fading + moving synthetic content: motion for P/B tools, global
    luminance ramp so x265's weightp engages."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h * 2, w * 2, 3), np.uint8)
    dx, dy = (3 * i) % w, (2 * i) % h
    f = base[dy:dy + h, dx:dx + w].astype(np.int32)
    f = np.clip(f * (10 + i) // 16, 0, 255)
    return f.astype(np.uint8)


def _mk(tmp_path, name, n, w, h, opts, frame_fn=None):
    p = str(tmp_path / f"{name}.mp4")
    kw = {}
    if frame_fn is not None:
        kw["frame_fn"] = frame_fn
    encode_video(p, n, w, h, codec="libx265", profile="main", gop_size=250,
                 crf=26, extra_opts=_BASE + ":" + opts, **kw)
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
    recon = reconstruct_gop(t)
    # decode order == display order only without B frames; with reorder,
    # match display positions through the POC order
    if t.poc is not None and t.n_frames > 1:
        order = np.argsort(t.poc, kind="stable")
    else:
        order = np.arange(t.n_frames)
    for disp in range(t.n_frames):
        planes = recon[order[disp]]
        assert planes is not None
        for pi, (a, b) in enumerate(zip(planes, truth[disp])):
            d = np.abs(a.astype(int) - b.astype(int))
            assert d.max() == 0, (
                f"display {disp} (decode {order[disp]}) plane {pi}: "
                f"maxdiff {d.max()} ndiff {(d > 0).sum()}"
            )


def test_p_basic(tmp_path):
    """P slices, 1 ref, no TMVP/weightp: merge + AMVP spatial only."""
    p = _mk(tmp_path, "p_basic", 8, 64, 64,
            "bframes=0:ref=1:no-temporal-mvp=1:no-weightp=1")
    assert_exact(p)


def test_p_tmvp(tmp_path):
    """P slices + temporal MVP (collocated MV field + scaling)."""
    p = _mk(tmp_path, "p_tmvp", 8, 64, 64,
            "bframes=0:ref=1:no-weightp=1")
    assert_exact(p)


def test_p_multiref(tmp_path):
    """P slices, 3 refs: ref_idx coding + AMVP scaling across refs."""
    p = _mk(tmp_path, "p_multiref", 10, 96, 64,
            "bframes=0:ref=3:no-weightp=1")
    assert_exact(p)


def test_p_weightp(tmp_path):
    """Explicit weighted P prediction on a fade."""
    p = _mk(tmp_path, "p_weightp", 10, 96, 64,
            "bframes=0:ref=2", frame_fn=_fade_frame)
    assert_exact(p)


def test_p_rect_amp(tmp_path):
    """Rectangular + asymmetric partitions."""
    p = _mk(tmp_path, "p_rect_amp", 8, 96, 96,
            "bframes=0:ref=2:rect=1:amp=1:no-weightp=1")
    assert_exact(p)


def test_b_frames(tmp_path):
    """B frames + b-pyramid: list1, bi-prediction, POC reorder."""
    p = _mk(tmp_path, "b_frames", 12, 64, 64,
            "bframes=3:ref=2:no-weightp=1")
    assert_exact(p)


def test_b_weightb(tmp_path):
    """B frames with weighted bi-prediction on a fade."""
    p = _mk(tmp_path, "b_weightb", 12, 64, 64,
            "bframes=3:ref=2:weightb=1", frame_fn=_fade_frame)
    assert_exact(p)


def test_x265_defaults_nofilter(tmp_path):
    """Everything x265 defaults choose (B/b-pyramid/tmvp/weightp/ctu64),
    minus in-loop filters and threads."""
    p = str(tmp_path / "defaults.mp4")
    encode_video(
        p, 16, 112, 80, codec="libx265", profile="main", gop_size=250,
        crf=26,
        extra_opts="no-deblock=1:no-sao=1:no-wpp=1:frame-threads=1:"
                   "no-open-gop=1:no-signhide=1",
        frame_fn=_fade_frame,
    )
    assert_exact(p)


def test_long_span_ref_index_guard(tmp_path):
    """A span past 256 samples would wrap the uint8 pu_ref* span index
    and silently feed the wrong reference frame.  The front-end must
    FAIL the decode instead (-> audited SOFTWARE fallback upstream)."""
    # 64x64: this image's libx265 heap-corrupts on width-48 encodes
    # (system-library bug, bisected; independent of our RGB/YUV feed)
    p = _mk(tmp_path, "longspan", 260, 64, 64, "bframes=0:ref=1:keyint=300",
            frame_fn=lambda i, w, h, seed=0: np.full(
                (h, w, 3), (i * 7) % 255, np.uint8))
    with open(p, "rb") as f:
        idx = index_video(f)
        f.seek(idx.sample_offsets[0])
        nb = int(idx.sample_offsets[-1] + idx.sample_sizes[-1]
                 - idx.sample_offsets[0])
        data = f.read(nb)
    offs = [int(o - idx.sample_offsets[0]) for o in idx.sample_offsets]
    sizes = [int(s) for s in idx.sample_sizes]
    dec = HevcEntropyDecoder(idx.metadata_bytes)
    with pytest.raises(ValueError, match="span"):
        dec.decode_gop(data, offs, sizes)
