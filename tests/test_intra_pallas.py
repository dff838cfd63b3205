"""Pallas intra wavefront kernel vs the XLA skewed stage (bit-exact).

Runs the kernel in interpret mode on CPU (the compiled TPU path is
exercised by bench.py).  Comparison is end-to-end through the batched GOP
decoder: HWANG_INTRA=pallas vs HWANG_INTRA=skewed must agree exactly, and
both must match the libavcodec oracle — two independent implementations of
spec 8.3 over real encoder output (all i4/i16/chroma modes appear in an
I-frame at this size).
"""

import ctypes

import numpy as np
import pytest

from hwang_tpu import index_video
from hwang_tpu.models.h264.entropy import H264EntropyDecoder
from hwang_tpu.native import get_lib
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    d = tmp_path_factory.mktemp("intrap")
    out = []
    for i, opts in enumerate(
        ["ref=2", "ref=2:cabac=0"]  # CABAC and CAVLC syntax variants
    ):
        p = str(d / f"c{i}.mp4")
        encode_video(p, 6, 64, 48, profile="main", gop_size=6, crf=24,
                     seed=11 * i + 3,
                     extra_opts=f"keyint=6:min-keyint=6:no-scenecut=1:{opts}")
        idx = index_video(p)
        dec = H264EntropyDecoder(idx.metadata_bytes)
        lib = get_lib()
        lib.hw_h264_chroma_qp_offset.restype = ctypes.c_int
        lib.hw_h264_chroma_qp_offset.argtypes = [ctypes.c_void_p]
        cqo = lib.hw_h264_chroma_qp_offset(dec._h)
        t = dec.decode_gop(open(p, "rb").read(), idx.sample_offsets,
                           idx.sample_sizes)
        out.append((p, t, cqo))
    return out


def _decode(clips, intra_impl, monkeypatch, variant="block"):
    from hwang_tpu.models.h264.recon_batched import (
        decode_gop_batched,
        stack_tensors,
    )

    monkeypatch.setenv("HWANG_INTRA", intra_impl)
    monkeypatch.setenv("HWANG_INTRA_VARIANT", variant)
    decode_gop_batched.clear_cache()  # env is read at trace time
    tensors = [t for _, t, _ in clips]
    cqo = clips[0][2]
    g = stack_tensors(tensors, pad_frames=6)
    out = decode_gop_batched(g, tensors[0].mb_width, tensors[0].mb_height,
                             cqo, 2)
    res = tuple(np.asarray(a) for a in out)
    decode_gop_batched.clear_cache()
    monkeypatch.delenv("HWANG_INTRA")
    return res


def test_intra_pallas_matches_skewed_and_oracle(clips, monkeypatch):
    ref = _decode(clips, "skewed", monkeypatch)
    got = _decode(clips, "pallas", monkeypatch)
    for name, a, b in zip("YUV", ref, got):
        assert np.array_equal(a, b), name
    Ys, Us, Vs = got
    for b, (p, t, _) in enumerate(clips):
        oracle = oracle_decode_all(p, fmt="yuv")
        for f in range(t.n_frames):
            oy, ou, ov = oracle[f]
            assert np.array_equal(Ys[b, f], oy), f"clip {b} frame {f} Y"
            assert np.array_equal(Us[b, f], ou), f"clip {b} frame {f} U"
            assert np.array_equal(Vs[b, f], ov), f"clip {b} frame {f} V"


@pytest.fixture(scope="module")
def clips8(tmp_path_factory):
    """High-profile clips with the 8x8 transform: every I frame carries
    intra-8x8 MBs (x264 High defaults to 8x8dct=1; i4/i16 still appear),
    so the kernel's with_i8 branch and its quadrant chaining are hit."""
    d = tmp_path_factory.mktemp("intrap8")
    out = []
    for i, opts in enumerate(["ref=2", "ref=2:cabac=0"]):
        p = str(d / f"c{i}.mp4")
        encode_video(p, 6, 64, 48, profile="high", gop_size=6, crf=24,
                     seed=7 * i + 5,
                     extra_opts=f"keyint=6:min-keyint=6:no-scenecut=1:{opts}")
        idx = index_video(p)
        dec = H264EntropyDecoder(idx.metadata_bytes)
        lib = get_lib()
        lib.hw_h264_chroma_qp_offset.restype = ctypes.c_int
        lib.hw_h264_chroma_qp_offset.argtypes = [ctypes.c_void_p]
        cqo = lib.hw_h264_chroma_qp_offset(dec._h)
        t = dec.decode_gop(open(p, "rb").read(), idx.sample_offsets,
                           idx.sample_sizes)
        assert t.transform8 is not None and t.transform8.any(), \
            "fixture must exercise the 8x8 transform"
        out.append((p, t, cqo))
    return out


def test_intra_pallas_i8x8_matches_skewed_and_oracle(clips8, monkeypatch):
    ref = _decode(clips8, "skewed", monkeypatch)
    got = _decode(clips8, "pallas", monkeypatch)
    for name, a, b in zip("YUV", ref, got):
        assert np.array_equal(a, b), name
    Ys, Us, Vs = got
    for b, (p, t, _) in enumerate(clips8):
        oracle = oracle_decode_all(p, fmt="yuv")
        for f in range(t.n_frames):
            oy, ou, ov = oracle[f]
            assert np.array_equal(Ys[b, f], oy), f"clip {b} frame {f} Y"
            assert np.array_equal(Us[b, f], ou), f"clip {b} frame {f} U"
            assert np.array_equal(Vs[b, f], ov), f"clip {b} frame {f} V"


def test_intra_pallas_i8x8_ring_matches_block(clips8, monkeypatch):
    ref = _decode(clips8, "pallas", monkeypatch, variant="block")
    got = _decode(clips8, "pallas", monkeypatch, variant="ring")
    for name, a, b in zip("YUV", ref, got):
        assert np.array_equal(a, b), name


def test_intra_pallas_ring_matches_block(clips, monkeypatch):
    """Ring-DMA variant (HBM-resident, 4-column VMEM ring — used for
    1080p-class frames): bit-identical to the whole-block kernel.  The
    B=2 batch also exercises the clip padding to the 8-lane DMA
    alignment."""
    ref = _decode(clips, "pallas", monkeypatch, variant="block")
    got = _decode(clips, "pallas", monkeypatch, variant="ring")
    for name, a, b in zip("YUV", ref, got):
        assert np.array_equal(a, b), name
