"""Host entropy decoder + numpy reference reconstruction vs libavcodec.

These tests validate the full TPU-path front-end (CAVLC entropy decode)
and the spec-faithful reconstruction model bit-exactly against the
independent libavformat+libavcodec oracle on real x264 streams.
"""

import ctypes

import numpy as np
import pytest

from hwang_tpu import index_video
from hwang_tpu.models.h264.entropy import H264EntropyDecoder
from hwang_tpu.models.h264.ref_recon import reconstruct_gop
from hwang_tpu.native import get_lib
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all, synth_frame


def chroma_qp_offset(dec):
    lib = get_lib()
    lib.hw_h264_chroma_qp_offset.restype = ctypes.c_int
    lib.hw_h264_chroma_qp_offset.argtypes = [ctypes.c_void_p]
    return lib.hw_h264_chroma_qp_offset(dec._h)


def decode_ours(path):
    idx = index_video(path)
    dec = H264EntropyDecoder(idx.metadata_bytes)
    t = dec.decode_gop(
        open(path, "rb").read(), idx.sample_offsets, idx.sample_sizes
    )
    return reconstruct_gop(t, chroma_qp_offset=chroma_qp_offset(dec))


def assert_exact(path):
    ours = decode_ours(path)
    oracle = oracle_decode_all(path, fmt="yuv")
    assert len(ours) == len(oracle)
    for f, (a, b) in enumerate(zip(ours, oracle)):
        for plane, (x, y) in enumerate(zip(a, b)):
            d = np.abs(x.astype(int) - y.astype(int))
            assert d.max() == 0, (
                f"frame {f} plane {plane}: maxdiff {d.max()} "
                f"ndiff {(d > 0).sum()}"
            )


def _mk(tmp_path, name, n, w, h, **kw):
    p = str(tmp_path / f"{name}.mp4")
    kw.setdefault("profile", "baseline")
    encode_video(p, n, w, h, **kw)
    return p


def test_iframes_noisy(tmp_path):
    p = _mk(tmp_path, "i", 5, 64, 64, gop_size=1, crf=23,
            extra_opts="keyint=1:min-keyint=1:no-scenecut=1")
    assert_exact(p)


def test_iframes_odd_size(tmp_path):
    p = _mk(tmp_path, "iodd", 3, 80, 48, gop_size=1, crf=28,
            extra_opts="keyint=1:min-keyint=1:no-scenecut=1")
    assert_exact(p)


def test_pframes_motion(tmp_path):
    p = _mk(tmp_path, "p", 8, 96, 64, gop_size=8, crf=24,
            extra_opts="keyint=8:min-keyint=8:no-scenecut=1:ref=1")
    assert_exact(p)


def test_pframes_multiref(tmp_path):
    p = _mk(tmp_path, "pref3", 8, 64, 64, gop_size=8, crf=24,
            extra_opts="keyint=8:min-keyint=8:no-scenecut=1:ref=3")
    assert_exact(p)


def test_qp_ladder(tmp_path):
    for crf in (18, 30, 38):
        p = _mk(tmp_path, f"crf{crf}", 4, 64, 64, gop_size=4, crf=crf,
                extra_opts="keyint=4:min-keyint=4:no-scenecut=1:ref=1")
        assert_exact(p)


def test_multiple_gops_as_spans(tmp_path):
    """Each GOP decodes independently as its own span."""
    p = _mk(tmp_path, "spans", 12, 64, 64, gop_size=4, crf=25,
            extra_opts="keyint=4:min-keyint=4:no-scenecut=1:ref=1")
    idx = index_video(p)
    dec = H264EntropyDecoder(idx.metadata_bytes)
    data = open(p, "rb").read()
    oracle = oracle_decode_all(p, fmt="yuv")
    cqo = chroma_qp_offset(dec)
    for start in (0, 4, 8):
        t = dec.decode_gop(
            data, idx.sample_offsets[start : start + 4],
            idx.sample_sizes[start : start + 4],
        )
        frames = reconstruct_gop(t, chroma_qp_offset=cqo)
        for f in range(4):
            for x, y in zip(frames[f], oracle[start + f]):
                assert np.array_equal(x, y)


def test_non_idr_span_start_rejected(tmp_path):
    p = _mk(tmp_path, "nonidr", 8, 64, 64, gop_size=8, crf=25,
            extra_opts="keyint=8:min-keyint=8:no-scenecut=1:ref=1")
    idx = index_video(p)
    dec = H264EntropyDecoder(idx.metadata_bytes)
    data = open(p, "rb").read()
    with pytest.raises(ValueError, match="IDR"):
        dec.decode_gop(data, idx.sample_offsets[3:5], idx.sample_sizes[3:5])


def test_cabac_detected(tmp_path):
    p = _mk(tmp_path, "cabac", 2, 64, 64, profile="main", gop_size=2, crf=25,
            extra_opts="keyint=2:min-keyint=2:no-scenecut=1:bframes=0")
    idx = index_video(p)
    dec = H264EntropyDecoder(idx.metadata_bytes)
    assert dec.is_cabac


def test_high_profile_8x8_bit_exact(tmp_path):
    """High profile with the 8x8 transform, both entropy modes."""
    for name, extra in (("h8_cabac", ""), ("h8_cavlc", ":cabac=0")):
        p = str(tmp_path / f"{name}.mp4")
        encode_video(p, 6, 64, 48, profile="high", gop_size=6, crf=22,
                     extra_opts="keyint=6:min-keyint=6:no-scenecut=1:"
                                f"bframes=0:weightp=0:ref=2:subme=7{extra}")
        assert_exact(p)


def test_scaling_matrices_bit_exact(tmp_path):
    """Non-flat scaling matrices (x264 --cqm jvt): SPS/PPS list parsing
    with fall-back rules and weight-aware dequant at spec shift
    references (4x4 ref 4, DC/8x8 ref 6)."""
    for name, extra in (("cqm_cabac", ""), ("cqm_cavlc", ":cabac=0")):
        p = str(tmp_path / f"{name}.mp4")
        encode_video(p, 6, 96, 80, profile="high", gop_size=6, crf=24,
                     extra_opts="keyint=6:min-keyint=6:no-scenecut=1:"
                                f"bframes=0:weightp=0:ref=2:cqm=jvt{extra}")
        idx = index_video(p)
        dec = H264EntropyDecoder(idx.metadata_bytes)
        assert dec.has_scaling
        assert_exact(p)


def test_cabac_ip_bit_exact(tmp_path):
    """CABAC entropy decode (h264_cabac.h + the CABAC MB layer) on an I/P
    main-profile stream with partitions and multi-ref."""
    p = _mk(tmp_path, "cabac_ip", 8, 64, 48, profile="main", gop_size=8,
            crf=26,
            extra_opts="keyint=8:min-keyint=8:no-scenecut=1:bframes=0:"
                       "weightp=0:ref=2:subme=7:partitions=all")
    assert_exact(p)


def _fade_frame(i, w, h, seed=0):
    f = synth_frame(i, w, h, seed).astype(np.int32)
    return np.clip((f * (256 - i * 20)) >> 8, 0, 255).astype(np.uint8)


def test_weighted_prediction_bit_exact(tmp_path):
    """Explicit weighted P prediction (8.4.2.3) on a fade — forces x264
    (weightp=2, its main-profile default) to emit non-trivial weights."""
    for name, profile in (("wp_cabac", "main"), ("wp_cavlc", "baseline")):
        p = str(tmp_path / f"{name}.mp4")
        encode_video(p, 10, 96, 80, profile=profile, gop_size=10, crf=20,
                     extra_opts="keyint=10:min-keyint=10:no-scenecut=1:"
                                "bframes=0:weightp=2:ref=2:subme=7",
                     frame_fn=_fade_frame)
        idx = index_video(p)
        dec = H264EntropyDecoder(idx.metadata_bytes)
        t = dec.decode_gop(open(p, "rb").read(), idx.sample_offsets,
                           idx.sample_sizes)
        assert t.weight_flag.any(), "fixture did not trigger pred weights"
        assert_exact(p)


def test_vlc_tables_self_check():
    """Native table self-check: spec-table prefix-freeness AND the
    decode-time two-level VLC LUTs reproducing the linear-scan match
    (symbol + consumed length) on every 16-bit prefix."""
    lib = get_lib()
    lib.hw_h264_check_tables.restype = ctypes.c_int
    assert lib.hw_h264_check_tables() == 0
