"""End-to-end TPU-backend decode on robustness-relevant stream shapes.

Runs the real Decoder(TPU) path (host entropy decode -> packed transport
-> batched JAX reconstruction) on CPU-jax and compares bit-exactly
against libavcodec.  Covers stream shapes the unit tests don't:
multi-slice frames (slice-boundary neighbor availability, per-slice
deblock metadata) and odd display sizes (frame cropping).
"""

import numpy as np
import pytest

from hwang_tpu import Decoder, VideoDecoderType
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all

# the Decoder's TPU->SOFTWARE failover would silently turn these tests
# into software-path tests (the software output is bit-exact too) — a
# TPU-path decode error must FAIL here, not fall back
pytestmark = [
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


def test_tpu_multislice_bit_exact(tmp_path):
    """4 slices per frame: exercises slice-boundary intra availability
    (avail bits b4/b5) and per-slice deblock params on the TPU path."""
    p = str(tmp_path / "slices.mp4")
    encode_video(
        p, 6, 128, 96, profile="baseline", gop_size=6, crf=25,
        extra_opts="keyint=6:min-keyint=6:no-scenecut=1:ref=1:slices=4",
    )
    rows = list(range(6))
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


def test_tpu_cabac_bit_exact(tmp_path):
    """CABAC (main profile) I/P stream through the full TPU path: the host
    entropy decoder's arithmetic-decode path (native/src/h264/h264_cabac.h)
    feeding the same device reconstruction."""
    p = str(tmp_path / "cabac.mp4")
    encode_video(
        p, 12, 128, 96, profile="main", gop_size=6, crf=24,
        extra_opts="keyint=6:min-keyint=6:no-scenecut=1:bframes=0:"
                   "weightp=0:ref=2:subme=7:partitions=all",
    )
    rows = [0, 3, 5, 7, 11]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


def test_tpu_weighted_pred_bit_exact(tmp_path):
    """Weighted P prediction on a fade, through the production batched
    device path (packed transport ships per-ref weight rows)."""
    import numpy as np
    from hwang_tpu.utils.fixtures import synth_frame

    def fade(i, w, h, seed=0):
        f = synth_frame(i, w, h, seed).astype(np.int32)
        return np.clip((f * (256 - i * 20)) >> 8, 0, 255).astype(np.uint8)

    p = str(tmp_path / "wp.mp4")
    encode_video(p, 10, 96, 80, profile="main", gop_size=10, crf=20,
                 extra_opts="keyint=10:min-keyint=10:no-scenecut=1:"
                            "bframes=0:weightp=2:ref=2:subme=7",
                 frame_fn=fade)
    rows = [0, 4, 6, 9]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


def test_tpu_bframes_bit_exact(tmp_path):
    """x264-default-like stream (CABAC, bframes=3 adaptive, b-pyramid,
    implicit weighted bipred) through the full TPU path: B entropy decode,
    L1 motion compensation + bi-prediction on device, reference-ring
    gating by frame_is_ref, and display-order output mapping."""
    p = str(tmp_path / "bdef.mp4")
    encode_video(
        p, 16, 112, 80, profile="main", gop_size=16, crf=24, b_frames=3,
        extra_opts="keyint=16:min-keyint=16:no-scenecut=1:ref=3:subme=7:"
                   "weightp=0",
    )
    rows = [0, 3, 6, 9, 13, 15]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


def test_tpu_high_profile_bit_exact(tmp_path):
    """True x264-default stream (HIGH profile: 8x8 transform + CABAC +
    B-pyramid) through the full TPU path: intra 8x8 with filtered
    references, 8x8 dequant/IDCT, interleaved/cat-5 residuals, and the
    8x8 deblock edge rules."""
    p = str(tmp_path / "high.mp4")
    encode_video(
        p, 16, 112, 80, profile="high", gop_size=16, crf=24, b_frames=3,
        extra_opts="keyint=16:min-keyint=16:no-scenecut=1:ref=3:subme=7:"
                   "weightp=0",
    )
    rows = [0, 3, 7, 10, 15]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


def test_tpu_scaling_matrices_bit_exact(tmp_path):
    """Non-flat scaling matrices (x264 --cqm jvt) through the full TPU
    path: per-clip weight tables in the transport, weight-aware dequant
    with per-MB intra/inter list selection on device."""
    p = str(tmp_path / "cqm.mp4")
    encode_video(
        p, 8, 96, 80, profile="high", gop_size=8, crf=24,
        extra_opts="keyint=8:min-keyint=8:no-scenecut=1:bframes=0:"
                   "weightp=0:ref=2:cqm=jvt",
    )
    rows = [0, 3, 5, 7]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


def test_tpu_odd_size_crop_bit_exact(tmp_path):
    """100x76 display inside 112x80 coded: frame_crop right/bottom."""
    p = str(tmp_path / "odd.mp4")
    encode_video(
        p, 4, 100, 76, profile="baseline", gop_size=4, crf=25,
        extra_opts="keyint=4:min-keyint=4:no-scenecut=1:ref=1",
    )
    rows = [0, 3]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


def test_tpu_frame_num_wrap_poc_type2(tmp_path):
    """GOP longer than MaxFrameNum (2^log2_max_frame_num = 16 here) with
    pic_order_cnt_type=2: POC must apply FrameNumOffset (spec 8.2.1.3)
    across the frame_num wrap or display order scrambles mid-span.
    Regression: frames past the wrap were emitted in garbage order."""
    p = str(tmp_path / "wrap.mp4")
    # x264 defaults (no bframes arg) select poc_type 2 and
    # log2_max_frame_num 4; 30-frame GOP crosses the wrap at frame 16
    encode_video(p, 60, 96, 80, profile="high", gop_size=30, crf=25,
                 extra_opts="keyint=30:min-keyint=30:no-scenecut=1")
    rows = [0, 17, 29, 45, 59]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_tpu_ipcm_bit_exact(tmp_path, entropy):
    """I_PCM macroblocks: raw-sample passthrough under CAVLC, and the
    CABAC engine flush/realign/reinit around the raw bytes (spec 7.3.5 +
    9.3.1.2).  x264 never emits I_PCM, so the stream is synthesized from
    scratch (utils/bitsurgery.make_ipcm_mp4, incl. a minimal CABAC
    encoder) and validated against libavcodec."""
    from hwang_tpu.utils.bitsurgery import make_ipcm_mp4

    p = str(tmp_path / f"ipcm_{entropy}.mp4")
    make_ipcm_mp4(p, 3, 64, 48, cabac=(entropy == "cabac"), seed=7)

    from hwang_tpu import index_video
    from hwang_tpu.models.h264.entropy import H264EntropyDecoder

    idx = index_video(p)
    dec = H264EntropyDecoder(idx.metadata_bytes)
    t = dec.decode_gop(open(p, "rb").read(), idx.sample_offsets,
                       idx.sample_sizes)
    assert (t.mb_kind == 4).all(), "every MB should be I_PCM"

    rows = [0, 2]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as d:
        out = d.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


def test_tpu_hevc_bit_exact(tmp_path):
    """HEVC I-only stream through the full TPU path: the owned HEVC
    entropy front-end (native/src/hevc/) feeding the matmul device recon
    (models/hevc/recon_jax.py).  The reference only ever decoded HEVC
    through FFmpeg/NVDEC (software_video_decoder.cpp:122-136)."""
    p = str(tmp_path / "hevc.mp4")
    encode_video(
        p, 5, 96, 80, codec="libx265", profile="main", gop_size=1, crf=24,
        extra_opts="keyint=1:min-keyint=1:no-open-gop=1:ctu=16:"
                   "no-deblock=1:no-sao=1:no-wpp=1:frame-threads=1",
    )
    rows = [0, 2, 4]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


@pytest.mark.parametrize("ctu", [32, 64])
def test_tpu_hevc_big_ctu_bit_exact(tmp_path, ctu):
    """HEVC with x265's real-world CTU sizes (32/64) and ALL in-loop
    filters enabled (deblock + SAO + WPP): the coding-quadtree depth,
    big-CTB SAO/deblock metadata and per-row WPP substreams all flow
    through the TPU path.  Only max-tu-size is pinned to the supported
    transform set.  The reference decoded such streams via FFmpeg only
    (software_video_decoder.cpp:122-136)."""
    p = str(tmp_path / f"hevc_ctu{ctu}.mp4")
    encode_video(
        p, 3, 96, 64, codec="libx265", profile="main", gop_size=1, crf=24,
        extra_opts=f"keyint=1:min-keyint=1:no-open-gop=1:ctu={ctu}:"
                   "max-tu-size=16:frame-threads=1",
    )
    rows = [0, 1, 2]
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    _assert_yuv_exact(p, rows, out)


def test_tpu_hevc_defaults_native_and_multislice_falls_back(tmp_path):
    """Default x265 settings (deblock+SAO, inter, tmvp) now decode
    NATIVELY on the TPU path (round 4); multi-slice pictures remain
    outside the envelope and must fail over to SOFTWARE with the audit
    warning while still returning correct frames."""
    import warnings

    p = str(tmp_path / "hevc_full.mp4")
    encode_video(p, 8, 96, 80, codec="libx265", profile="main", gop_size=8)
    rows = [0, 5]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning = failure
        with Decoder(p, decoder_type=VideoDecoderType.TPU,
                     output_format="yuv420") as dec:
            out = dec.retrieve(rows)
    oracle = oracle_decode_all(p, fmt="yuv")
    for got, r in zip(out, rows):
        truth = np.concatenate([pl.ravel() for pl in oracle[r]])
        assert np.array_equal(got.ravel(), truth)

    # multi-slice: still SOFTWARE with the audited warning
    p2 = str(tmp_path / "hevc_slices.mp4")
    encode_video(p2, 6, 128, 96, codec="libx265", profile="main",
                 gop_size=6, extra_opts="slices=2:frame-threads=1")
    with pytest.warns(UserWarning, match="falling back to SOFTWARE"):
        with Decoder(p2, decoder_type=VideoDecoderType.TPU) as dec:
            out2 = dec.retrieve([0, 4])
    oracle2 = oracle_decode_all(p2)
    assert np.array_equal(out2[0], oracle2[0])
    assert np.array_equal(out2[1], oracle2[4])


def test_tpu_hevc_open_gop_rasl_extends_span(tmp_path):
    """A gather span starting at an open-GOP CRA contains RASL pictures
    whose references precede the span.  The TPU path must NOT return
    them as silent black frames: it retries with the span extended one
    keyframe back, which makes the RASLs decodable natively (the
    SOFTWARE path can't be used here — libavcodec silently DROPS
    undecodable RASL outputs and misaligns the whole span)."""
    import warnings

    p = str(tmp_path / "hevc_ogop.mp4")
    encode_video(p, 24, 96, 80, codec="libx265", profile="main",
                 gop_size=8,
                 extra_opts="open-gop=1:bframes=3:b-adapt=0:"
                            "frame-threads=1")
    with open(p, "rb") as f:
        from hwang_tpu import index_video
        idx = index_video(f)
    # only meaningful if the encode actually produced a non-IDR keyframe
    # mid-stream (open GOP); request a frame right after the 2nd keyframe
    kfs = list(idx.keyframe_indices)
    if len(kfs) < 2:
        pytest.skip("encoder produced a single GOP")
    rows = [int(kfs[1]) + 1, int(kfs[1]) + 3]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # extension must not warn/fallback
        with Decoder(p, decoder_type=VideoDecoderType.TPU,
                     output_format="yuv420") as dec:
            out = dec.retrieve(rows)
    oracle = oracle_decode_all(p, fmt="yuv")
    for got, r in zip(out, rows):
        truth = np.concatenate([pl.ravel() for pl in oracle[r]])
        assert np.array_equal(got.ravel(), truth), f"row {r}"
