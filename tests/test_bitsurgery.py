"""Bitstream-surgery fixtures: features no encoder emits.

Each test rewrites x264 output at the bit level (utils/bitsurgery),
producing conformant streams exercising long-term references, MMCO 2-6,
pic_order_cnt_type=1 and explicit B weighting.  Ground truth remains the
independent libavcodec oracle decoding the SAME doctored stream — the
rewrite may change which pixels get predicted, but two correct decoders
agree bit-exactly.
"""

import numpy as np
import pytest

from hwang_tpu import Decoder, VideoDecoderType, index_video
from hwang_tpu.utils.bitsurgery import SliceEdit, rewrite_stream
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all


def _assert_tpu_yuv_exact(path, rows):
    oracle = oracle_decode_all(path, fmt="yuv")
    with Decoder(path, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
        # a silent SOFTWARE fallback would make this comparison vacuous
        assert dec._decoder_type == VideoDecoderType.TPU, (
            "TPU decode fell back to SOFTWARE"
        )
    for got, r in zip(out, rows):
        oy, ou, ov = oracle[r]
        want = np.concatenate(
            [oy.reshape(-1), ou.reshape(-1), ov.reshape(-1)]
        )
        assert np.array_equal(got, want), f"frame {r} differs"


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_identity_rewrite(tmp_path, entropy):
    """Round-trip sanity: an unmodified rewrite decodes identically."""
    src = str(tmp_path / "src.mp4")
    extra = "keyint=8:min-keyint=8:no-scenecut=1:ref=2:weightp=0"
    if entropy == "cavlc":
        extra += ":cabac=0"
    encode_video(src, 16, 96, 80, profile="main", gop_size=8, crf=24,
                 extra_opts=extra)
    orig = oracle_decode_all(src, fmt="yuv")
    dst = str(tmp_path / "ident.mp4")
    rewrite_stream(src, dst)
    doctored = oracle_decode_all(dst, fmt="yuv")
    for f, (a, b) in enumerate(zip(orig, doctored)):
        for pa, pb in zip(a, b):
            assert np.array_equal(pa, pb), f"identity rewrite frame {f}"
    _assert_tpu_yuv_exact(dst, [0, 5, 9, 15])


def test_poc_type1(tmp_path):
    """pic_order_cnt_type=1 (delta_always_zero): exact POC derivation
    incl. the frame_num-wrap FrameNumOffset (spec 8.2.1.2/8.2.1.3)."""
    src = str(tmp_path / "src.mp4")
    # GOP 24 > MaxFrameNum 16 crosses the frame_num wrap mid-GOP
    encode_video(src, 24, 96, 80, profile="main", gop_size=24, crf=24,
                 extra_opts="keyint=24:min-keyint=24:no-scenecut=1:ref=2:"
                            "weightp=0:bframes=0")

    def sps_fn(s):
        s.pic_order_cnt_type = 1
        s.delta_pic_order_always_zero = 1
        s.offset_for_non_ref_pic = 0
        s.offset_for_top_to_bottom_field = 0
        s.offsets_for_ref_frame = [2]

    dst = str(tmp_path / "poc1.mp4")
    rewrite_stream(src, dst, sps_fn=sps_fn)
    _assert_tpu_yuv_exact(dst, [0, 7, 17, 23])


def test_long_term_idr_flag(tmp_path):
    """IDR long_term_reference_flag: frame 0 stays referenceable for the
    whole GOP while short-term refs slide (spec 8.2.4.2.1 list order,
    8.2.5.3 LT-aware sliding window)."""
    src = str(tmp_path / "src.mp4")
    encode_video(src, 16, 96, 80, profile="main", gop_size=16, crf=24,
                 extra_opts="keyint=16:min-keyint=16:no-scenecut=1:ref=2:"
                            "weightp=0:bframes=0")

    def edit_fn(i, st, is_idr, ref_idc):
        if is_idr:
            return SliceEdit(idr_long_term=True)
        return None

    dst = str(tmp_path / "lt.mp4")
    rewrite_stream(src, dst, edit_fn=edit_fn)
    _assert_tpu_yuv_exact(dst, [0, 6, 11, 15])


def test_mmco_long_term_ops(tmp_path):
    """MMCO 2/3/4/6 + LT-aware eviction: mark-current (4+6), convert
    short-term to long-term (3), unmark long-term (2)."""
    src = str(tmp_path / "src.mp4")
    encode_video(src, 20, 96, 80, profile="main", gop_size=20, crf=24,
                 extra_opts="keyint=20:min-keyint=20:no-scenecut=1:ref=2:"
                            "weightp=0:bframes=0")

    def edit_fn(i, st, is_idr, ref_idc):
        if ref_idc == 0 or is_idr:
            return None
        if i == 4:
            # free a short-term slot, allow LT idx 0, mark current LT
            # (adaptive marking replaces the sliding window, so it must
            # keep the DPB within max_num_ref_frames itself)
            return SliceEdit(mmco=[(1, 0, 0), (4, 1, 0), (6, 0, 0)])
        if i == 9:
            # convert the previous short-term ref to LT idx 0 (replaces
            # the old LT with that index, 8.2.5.4.3)
            return SliceEdit(mmco=[(3, 0, 0)])
        if i == 14:
            # unmark the long-term reference
            return SliceEdit(mmco=[(2, 0, 0)])
        return None

    dst = str(tmp_path / "mmco.mp4")
    rewrite_stream(src, dst, edit_fn=edit_fn)
    _assert_tpu_yuv_exact(dst, [0, 5, 8, 12, 16, 19])


def test_mmco6_long_term_idx_nonzero(tmp_path):
    """MMCO 6 with long_term_frame_idx=1 while idx 0 is also occupied:
    two concurrent long-term references.  Regression for the apply-site
    reading op 6's index from the wrong ue(v) slot (it is the second one,
    like op 3's) — the bug collapsed every op-6 mark onto idx 0, so the
    later op-3 assignment of idx 0 would evict it and the op-2 unmark of
    lt_num 1 would find nothing."""
    src = str(tmp_path / "src.mp4")
    encode_video(src, 20, 96, 80, profile="main", gop_size=20, crf=24,
                 extra_opts="keyint=20:min-keyint=20:no-scenecut=1:ref=3:"
                            "weightp=0:bframes=0")

    def edit_fn(i, st, is_idr, ref_idc):
        if ref_idc == 0 or is_idr:
            return None
        if i == 3:
            # free the newest short-term, allow LT idx 0..1, mark the
            # current picture long-term at idx **1**
            return SliceEdit(mmco=[(1, 0, 0), (4, 2, 0), (6, 0, 1)])
        if i == 8:
            # convert frame 7 to LT idx 0 (both LT slots now live);
            # drop frame 6 to stay within max_num_ref_frames
            return SliceEdit(mmco=[(1, 1, 0), (3, 0, 0)])
        if i == 14:
            # unmark LT idx 1 (the op-6 picture) by long_term_pic_num
            return SliceEdit(mmco=[(2, 1, 0)])
        return None

    dst = str(tmp_path / "mmco6.mp4")
    rewrite_stream(src, dst, edit_fn=edit_fn)
    _assert_tpu_yuv_exact(dst, [0, 4, 7, 10, 13, 15, 19])


def test_mmco5_reset(tmp_path):
    """MMCO 5: unmark everything and reset POC/frame_num state."""
    src = str(tmp_path / "src.mp4")
    encode_video(src, 12, 96, 80, profile="main", gop_size=12, crf=24,
                 extra_opts="keyint=12:min-keyint=12:no-scenecut=1:ref=1:"
                            "weightp=0:bframes=0")

    def edit_fn(i, st, is_idr, ref_idc):
        if i == 6 and not is_idr and ref_idc:
            return SliceEdit(mmco=[(5, 0, 0)])
        return None

    dst = str(tmp_path / "mmco5.mp4")
    rewrite_stream(src, dst, edit_fn=edit_fn)
    _assert_tpu_yuv_exact(dst, [0, 5, 6, 8, 11])


def test_explicit_b_weighting_host(tmp_path):
    """weighted_bipred_idc=1 with real weight tables: the host decoder
    parses/exports them, the numpy reference model and the device
    reconstruction both apply eq 8-272; compared against libavcodec."""
    import ctypes

    from hwang_tpu.models.h264 import ref_recon as R
    from hwang_tpu.models.h264.entropy import H264EntropyDecoder

    src = str(tmp_path / "src.mp4")
    encode_video(src, 12, 96, 80, profile="main", b_frames=2, gop_size=12,
                 crf=24,
                 extra_opts="keyint=12:min-keyint=12:no-scenecut=1:ref=2:"
                            "weightp=0")

    def pps_fn(p):
        p.weighted_bipred_idc = 1

    def edit_fn(i, st, is_idr, ref_idc):
        if st == 1:  # B slices get non-trivial weights on both lists
            return SliceEdit(weight_tables=(
                5, 5,
                [(40, 3, [(30, -2), (34, 1)]), None],
                [(24, -1, None), None],
            ))
        return None

    dst = str(tmp_path / "expb.mp4")
    rewrite_stream(src, dst, pps_fn=pps_fn, edit_fn=edit_fn)

    oracle = oracle_decode_all(dst, fmt="yuv")
    idx = index_video(dst)
    dec = H264EntropyDecoder(idx.metadata_bytes)
    t = dec.decode_gop(open(dst, "rb").read(), idx.sample_offsets,
                       idx.sample_sizes)
    rec = R.reconstruct_gop(t, chroma_qp_offset=dec.chroma_qp_offset,
                            with_deblock=True)
    order = np.argsort(t.poc[: t.n_frames], kind="stable")
    for disp in range(t.n_frames):
        oy, ou, ov = oracle[disp]
        ry, ru, rv = rec[order[disp]]
        assert np.array_equal(ry, oy), f"display frame {disp} Y"
        assert np.array_equal(ru, ou), f"display frame {disp} U"
        assert np.array_equal(rv, ov), f"display frame {disp} V"

    # native TPU path applies the explicit bi combine on-device
    _assert_tpu_yuv_exact(dst, [0, 3, 7, 11])
