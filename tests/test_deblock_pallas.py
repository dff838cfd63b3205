"""Pallas deblocking kernels vs the XLA skewed wavefront (bit-exact).

Covers both variants: whole-block (frame fits VMEM) and ring-DMA
(HBM-resident with a 4-column VMEM ring, used for 1080p-class frames).

Runs the kernel in interpret mode on CPU; the compiled TPU path is
exercised by bench.py and was verified bit-exact on hardware.  Mirrors
the reference's gather-vs-sequential oracle idea at the stage level
(decoder_automata_test.cpp:262-342): two independent implementations of
the same spec stage must agree exactly.
"""

import ctypes

import numpy as np
import pytest


@pytest.fixture(scope="module")
def decoded(tmp_path_factory):
    from hwang_tpu import index_video
    from hwang_tpu.models.h264 import ref_recon as R
    from hwang_tpu.models.h264.entropy import H264EntropyDecoder
    from hwang_tpu.utils.fixtures import encode_video

    p = str(tmp_path_factory.mktemp("dbp") / "clip.mp4")
    # P-frames with real motion and varied QPs exercise all bS classes
    encode_video(p, 6, 64, 48, profile="baseline", gop_size=6, crf=24,
                 extra_opts="keyint=6:min-keyint=6:no-scenecut=1:ref=2")
    idx = index_video(p)
    dec = H264EntropyDecoder(idx.metadata_bytes)
    t = dec.decode_gop(open(p, "rb").read(), idx.sample_offsets,
                       idx.sample_sizes)
    nd = R.reconstruct_gop(t, chroma_qp_offset=dec.chroma_qp_offset,
                           with_deblock=False)
    return t, dec.chroma_qp_offset, nd


@pytest.mark.parametrize("variant", ["block", "ring"])
def test_pallas_deblock_matches_skewed(decoded, variant, monkeypatch):
    import jax.numpy as jnp

    from hwang_tpu.models.h264.recon_skewed import deblock_stage_skewed
    from hwang_tpu.ops.deblock_pallas import deblock_stage_pallas

    monkeypatch.setenv(
        "HWANG_DEBLOCK_VARIANT", "ring" if variant == "ring" else "block"
    )
    t, cqo, nd = decoded
    fs = list(range(t.n_frames))

    def stackf(get):
        return jnp.asarray(np.stack([get(f) for f in fs]).astype(np.int32))

    rid = t.refidx.astype(np.int64)
    span_ref = np.where(
        rid >= 0,
        np.take_along_axis(
            t.ref_map, np.clip(rid, 0, 15).reshape(t.n_frames, -1), axis=1
        ).reshape(rid.shape),
        -1,
    )
    meta = {
        "qp": stackf(lambda f: t.qp[f]),
        "kind": stackf(lambda f: t.mb_kind[f]),
        "idc": stackf(lambda f: t.deblock_idc[f]),
        "a_off": stackf(lambda f: t.alpha_off[f]),
        "b_off": stackf(lambda f: t.beta_off[f]),
        "avail": stackf(lambda f: t.avail[f]),
        "nnz": stackf(lambda f: t.nnz[f]),
        "mv": stackf(lambda f: t.mv[f]),
        "ref": stackf(lambda f: span_ref[f]),
    }
    Y = stackf(lambda f: nd[f][0])
    U = stackf(lambda f: nd[f][1])
    V = stackf(lambda f: nd[f][2])

    ref = deblock_stage_skewed(Y, U, V, meta, t.mb_width, t.mb_height, cqo)
    got = deblock_stage_pallas(Y, U, V, meta, t.mb_width, t.mb_height, cqo,
                               interpret=True)
    for name, a, b in zip("YUV", ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), f"{name}"
