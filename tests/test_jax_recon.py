"""JAX GOP reconstruction vs the numpy reference model (hence libavcodec).

Uses one small stream so the (large) wavefront compile happens once.
"""

import ctypes

import numpy as np
import pytest

from hwang_tpu import index_video
from hwang_tpu.models.h264.entropy import H264EntropyDecoder
from hwang_tpu.models.h264 import ref_recon as R
from hwang_tpu.native import get_lib
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all


@pytest.fixture(scope="module")
def decoded(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("jaxrecon") / "clip.mp4")
    encode_video(p, 6, 48, 48, profile="baseline", gop_size=6, crf=26,
                 extra_opts="keyint=6:min-keyint=6:no-scenecut=1:ref=2")
    idx = index_video(p)
    dec = H264EntropyDecoder(idx.metadata_bytes)
    lib = get_lib()
    lib.hw_h264_chroma_qp_offset.restype = ctypes.c_int
    lib.hw_h264_chroma_qp_offset.argtypes = [ctypes.c_void_p]
    cqo = lib.hw_h264_chroma_qp_offset(dec._h)
    t = dec.decode_gop(open(p, "rb").read(), idx.sample_offsets,
                       idx.sample_sizes)
    return p, t, cqo


def test_jax_decode_gop_bit_exact(decoded):
    from hwang_tpu.models.h264.recon import GopArrays, decode_gop

    p, t, cqo = decoded
    oracle = oracle_decode_all(p, fmt="yuv")
    g = GopArrays.from_tensors(t)
    Ys, Us, Vs = decode_gop(g, t.mb_width, t.mb_height, cqo, n_refs=2)
    Ys, Us, Vs = np.asarray(Ys), np.asarray(Us), np.asarray(Vs)
    for f in range(t.n_frames):
        oy, ou, ov = oracle[f]
        assert np.array_equal(Ys[f], oy), f"frame {f} Y"
        assert np.array_equal(Us[f], ou), f"frame {f} U"
        assert np.array_equal(Vs[f], ov), f"frame {f} V"


def test_jax_deblock_matches_reference(decoded):
    """Standalone deblock op on un-deblocked recon output."""
    import jax.numpy as jnp

    from hwang_tpu.ops.deblock import deblock_frame

    p, t, cqo = decoded
    nd = R.reconstruct_gop(t, chroma_qp_offset=cqo, with_deblock=False)
    db = R.reconstruct_gop(t, chroma_qp_offset=cqo, with_deblock=True)
    f = 0
    rid = t.refidx[f].astype(np.int64)
    span_ref = np.where(rid >= 0, t.ref_map[f][np.clip(rid, 0, 15)], -1)
    meta = {
        "qp": jnp.asarray(t.qp[f].astype(np.int32)),
        "kind": jnp.asarray(t.mb_kind[f].astype(np.int32)),
        "idc": jnp.asarray(t.deblock_idc[f].astype(np.int32)),
        "a_off": jnp.asarray(t.alpha_off[f].astype(np.int32)),
        "b_off": jnp.asarray(t.beta_off[f].astype(np.int32)),
        "avail": jnp.asarray(t.avail[f].astype(np.int32)),
        "nnz": jnp.asarray(t.nnz[f].astype(np.int32)),
        "mv": jnp.asarray(t.mv[f].astype(np.int32)),
        "ref": jnp.asarray(span_ref.astype(np.int32)),
    }
    Y, U, V = (jnp.asarray(x.astype(np.int32)) for x in nd[f])
    gy, gu, gv = deblock_frame(Y, U, V, meta, t.mb_width, t.mb_height, cqo)
    assert np.array_equal(np.asarray(gy), db[f][0].astype(np.int64))
    assert np.array_equal(np.asarray(gu), db[f][1].astype(np.int64))
    assert np.array_equal(np.asarray(gv), db[f][2].astype(np.int64))


@pytest.mark.parametrize("mc_mode", ["pixel", "wide", "wide2", "yquad"])
def test_batched_decode_bit_exact(decoded, mc_mode, monkeypatch):
    """Natively-batched decoder (the production path) vs libavcodec, for
    every MC gather formulation (per-pixel / wide word-row / paired-word
    ring — see ops/mc.py).  Uses the unjitted core: the MC mode is read
    from the environment at trace time, so the jitted wrapper would cache
    across parametrizations."""
    from hwang_tpu.models.h264.recon_batched import (
        decode_gop_batched_core,
        stack_tensors,
    )

    monkeypatch.setenv("HWANG_MC", mc_mode)
    p, t, cqo = decoded
    oracle = oracle_decode_all(p, fmt="yuv")
    g = stack_tensors([t, t], pad_frames=8)  # B=2, same clip twice
    Ys, Us, Vs = decode_gop_batched_core(g, t.mb_width, t.mb_height, cqo, 2)
    Ys, Us, Vs = np.asarray(Ys), np.asarray(Us), np.asarray(Vs)
    for b in range(2):
        for f in range(t.n_frames):
            oy, ou, ov = oracle[f]
            assert np.array_equal(Ys[b, f], oy), f"clip {b} frame {f} Y"
            assert np.array_equal(Us[b, f], ou), f"clip {b} frame {f} U"
            assert np.array_equal(Vs[b, f], ov), f"clip {b} frame {f} V"
