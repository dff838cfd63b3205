"""HEVC I-frame reconstruction on device (JAX/XLA, TPU-first).

Consumes the host-prepped SoA TU streams (prep.py) and reconstructs
planes with a lax.scan over TU decode positions, hand-batched over the
frame axis (one TU per frame per step; jax.vmap over the scan crashes
the TPU runtime — see CLAUDE.md).  Every stage of a step is static-shape
dense linear algebra:

  refs      one flat gather of the 66-sample raw window per frame
  subst     take_along_axis with the host-resolved 8.4.4.2.2 permutation
  smoothing (A_size @ x + 2) >> 2              [65x65 int32 matmul]
  intra     (W[widx] @ xe) >> 5, clip          [MXU bf16 matmul via a
            one-hot outer product: z = onehot(widx) x xe, pred = z @ T2;
            all operands are small integers, so bf16 products with f32
            accumulation are EXACT — see tables.py]
  dequant   int32-safe split-shift form (prep.qmul/qsh)
  itrans    two 16x16 int32 matmuls with the 8.6.4 intermediate clip
  scatter   one masked flat scatter of the 16x16 window per frame

The reference had no HEVC pixel path of its own (it delegated to
FFmpeg/NVDEC, software_video_decoder.cpp:122-136); this design has no
CUDA counterpart to mirror — it is the matmul formulation the MXU wants.

Bit-exactness contract: output == ref_recon == libavcodec
(tests/test_hevc_jax.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import tables
from .prep import MARGIN_BR, MARGIN_TL, PlanePrep


@functools.lru_cache(maxsize=1)
def _consts():
    Wt = tables.w_table()  # [210, 256, 67]
    t2 = np.transpose(Wt, (0, 2, 1)).reshape(210 * tables.N_COL, 256)
    return (
        jnp.asarray(t2, jnp.bfloat16),
        jnp.asarray(tables.filter_table(), jnp.int32),   # [3,65,65]
        jnp.asarray(tables.dc_table(), jnp.int32),       # [3,65]
        jnp.asarray(tables.m_table(), jnp.int32),        # [4,16,16]
    )


def _step(consts, Hp, Wp, plane_flat, xs):
    t2, A, dcw, M = consts
    F = xs["x0"].shape[0]
    x0, y0 = xs["x0"], xs["y0"]
    offs = jnp.arange(F, dtype=jnp.int32) * (Hp * Wp)

    # raw ref window: left column (32), corner+top row (33), const 128
    ar32 = jnp.arange(32, dtype=jnp.int32)
    ar33 = jnp.arange(33, dtype=jnp.int32)
    left_idx = offs[:, None] + (y0[:, None] + ar32[None, :]) * Wp \
        + (x0[:, None] - 1)
    ctop_idx = offs[:, None] + (y0[:, None] - 1) * Wp \
        + (x0[:, None] - 1) + ar33[None, :]
    raw = jnp.concatenate(
        [plane_flat[left_idx], plane_flat[ctop_idx],
         jnp.full((F, 1), 128, jnp.int32)], axis=1)          # [F, 66]
    x = jnp.take_along_axis(raw, xs["subst"], axis=1)        # [F, 65]

    si_oh = jax.nn.one_hot(xs["si"], 3, dtype=jnp.int32)     # [F, 3]
    dcsum = jnp.sum(jnp.einsum("fj,sj->fs", x, dcw) * si_oh, axis=1)
    dc = (dcsum + xs["dcadd"]) >> xs["dcshift"]

    xf3 = jnp.einsum("fj,skj->fsk", x, A)                    # [F, 3, 65]
    xf = (jnp.sum(xf3 * si_oh[:, :, None], axis=1) + 2) >> 2
    xsel = jnp.where(xs["filt"][:, None] == 1, xf, x)
    xe = jnp.concatenate(
        [xsel, dc[:, None], jnp.ones((F, 1), jnp.int32)], axis=1)  # [F,67]

    oh = jax.nn.one_hot(xs["widx"], 210, dtype=jnp.bfloat16)
    z = (oh[:, :, None] * xe[:, None, :].astype(jnp.bfloat16)).reshape(
        F, 210 * tables.N_COL)
    pred = jnp.dot(z, t2, preferred_element_type=jnp.float32)
    pred = jnp.clip(pred.astype(jnp.int32) >> 5, 0, 255)     # [F, 256]

    # dequant (8.6.3, int32-safe split shift) + inverse transform (8.6.4)
    qsh = xs["qsh"][:, None]
    prod = xs["coeff"].astype(jnp.int32) * xs["qmul"][:, None]
    rnd = jnp.where(qsh > 0, 1 << jnp.maximum(qsh - 1, 0), 0)
    d_r = (prod + rnd) >> jnp.maximum(qsh, 0)
    d_l = prod << jnp.maximum(-qsh, 0)
    d = jnp.clip(jnp.where(qsh >= 0, d_r, d_l), -32768, 32767)
    d = d.reshape(F, 16, 16)
    Msel = jnp.einsum("fm,mkr->fkr",
                      jax.nn.one_hot(xs["mi"], 4, dtype=jnp.int32), M)
    e = jnp.einsum("frk,frc->fkc", Msel, d)                  # M^T @ d
    e = jnp.clip((e + 64) >> 7, -32768, 32767)
    r = (jnp.einsum("fkc,fcj->fkj", e, Msel) + 2048) >> 12   # e @ M
    r = jnp.clip(r, -32768, 32767)

    rec = jnp.clip(pred.reshape(F, 16, 16) + r, 0, 255)

    # masked scatter of the 16x16 window (one TU per frame per step)
    ar16 = jnp.arange(16, dtype=jnp.int32)
    win = offs[:, None, None] \
        + (y0[:, None, None] + ar16[None, :, None]) * Wp \
        + (x0[:, None, None] + ar16[None, None, :])
    n = 4 << xs["si"]
    bm = (ar16[None, :, None] < n[:, None, None]) \
        & (ar16[None, None, :] < n[:, None, None]) \
        & (xs["mask"][:, None, None] == 1)
    flat = win.reshape(F * 256)
    old = plane_flat[flat]
    new = jnp.where(bm.reshape(F * 256), rec.reshape(F * 256), old)
    plane_flat = plane_flat.at[flat].set(new, unique_indices=True)
    return plane_flat, None


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _decode_core(consts, xs, h, w):
    Hp = h + MARGIN_TL + MARGIN_BR
    Wp = w + MARGIN_TL + MARGIN_BR
    F = xs["x0"].shape[1]
    plane = jnp.zeros(F * Hp * Wp, jnp.int32)
    step = functools.partial(_step, consts, Hp, Wp)
    plane, _ = jax.lax.scan(step, plane, xs)
    plane = plane.reshape(F, Hp, Wp)
    out = plane[:, MARGIN_TL:MARGIN_TL + h, MARGIN_TL:MARGIN_TL + w]
    return out.astype(jnp.uint8)


def decode_planes(p: PlanePrep) -> jax.Array:
    """Run one plane scan; returns [n_seq, h, w] uint8 on device."""
    xs = {
        "x0": jnp.asarray(p.x0), "y0": jnp.asarray(p.y0),
        "subst": jnp.asarray(p.subst), "widx": jnp.asarray(p.widx),
        "si": jnp.asarray(p.si), "filt": jnp.asarray(p.filt),
        "mi": jnp.asarray(p.mi), "qmul": jnp.asarray(p.qmul),
        "qsh": jnp.asarray(p.qsh), "dcadd": jnp.asarray(p.dcadd),
        "dcshift": jnp.asarray(p.dcshift), "mask": jnp.asarray(p.mask),
        "coeff": jnp.asarray(p.coeff),
    }
    return _decode_core(_consts(), xs, p.h, p.w)


def decode_gop_frames(t) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full-GOP decode: returns (Y [F,H,W], Cb [F,H/2,W/2], Cr) uint8 on
    device, coded size (apply t.crop for display)."""
    from .prep import prep_plane_sequences

    luma, chroma = prep_plane_sequences(t)
    y = decode_planes(luma)
    c = decode_planes(chroma)
    return y, c[0::2], c[1::2]
