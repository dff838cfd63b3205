"""Batched-residual helpers: leading [B] clip dim over the transform ops."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .transforms import (
    chroma_dc_transform,
    chroma_qp_from_luma,
    dequant4x4,
    idct4x4,
    luma_dc_transform,
)


_DQ8_CLASS = np.array([0, 3, 4, 3, 3, 1, 5, 1, 4, 5, 2, 5, 3, 1, 5, 1],
                      np.int32).reshape(4, 4)
_DQ8_TAB = np.array([[20, 18, 32, 19, 25, 24], [22, 19, 35, 21, 28, 26],
                     [26, 23, 42, 24, 33, 31], [28, 25, 45, 26, 35, 33],
                     [32, 28, 51, 30, 40, 38], [36, 32, 58, 34, 46, 43]],
                    np.int32)
_ii, _jj = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
# [6, 8, 8] per-position LevelScale for each qp%6
_DQ8_LS = jnp.asarray(_DQ8_TAB[:, _DQ8_CLASS[_ii % 4, _jj % 4]])

def luma_residual_b(luma_ac, luma_dc, qp, is_i16):
    """luma_ac [B,M,16,16], luma_dc [B,M,16], qp [B,M], is_i16 [B,M]
    -> assembled [B,M,16,16] residual and per-block [B,M,16,4,4]."""
    B, M = qp.shape
    d = dequant4x4(luma_ac, qp[..., None])          # [B,M,16,16]
    blocks = (idct4x4(d.reshape(B, M, 16, 4, 4)) + 32) >> 6
    dcs = luma_dc_transform(luma_dc, qp).reshape(B, M, 16)
    d16 = d.at[..., 0].set(jnp.where(is_i16[..., None], dcs, d[..., 0]))
    res = (idct4x4(d16.reshape(B, M, 16, 4, 4)) + 32) >> 6
    assembled = (
        res.reshape(B, M, 4, 4, 4, 4)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(B, M, 16, 16)
    )
    return assembled, blocks


def chroma_residual_b(chroma_ac, chroma_dc, qpc):
    """[B,M,2,4,16], [B,M,2,4], qpc [B,M] -> [B,M,2,8,8]."""
    B, M = qpc.shape
    d = dequant4x4(chroma_ac, qpc[..., None, None])
    dcs = chroma_dc_transform(chroma_dc, qpc).reshape(B, M, 2, 4)
    d = d.at[..., 0].set(dcs)
    res = (idct4x4(d.reshape(B, M, 2, 4, 4, 4)) + 32) >> 6
    return (
        res.reshape(B, M, 2, 2, 2, 4, 4)
        .transpose(0, 1, 2, 3, 5, 4, 6)
        .reshape(B, M, 2, 8, 8)
    )


def luma_residual8_b(luma_ac, qp):
    """High-profile 8x8 residual: luma_ac [B,M,16,16] holds each quad's
    raster [8,8] coefficients across its four 4x4 slots (rows 0-1 in the
    quad's first raster slot, ...).  Returns ([B,M,16,16] assembled MB
    residual, [B,M,4,8,8] per-quad).  Ground truth: ref_recon.residual8x8.
    """
    B, M = qp.shape
    # reassemble [B,M,4,8,8]: quad q slots = (q>>1)*8+(q&1)*2 + {0,1,4,5}
    slot_idx = []
    for q in range(4):
        b0 = (q >> 1) * 8 + (q & 1) * 2
        slot_idx += [b0, b0 + 1, b0 + 4, b0 + 5]
    c8 = luma_ac[:, :, jnp.asarray(slot_idx)].reshape(B, M, 4, 64)
    c8 = c8.reshape(B, M, 4, 8, 8)
    d = dequant8x8(c8, qp)
    d = d.at[..., 0, 0].add(32)
    d = _idct8_1d(d)
    d = _idct8_1d(jnp.swapaxes(d, -1, -2))
    res8 = jnp.swapaxes(d, -1, -2) >> 6              # [B,M,4,8,8]
    assembled = (
        res8.reshape(B, M, 2, 2, 8, 8)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(B, M, 16, 16)
    )
    return assembled, res8


def dequant8x8(coef, qp):
    """Batched 8x8 dequant (flat matrix, shift reference 2).
    coef [B, M, K, 8, 8] raster; qp [B, M]."""
    v = _DQ8_LS[qp % 6]                               # [B, M, 8, 8]
    c = coef.astype(jnp.int64) * v[:, :, None, :, :]
    q6 = (qp // 6)[:, :, None, None, None]
    hi = c << jnp.maximum(q6 - 2, 0)
    shift = jnp.maximum(2 - q6, 0)
    rnd = jnp.where(shift > 0, 1 << jnp.maximum(shift - 1, 0), 0)
    lo = (c + rnd) >> shift
    return jnp.where(qp[:, :, None, None, None] >= 12, hi, lo).astype(
        jnp.int32)


def _idct8_1d(x):
    """8-point inverse transform stage along the last axis (8.5.12.3)."""
    xs = [x[..., i] for i in range(8)]
    a0 = xs[0] + xs[4]
    a2 = xs[0] - xs[4]
    a4 = (xs[2] >> 1) - xs[6]
    a6 = xs[2] + (xs[6] >> 1)
    b0 = a0 + a6
    b2 = a2 + a4
    b4 = a2 - a4
    b6 = a0 - a6
    a1 = -xs[3] + xs[5] - xs[7] - (xs[7] >> 1)
    a3 = xs[1] + xs[7] - xs[3] - (xs[3] >> 1)
    a5 = -xs[1] + xs[7] + xs[5] + (xs[5] >> 1)
    a7 = xs[3] + xs[5] + xs[1] + (xs[1] >> 1)
    b1 = (a7 >> 2) + a1
    b3 = a3 + (a5 >> 2)
    b5 = (a3 >> 2) - a5
    b7 = a7 - (a1 >> 2)
    return jnp.stack([b0 + b7, b2 + b5, b4 + b3, b6 + b1,
                      b6 - b1, b4 - b3, b2 - b5, b0 - b7], axis=-1)
