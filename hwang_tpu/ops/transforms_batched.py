"""Batched-residual helpers: leading [B] clip dim over the transform ops."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .transforms import (
    _V_TABLE,
    _VSCALE,
    chroma_dc_transform,
    chroma_qp_from_luma,
    dequant4x4,
    idct4x4,
    luma_dc_transform,
)


# ---------------------------------------------------------------------------
# Weighted (scaling-matrix) dequant helpers — spec shift references; all
# exactly reduce to the flat paths at weight 16 (see ref_recon).
# ---------------------------------------------------------------------------


def _w4_ls(qp, intra, w4, li, lp):
    """Per-MB 4x4 LevelScale [B,M,16]: normAdjust(qp%6, pos) * weight of
    list `li` (intra MBs) or `lp` (inter).  w4 [B,6,16] uint8."""
    v = jnp.asarray(_VSCALE)[qp % 6]                 # [B,M,16]
    w = jnp.where(intra[..., None], w4[:, None, li], w4[:, None, lp])
    return v * w.astype(jnp.int32)


def _dq4_weighted(coef, qp, ls):
    """coef [B,M,K,16], qp [B,M], ls [B,M,16] -> dequantized int32
    (spec 8.5.12.1, shift reference 4)."""
    c = coef.astype(jnp.int32) * ls[:, :, None, :]
    q6 = (qp // 6)[..., None, None]
    hi = c << jnp.maximum(q6 - 4, 0)
    sh = jnp.maximum(4 - q6, 0)
    lo = (c + (1 << jnp.maximum(sh - 1, 0)) *
          (sh > 0).astype(jnp.int32)) >> sh
    return jnp.where(qp[..., None, None] >= 24, hi, lo)


def _dc_ref6(f, qp, ls):
    """DC scaling at shift reference 6; f/ls broadcastable, qp same rank
    as f's batch dims (expanded by caller)."""
    c = f * ls
    hi = c << jnp.maximum(qp // 6 - 6, 0)
    sh = jnp.maximum(6 - qp // 6, 0)
    lo = (c + (1 << jnp.maximum(sh - 1, 0)) *
          (sh > 0).astype(jnp.int32)) >> sh
    return jnp.where(qp >= 36, hi, lo)


_DQ8_CLASS = np.array([0, 3, 4, 3, 3, 1, 5, 1, 4, 5, 2, 5, 3, 1, 5, 1],
                      np.int32).reshape(4, 4)
_DQ8_TAB = np.array([[20, 18, 32, 19, 25, 24], [22, 19, 35, 21, 28, 26],
                     [26, 23, 42, 24, 33, 31], [28, 25, 45, 26, 35, 33],
                     [32, 28, 51, 30, 40, 38], [36, 32, 58, 34, 46, 43]],
                    np.int32)
_ii, _jj = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
# [6, 8, 8] per-position LevelScale for each qp%6
_DQ8_LS = jnp.asarray(_DQ8_TAB[:, _DQ8_CLASS[_ii % 4, _jj % 4]])

def luma_residual_b(luma_ac, luma_dc, qp, is_i16, intra=None, w4=None):
    """luma_ac [B,M,16,16], luma_dc [B,M,16], qp [B,M], is_i16 [B,M]
    -> assembled [B,M,16,16] residual and per-block [B,M,16,4,4].
    Optional scaling weights w4 [B,6,16] with the per-MB intra mask."""
    B, M = qp.shape
    if w4 is None:
        d = dequant4x4(luma_ac, qp[..., None])      # [B,M,16,16]
        dcs = luma_dc_transform(luma_dc, qp).reshape(B, M, 16)
    else:
        d = _dq4_weighted(luma_ac, qp, _w4_ls(qp, intra, w4, 0, 3))
        # I16 luma DC: list 0 weight at position 0 (I16 is always intra)
        H = jnp.asarray(np.array(
            [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
            np.int32))
        c = luma_dc.astype(jnp.int32).reshape(B, M, 4, 4)
        f = jnp.einsum("ij,...jk,lk->...il", H, c, H)
        ls = (jnp.asarray(_V_TABLE)[qp % 6, 0] *
              w4[:, 0, 0][:, None])[..., None, None]
        dcs = _dc_ref6(f, qp[..., None, None], ls).reshape(B, M, 16)
    blocks = (idct4x4(d.reshape(B, M, 16, 4, 4)) + 32) >> 6
    d16 = d.at[..., 0].set(jnp.where(is_i16[..., None], dcs, d[..., 0]))
    res = (idct4x4(d16.reshape(B, M, 16, 4, 4)) + 32) >> 6
    assembled = (
        res.reshape(B, M, 4, 4, 4, 4)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(B, M, 16, 16)
    )
    return assembled, blocks


def chroma_residual_b(chroma_ac, chroma_dc, qpc, intra=None, w4=None):
    """[B,M,2,4,16], [B,M,2,4], qpc [B,M] -> [B,M,2,8,8].
    Optional scaling weights: chroma lists 1/2 (intra Cb/Cr), 4/5."""
    B, M = qpc.shape
    if w4 is None:
        d = dequant4x4(chroma_ac, qpc[..., None, None])
        dcs = chroma_dc_transform(chroma_dc, qpc).reshape(B, M, 2, 4)
    else:
        d = jnp.stack(
            [
                _dq4_weighted(chroma_ac[:, :, comp], qpc,
                              _w4_ls(qpc, intra, w4, 1 + comp, 4 + comp))
                for comp in (0, 1)
            ],
            axis=2,
        )
        F2 = jnp.asarray(np.array([[1, 1], [1, -1]], np.int32))
        c = chroma_dc.astype(jnp.int32).reshape(B, M, 2, 2, 2)
        t2 = jnp.einsum("ij,...jk,kl->...il", F2, c, F2)
        w00 = jnp.where(
            intra[:, :, None],
            jnp.stack([w4[:, 1, 0], w4[:, 2, 0]], -1)[:, None, :],
            jnp.stack([w4[:, 4, 0], w4[:, 5, 0]], -1)[:, None, :],
        ).astype(jnp.int32)                           # [B,M,2]
        ls = jnp.asarray(_V_TABLE)[qpc % 6, 0][..., None] * w00
        dcs = (((t2.reshape(B, M, 2, 4) * ls[..., None])
                << (qpc // 6)[..., None, None]) >> 5)
    d = d.at[..., 0].set(dcs)
    res = (idct4x4(d.reshape(B, M, 2, 4, 4, 4)) + 32) >> 6
    return (
        res.reshape(B, M, 2, 2, 2, 4, 4)
        .transpose(0, 1, 2, 3, 5, 4, 6)
        .reshape(B, M, 2, 8, 8)
    )


def luma_residual8_b(luma_ac, qp, intra=None, w8=None):
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
    d = dequant8x8(c8, qp, intra=intra, w8=w8)
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


def dequant8x8(coef, qp, intra=None, w8=None):
    """Batched 8x8 dequant; coef [B, M, K, 8, 8] raster, qp [B, M].
    Flat path: shift reference 2.  With scaling weights w8 [B,2,64]
    (intra/inter lists) the full spec 8.5.13 form at reference 6."""
    v = _DQ8_LS[qp % 6]                               # [B, M, 8, 8]
    if w8 is None:
        c = coef.astype(jnp.int64) * v[:, :, None, :, :]
        q6 = (qp // 6)[:, :, None, None, None]
        hi = c << jnp.maximum(q6 - 2, 0)
        shift = jnp.maximum(2 - q6, 0)
        rnd = jnp.where(shift > 0, 1 << jnp.maximum(shift - 1, 0), 0)
        lo = (c + rnd) >> shift
        return jnp.where(qp[:, :, None, None, None] >= 12, hi, lo).astype(
            jnp.int32)
    B, M = qp.shape
    w = jnp.where(
        intra[..., None], w8[:, None, 0], w8[:, None, 1]
    ).astype(jnp.int32).reshape(B, M, 8, 8)
    c = coef.astype(jnp.int32) * (v * w)[:, :, None, :, :]
    q6 = (qp // 6)[:, :, None, None, None]
    hi = c << jnp.maximum(q6 - 6, 0)
    shift = jnp.maximum(6 - q6, 0)
    lo = (c + (1 << jnp.maximum(shift - 1, 0)) *
          (shift > 0).astype(jnp.int32)) >> shift
    return jnp.where(qp[:, :, None, None, None] >= 36, hi, lo)


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
