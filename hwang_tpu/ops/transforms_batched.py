"""Batched-residual helpers: leading [B] clip dim over the transform ops."""

from __future__ import annotations

import jax.numpy as jnp

from .transforms import (
    chroma_dc_transform,
    chroma_qp_from_luma,
    dequant4x4,
    idct4x4,
    luma_dc_transform,
)


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
