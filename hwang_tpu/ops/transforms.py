"""Batched integer transforms (dequant, IDCT, Hadamard) in JAX.

All ops are exact int32 arithmetic (H.264 spec 8.5) vectorized over
arbitrary leading batch dimensions — thousands of 4x4 blocks per call, so
the VPU stays busy.  Shift-by-one uses arithmetic right shift (floor), NOT
division, to match the spec exactly.

Ground truth: hwang_tpu/models/h264/ref_recon.py (numpy, validated
bit-exact against libavcodec).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# V[qp%6][class]; position classes as in ref_recon._POS_CLASS
_V_TABLE = np.array(
    [
        [10, 16, 13],
        [11, 18, 14],
        [13, 20, 16],
        [14, 23, 18],
        [16, 25, 20],
        [18, 29, 23],
    ],
    np.int32,
)

_POS_CLASS = np.array(
    [0, 2, 0, 2, 2, 1, 2, 1, 0, 2, 0, 2, 2, 1, 2, 1], np.int32
)  # flattened 4x4 raster

# Per-position dequant scale for each qp%6: [6, 16]
_VSCALE = _V_TABLE[:, _POS_CLASS]  # [6][16]

_CHROMA_QP_MAP = np.array(
    list(range(30))
    + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38,
       38, 39, 39, 39, 39],
    np.int32,
)


def chroma_qp_from_luma(qp_luma: jnp.ndarray, offset: int) -> jnp.ndarray:
    qpi = jnp.clip(qp_luma.astype(jnp.int32) + offset, 0, 51)
    return jnp.asarray(_CHROMA_QP_MAP)[qpi]


def dequant4x4(coef: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """coef: [..., 16] int, qp: [...] int -> [..., 16] int32.

    d = c * V[qp%6][pos] << (qp/6)  (flat scaling matrices).
    """
    coef = coef.astype(jnp.int32)
    qp = qp.astype(jnp.int32)
    v = jnp.asarray(_VSCALE)[qp % 6]  # [..., 16]
    return (coef * v) << (qp // 6)[..., None]


def idct4x4(d: jnp.ndarray) -> jnp.ndarray:
    """Core inverse transform on [..., 4, 4] int32 (before (x+32)>>6)."""
    d = d.astype(jnp.int32)
    # rows
    e0 = d[..., :, 0] + d[..., :, 2]
    e1 = d[..., :, 0] - d[..., :, 2]
    e2 = (d[..., :, 1] >> 1) - d[..., :, 3]
    e3 = d[..., :, 1] + (d[..., :, 3] >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    # cols
    g0 = f[..., 0, :] + f[..., 2, :]
    g1 = f[..., 0, :] - f[..., 2, :]
    g2 = (f[..., 1, :] >> 1) - f[..., 3, :]
    g3 = f[..., 1, :] + (f[..., 3, :] >> 1)
    return jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)


def residual4x4(coef: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """[..., 16] coeffs (raster) + [...] qp -> [..., 4, 4] residual."""
    d = dequant4x4(coef, qp).reshape(coef.shape[:-1] + (4, 4))
    return (idct4x4(d) + 32) >> 6


def luma_dc_transform(dc: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """I16x16 luma DC: [..., 16] (block-grid raster) + [...] qp -> [..., 4, 4]."""
    c = dc.astype(jnp.int32).reshape(dc.shape[:-1] + (4, 4))
    H = jnp.asarray(
        np.array(
            [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
            np.int32,
        )
    )
    f = jnp.einsum("ij,...jk,lk->...il", H, c, H)
    v = jnp.asarray(_V_TABLE)[qp.astype(jnp.int32) % 6, 0][..., None, None]
    qp6 = (qp.astype(jnp.int32) // 6)[..., None, None]
    hi = (f * v) << jnp.maximum(qp6 - 2, 0)
    shift = jnp.maximum(2 - qp6, 0)
    lo = (f * v + (1 << jnp.maximum(shift - 1, 0))) >> shift
    return jnp.where(qp6 >= 2, hi, lo)


def chroma_dc_transform(dc: jnp.ndarray, qpc: jnp.ndarray) -> jnp.ndarray:
    """Chroma DC: [..., 4] (2x2 raster) + qpc broadcastable over the
    leading dims -> [..., 2, 2]."""
    c = dc.astype(jnp.int32).reshape(dc.shape[:-1] + (2, 2))
    F = jnp.asarray(np.array([[1, 1], [1, -1]], np.int32))
    t = jnp.einsum("ij,...jk,kl->...il", F, c, F)
    extra = t.ndim - qpc.ndim
    shape = qpc.shape + (1,) * extra
    v = jnp.asarray(_V_TABLE)[qpc.astype(jnp.int32) % 6, 0].reshape(shape)
    qp6 = (qpc.astype(jnp.int32) // 6).reshape(shape)
    return ((t * v) << qp6) >> 1


def mb_luma_residual(
    luma_ac: jnp.ndarray,   # [M, 16, 16] per-4x4-block coeffs (raster)
    luma_dc: jnp.ndarray,   # [M, 16] I16 DC
    qp: jnp.ndarray,        # [M]
    is_i16: jnp.ndarray,    # [M] bool
) -> jnp.ndarray:
    """Full 16x16 luma residual per MB -> [M, 16, 16] int32."""
    M = luma_ac.shape[0]
    d = dequant4x4(luma_ac, qp[:, None])  # [M, 16, 16]
    dcs = luma_dc_transform(luma_dc, qp).reshape(M, 16)  # block-grid raster
    d = d.at[:, :, 0].set(jnp.where(is_i16[:, None], dcs, d[:, :, 0]))
    res = (idct4x4(d.reshape(M, 16, 4, 4)) + 32) >> 6  # [M, 16, 4, 4]
    # assemble 16 blocks (raster) into 16x16
    res = res.reshape(M, 4, 4, 4, 4)  # [M, by, bx, y, x]
    return res.transpose(0, 1, 3, 2, 4).reshape(M, 16, 16)


def mb_chroma_residual(
    chroma_ac: jnp.ndarray,  # [M, 2, 4, 16]
    chroma_dc: jnp.ndarray,  # [M, 2, 4]
    qpc: jnp.ndarray,        # [M]
) -> jnp.ndarray:
    """8x8 chroma residual per MB and component -> [M, 2, 8, 8] int32."""
    M = chroma_ac.shape[0]
    d = dequant4x4(chroma_ac, qpc[:, None, None])  # [M, 2, 4, 16]
    dcs = chroma_dc_transform(chroma_dc, qpc).reshape(M, 2, 4)
    d = d.at[:, :, :, 0].set(dcs)
    res = (idct4x4(d.reshape(M, 2, 4, 4, 4)) + 32) >> 6
    res = res.reshape(M, 2, 2, 2, 4, 4)  # [M, c, by, bx, y, x]
    return res.transpose(0, 1, 2, 4, 3, 5).reshape(M, 2, 8, 8)
