"""Reference (numpy) H.264 reconstruction — the spec-faithful ground truth.

Consumes the SoA tensors from the host entropy decoder (entropy.py) and
reconstructs YUV frames with exact integer arithmetic per the H.264 spec
(8.5 transforms, 8.3 intra prediction, 8.4 inter prediction, 8.7 deblock).

This module is intentionally simple and sequential: it exists to (a)
validate the entropy decoder bit-exactly against libavcodec and (b) serve
as the stage-by-stage oracle for the JAX/Pallas reconstruction
(hwang_tpu/models/h264/recon.py), which must match it exactly.
"""

from __future__ import annotations

import numpy as np

from .entropy import GopTensors

# ---------------------------------------------------------------------------
# Dequant tables (spec 8.5.9, flat scaling matrices)
# ---------------------------------------------------------------------------

# V[qp%6][class]; class 0: positions (0,0),(0,2),(2,0),(2,2);
# class 1: (1,1),(1,3),(3,1),(3,3); class 2: others.
_V = np.array(
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
    [
        [0, 2, 0, 2],
        [2, 1, 2, 1],
        [0, 2, 0, 2],
        [2, 1, 2, 1],
    ],
    np.int32,
)

_CHROMA_QP_MAP = np.array(
    list(range(30))
    + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38,
       38, 39, 39, 39, 39],
    np.int32,
)


def chroma_qp(qp_luma: int, offset: int) -> int:
    qpi = int(np.clip(qp_luma + offset, 0, 51))
    return int(_CHROMA_QP_MAP[qpi])


def dequant4x4(coef: np.ndarray, qp: int, w=None) -> np.ndarray:
    """Dequantize a 4x4 block (coef in raster order; DC included for
    non-I16 blocks).  Spec 8.5.12.1: LevelScale = weight * normAdjust
    with shift reference 4; flat weight 16 reduces exactly to
    d = c * V << (qp/6) (calibrated bit-exact against libavcodec).
    `w` is the per-position weight matrix [4,4] (scaling lists)."""
    v = _V[qp % 6][_POS_CLASS]
    if w is None:
        return (coef.astype(np.int32) * v) << (qp // 6)
    c = coef.astype(np.int64) * (v.astype(np.int64) * w)
    q6 = qp // 6
    if qp >= 24:
        return (c << (q6 - 4)).astype(np.int32)
    return ((c + (1 << (3 - q6))) >> (4 - q6)).astype(np.int32)


def idct4x4(d: np.ndarray) -> np.ndarray:
    """H.264 4x4 inverse core transform (spec 8.5.12.2). Input dequantized
    levels; output residual BEFORE the final (x+32)>>6."""
    d = d.astype(np.int32)
    # horizontal (rows)
    e0 = d[:, 0] + d[:, 2]
    e1 = d[:, 0] - d[:, 2]
    e2 = (d[:, 1] >> 1) - d[:, 3]
    e3 = d[:, 1] + (d[:, 3] >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=1)
    # vertical (cols)
    g0 = f[0] + f[2]
    g1 = f[0] - f[2]
    g2 = (f[1] >> 1) - f[3]
    g3 = f[1] + (f[3] >> 1)
    return np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=0)


_DQ8_CLASS = np.array([0, 3, 4, 3, 3, 1, 5, 1, 4, 5, 2, 5, 3, 1, 5, 1],
                      np.int32).reshape(4, 4)
_DQ8 = np.array([[20, 18, 32, 19, 25, 24], [22, 19, 35, 21, 28, 26],
                 [26, 23, 42, 24, 33, 31], [28, 25, 45, 26, 35, 33],
                 [32, 28, 51, 30, 40, 38], [36, 32, 58, 34, 46, 43]],
                np.int32)


def dequant8x8(coef: np.ndarray, qp: int, w=None) -> np.ndarray:
    """8x8 dequant (spec 8.5.13): LevelScale = weight * normAdjust8x8 at
    shift reference 6; flat weight 16 reduces exactly to
    d = c * V8 << (qp/6 - 2) (calibrated against libavcodec).
    `w` [8,8] raster weights (scaling list 6/7)."""
    ii, jj = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    v8 = _DQ8[qp % 6][_DQ8_CLASS[ii % 4, jj % 4]].astype(np.int64)
    ls = v8 * (16 if w is None else w)
    c = coef.astype(np.int64) * ls
    if qp >= 36:
        return (c << (qp // 6 - 6)).astype(np.int32)
    shift = 6 - qp // 6
    return ((c + (1 << (shift - 1))) >> shift).astype(np.int32)


def _idct8_1d(x):
    """One 8-point inverse transform stage (spec 8.5.12.3 butterflies);
    x is [..., 8] along the transformed axis."""
    x = [x[..., i] for i in range(8)]
    a0 = x[0] + x[4]
    a2 = x[0] - x[4]
    a4 = (x[2] >> 1) - x[6]
    a6 = x[2] + (x[6] >> 1)
    b0 = a0 + a6
    b2 = a2 + a4
    b4 = a2 - a4
    b6 = a0 - a6
    a1 = -x[3] + x[5] - x[7] - (x[7] >> 1)
    a3 = x[1] + x[7] - x[3] - (x[3] >> 1)
    a5 = -x[1] + x[7] + x[5] + (x[5] >> 1)
    a7 = x[3] + x[5] + x[1] + (x[1] >> 1)
    b1 = (a7 >> 2) + a1
    b3 = a3 + (a5 >> 2)
    b5 = (a3 >> 2) - a5
    b7 = a7 - (a1 >> 2)
    return np.stack([b0 + b7, b2 + b5, b4 + b3, b6 + b1,
                     b6 - b1, b4 - b3, b2 - b5, b0 - b7], axis=-1)


def residual8x8(coef: np.ndarray, qp: int, w=None) -> np.ndarray:
    """Dequant + 8x8 IDCT -> spatial residual [8,8] (rounded >> 6)."""
    d = dequant8x8(coef, qp, w)
    d[0, 0] += 32
    d = _idct8_1d(d)       # horizontal (rows) first, like the 4x4 path
    d = _idct8_1d(d.T).T   # then vertical (columns)
    return d >> 6


def residual4x4(coef: np.ndarray, qp: int, w=None) -> np.ndarray:
    """Full 4x4 residual: dequant + IDCT + rounding (x+32)>>6."""
    return (idct4x4(dequant4x4(coef, qp, w)) + 32) >> 6


def luma_dc_transform(dc_raster: np.ndarray, qp: int,
                      w00: int = 16) -> np.ndarray:
    """I16x16 luma DC: 4x4 inverse Hadamard then scale (spec 8.5.10)."""
    c = dc_raster.reshape(4, 4).astype(np.int32)
    H = np.array(
        [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
        np.int32,
    )
    f = H @ c @ H.T
    ls = int(_V[qp % 6][0]) * w00
    # LevelScale = weight*normAdjust at shift reference 6 (spec 8.5.10);
    # flat weight 16 reduces exactly to (f*V) << (qp/6 - 2).
    if qp >= 36:
        dc = (f * ls) << (qp // 6 - 6)
    else:
        shift = 6 - qp // 6
        dc = (f * ls + (1 << (shift - 1))) >> shift
    return dc  # [4,4] DC value per 4x4 block (block-grid raster)


def chroma_dc_transform(dc: np.ndarray, qpc: int,
                        w00: int = 16) -> np.ndarray:
    """2x2 chroma DC inverse transform + scale (spec 8.5.11)."""
    c = dc.reshape(2, 2).astype(np.int32)
    f = np.array([[1, 1], [1, -1]], np.int32)
    t = f @ c @ f
    ls = int(_V[qpc % 6][0]) * w00
    return ((t * ls) << (qpc // 6)) >> 5


# ---------------------------------------------------------------------------
# Intra prediction (spec 8.3)
# ---------------------------------------------------------------------------


def _i4x4_predict(mode, left, top, topleft, topright, have_l, have_t,
                  have_tl, have_tr):
    """Predict one 4x4 block.  left: [4] col x=-1; top: [4] row y=-1;
    topright: [4] samples x=4..7 of row y=-1 (substituted with top[3] when
    unavailable per spec sample substitution)."""
    p = np.zeros((4, 4), np.int32)
    l = left.astype(np.int32)
    t = top.astype(np.int32)
    tr = topright.astype(np.int32)
    tl = int(topleft)
    if mode == 0:  # Vertical
        p[:, :] = t[None, :]
    elif mode == 1:  # Horizontal
        p[:, :] = l[:, None]
    elif mode == 2:  # DC
        if have_l and have_t:
            dc = (int(l.sum()) + int(t.sum()) + 4) >> 3
        elif have_l:
            dc = (int(l.sum()) + 2) >> 2
        elif have_t:
            dc = (int(t.sum()) + 2) >> 2
        else:
            dc = 128
        p[:, :] = dc
    elif mode == 3:  # Diagonal down-left
        a = np.concatenate([t, tr])
        for y in range(4):
            for x in range(4):
                i = x + y
                if i == 6:
                    p[y, x] = (a[6] + 3 * a[7] + 2) >> 2
                else:
                    p[y, x] = (a[i] + 2 * a[i + 1] + a[i + 2] + 2) >> 2
    elif mode == 4:  # Diagonal down-right
        for y in range(4):
            for x in range(4):
                if x > y:
                    i = x - y
                    p[y, x] = ((t[i - 2] if i >= 2 else tl) + 2 * (t[i - 1] if i >= 1 else tl) + t[i] + 2) >> 2 if i >= 2 else (
                        (tl + 2 * t[0] + t[1] + 2) >> 2 if i == 1 else 0)
                elif x < y:
                    i = y - x
                    p[y, x] = ((l[i - 2] if i >= 2 else tl) + 2 * (l[i - 1] if i >= 1 else tl) + l[i] + 2) >> 2 if i >= 2 else (
                        (tl + 2 * l[0] + l[1] + 2) >> 2 if i == 1 else 0)
                else:
                    p[y, x] = (t[0] + 2 * tl + l[0] + 2) >> 2
    elif mode == 5:  # Vertical-right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    i = x - (y >> 1)
                    p[y, x] = ((t[i - 1] if i >= 1 else tl) + t[i] + 1) >> 1
                elif z >= 0:
                    i = x - (y >> 1)
                    a = t[i - 2] if i >= 2 else tl
                    b = t[i - 1] if i >= 1 else tl
                    p[y, x] = (a + 2 * b + t[i] + 2) >> 2
                elif z == -1:
                    p[y, x] = (l[0] + 2 * tl + t[0] + 2) >> 2
                else:
                    i = y - 2 * x - 1
                    a = l[i]
                    b = l[i - 1] if i >= 1 else tl
                    cc = l[i - 2] if i >= 2 else tl
                    p[y, x] = (a + 2 * b + cc + 2) >> 2
    elif mode == 6:  # Horizontal-down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    i = y - (x >> 1)
                    p[y, x] = ((l[i - 1] if i >= 1 else tl) + l[i] + 1) >> 1
                elif z >= 0:
                    i = y - (x >> 1)
                    a = l[i - 2] if i >= 2 else tl
                    b = l[i - 1] if i >= 1 else tl
                    p[y, x] = (a + 2 * b + l[i] + 2) >> 2
                elif z == -1:
                    p[y, x] = (t[0] + 2 * tl + l[0] + 2) >> 2
                else:
                    i = x - 2 * y - 1
                    a = t[i]
                    b = t[i - 1] if i >= 1 else tl
                    cc = t[i - 2] if i >= 2 else tl
                    p[y, x] = (a + 2 * b + cc + 2) >> 2
    elif mode == 7:  # Vertical-left
        a = np.concatenate([t, tr])
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = (a[i] + a[i + 1] + 1) >> 1
                else:
                    p[y, x] = (a[i] + 2 * a[i + 1] + a[i + 2] + 2) >> 2
    elif mode == 8:  # Horizontal-up
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z > 5:
                    p[y, x] = l[3]
                elif z == 5:
                    p[y, x] = (l[2] + 3 * l[3] + 2) >> 2
                elif z % 2 == 0:
                    p[y, x] = (l[z >> 1] + l[(z >> 1) + 1] + 1) >> 1
                else:
                    i = z >> 1
                    p[y, x] = (l[i] + 2 * l[i + 1] + l[i + 2] + 2) >> 2
    return p


def _i16_predict(mode, left, top, topleft, have_l, have_t):
    p = np.zeros((16, 16), np.int32)
    l = left.astype(np.int32)
    t = top.astype(np.int32)
    if mode == 0:  # Vertical
        p[:, :] = t[None, :]
    elif mode == 1:  # Horizontal
        p[:, :] = l[:, None]
    elif mode == 2:  # DC
        if have_l and have_t:
            dc = (int(l.sum()) + int(t.sum()) + 16) >> 5
        elif have_l:
            dc = (int(l.sum()) + 8) >> 4
        elif have_t:
            dc = (int(t.sum()) + 8) >> 4
        else:
            dc = 128
        p[:, :] = dc
    else:  # Plane
        tl = int(topleft)
        h = sum((x + 1) * (int(t[8 + x]) - int(t[6 - x])) for x in range(7))
        h += 8 * (int(t[15]) - tl)
        v = sum((y + 1) * (int(l[8 + y]) - int(l[6 - y])) for y in range(7))
        v += 8 * (int(l[15]) - tl)
        a = 16 * (int(l[15]) + int(t[15]))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        for y in range(16):
            for x in range(16):
                p[y, x] = np.clip((a + b * (x - 7) + c * (y - 7) + 16) >> 5, 0, 255)
    return p


def _chroma_predict(mode, left, top, topleft, have_l, have_t):
    """8x8 chroma prediction.  Mode numbering: 0=DC 1=H 2=V 3=Plane."""
    p = np.zeros((8, 8), np.int32)
    l = left.astype(np.int32)
    t = top.astype(np.int32)
    if mode == 0:  # DC, per 4x4 quadrant with edge rules (8.3.4.1)
        for qy in range(2):
            for qx in range(2):
                ls = l[qy * 4 : qy * 4 + 4]
                ts = t[qx * 4 : qx * 4 + 4]
                if qx == 0 and qy == 0 or (qx == 1 and qy == 1):
                    if have_l and have_t:
                        dc = (int(ls.sum()) + int(ts.sum()) + 4) >> 3
                    elif have_l:
                        dc = (int(ls.sum()) + 2) >> 2
                    elif have_t:
                        dc = (int(ts.sum()) + 2) >> 2
                    else:
                        dc = 128
                elif qx == 1:  # top-right quadrant: prefer top
                    if have_t:
                        dc = (int(ts.sum()) + 2) >> 2
                    elif have_l:
                        dc = (int(ls.sum()) + 2) >> 2
                    else:
                        dc = 128
                else:  # bottom-left quadrant: prefer left
                    if have_l:
                        dc = (int(ls.sum()) + 2) >> 2
                    elif have_t:
                        dc = (int(ts.sum()) + 2) >> 2
                    else:
                        dc = 128
                p[qy * 4 : qy * 4 + 4, qx * 4 : qx * 4 + 4] = dc
    elif mode == 1:  # Horizontal
        p[:, :] = l[:, None]
    elif mode == 2:  # Vertical
        p[:, :] = t[None, :]
    else:  # Plane
        tl = int(topleft)
        h = sum((x + 1) * (int(t[4 + x]) - int(t[2 - x])) for x in range(3))
        h += 4 * (int(t[7]) - tl)
        v = sum((y + 1) * (int(l[4 + y]) - int(l[2 - y])) for y in range(3))
        v += 4 * (int(l[7]) - tl)
        a = 16 * (int(l[7]) + int(t[7]))
        b = (17 * h + 16) >> 5
        c = (17 * v + 16) >> 5
        for y in range(8):
            for x in range(8):
                p[y, x] = np.clip((a + b * (x - 3) + c * (y - 3) + 16) >> 5, 0, 255)
    return p


# ---------------------------------------------------------------------------
# Frame reconstruction
# ---------------------------------------------------------------------------

# raster order of 4x4 luma blocks within MB, x/y offsets
def _i8x8_predict(mode, left, top16, topleft, have_l, have_t, have_tl):
    """Predict one 8x8 intra block (spec 8.3.2): reference samples are
    low-pass filtered first (8.3.2.2.1), then the 9 modes mirror the 4x4
    formulas on the 8-wide block.  top16 holds p[x,-1] x=0..15 with the
    top-right half already substituted (p[7,-1] replicated) when the
    top-right region is unavailable."""
    l = left.astype(np.int32)
    t = top16.astype(np.int32)
    tl = int(topleft)
    # --- reference filtering ---
    ft = np.zeros(16, np.int32)
    fl = np.zeros(8, np.int32)
    ftl = 0
    if have_t:
        ft[0] = ((tl + 2 * t[0] + t[1] + 2) >> 2) if have_tl else (
            (3 * t[0] + t[1] + 2) >> 2)
        ft[1:15] = (t[0:14] + 2 * t[1:15] + t[2:16] + 2) >> 2
        ft[15] = (t[14] + 3 * t[15] + 2) >> 2
    if have_tl:
        if have_l and have_t:
            ftl = (t[0] + 2 * tl + l[0] + 2) >> 2
        elif have_t:
            ftl = (3 * tl + t[0] + 2) >> 2
        elif have_l:
            ftl = (3 * tl + l[0] + 2) >> 2
        else:
            ftl = tl
    if have_l:
        fl[0] = ((tl + 2 * l[0] + l[1] + 2) >> 2) if have_tl else (
            (3 * l[0] + l[1] + 2) >> 2)
        fl[1:7] = (l[0:6] + 2 * l[1:7] + l[2:8] + 2) >> 2
        fl[7] = (l[6] + 3 * l[7] + 2) >> 2
    t, l, tl = ft, fl, ftl

    p = np.zeros((8, 8), np.int32)
    if mode == 0:  # Vertical
        p[:, :] = t[None, :8]
    elif mode == 1:  # Horizontal
        p[:, :] = l[:, None]
    elif mode == 2:  # DC
        if have_l and have_t:
            dc = (int(l.sum()) + int(t[:8].sum()) + 8) >> 4
        elif have_l:
            dc = (int(l.sum()) + 4) >> 3
        elif have_t:
            dc = (int(t[:8].sum()) + 4) >> 3
        else:
            dc = 128
        p[:, :] = dc
    elif mode == 3:  # Diagonal down-left
        for y in range(8):
            for x in range(8):
                i = x + y
                if i == 14:
                    p[y, x] = (t[14] + 3 * t[15] + 2) >> 2
                else:
                    p[y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
    elif mode == 4:  # Diagonal down-right
        for y in range(8):
            for x in range(8):
                if x > y:
                    i = x - y
                    a = t[i - 2] if i >= 2 else tl
                    b = t[i - 1] if i >= 1 else tl
                    p[y, x] = (a + 2 * b + t[i] + 2) >> 2
                elif x < y:
                    i = y - x
                    a = l[i - 2] if i >= 2 else tl
                    b = l[i - 1] if i >= 1 else tl
                    p[y, x] = (a + 2 * b + l[i] + 2) >> 2
                else:
                    p[y, x] = (t[0] + 2 * tl + l[0] + 2) >> 2
    elif mode == 5:  # Vertical-right
        for y in range(8):
            for x in range(8):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    i = x - (y >> 1)
                    p[y, x] = ((t[i - 1] if i >= 1 else tl) + t[i] + 1) >> 1
                elif z >= 0:
                    i = x - (y >> 1)
                    a = t[i - 2] if i >= 2 else tl
                    b = t[i - 1] if i >= 1 else tl
                    p[y, x] = (a + 2 * b + t[i] + 2) >> 2
                elif z == -1:
                    p[y, x] = (l[0] + 2 * tl + t[0] + 2) >> 2
                else:
                    i = y - 2 * x - 1
                    a = l[i]
                    b = l[i - 1] if i >= 1 else tl
                    cc = l[i - 2] if i >= 2 else tl
                    p[y, x] = (a + 2 * b + cc + 2) >> 2
    elif mode == 6:  # Horizontal-down
        for y in range(8):
            for x in range(8):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    i = y - (x >> 1)
                    p[y, x] = ((l[i - 1] if i >= 1 else tl) + l[i] + 1) >> 1
                elif z >= 0:
                    i = y - (x >> 1)
                    a = l[i - 2] if i >= 2 else tl
                    b = l[i - 1] if i >= 1 else tl
                    p[y, x] = (a + 2 * b + l[i] + 2) >> 2
                elif z == -1:
                    p[y, x] = (t[0] + 2 * tl + l[0] + 2) >> 2
                else:
                    i = x - 2 * y - 1
                    a = t[i]
                    b = t[i - 1] if i >= 1 else tl
                    cc = t[i - 2] if i >= 2 else tl
                    p[y, x] = (a + 2 * b + cc + 2) >> 2
    elif mode == 7:  # Vertical-left
        for y in range(8):
            for x in range(8):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = (t[i] + t[i + 1] + 1) >> 1
                else:
                    p[y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
    elif mode == 8:  # Horizontal-up
        for y in range(8):
            for x in range(8):
                z = x + 2 * y
                if z > 13:
                    p[y, x] = l[7]
                elif z == 13:
                    p[y, x] = (l[6] + 3 * l[7] + 2) >> 2
                elif z % 2 == 0:
                    p[y, x] = (l[z >> 1] + l[(z >> 1) + 1] + 1) >> 1
                else:
                    i = z >> 1
                    p[y, x] = (l[i] + 2 * l[i + 1] + l[i + 2] + 2) >> 2
    return p


def _quad_coeff8(t, f, mb, q):
    """Assemble the raster [8,8] coefficient block of quad q from its four
    16-coeff 4x4 slots (rows 0-1 in slot0, 2-3 in slot1, ...)."""
    b0 = (q >> 1) * 8 + (q & 1) * 2
    rb = (b0, b0 + 1, b0 + 4, b0 + 5)
    return np.concatenate(
        [t.luma_ac[f, mb, k] for k in rb]
    ).reshape(8, 8)


_BLK_X = np.array([(b & 3) * 4 for b in range(16)])
_BLK_Y = np.array([(b >> 2) * 4 for b in range(16)])


class FrameBuffers:
    def __init__(self, mbw, mbh):
        self.Y = np.zeros((mbh * 16, mbw * 16), np.uint8)
        self.U = np.zeros((mbh * 8, mbw * 8), np.uint8)
        self.V = np.zeros((mbh * 8, mbw * 8), np.uint8)


def reconstruct_gop(t: GopTensors, chroma_qp_offset: int = 0,
                    with_deblock: bool = True):
    """Reconstruct every frame of a GOP.  Returns list of (Y, U, V)."""
    mbw, mbh = t.mb_width, t.mb_height
    frames = []
    ref_frames = []  # decoded (post-deblock) frames by span index
    for f in range(t.n_frames):
        buf = FrameBuffers(mbw, mbh)
        _recon_frame(t, f, buf, ref_frames, chroma_qp_offset)
        if with_deblock:
            deblock_frame(t, f, buf, chroma_qp_offset)
        ref_frames.append(buf)
        frames.append((buf.Y.copy(), buf.U.copy(), buf.V.copy()))
    return frames


def _get_edge(plane, x, y, n, dx, dy):
    """Read n samples from plane starting at (x,y) stepping (dx,dy)."""
    ys = y + dy * np.arange(n)
    xs = x + dx * np.arange(n)
    return plane[ys, xs]


def _recon_frame(t, f, buf, ref_frames, chroma_qp_offset):
    mbw, mbh = t.mb_width, t.mb_height
    Y, U, V = buf.Y, buf.U, buf.V

    sw4 = getattr(t, "scaling_w4", None)
    sw8 = getattr(t, "scaling_w8", None)

    def w4(lst):
        return None if sw4 is None else sw4[lst].reshape(4, 4).astype(np.int64)

    for mb in range(mbw * mbh):
        mx, my = (mb % mbw) * 16, (mb // mbw) * 16
        cx, cy = mx // 2, my // 2
        kind = t.mb_kind[f, mb]
        qp = int(t.qp[f, mb])
        qpc = chroma_qp(qp, chroma_qp_offset)
        avail = int(t.avail[f, mb])
        have_l = bool(avail & 1)
        have_t = bool(avail & 2)
        have_tr = bool(avail & 4)
        have_tl = bool(avail & 8)

        if kind == 4:  # I_PCM
            pcm = t.ipcm[f, mb]
            Y[my : my + 16, mx : mx + 16] = pcm[:256].reshape(16, 16)
            U[cy : cy + 8, cx : cx + 8] = pcm[256:320].reshape(8, 8)
            V[cy : cy + 8, cx : cx + 8] = pcm[320:384].reshape(8, 8)
            continue

        if kind in (0, 1, 5, 6):  # inter (P/B, skip or coded)
            _inter_predict_mb(t, f, mb, buf, ref_frames,
                              bipred_idc=getattr(t, "bipred_idc", 0))
            # add residuals
            if kind in (1, 6):
                t8 = bool(t.transform8 is not None and t.transform8[f, mb])
                if t8:
                    for q in range(4):
                        coef = _quad_coeff8(t, f, mb, q)
                        if not coef.any():
                            continue
                        res = residual8x8(
                            coef, qp,
                            None if sw8 is None else sw8[1].reshape(8, 8))
                        bx = mx + (q & 1) * 8
                        by = my + (q >> 1) * 8
                        blk = Y[by : by + 8, bx : bx + 8].astype(np.int32)
                        Y[by : by + 8, bx : bx + 8] = np.clip(blk + res,
                                                              0, 255)
                else:
                    for b in range(16):
                        coef = t.luma_ac[f, mb, b]
                        if not coef.any():
                            continue
                        res = residual4x4(coef.reshape(4, 4), qp, w4(3))
                        bx, by = mx + _BLK_X[b], my + _BLK_Y[b]
                        blk = Y[by : by + 4, bx : bx + 4].astype(np.int32) + res
                        Y[by : by + 4, bx : bx + 4] = np.clip(blk, 0, 255)
                _add_chroma_residuals(t, f, mb, U, V, cx, cy, qpc,
                                      intra=False)
            continue

        # ----- intra -----
        if kind == 3:  # I16x16
            left = _get_edge(Y, mx - 1, my, 16, 0, 1) if have_l else np.zeros(16, np.uint8)
            top = _get_edge(Y, mx, my - 1, 16, 1, 0) if have_t else np.zeros(16, np.uint8)
            tl = Y[my - 1, mx - 1] if (have_l and have_t) else 0
            pred = _i16_predict(int(t.i16_mode[f, mb]), left, top, tl,
                                have_l, have_t)
            # DC transform
            dcs = luma_dc_transform(
                t.luma_dc[f, mb], qp,
                16 if sw4 is None else int(sw4[0][0]))
            res16 = np.zeros((16, 16), np.int32)
            for b in range(16):
                d = dequant4x4(t.luma_ac[f, mb, b].reshape(4, 4), qp, w4(0))
                d[0, 0] = dcs[b >> 2, b & 3]
                res16[
                    _BLK_Y[b] : _BLK_Y[b] + 4, _BLK_X[b] : _BLK_X[b] + 4
                ] = (idct4x4(d) + 32) >> 6
            Y[my : my + 16, mx : mx + 16] = np.clip(pred + res16, 0, 255)
        elif t.transform8 is not None and t.transform8[f, mb]:  # I 8x8
            for q in range(4):  # raster quad order == decode order
                qx, qy = q & 1, q >> 1
                bx8, by8 = mx + qx * 8, my + qy * 8
                bl = qx > 0 or have_l
                bt = qy > 0 or have_t
                if qy == 0:
                    btr = (qx == 0 and have_t) or (qx == 1 and have_tr)
                else:
                    # block 2: above-right is quad 1 (decoded); block 3:
                    # above-right is the right MB's row 7 (undecoded)
                    btr = qx == 0
                btl = (qx > 0 and qy > 0) or (qx == 0 and qy > 0 and have_l) \
                    or (qy == 0 and qx > 0 and have_t) \
                    or (qx == 0 and qy == 0 and have_tl)
                left = (_get_edge(Y, bx8 - 1, by8, 8, 0, 1) if bl
                        else np.zeros(8, np.uint8))
                top8 = (_get_edge(Y, bx8, by8 - 1, 8, 1, 0) if bt
                        else np.zeros(8, np.uint8))
                if btr:
                    tr8 = _get_edge(Y, bx8 + 8, by8 - 1, 8, 1, 0)
                elif bt:
                    tr8 = np.full(8, top8[7], np.uint8)
                else:
                    tr8 = np.zeros(8, np.uint8)
                t16 = np.concatenate([top8, tr8])
                tl = Y[by8 - 1, bx8 - 1] if btl else 0
                mode = int(t.i4_modes[f, mb, qy * 8 + qx * 2])
                pred = _i8x8_predict(mode, left, t16, tl, bl, bt, btl)
                coef = _quad_coeff8(t, f, mb, q)
                res = residual8x8(
                    coef, qp, None if sw8 is None else sw8[0].reshape(8, 8))
                Y[by8 : by8 + 8, bx8 : bx8 + 8] = np.clip(pred + res, 0, 255)
        else:  # I4x4
            for b in range(16):  # standard 4x4 decode order within MB
                db = [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15][b]
                bx, by = mx + _BLK_X[db], my + _BLK_Y[db]
                x4, y4 = db & 3, db >> 2
                # per-block availability
                bl = x4 > 0 or have_l
                bt = y4 > 0 or have_t
                # top-right availability (spec 6.4.11.4 via raster order):
                if y4 == 0:
                    btr = (x4 < 3 and have_t) or (x4 == 3 and have_tr)
                else:
                    # inside MB: available iff block above-right is decoded
                    # before this one in raster scan, i.e. x4<3 and the
                    # block (y4-1, x4+1) is earlier in *decode* order.
                    btr = x4 < 3 and _decoded_before(x4 + 1, y4 - 1, x4, y4)
                btl = (x4 > 0 and y4 > 0) or (x4 == 0 and y4 > 0 and have_l) \
                    or (y4 == 0 and x4 > 0 and have_t) \
                    or (x4 == 0 and y4 == 0 and have_tl)
                left = _get_edge(Y, bx - 1, by, 4, 0, 1) if bl else np.zeros(4, np.uint8)
                top = _get_edge(Y, bx, by - 1, 4, 1, 0) if bt else np.zeros(4, np.uint8)
                if btr:
                    tr = _get_edge(Y, bx + 4, by - 1, 4, 1, 0)
                elif bt:
                    tr = np.full(4, top[3], np.uint8)
                else:
                    tr = np.zeros(4, np.uint8)
                tl = Y[by - 1, bx - 1] if btl else 0
                pred = _i4x4_predict(int(t.i4_modes[f, mb, db]), left, top,
                                     tl, tr, bl, bt, btl, btr)
                res = residual4x4(t.luma_ac[f, mb, db].reshape(4, 4), qp,
                                  w4(0))
                Y[by : by + 4, bx : bx + 4] = np.clip(pred + res, 0, 255)

        # chroma intra
        lc_u = _get_edge(U, cx - 1, cy, 8, 0, 1) if have_l else np.zeros(8, np.uint8)
        tc_u = _get_edge(U, cx, cy - 1, 8, 1, 0) if have_t else np.zeros(8, np.uint8)
        lc_v = _get_edge(V, cx - 1, cy, 8, 0, 1) if have_l else np.zeros(8, np.uint8)
        tc_v = _get_edge(V, cx, cy - 1, 8, 1, 0) if have_t else np.zeros(8, np.uint8)
        tlu = U[cy - 1, cx - 1] if (have_l and have_t) else 0
        tlv = V[cy - 1, cx - 1] if (have_l and have_t) else 0
        cmode = int(t.chroma_mode[f, mb])
        pu = _chroma_predict(cmode, lc_u, tc_u, tlu, have_l, have_t)
        pv = _chroma_predict(cmode, lc_v, tc_v, tlv, have_l, have_t)
        U[cy : cy + 8, cx : cx + 8] = np.clip(pu, 0, 255)
        V[cy : cy + 8, cx : cx + 8] = np.clip(pv, 0, 255)
        _add_chroma_residuals(t, f, mb, U, V, cx, cy, qpc, intra=True)


def _decoded_before(x4a, y4a, x4b, y4b):
    """Is block (x4a,y4a) decoded before (x4b,y4b) in the standard 4x4
    decode order?"""
    order = [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15]
    ia = order.index(y4a * 4 + x4a)
    ib = order.index(y4b * 4 + x4b)
    return ia < ib


def _add_chroma_residuals(t, f, mb, U, V, cx, cy, qpc, intra=True):
    sw4 = getattr(t, "scaling_w4", None)
    for comp, plane in ((0, U), (1, V)):
        lst = (1 if intra else 4) + comp
        w = None if sw4 is None else sw4[lst].reshape(4, 4).astype(np.int64)
        dcs = chroma_dc_transform(
            t.chroma_dc[f, mb, comp], qpc,
            16 if sw4 is None else int(sw4[lst][0]))
        for b in range(4):
            coef = t.chroma_ac[f, mb, comp, b]
            d = dequant4x4(coef.reshape(4, 4), qpc, w)
            d[0, 0] = dcs[b >> 1, b & 1]
            if not d.any():
                continue
            res = (idct4x4(d) + 32) >> 6
            bx = cx + (b & 1) * 4
            by = cy + (b >> 1) * 4
            blk = plane[by : by + 4, bx : bx + 4].astype(np.int32) + res
            plane[by : by + 4, bx : bx + 4] = np.clip(blk, 0, 255)


# ---------------------------------------------------------------------------
# Inter prediction (spec 8.4.2.2): 6-tap half-pel + bilinear quarter-pel
# ---------------------------------------------------------------------------


def _luma_mc_block(ref_y: np.ndarray, x0: int, y0: int, w: int, h: int,
                   mvx: int, mvy: int) -> np.ndarray:
    """Quarter-pel luma MC for a w x h block at (x0,y0) (spec 8.4.2.2.1).

    Grids (Figure 8-4 letters): G integer; b half-pel horizontal; h
    half-pel vertical; j center; m = h at x+1; s = b at y+1.  Averages per
    Table 8-12.  Edge samples are clamped (picture border extension).
    """
    H, W = ref_y.shape
    ix, iy = mvx >> 2, mvy >> 2
    fx, fy = mvx & 3, mvy & 3
    # region R[(h+7) x (w+7)]: R[2+y, 2+x] = integer sample (x,y) of block
    ys = np.clip(np.arange(y0 + iy - 2, y0 + iy + h + 5), 0, H - 1)
    xs = np.clip(np.arange(x0 + ix - 2, x0 + ix + w + 5), 0, W - 1)
    R = ref_y[np.ix_(ys, xs)].astype(np.int32)

    def tap6(a, axis):
        if axis == 1:
            return (a[:, 0:-5] - 5 * a[:, 1:-4] + 20 * a[:, 2:-3]
                    + 20 * a[:, 3:-2] - 5 * a[:, 4:-1] + a[:, 5:])
        return (a[0:-5] - 5 * a[1:-4] + 20 * a[2:-3]
                + 20 * a[3:-2] - 5 * a[4:-1] + a[5:])

    G = R[2 : 2 + h, 2 : 2 + w]
    if fx == 0 and fy == 0:
        return G

    def avg(a, b_):
        return (a + b_ + 1) >> 1

    # T1[r,c] = horizontal 6-tap at R row r spanning cols c..c+5, i.e. the
    # half-pel at block coords (x = c + 0.5, y = r - 2).
    T1 = tap6(R, 1)          # [(h+7) x (w+2)]
    B = np.clip((T1 + 16) >> 5, 0, 255)
    # T2[r,c] = vertical 6-tap spanning R rows r..r+5: half-pel at
    # (x = c - 2, y = r + 0.5).
    T2 = tap6(R, 0)          # [(h+2) x (w+7)]
    Hh = np.clip((T2 + 16) >> 5, 0, 255)

    b = B[2 : 2 + h, 0 : w]
    s = B[3 : 3 + h, 0 : w]              # b at y+1
    hv = Hh[0 : h, 2 : 2 + w]
    m = Hh[0 : h, 3 : 3 + w]             # h at x+1
    G_r = R[2 : 2 + h, 3 : 3 + w]
    G_d = R[3 : 3 + h, 2 : 2 + w]

    if fy == 0:
        if fx == 1:
            return avg(G, b)
        if fx == 2:
            return b
        return avg(b, G_r)
    if fx == 0:
        if fy == 1:
            return avg(G, hv)
        if fy == 2:
            return hv
        return avg(hv, G_d)

    J2 = tap6(T1, 0)                     # [(h+2) x (w+2)] raw j
    j = np.clip((J2 + 512) >> 10, 0, 255)[0 : h, 0 : w]

    if fx == 2 and fy == 2:
        return j
    if fx == 2:  # f (fy==1) / q (fy==3)
        return avg(b, j) if fy == 1 else avg(s, j)
    if fy == 2:  # i (fx==1) / k (fx==3)
        return avg(hv, j) if fx == 1 else avg(m, j)
    # corner quarter positions e/g/p/r
    bb = b if fy == 1 else s
    hh_ = hv if fx == 1 else m
    return avg(bb, hh_)


def _chroma_mc_block(ref_c: np.ndarray, x0: int, y0: int, w: int, h: int,
                     mvx: int, mvy: int) -> np.ndarray:
    """Eighth-pel bilinear chroma MC (spec 8.4.2.2.2)."""
    H, W = ref_c.shape
    ix, iy = mvx >> 3, mvy >> 3
    fx, fy = mvx & 7, mvy & 7
    xs = np.clip(np.arange(x0 + ix, x0 + ix + w + 1), 0, W - 1)
    ys = np.clip(np.arange(y0 + iy, y0 + iy + h + 1), 0, H - 1)
    R = ref_c[np.ix_(ys, xs)].astype(np.int32)
    A = R[0:h, 0:w]
    B = R[0:h, 1 : w + 1]
    C = R[1 : h + 1, 0:w]
    D = R[1 : h + 1, 1 : w + 1]
    return ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * B
            + (8 - fx) * fy * C + fx * fy * D + 32) >> 6


def _weight_pred(p, w, o, log_wd):
    """Explicit weighted uni-prediction (spec 8.4.2.3.2, eq 8-269/270)."""
    p = p.astype(np.int32)
    if log_wd >= 1:
        v = ((p * w + (1 << (log_wd - 1))) >> log_wd) + o
    else:
        v = p * w + o
    return np.clip(v, 0, 255)


def _implicit_bi_weight(poc_cur, poc0, poc1):
    """Implicit weighted bi-prediction w0/w1 (spec 8.4.2.3.1, frames)."""
    td = int(np.clip(poc1 - poc0, -128, 127))
    if td == 0:
        return 32, 32
    tb = int(np.clip(poc_cur - poc0, -128, 127))
    tx = (16384 + abs(td) // 2) // td
    dsf = (tb * tx + 32) >> 8  # == (temporal DistScaleFactor) >> 2
    if dsf < -64 or dsf > 128:
        return 32, 32
    return 64 - dsf, dsf


def _inter_predict_mb(t, f, mb, buf, ref_frames, bipred_idc=0):
    mbw = t.mb_width
    mx, my = (mb % mbw) * 16, (mb // mbw) * 16
    # per 4x4 block (MVs are stored at 4x4 granularity; contiguous equal-MV
    # blocks could be merged, but correctness first)
    for b in range(16):
        x4, y4 = b & 3, b >> 2
        q8 = (y4 >> 1) * 2 + (x4 >> 1)
        bx, by = mx + x4 * 4, my + y4 * 4
        cbx, cby = bx // 2, by // 2
        preds = []  # (py, pu, pv, ref_idx, span_ref) per used list
        for lst, (refidx, mvs, rmap) in enumerate(
            ((t.refidx, t.mv, t.ref_map), (t.refidx_l1, t.mv_l1, t.ref_map_l1))
        ):
            ref_idx = int(refidx[f, mb, q8])
            if ref_idx < 0:
                continue
            span_ref = int(rmap[f, ref_idx])
            if span_ref < 0:
                raise ValueError(
                    f"inter MB {mb} frame {f} list {lst}: missing reference"
                )
            ref = ref_frames[span_ref]
            mvx = int(mvs[f, mb, b, 0])
            mvy = int(mvs[f, mb, b, 1])
            # chroma: each 4x4 luma block's MV drives its own 2x2 chroma
            # block (sub-8x8 partitions carry distinct MVs per 4x4)
            preds.append((
                _luma_mc_block(ref.Y, bx, by, 4, 4, mvx, mvy).astype(np.int32),
                _chroma_mc_block(ref.U, cbx, cby, 2, 2, mvx, mvy).astype(np.int32),
                _chroma_mc_block(ref.V, cbx, cby, 2, 2, mvx, mvy).astype(np.int32),
                ref_idx, span_ref, lst,
            ))
        if not preds:
            raise ValueError(f"inter MB {mb} frame {f}: no prediction")
        weighted = t.weight_flag is not None and t.weight_flag[f]
        if len(preds) == 1:
            py, pu, pv, ref_idx, _, lst = preds[0]
            if weighted:
                # explicit weighted prediction, uni-pred (8.4.2.3.2);
                # list-1-only B blocks take the L1 table
                table = (
                    t.pred_weights_l1 if lst == 1 else t.pred_weights
                )
                wy, oy, wu, ou, wv, ov, ly, lc = (
                    int(v) for v in table[f, ref_idx]
                )
                py = _weight_pred(py, wy, oy, ly)
                pu = _weight_pred(pu, wu, ou, lc)
                pv = _weight_pred(pv, wv, ov, lc)
        else:
            (py0, pu0, pv0, r0, sr0, _), (py1, pu1, pv1, r1, sr1, _) = preds
            if bipred_idc == 1 and weighted:
                # explicit weighted bi-prediction (8.4.2.3.2, eq 8-272):
                # per-list weights combined at logWD+1 with averaged offset
                wy0, oy0, wu0, ou0, wv0, ov0, ly, lc = (
                    int(v) for v in t.pred_weights[f, r0]
                )
                wy1, oy1, wu1, ou1, wv1, ov1, _, _ = (
                    int(v) for v in t.pred_weights_l1[f, r1]
                )

                def bi(p0, p1, w0, w1, o0, o1, lwd):
                    v = ((p0 * w0 + p1 * w1 + (1 << lwd)) >> (lwd + 1)) + (
                        (o0 + o1 + 1) >> 1
                    )
                    return np.clip(v, 0, 255)

                py = bi(py0, py1, wy0, wy1, oy0, oy1, ly)
                pu = bi(pu0, pu1, wu0, wu1, ou0, ou1, lc)
                pv = bi(pv0, pv1, wv0, wv1, ov0, ov1, lc)
            else:
                # default average or implicit POC weights
                if bipred_idc == 2:
                    w0, w1 = _implicit_bi_weight(
                        int(t.poc[f]), int(t.poc[sr0]), int(t.poc[sr1])
                    )
                else:
                    w0 = w1 = 32
                py = np.clip((py0 * w0 + py1 * w1 + 32) >> 6, 0, 255)
                pu = np.clip((pu0 * w0 + pu1 * w1 + 32) >> 6, 0, 255)
                pv = np.clip((pv0 * w0 + pv1 * w1 + 32) >> 6, 0, 255)
        buf.Y[by : by + 4, bx : bx + 4] = py.astype(np.uint8)
        buf.U[cby : cby + 2, cbx : cbx + 2] = pu.astype(np.uint8)
        buf.V[cby : cby + 2, cbx : cbx + 2] = pv.astype(np.uint8)


# ---------------------------------------------------------------------------
# Deblocking filter (spec 8.7) — added in deblock.py-style pass
# ---------------------------------------------------------------------------

_ALPHA = np.array(
    [0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0, 4,4,5,6,7,8,9,10,12,13,15,17,20,22,
     25,28,32,36,40,45,50,56,63,71,80,90,101,113,127,144,162,182,203,226,
     255,255], np.int32)
_BETA = np.array(
    [0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0, 2,2,2,3,3,3,3,4,4,4,6,6,7,7,8,8,9,9,
     10,10,11,11,12,12,13,13,14,14,15,15,16,16,17,17,18,18], np.int32)
_TC0 = np.array([
    # Table 8-17 tc0 by indexA, columns bS=1,2,3.  Rows 16-48 calibrated
    # bit-exactly against libavcodec (empirical VLC/filter oracle); rows
    # 49-51 follow the table's growth pattern.
    [0,0,0],[0,0,0],[0,0,0],[0,0,0],[0,0,0],[0,0,0],[0,0,0],[0,0,0],
    [0,0,0],[0,0,0],[0,0,0],[0,0,0],[0,0,0],[0,0,0],[0,0,0],[0,0,0],
    [0,0,0],[0,0,1],[0,0,1],[0,0,1],[0,0,1],[0,1,1],[0,1,1],[1,1,1],
    [1,1,1],[1,1,1],[1,1,1],[1,1,2],[1,1,2],[1,1,2],[1,1,2],[1,2,3],
    [1,2,3],[2,2,3],[2,2,4],[2,3,4],[2,3,4],[3,3,5],[3,4,6],[3,4,6],
    [4,5,7],[4,5,8],[4,6,9],[5,7,10],[6,8,11],[6,8,13],[7,10,14],[8,11,16],
    [9,12,18],[10,13,20],[11,15,23],[13,17,25]], np.int32)


def deblock_frame(t, f, buf, chroma_qp_offset):
    """In-loop deblocking, MB raster order, vertical then horizontal edges
    per MB (spec 8.7 processing order)."""
    mbw, mbh = t.mb_width, t.mb_height
    Y, U, V = buf.Y, buf.U, buf.V
    for mb in range(mbw * mbh):
        if t.deblock_idc[f, mb] == 1:
            continue
        mx, my = (mb % mbw) * 16, (mb // mbw) * 16
        avail = int(t.avail[f, mb])
        # filter across left edge? picture boundary no; slice boundary per idc
        left_mb = mb - 1 if mb % mbw else -1
        top_mb = mb - mbw if mb >= mbw else -1
        left_ok = left_mb >= 0 and (
            t.deblock_idc[f, mb] != 2 or (avail & 16)
        )
        top_ok = top_mb >= 0 and (
            t.deblock_idc[f, mb] != 2 or (avail & 32)
        )
        qp = int(t.qp[f, mb])
        a_off = int(t.alpha_off[f, mb])
        b_off = int(t.beta_off[f, mb])

        t8 = bool(t.transform8 is not None and t.transform8[f, mb])
        # ---- vertical edges (filter left to right), luma
        for e in range(4):
            x = mx + 4 * e
            if e == 0 and not left_ok:
                continue
            if t8 and e in (1, 3):  # 8x8 transform: no 4x4-internal edges
                continue
            nbr = left_mb if e == 0 else mb
            _filter_luma_edge(t, f, buf, mb, nbr, x, my, vertical=True,
                              edge=e, qp_avg_mb=nbr, a_off=a_off, b_off=b_off)
        # ---- horizontal edges, luma
        for e in range(4):
            y = my + 4 * e
            if e == 0 and not top_ok:
                continue
            if t8 and e in (1, 3):
                continue
            nbr = top_mb if e == 0 else mb
            _filter_luma_edge(t, f, buf, mb, nbr, mx, y, vertical=False,
                              edge=e, qp_avg_mb=nbr, a_off=a_off, b_off=b_off)
        # ---- chroma edges (every other 4x4 edge: 0 and 2)
        for e in (0, 2):
            if e == 0 and not left_ok:
                continue
            nbr = left_mb if e == 0 else mb
            _filter_chroma_edge(t, f, buf, mb, nbr, mx // 2 + 2 * e, my // 2,
                                vertical=True, edge=e, a_off=a_off,
                                b_off=b_off, qp_off=chroma_qp_offset)
        for e in (0, 2):
            if e == 0 and not top_ok:
                continue
            nbr = top_mb if e == 0 else mb
            _filter_chroma_edge(t, f, buf, mb, nbr, mx // 2, my // 2 + 2 * e,
                                vertical=False, edge=e, a_off=a_off,
                                b_off=b_off, qp_off=chroma_qp_offset)


def _side_motion(t, f, mb, blk):
    """Predictions of one 4x4 block: list of (span_ref, mvx, mvy)."""
    q8 = ((blk >> 2) >> 1) * 2 + ((blk & 3) >> 1)
    out = []
    r0 = int(t.refidx[f, mb, q8])
    if r0 >= 0:
        out.append((int(t.ref_map[f, r0]), int(t.mv[f, mb, blk, 0]),
                    int(t.mv[f, mb, blk, 1])))
    r1 = int(t.refidx_l1[f, mb, q8])
    if r1 >= 0:
        out.append((int(t.ref_map_l1[f, r1]), int(t.mv_l1[f, mb, blk, 0]),
                    int(t.mv_l1[f, mb, blk, 1])))
    return out


def _mv_far(a, b):
    return abs(a[1] - b[1]) >= 4 or abs(a[2] - b[2]) >= 4


def _bs_for_edge(t, f, mb_q, mb_p, blk_q, blk_p, mb_edge, vertical):
    """Boundary strength for one 4x4 edge segment (spec 8.7.2.1)."""
    kind_q = t.mb_kind[f, mb_q]
    kind_p = t.mb_kind[f, mb_p]
    intra_q = kind_q in (2, 3, 4)
    intra_p = kind_p in (2, 3, 4)
    if intra_q or intra_p:
        return 4 if mb_edge else 3
    nnz_q = t.nnz[f, mb_q, blk_q]
    nnz_p = t.nnz[f, mb_p, blk_p]
    if nnz_q or nnz_p:
        return 2
    # motion-based: compare the prediction sets of both sides (covers P
    # and B: uni/bi, matching by reference picture regardless of list)
    mq = _side_motion(t, f, mb_q, blk_q)
    mp = _side_motion(t, f, mb_p, blk_p)
    if len(mq) != len(mp):
        return 1
    if sorted(x[0] for x in mq) != sorted(x[0] for x in mp):
        return 1
    if len(mq) == 1:
        return 1 if _mv_far(mq[0], mp[0]) else 0
    # bi-predicted both sides with the same pair of pictures
    if mq[0][0] != mq[1][0]:
        # distinct pictures: unique pairing by picture
        p_by_ref = {x[0]: x for x in mp}
        for x in mq:
            if _mv_far(x, p_by_ref[x[0]]):
                return 1
        return 0
    # same picture in both lists: bS=0 if EITHER assignment is close
    straight = not (_mv_far(mq[0], mp[0]) or _mv_far(mq[1], mp[1]))
    crossed = not (_mv_far(mq[0], mp[1]) or _mv_far(mq[1], mp[0]))
    return 0 if (straight or crossed) else 1


def _filter_luma_edge(t, f, buf, mb_q, mb_p, x, y, vertical, edge, qp_avg_mb,
                      a_off, b_off):
    Y = buf.Y
    qp_q = int(t.qp[f, mb_q])
    qp_p = int(t.qp[f, mb_p])
    qp_avg = (qp_q + qp_p + 1) >> 1
    alpha = int(_ALPHA[np.clip(qp_avg + a_off, 0, 51)])
    beta = int(_BETA[np.clip(qp_avg + b_off, 0, 51)])
    if alpha == 0 or beta == 0:
        return
    for k in range(16):  # each sample line along the edge
        if vertical:
            py, px = y + k, x
            p = Y[py, px - 4 : px][::-1].astype(np.int32)  # p0..p3
            q = Y[py, px : px + 4].astype(np.int32)
        else:
            py, px = y, x + k
            p = Y[py - 4 : py, px][::-1].astype(np.int32)
            q = Y[py : py + 4, px].astype(np.int32)
        # block indices for bS
        if vertical:
            blk_q = ((py % 16) // 4) * 4 + ((px % 16) // 4)
            pxp = px - 1
            blk_p = ((py % 16) // 4) * 4 + ((pxp % 16) // 4)
        else:
            blk_q = ((py % 16) // 4) * 4 + ((px % 16) // 4)
            pyp = py - 1
            blk_p = ((pyp % 16) // 4) * 4 + ((px % 16) // 4)
        bs = _bs_for_edge(t, f, mb_q, mb_p, blk_q, blk_p, edge == 0, vertical)
        if bs == 0:
            continue
        out = _filter_line_luma(p, q, bs, alpha, beta,
                                int(_TC0[np.clip(qp_avg + a_off, 0, 51), bs - 1])
                                if bs < 4 else 0)
        if out is None:
            continue
        np_, nq = out
        if vertical:
            Y[py, px - 3 : px] = np_[2::-1]
            Y[py, px : px + 3] = nq[:3]
        else:
            Y[py - 3 : py, px] = np_[2::-1]
            Y[py : py + 3, px] = nq[:3]


def _filter_line_luma(p, q, bs, alpha, beta, tc0):
    p0, p1, p2, p3 = int(p[0]), int(p[1]), int(p[2]), int(p[3])
    q0, q1, q2, q3 = int(q[0]), int(q[1]), int(q[2]), int(q[3])
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta and abs(q1 - q0) < beta):
        return None
    np_ = np.array([p0, p1, p2], np.int32)
    nq = np.array([q0, q1, q2], np.int32)
    if bs < 4:
        ap = abs(p2 - p0)
        aq = abs(q2 - q0)
        tc = tc0 + (1 if ap < beta else 0) + (1 if aq < beta else 0)
        delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
        np_[0] = np.clip(p0 + delta, 0, 255)
        nq[0] = np.clip(q0 - delta, 0, 255)
        if ap < beta:
            np_[1] = p1 + np.clip((p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1,
                                  -tc0, tc0)
        if aq < beta:
            nq[1] = q1 + np.clip((q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1,
                                 -tc0, tc0)
    else:
        ap = abs(p2 - p0)
        aq = abs(q2 - q0)
        strong = abs(p0 - q0) < ((alpha >> 2) + 2)
        if strong and ap < beta:
            np_[0] = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
            np_[1] = (p2 + p1 + p0 + q0 + 2) >> 2
            np_[2] = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
        else:
            np_[0] = (2 * p1 + p0 + q1 + 2) >> 2
        if strong and aq < beta:
            nq[0] = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
            nq[1] = (q2 + q1 + q0 + p0 + 2) >> 2
            nq[2] = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
        else:
            nq[0] = (2 * q1 + q0 + p1 + 2) >> 2
    return np_, nq


def _filter_chroma_edge(t, f, buf, mb_q, mb_p, x, y, vertical, edge, a_off,
                        b_off, qp_off):
    qp_q = chroma_qp(int(t.qp[f, mb_q]), qp_off)
    qp_p = chroma_qp(int(t.qp[f, mb_p]), qp_off)
    qp_avg = (qp_q + qp_p + 1) >> 1
    alpha = int(_ALPHA[np.clip(qp_avg + a_off, 0, 51)])
    beta = int(_BETA[np.clip(qp_avg + b_off, 0, 51)])
    if alpha == 0 or beta == 0:
        return
    for plane in (buf.U, buf.V):
        for k in range(8):
            if vertical:
                py, px = y + k, x
                p = plane[py, px - 2 : px][::-1].astype(np.int32)
                q = plane[py, px : px + 2].astype(np.int32)
            else:
                py, px = y, x + k
                p = plane[py - 2 : py, px][::-1].astype(np.int32)
                q = plane[py : py + 2, px].astype(np.int32)
            # bS from the corresponding luma edge: luma block at 2x chroma pos
            ly, lx = py * 2, px * 2
            if vertical:
                blk_q = ((ly % 16) // 4) * 4 + ((lx % 16) // 4)
                blk_p = ((ly % 16) // 4) * 4 + (((lx - 1) % 16) // 4)
            else:
                blk_q = ((ly % 16) // 4) * 4 + ((lx % 16) // 4)
                blk_p = (((ly - 1) % 16) // 4) * 4 + ((lx % 16) // 4)
            bs = _bs_for_edge(t, f, mb_q, mb_p, blk_q, blk_p, edge == 0,
                              vertical)
            if bs == 0:
                continue
            p0, p1 = int(p[0]), int(p[1])
            q0, q1 = int(q[0]), int(q[1])
            if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
                    and abs(q1 - q0) < beta):
                continue
            if bs < 4:
                tc0 = int(_TC0[np.clip(qp_avg + a_off, 0, 51), bs - 1])
                tc = tc0 + 1
                delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
                np0 = np.clip(p0 + delta, 0, 255)
                nq0 = np.clip(q0 - delta, 0, 255)
            else:
                np0 = (2 * p1 + p0 + q1 + 2) >> 2
                nq0 = (2 * q1 + q0 + p1 + 2) >> 2
            if vertical:
                plane[py, px - 1] = np0
                plane[py, px] = nq0
            else:
                plane[py - 1, px] = np0
                plane[py, px] = nq0
