"""HEVC intra prediction as integer matrices — the TPU formulation.

Every HEVC intra mode (8.4.4.2.4-6: planar, DC, angular 2..34, including
the luma DC/vertical/horizontal edge filters) is LINEAR in the reference
samples before the final rounding shift.  So prediction compiles to one
MXU matmul per transform unit:

    pred[yy*16+xx] = (W[widx] @ xe) >> 5,   clip 0..255

where `xe` is the TU's canonical reference vector and W is an integer
weight matrix built here.  Per-row rounding/shifts are normalised to a
single >>5 by scaling each row's weights and folding its rounding
constant into a constant-1 column (floor((a+r)/2^k) ==
floor((a+r)*2^(5-k)/2^5) exactly, for any integers).

Canonical reference vector layout (length 67):
    0..31   left[i]  = p[x0-1, y0+i]          (i < 2n used)
    32      corner   = p[x0-1, y0-1]
    33..64  top[i]   = p[x0+i, y0-1]          (i < 2n used)
    65      dc       (computed on device from the unfiltered refs)
    66      1        (rounding constants)

The 8.4.4.2.3 reference smoothing is a separate linear stage (its own
rounding): xf = (A_n @ x + 2) >> 2, selected per TU by a host flag.

Scope: TU sizes 4/8/16 (32x32 TUs need the data-dependent strong
smoothing select; the prep layer rejects them and the backend falls back
to SOFTWARE).  Validated row-for-row against ref_recon.intra_predict in
tests/test_hevc_jax.py.
"""

from __future__ import annotations

import functools

import numpy as np

from .ref_recon import DCT, DST4, LEVEL_SCALE, _ANGLE, _INV_ANGLE

SIZES = (4, 8, 16)
N_REF = 65          # canonical refs: 32 left + corner + 32 top
COL_DC = 65
COL_ONE = 66
N_COL = 67
SHIFT = 5           # common output shift


def _colL(i):
    return i


def _colT(i):
    return 33 + i


_COL_CORNER = 32


def _build_w_g(mode: int, n: int, luma: bool, stride: int, colL, colC,
               colT, col_dc, col_one, n_col: int, shift: int) -> np.ndarray:
    """Integer weight matrix [stride*stride, n_col] for one (mode, size,
    plane) at output scale 2^shift (pred = (W @ xe) >> shift), over a
    parameterized canonical-column layout (the 4/8/16 class packs into a
    16x16 window over 65+2 columns; the 32 class into 32x32 over 129+2)."""
    W = np.zeros((stride * stride, n_col), np.int64)
    lg = n.bit_length() - 1

    def R(yy, xx):
        return W[yy * stride + xx]

    if mode == 0:  # planar (8.4.4.2.4), natural shift lg+1
        sc = 1 << (shift - (lg + 1))
        for yy in range(n):
            for xx in range(n):
                r = R(yy, xx)
                r[colL(yy)] += sc * (n - 1 - xx)
                r[colT(n)] += sc * (xx + 1)
                r[colT(xx)] += sc * (n - 1 - yy)
                r[colL(n)] += sc * (yy + 1)
                r[col_one] += sc * n
    elif mode == 1:  # DC (8.4.4.2.5); dc itself arrives via col_dc
        for yy in range(n):
            for xx in range(n):
                R(yy, xx)[col_dc] = 1 << shift
        if luma and n < 32:  # edge filtering, natural shift 2
            sc = 1 << (shift - 2)
            r = R(0, 0)
            r[:] = 0
            r[colL(0)] = sc
            r[col_dc] = 2 * sc
            r[colT(0)] = sc
            r[col_one] = 2 * sc
            for xx in range(1, n):
                r = R(0, xx)
                r[:] = 0
                r[colT(xx)] = sc
                r[col_dc] = 3 * sc
                r[col_one] = 2 * sc
            for yy in range(1, n):
                r = R(yy, 0)
                r[:] = 0
                r[colL(yy)] = sc
                r[col_dc] = 3 * sc
                r[col_one] = 2 * sc
    else:  # angular 2..34 (8.4.4.2.6), natural shift 5
        ang = _ANGLE[mode - 2]
        sc = 1 << (shift - 5)
        # symbolic ref array: refc[k] = row of column-coefficients for
        # ref[k - n] in the spec's ref[-n .. 2n+1] indexing
        refc = np.zeros((3 * n + 2, n_col), np.int64)
        main_is_top = mode >= 18
        side = colL if main_is_top else colT
        main = colT if main_is_top else colL
        refc[n, colC] = 1
        for i in range(2 * n):
            refc[n + 1 + i, main(i)] = 1
        if ang < 0 and ((n * ang) >> 5) < -1:
            inv = _INV_ANGLE[mode]
            lo = (n * ang) >> 5
            for x in range(-1, lo - 1, -1):
                idx = -1 + ((x * inv + 128) >> 8)
                refc[n + x] = 0
                if idx >= 0:
                    refc[n + x, side(idx)] = 1
                else:
                    refc[n + x, colC] = 1
        for a in range(n):  # a = yy (vertical family) / xx (horizontal)
            i_idx = ((a + 1) * ang) >> 5
            i_fact = ((a + 1) * ang) & 31
            for b in range(n):
                r = n + b + i_idx + 1
                row = sc * ((32 - i_fact) * refc[r] + i_fact * refc[r + 1])
                row[col_one] += 16 * sc
                if main_is_top:
                    W[a * stride + b] = row
                else:
                    W[b * stride + a] = row
        if luma and n < 32 and mode == 26:  # vertical edge (clip at end)
            ec = 1 << (shift - 1)
            for yy in range(n):
                r = R(yy, 0)
                r[:] = 0
                r[colT(0)] = 2 * ec
                r[colL(yy)] = ec
                r[colC] = -ec
        if luma and n < 32 and mode == 10:  # horizontal edge
            ec = 1 << (shift - 1)
            for xx in range(n):
                r = R(0, xx)
                r[:] = 0
                r[colL(0)] = 2 * ec
                r[colT(xx)] = ec
                r[colC] = -ec
    # |W| < 256 keeps every entry (and every z = onehot*ref product in
    # recon_jax) exactly representable in bfloat16, which makes the MXU
    # bf16 matmul with f32 accumulation bit-exact integer arithmetic
    assert np.abs(W).max() < 256
    return W


def _build_w(mode: int, n: int, luma: bool) -> np.ndarray:
    return _build_w_g(mode, n, luma, 16, _colL, _COL_CORNER, _colT,
                      COL_DC, COL_ONE, N_COL, SHIFT)


@functools.lru_cache(maxsize=1)
def w_table() -> np.ndarray:
    """Stacked [210, 256, 67] int32: widx = (mode*3 + size_idx)*2 + luma."""
    out = np.zeros((35 * 3 * 2, 256, N_COL), np.int64)
    for mode in range(35):
        for si, n in enumerate(SIZES):
            for luma in (0, 1):
                out[(mode * 3 + si) * 2 + luma] = _build_w(mode, n, bool(luma))
    return out.astype(np.int32)


def widx(mode: int, n: int, luma: bool) -> int:
    return (mode * 3 + SIZES.index(n)) * 2 + int(luma)


@functools.lru_cache(maxsize=1)
def filter_table() -> np.ndarray:
    """[3, 65, 65] smoothing matrices: xf = (A @ x + 2) >> 2 over the
    canonical ref slots (8.4.4.2.3 3-tap; chain ends pass through x4)."""
    out = np.zeros((3, N_REF, N_REF), np.int64)
    for si, n in enumerate(SIZES):
        A = out[si]
        for i in range(N_REF):  # inactive slots: identity
            A[i, i] = 4
        # corner
        A[_COL_CORNER] = 0
        A[_COL_CORNER, _colL(0)] = 1
        A[_COL_CORNER, _COL_CORNER] = 2
        A[_COL_CORNER, _colT(0)] = 1
        for i in range(2 * n - 1):
            A[_colL(i)] = 0
            A[_colL(i), _COL_CORNER if i == 0 else _colL(i - 1)] = 1
            A[_colL(i), _colL(i)] = 2
            A[_colL(i), _colL(i + 1)] = 1
            A[_colT(i)] = 0
            A[_colT(i), _COL_CORNER if i == 0 else _colT(i - 1)] = 1
            A[_colT(i), _colT(i)] = 2
            A[_colT(i), _colT(i + 1)] = 1
        # i = 2n-1 endpoints stay identity x4
    return out.astype(np.int32)


@functools.lru_cache(maxsize=1)
def dc_table() -> np.ndarray:
    """[3, 65] rows: dcsum = dcw @ x; dc = (dcsum + n) >> (lg+1)."""
    out = np.zeros((3, N_REF), np.int64)
    for si, n in enumerate(SIZES):
        for i in range(n):
            out[si, _colL(i)] = 1
            out[si, _colT(i)] = 1
    return out.astype(np.int32)


@functools.lru_cache(maxsize=1)
def m_table() -> np.ndarray:
    """[4, 16, 16] inverse-transform matrices padded into 16x16:
    0=DST4 (luma 4x4), 1=DCT4, 2=DCT8, 3=DCT16."""
    out = np.zeros((4, 16, 16), np.int64)
    out[0, :4, :4] = DST4
    out[1, :4, :4] = DCT[4]
    out[2, :8, :8] = DCT[8]
    out[3, :16, :16] = DCT[16]
    return out.astype(np.int32)


def m_index(n: int, cidx: int) -> int:
    if n == 4:
        return 0 if cidx == 0 else 1
    return {8: 2, 16: 3}[n]


def quant_scale(qp: int) -> int:
    return 16 * int(LEVEL_SCALE[qp % 6]) << (qp // 6)


# ---------------------------------------------------------------------------
# 32x32 TU class (luma only in 4:2:0 — chroma TUs cap at half the luma
# size).  Separate table set so the hot 4/8/16 class keeps its small
# per-step weight stream; the 32 class uses SHIFT32 = 6 (planar's
# natural shift at n=32) and a 131-column canonical layout:
#   0..63 left, 64 corner, 65..128 top, 129 dc, 130 one.
# ---------------------------------------------------------------------------

N_REF32 = 129
COL32_CORNER = 64
COL32_DC = 129
COL32_ONE = 130
N_COL32 = 131
SHIFT32 = 6


def _col32L(i):
    return i


def _col32T(i):
    return 65 + i


@functools.lru_cache(maxsize=1)
def w_table32() -> np.ndarray:
    """[35, 1024, 131] int32 luma weight matrices at output shift 6."""
    out = np.zeros((35, 1024, N_COL32), np.int64)
    for mode in range(35):
        out[mode] = _build_w_g(mode, 32, True, 32, _col32L, COL32_CORNER,
                               _col32T, COL32_DC, COL32_ONE, N_COL32,
                               SHIFT32)
    return out.astype(np.int32)


@functools.lru_cache(maxsize=1)
def filter_table32() -> np.ndarray:
    """[129, 129] 3-tap smoothing over the 32-class canonical slots
    (xf = (A @ x + 2) >> 2; chain endpoints i = 63 pass through x4)."""
    A = np.zeros((N_REF32, N_REF32), np.int64)
    for i in range(N_REF32):
        A[i, i] = 4
    A[COL32_CORNER] = 0
    A[COL32_CORNER, _col32L(0)] = 1
    A[COL32_CORNER, COL32_CORNER] = 2
    A[COL32_CORNER, _col32T(0)] = 1
    for i in range(63):
        A[_col32L(i)] = 0
        A[_col32L(i), COL32_CORNER if i == 0 else _col32L(i - 1)] = 1
        A[_col32L(i), _col32L(i)] = 2
        A[_col32L(i), _col32L(i + 1)] = 1
        A[_col32T(i)] = 0
        A[_col32T(i), COL32_CORNER if i == 0 else _col32T(i - 1)] = 1
        A[_col32T(i), _col32T(i)] = 2
        A[_col32T(i), _col32T(i + 1)] = 1
    return A.astype(np.int32)


@functools.lru_cache(maxsize=1)
def dc_table32() -> np.ndarray:
    """[129]: dcsum = dcw @ x; dc = (dcsum + 32) >> 6."""
    out = np.zeros(N_REF32, np.int64)
    for i in range(32):
        out[_col32L(i)] = 1
        out[_col32T(i)] = 1
    return out.astype(np.int32)


@functools.lru_cache(maxsize=1)
def m_table32() -> np.ndarray:
    """[32, 32] DCT-32 inverse-transform matrix (8.6.4)."""
    from .ref_recon import DCT

    return DCT[32].astype(np.int32)
