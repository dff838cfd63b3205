"""Spec-faithful numpy reconstruction for HEVC I frames.

Consumes the TU-entry stream from HevcEntropyDecoder (entropy.py) and
reconstructs pixels: intra prediction (H.265 8.4.4), dequantization
(8.6.3) and inverse transforms (8.6.4, DST-4 + DCT 4/8/16/32).  In-loop
filters are not applied — use fixtures encoded with deblock and SAO
disabled (the entropy layer refuses SAO-enabled slices and reports the
deblock flag so callers can detect a mismatch).

Role: ground-truth chain anchor, mirroring models/h264/ref_recon.py —
libavcodec (oracle) == this numpy recon == (next round) the JAX recon.
Debug entropy/codec issues here; it is readable and steppable.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Transform matrices (8.6.4).  The DCT-II matrices are defined by the
# antisymmetric extension of the 32-point first column (hand-tuned spec
# integers — NOT pure cosine rounding: e.g. M4[1] = {83, 36}, where
# rounding 64*sqrt(2)*cos gives {84, 35}).
# ---------------------------------------------------------------------------

_C32 = [64, 90, 90, 90, 89, 88, 87, 85, 83, 82, 80, 78, 75, 73, 70, 67,
        64, 61, 57, 54, 50, 46, 43, 38, 36, 31, 25, 22, 18, 13, 9, 4]


def _dct_entry(k: int, n: int) -> int:
    g = (k * (2 * n + 1)) % 128
    if g <= 32:
        return _C32[g] if g < 32 else 0
    if g < 64:
        return -(_C32[64 - g] if 64 - g < 32 else 0)
    if g <= 96:
        return -(_C32[g - 64] if g - 64 < 32 else 0)
    return _C32[128 - g] if 128 - g < 32 else 0


def _dct_matrix(n: int) -> np.ndarray:
    step = 32 // n
    return np.array(
        [[_dct_entry(k * step, j) for j in range(n)] for k in range(n)],
        np.int64,
    )


DCT = {n: _dct_matrix(n) for n in (4, 8, 16, 32)}
DST4 = np.array(
    [[29, 55, 74, 84], [74, 74, 0, -74], [84, -29, -74, 55],
     [55, -84, 74, -29]], np.int64)

LEVEL_SCALE = np.array([40, 45, 51, 57, 64, 72], np.int64)


def dequant(coeff: np.ndarray, qp: int, log2: int) -> np.ndarray:
    """8.6.3 with flat (16) scaling lists, 8-bit."""
    bd_shift = log2 + 3  # BitDepth + Log2(nTbS) - 5
    scale = 16 * int(LEVEL_SCALE[qp % 6]) << (qp // 6)
    d = (coeff.astype(np.int64) * scale + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(d, -32768, 32767)


def inverse_transform(d: np.ndarray, log2: int, dst: bool) -> np.ndarray:
    """8.6.4: two-stage inverse with intermediate clipping (8-bit)."""
    m = DST4 if dst else DCT[1 << log2]
    # stage 1 (columns): E = M^T @ D, shift 7
    e = (m.T @ d.astype(np.int64) + 64) >> 7
    e = np.clip(e, -32768, 32767)
    # stage 2 (rows): R = E @ M, shift 20 - BitDepth = 12
    r = (e @ m + (1 << 11)) >> 12
    return np.clip(r, -32768, 32767)


# ---------------------------------------------------------------------------
# Intra prediction (8.4.4)
# ---------------------------------------------------------------------------

_ANGLE = [32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21, -26,
          -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13, 17, 21, 26,
          32]  # modes 2..34
_INV_ANGLE = {11: -4096, 12: -1638, 13: -910, 14: -630, 15: -482, 16: -390,
              17: -315, 18: -256, 19: -315, 20: -390, 21: -482, 22: -630,
              23: -910, 24: -1638, 25: -4096}


def _gather_refs(plane, done, x0, y0, n):
    """Reference samples p[-1][-1..2n-1] / p[0..2n-1][-1] with the
    8.4.4.2.2 substitution.  Returns (left[2n], corner, top[2n])."""
    H, W = plane.shape
    w4 = (W + 3) >> 2

    def avail(x, y):
        if x < 0 or y < 0 or x >= W or y >= H:
            return False
        return bool(done[(y >> 2) * w4 + (x >> 2)])

    # search order: p[-1][2n-1] up to p[-1][-1], then p[0][-1]..p[2n-1][-1]
    coords = [(x0 - 1, y0 + i) for i in range(2 * n - 1, -1, -1)]
    coords.append((x0 - 1, y0 - 1))
    coords += [(x0 + i, y0 - 1) for i in range(2 * n)]
    vals = np.empty(len(coords), np.int32)
    ok = np.empty(len(coords), bool)
    for i, (x, y) in enumerate(coords):
        a = avail(x, y)
        ok[i] = a
        vals[i] = int(plane[y, x]) if a else 0
    if not ok.any():
        vals[:] = 128
    else:
        if not ok[0]:
            vals[0] = vals[np.argmax(ok)]
            ok[0] = True
        for i in range(1, len(coords)):
            if not ok[i]:
                vals[i] = vals[i - 1]
    left = vals[:2 * n][::-1].copy()  # left[i] = p[-1][y0+i]
    corner = int(vals[2 * n])
    top = vals[2 * n + 1:].copy()     # top[i] = p[x0+i][-1]
    return left, corner, top


def _filter_refs(left, corner, top, n, mode, strong_ok):
    """8.4.4.2.3 reference smoothing (luma only)."""
    if mode == 1 or n == 4:
        return left, corner, top
    min_dist = min(abs(mode - 26), abs(mode - 10))
    thres = {8: 7, 16: 1, 32: 0}[n]
    if min_dist <= thres:
        return left, corner, top
    if n == 32 and strong_ok:
        bi_int = abs(corner + int(top[2 * n - 1]) - 2 * int(top[n - 1])) < 8
        bi_left = abs(corner + int(left[2 * n - 1]) - 2 * int(left[n - 1])) < 8
        if bi_int and bi_left:
            fl = np.empty_like(left)
            ft = np.empty_like(top)
            for i in range(2 * n - 1):
                ft[i] = (corner * (63 - i) + int(top[2 * n - 1]) * (i + 1)
                         + 32) >> 6
                fl[i] = (corner * (63 - i) + int(left[2 * n - 1]) * (i + 1)
                         + 32) >> 6
            ft[2 * n - 1] = top[2 * n - 1]
            fl[2 * n - 1] = left[2 * n - 1]
            return fl, corner, ft
    fl = left.copy()
    ft = top.copy()
    fl[0] = (int(corner) + 2 * int(left[0]) + int(left[1]) + 2) >> 2
    for i in range(1, 2 * n - 1):
        fl[i] = (int(left[i - 1]) + 2 * int(left[i]) + int(left[i + 1])
                 + 2) >> 2
    ft[0] = (int(corner) + 2 * int(top[0]) + int(top[1]) + 2) >> 2
    for i in range(1, 2 * n - 1):
        ft[i] = (int(top[i - 1]) + 2 * int(top[i]) + int(top[i + 1])
                 + 2) >> 2
    fc = (int(left[0]) + 2 * int(corner) + int(top[0]) + 2) >> 2
    return fl, fc, ft


def intra_predict(plane, done, x0, y0, n, mode, cidx, strong_smoothing):
    """8.4.4.2.4-6: returns the n x n prediction block (int32)."""
    left, corner, top = _gather_refs(plane, done, x0, y0, n)
    if cidx == 0:
        left, corner, top = _filter_refs(left, corner, top, n, mode,
                                         strong_smoothing)
    left = left.astype(np.int64)
    top = top.astype(np.int64)
    pred = np.zeros((n, n), np.int64)  # [y][x]
    if mode == 0:  # planar (8.4.4.2.4)
        lg = n.bit_length() - 1
        for yy in range(n):
            for xx in range(n):
                pred[yy, xx] = ((n - 1 - xx) * left[yy] + (xx + 1) * top[n]
                                + (n - 1 - yy) * top[xx]
                                + (yy + 1) * left[n] + n) >> (lg + 1)
    elif mode == 1:  # DC
        dc = (int(left[:n].sum() + top[:n].sum()) + n) >> (
            n.bit_length())  # log2(n) + 1
        pred[:, :] = dc
        if cidx == 0 and n < 32:
            pred[0, 0] = (left[0] + 2 * dc + top[0] + 2) >> 2
            pred[0, 1:] = (top[1:n] + 3 * dc + 2) >> 2
            pred[1:, 0] = (left[1:n] + 3 * dc + 2) >> 2
    else:  # angular 2..34
        ang = _ANGLE[mode - 2]
        if mode >= 18:
            ref = np.zeros(3 * n + 2, np.int64)  # index offset n (ref[-n..2n+1])
            ref[n] = corner
            ref[n + 1:n + 1 + 2 * n] = top[:2 * n]
            if ang < 0 and ((n * ang) >> 5) < -1:
                inv = _INV_ANGLE[mode]
                lo = (n * ang) >> 5
                for x in range(-1, lo - 1, -1):
                    idx = -1 + ((x * inv + 128) >> 8)
                    ref[n + x] = left[idx] if idx >= 0 else corner
            for yy in range(n):
                i_idx = ((yy + 1) * ang) >> 5
                i_fact = ((yy + 1) * ang) & 31
                for xx in range(n):
                    r = n + xx + i_idx + 1
                    pred[yy, xx] = ((32 - i_fact) * ref[r]
                                    + i_fact * ref[r + 1] + 16) >> 5
            if mode == 26 and cidx == 0 and n < 32:
                for yy in range(n):
                    pred[yy, 0] = np.clip(
                        top[0] + ((left[yy] - corner) >> 1), 0, 255)
        else:
            ref = np.zeros(3 * n + 2, np.int64)
            ref[n] = corner
            ref[n + 1:n + 1 + 2 * n] = left[:2 * n]
            if ang < 0 and ((n * ang) >> 5) < -1:
                inv = _INV_ANGLE[mode]
                lo = (n * ang) >> 5
                for x in range(-1, lo - 1, -1):
                    idx = -1 + ((x * inv + 128) >> 8)
                    ref[n + x] = top[idx] if idx >= 0 else corner
            for xx in range(n):
                i_idx = ((xx + 1) * ang) >> 5
                i_fact = ((xx + 1) * ang) & 31
                for yy in range(n):
                    r = n + yy + i_idx + 1
                    pred[yy, xx] = ((32 - i_fact) * ref[r]
                                    + i_fact * ref[r + 1] + 16) >> 5
            if mode == 10 and cidx == 0 and n < 32:
                for xx in range(n):
                    pred[0, xx] = np.clip(
                        left[0] + ((top[xx] - corner) >> 1), 0, 255)
    return pred


# ---------------------------------------------------------------------------
# Frame reconstruction driver
# ---------------------------------------------------------------------------

def reconstruct_frame(t, frame_idx: int, strong_smoothing: bool = True):
    """Reconstruct one frame from HevcGopTensors.  Returns (y, cb, cr)
    uint8 planes at coded size (apply t.crop for display)."""
    W, H = t.width, t.height
    planes = [np.zeros((H, W), np.uint8),
              np.zeros((H // 2, W // 2), np.uint8),
              np.zeros((H // 2, W // 2), np.uint8)]
    dones = []
    for pl in planes:
        ph, pw = pl.shape
        dones.append(np.zeros(((ph + 3) >> 2) * ((pw + 3) >> 2), np.uint8))

    lo = t.tu_off[frame_idx]
    hi = lo + t.n_tu[frame_idx]
    for i in range(lo, hi):
        cidx = int(t.tu_cidx[i])
        x0, y0 = int(t.tu_x[i]), int(t.tu_y[i])
        log2 = int(t.tu_log2[i])
        n = 1 << log2
        mode = int(t.tu_mode[i])
        qp = int(t.tu_qp[i])
        plane = planes[cidx]
        done = dones[cidx]
        ph, pw = plane.shape
        pred = intra_predict(plane, done, x0, y0, n, mode, cidx,
                             strong_smoothing)
        if t.tu_cbf[i]:
            off = int(t.tu_coef_off[i])
            coeff = t.coeff[off:off + n * n].reshape(n, n)
            d = dequant(coeff, qp, log2)
            res = inverse_transform(d, log2, dst=(cidx == 0 and n == 4))
            pred = pred + res
        block = np.clip(pred, 0, 255).astype(np.uint8)
        ny = min(n, ph - y0)
        nx = min(n, pw - x0)
        plane[y0:y0 + ny, x0:x0 + nx] = block[:ny, :nx]
        w4 = (pw + 3) >> 2
        for by in range((ny + 3) >> 2):
            for bx in range((nx + 3) >> 2):
                done[((y0 >> 2) + by) * w4 + (x0 >> 2) + bx] = 1
    return planes[0], planes[1], planes[2]
