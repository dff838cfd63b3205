"""Spec-faithful numpy reconstruction for HEVC I/P/B frames.

Consumes the TU-entry + PU streams from HevcEntropyDecoder (entropy.py)
and reconstructs pixels: intra prediction (H.265 8.4.4), inter
prediction (8.5.3.3: 8-tap luma quarter-pel / 4-tap chroma eighth-pel
at 14-bit intermediate precision, default and explicit weighted
combination), dequantization (8.6.3) and inverse transforms (8.6.4,
DST-4 + DCT 4/8/16/32).  In-loop filters are not applied — use fixtures
encoded with deblock and SAO disabled; references are then identical to
the unfiltered recon.

Role: ground-truth chain anchor, mirroring models/h264/ref_recon.py —
libavcodec (oracle) == this numpy recon == the JAX recon.
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
# Inter prediction (8.5.3.3)
# ---------------------------------------------------------------------------

# Table 8-12: luma 8-tap filters by quarter-pel fraction
_LF = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], np.int64)

# Table 8-13: chroma 4-tap filters by eighth-pel fraction
_CF = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], np.int64)


def _mc_block(ref, x0, y0, nW, nH, mvx, mvy, filt, frac_bits):
    """14-bit-scale prediction block (8.5.3.3.3, 8-bit input).

    ref: [H, W] uint8 plane.  (x0, y0): block origin on this plane's
    grid.  mv in units of 1/(1<<frac_bits) samples (2 = luma qpel,
    3 = chroma 1/8).  filt: [nfrac, taps] filter bank.
    """
    H, W = ref.shape
    taps = filt.shape[1]
    center = taps // 2 - 1
    xi = x0 + (mvx >> frac_bits)
    yi = y0 + (mvy >> frac_bits)
    fx = mvx & ((1 << frac_bits) - 1)
    fy = mvy & ((1 << frac_bits) - 1)
    r = ref.astype(np.int64)
    if fx == 0 and fy == 0:
        ys = np.clip(yi + np.arange(nH), 0, H - 1)
        xs = np.clip(xi + np.arange(nW), 0, W - 1)
        return r[np.ix_(ys, xs)] << 6
    if fy == 0:
        ys = np.clip(yi + np.arange(nH), 0, H - 1)
        xs = np.clip(xi - center + np.arange(nW + taps - 1), 0, W - 1)
        win = r[np.ix_(ys, xs)]
        f = filt[fx]
        return sum(int(f[t]) * win[:, t:t + nW] for t in range(taps))
    if fx == 0:
        ys = np.clip(yi - center + np.arange(nH + taps - 1), 0, H - 1)
        xs = np.clip(xi + np.arange(nW), 0, W - 1)
        win = r[np.ix_(ys, xs)]
        f = filt[fy]
        return sum(int(f[t]) * win[t:t + nH, :] for t in range(taps))
    ys = np.clip(yi - center + np.arange(nH + taps - 1), 0, H - 1)
    xs = np.clip(xi - center + np.arange(nW + taps - 1), 0, W - 1)
    win = r[np.ix_(ys, xs)]
    fh = filt[fx]
    tmp = sum(int(fh[t]) * win[:, t:t + nW] for t in range(taps))
    fv = filt[fy]
    return sum(int(fv[t]) * tmp[t:t + nH, :] for t in range(taps)) >> 6


def _combine(p0, p1, w0, w1, luma, cidx):
    """Weighted sample prediction (8.5.3.3.4) -> uint8 block.

    p0/p1: 14-bit-scale predictions (p1 None for uni).  w0/w1: weight
    rows (lw, lo, cw0, co0, cw1, co1, luma_denom, chroma_denom) or None
    for default weights.
    """
    def wpar(w):
        if luma:
            return int(w[0]), int(w[1]), int(w[6]) + 6
        return int(w[2 * cidx]), int(w[2 * cidx + 1]), int(w[7]) + 6

    if p1 is None:
        if w0 is None:
            return np.clip((p0 + 32) >> 6, 0, 255).astype(np.uint8)
        wv, off, lw = wpar(w0)
        v = ((p0 * wv + (1 << (lw - 1))) >> lw) + off
        return np.clip(v, 0, 255).astype(np.uint8)
    if w0 is None or w1 is None:
        return np.clip((p0 + p1 + 64) >> 7, 0, 255).astype(np.uint8)
    wv0, o0, lw = wpar(w0)
    wv1, o1, _ = wpar(w1)
    v = (p0 * wv0 + p1 * wv1 + ((o0 + o1 + 1) << lw)) >> (lw + 1)
    return np.clip(v, 0, 255).astype(np.uint8)


def inter_predict_frame(t, frame_idx, refs):
    """Dense inter prediction planes for one frame from its PU stream.

    refs: dict span decode index -> (y, u, v) uint8 planes.  Returns
    (pred_y, pred_u, pred_v) uint8 with inter-PU areas filled.
    """
    W, H = t.width, t.height
    py = np.zeros((H, W), np.uint8)
    pu_ = np.zeros((H // 2, W // 2), np.uint8)
    pv = np.zeros((H // 2, W // 2), np.uint8)
    lo = int(t.pu_off[frame_idx])
    hi = lo + int(t.n_pu[frame_idx])
    wp = t.wp_rows[frame_idx] if t.wp_rows is not None else None
    for i in range(lo, hi):
        x, y = int(t.pu_x[i]), int(t.pu_y[i])
        w, h = int(t.pu_w[i]), int(t.pu_h[i])
        pf = int(t.pu_flags[i])
        mv = t.pu_mv[i]
        preds = []   # (pred_y14, pred_u14, pred_v14, wrow)
        for li, (bit, ref_arr, wp_arr) in enumerate(
                ((1, t.pu_ref0, t.pu_wp0), (2, t.pu_ref1, t.pu_wp1))):
            if not pf & bit:
                continue
            ry, ru, rv = refs[int(ref_arr[i])]
            mvx, mvy = int(mv[2 * li]), int(mv[2 * li + 1])
            by = _mc_block(ry, x, y, w, h, mvx, mvy, _LF, 2)
            bu = _mc_block(ru, x >> 1, y >> 1, w >> 1, h >> 1, mvx, mvy,
                           _CF, 3)
            bv = _mc_block(rv, x >> 1, y >> 1, w >> 1, h >> 1, mvx, mvy,
                           _CF, 3)
            wrow = None
            if wp is not None and int(wp_arr[i]) != 255:
                wrow = wp[int(wp_arr[i])]
            preds.append((by, bu, bv, wrow))
        if not preds:
            continue
        if len(preds) == 1:
            b, w0 = preds[0][:3], preds[0][3]
            py[y:y + h, x:x + w] = _combine(b[0], None, w0, None, True, 0)
            pu_[y >> 1:(y >> 1) + (h >> 1), x >> 1:(x >> 1) + (w >> 1)] = \
                _combine(b[1], None, w0, None, False, 1)
            pv[y >> 1:(y >> 1) + (h >> 1), x >> 1:(x >> 1) + (w >> 1)] = \
                _combine(b[2], None, w0, None, False, 2)
        else:
            (b0, w0), (b1, w1) = (preds[0][:3], preds[0][3]), \
                (preds[1][:3], preds[1][3])
            py[y:y + h, x:x + w] = _combine(b0[0], b1[0], w0, w1, True, 0)
            pu_[y >> 1:(y >> 1) + (h >> 1), x >> 1:(x >> 1) + (w >> 1)] = \
                _combine(b0[1], b1[1], w0, w1, False, 1)
            pv[y >> 1:(y >> 1) + (h >> 1), x >> 1:(x >> 1) + (w >> 1)] = \
                _combine(b0[2], b1[2], w0, w1, False, 2)
    return py, pu_, pv


# ---------------------------------------------------------------------------
# Frame reconstruction driver
# ---------------------------------------------------------------------------

def reconstruct_frame(t, frame_idx: int, strong_smoothing: bool = True,
                      refs=None):
    """Reconstruct one frame from HevcGopTensors.  Returns (y, cb, cr)
    uint8 planes at coded size (apply t.crop for display).

    refs: dict span decode index -> (y, u, v) reconstructed planes of
    earlier frames (required for P/B frames).
    """
    W, H = t.width, t.height
    planes = [np.zeros((H, W), np.uint8),
              np.zeros((H // 2, W // 2), np.uint8),
              np.zeros((H // 2, W // 2), np.uint8)]
    dones = []
    for pl in planes:
        ph, pw = pl.shape
        dones.append(np.zeros(((ph + 3) >> 2) * ((pw + 3) >> 2), np.uint8))

    ipred = None
    if t.n_pu is not None and int(t.n_pu[frame_idx]) > 0:
        ipred = inter_predict_frame(t, frame_idx, refs or {})

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
        if mode == 255:  # inter TU: prediction comes from the MC planes
            pred = ipred[cidx][y0:y0 + n, x0:x0 + n].astype(np.int64)
        else:
            pred = intra_predict(plane, done, x0, y0, n, mode, cidx,
                                 strong_smoothing)
        if t.tu_cbf[i]:
            off = int(t.tu_coef_off[i])
            coeff = t.coeff[off:off + n * n].reshape(n, n)
            d = dequant(coeff, qp, log2)
            res = inverse_transform(
                d, log2, dst=(cidx == 0 and n == 4 and mode != 255))
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


def reconstruct_gop(t, strong_smoothing: bool = True):
    """Reconstruct every frame of a span in decode order, feeding each
    reconstruction back as reference.  Returns list of (y, u, v)."""
    refs = {}
    out = []
    for f in range(t.n_frames):
        if t.frame_type is not None and t.frame_type[f] == 3:
            out.append(None)  # skipped RASL
            continue
        y, u, v = reconstruct_frame(t, f, strong_smoothing, refs)
        refs[f] = (y, u, v)
        out.append((y, u, v))
    return out
