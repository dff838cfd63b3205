"""Spec-faithful numpy HEVC deblocking filter (8.7.2), all-intra scope.

Unlike H.264's macroblock-sequential filter, HEVC deblocking is
picture-based and two-pass — ALL vertical edges first, then ALL
horizontal edges — and edges sit on an 8x8 grid while a filter touches
at most 3 samples per side, so edges never interact within a pass.
That makes the whole filter dense data-parallel work (the JAX port in
recon_jax is a direct vectorization of this file).

All-intra streams give bS=2 on every transform-block edge, which also
means every chroma TU edge on the 16-luma-sample grid filters.

Ground-truth chain anchor: libavcodec == this numpy filter == the JAX
deblock (tests/test_hevc_deblock.py, test_hevc_jax.py).
"""

from __future__ import annotations

import numpy as np

# Table 8-12 (derivation of beta' and tc' from Q)
BETA_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
     26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
     58, 60, 62, 64], np.int32)
TC_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4,
     5, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24], np.int32)

# 4:2:0 chroma QP mapping (Table 8-10), shared with the entropy decoder
_CHROMA_QP = np.array(
    [29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37], np.int32)


def chroma_qp_from_luma(qpi: int) -> int:
    if qpi < 30:
        return qpi
    if qpi > 43:
        return qpi - 6
    return int(_CHROMA_QP[qpi - 30])


def edge_maps(t, frame_idx: int):
    """Luma transform-edge flags on the 4x4 grid: (ver[h4, w4],
    hor[h4, w4]).  ver[y4, x4] marks an edge on the LEFT side of 4x4
    block (x4, y4); only columns on the 8 grid are ever set (8.7.2.2).
    Intra-only: prediction edges are a subset of transform edges."""
    h4, w4 = (t.height + 3) >> 2, (t.width + 3) >> 2
    ver = np.zeros((h4, w4), bool)
    hor = np.zeros((h4, w4), bool)
    lo = int(t.tu_off[frame_idx])
    for i in range(lo, lo + int(t.n_tu[frame_idx])):
        if t.tu_cidx[i] != 0:
            continue
        x0, y0 = int(t.tu_x[i]), int(t.tu_y[i])
        n = 1 << int(t.tu_log2[i])
        y4a, y4b = y0 >> 2, min((y0 + n) >> 2, h4)
        x4a, x4b = x0 >> 2, min((x0 + n) >> 2, w4)
        if x0 > 0 and x0 % 8 == 0:
            ver[y4a:y4b, x4a] = True
        if y0 > 0 and y0 % 8 == 0:
            hor[y4a, x4a:x4b] = True
    return ver, hor


def bs_maps(t, frame_idx: int):
    """Boundary strengths on the 4x4 segment grid: (bs_v, bs_h), each
    [h4, w4] int32 in {0, 1, 2}.  Computed by the host entropy decoder
    (8.7.2.4, native compute_bs) for every frame; intra frames carry 2
    on all transform edges, inter frames the MV/cbf-derived values."""
    if getattr(t, "bs_map", None) is not None:
        m = np.asarray(t.bs_map[frame_idx], np.int32)
        return m[..., 0], m[..., 1]
    ver, hor = edge_maps(t, frame_idx)
    return ver.astype(np.int32) * 2, hor.astype(np.int32) * 2


def _clip3(lo, hi, v):
    return np.minimum(np.maximum(v, lo), hi)


def _filter_luma_segment(p, q, beta, tc):
    """One 4-row luma edge segment.  p[row, i] = p_i, q[row, i] = q_i
    (int32, 4 rows x 4 samples each side).  Returns filtered (p, q)."""
    dp = np.abs(p[:, 2] - 2 * p[:, 1] + p[:, 0])
    dq = np.abs(q[:, 2] - 2 * q[:, 1] + q[:, 0])
    d = dp[0] + dq[0] + dp[3] + dq[3]
    if d >= beta:
        return p, q
    strong = True
    for i in (0, 3):
        if not (2 * (dp[i] + dq[i]) < (beta >> 2)
                and abs(p[i, 3] - p[i, 0]) + abs(q[i, 0] - q[i, 3])
                < (beta >> 3)
                and abs(p[i, 0] - q[i, 0]) < ((5 * tc + 1) >> 1)):
            strong = False
    p, q = p.copy(), q.copy()
    if strong:
        p0, p1, p2, p3 = (p[:, i].copy() for i in range(4))
        q0, q1, q2, q3 = (q[:, i].copy() for i in range(4))
        p[:, 0] = _clip3(p0 - 2 * tc, p0 + 2 * tc,
                         (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
        p[:, 1] = _clip3(p1 - 2 * tc, p1 + 2 * tc,
                         (p2 + p1 + p0 + q0 + 2) >> 2)
        p[:, 2] = _clip3(p2 - 2 * tc, p2 + 2 * tc,
                         (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
        q[:, 0] = _clip3(q0 - 2 * tc, q0 + 2 * tc,
                         (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3)
        q[:, 1] = _clip3(q1 - 2 * tc, q1 + 2 * tc,
                         (q2 + q1 + q0 + p0 + 2) >> 2)
        q[:, 2] = _clip3(q2 - 2 * tc, q2 + 2 * tc,
                         (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)
        return p, q
    # weak filter (8.7.2.5.7, nDp/nDq side decisions at segment level)
    dEp = (dp[0] + dp[3]) < ((beta + (beta >> 1)) >> 3)
    dEq = (dq[0] + dq[3]) < ((beta + (beta >> 1)) >> 3)
    p0, p1, p2 = p[:, 0].copy(), p[:, 1].copy(), p[:, 2].copy()
    q0, q1, q2 = q[:, 0].copy(), q[:, 1].copy(), q[:, 2].copy()
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    on = np.abs(delta) < tc * 10
    dc = _clip3(-tc, tc, delta)
    p[:, 0] = np.where(on, _clip3(0, 255, p0 + dc), p0)
    q[:, 0] = np.where(on, _clip3(0, 255, q0 - dc), q0)
    if dEp:
        dp1 = _clip3(-(tc >> 1), tc >> 1,
                     (((p2 + p0 + 1) >> 1) - p1 + dc) >> 1)
        p[:, 1] = np.where(on, _clip3(0, 255, p1 + dp1), p1)
    if dEq:
        dq1 = _clip3(-(tc >> 1), tc >> 1,
                     (((q2 + q0 + 1) >> 1) - q1 - dc) >> 1)
        q[:, 1] = np.where(on, _clip3(0, 255, q1 + dq1), q1)
    return p, q


def deblock_frame(y, cb, cr, t, frame_idx: int):
    """Returns deblocked (y, cb, cr) uint8 planes (coded size)."""
    if t.deblock_disabled[frame_idx]:
        return y, cb, cr
    H, W = t.height, t.width
    qp = t.qp_map[frame_idx].astype(np.int32)
    beta_off2 = int(t.dbf[frame_idx, 0]) * 2
    tc_off2 = int(t.dbf[frame_idx, 1]) * 2
    cqpo = (int(t.dbf[frame_idx, 2]), int(t.dbf[frame_idx, 3]))
    bs_v, bs_h = bs_maps(t, frame_idx)
    ver, hor = bs_v > 0, bs_h > 0

    def luma_pass(plane, edges, transpose):
        bs_m = (bs_h.T if transpose else bs_v)
        pl = plane.astype(np.int32)
        if transpose:
            pl = pl.T
            edges = edges.T
        h, w = pl.shape
        for x in range(8, w - 3, 8):
            for y4 in range(0, h >> 2):
                if not edges[y4, x >> 2]:
                    continue
                r = y4 * 4
                if r + 4 > h:
                    continue
                qpl = (qp.T if transpose else qp)[y4, (x - 1) >> 2]
                qpq = (qp.T if transpose else qp)[y4, x >> 2]
                bs = int(bs_m[y4, x >> 2])
                qavg = (int(qpl) + int(qpq) + 1) >> 1
                beta = int(BETA_TABLE[min(max(qavg + beta_off2, 0), 51)])
                tc = int(TC_TABLE[min(max(
                    qavg + 2 * (bs - 1) + tc_off2, 0), 53)])
                if beta == 0:
                    continue
                p = pl[r:r + 4, x - 4:x][:, ::-1]  # p[row, i] = col x-1-i
                q = pl[r:r + 4, x:x + 4]
                fp, fq = _filter_luma_segment(p, q, beta, tc)
                pl[r:r + 4, x - 4:x] = fp[:, ::-1]
                pl[r:r + 4, x:x + 4] = fq
        pl = np.clip(pl, 0, 255).astype(np.uint8)
        return pl.T if transpose else pl

    def chroma_pass(plane, edges, transpose, off):
        bs_m = (bs_h.T if transpose else bs_v)
        pl = plane.astype(np.int32)
        if transpose:
            pl = pl.T
            edges = edges.T
        h, w = pl.shape  # chroma dims
        for x in range(8, w - 1, 8):     # chroma 8 = luma 16
            for y4 in range(0, h >> 2):  # 4-row chroma segments
                # edge flags live on the LUMA 4x4 grid; chroma filters
                # only at bS == 2
                if bs_m[y4 * 2, (x * 2) >> 2] != 2:
                    continue
                r = y4 * 4
                if r + 4 > h:
                    continue
                qg = qp.T if transpose else qp
                qpl = qg[y4 * 2, (x * 2 - 1) >> 2]
                qpq = qg[y4 * 2, (x * 2) >> 2]
                qpi = min(max(((int(qpl) + int(qpq) + 1) >> 1) + off, 0), 57)
                qpc = chroma_qp_from_luma(qpi)
                tc = int(TC_TABLE[min(max(qpc + 2 + tc_off2, 0), 53)])
                if tc == 0:
                    continue
                p1 = pl[r:r + 4, x - 2]
                p0 = pl[r:r + 4, x - 1]
                q0 = pl[r:r + 4, x]
                q1 = pl[r:r + 4, x + 1]
                delta = _clip3(-tc, tc,
                               ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3))
                pl[r:r + 4, x - 1] = _clip3(0, 255, p0 + delta)
                pl[r:r + 4, x] = _clip3(0, 255, q0 - delta)
        pl = np.clip(pl, 0, 255).astype(np.uint8)
        return pl.T if transpose else pl

    del H, W
    y = luma_pass(y, ver, False)
    y = luma_pass(y, hor, True)
    cb2 = chroma_pass(cb, ver, False, cqpo[0])
    cr2 = chroma_pass(cr, ver, False, cqpo[1])
    cb2 = chroma_pass(cb2, hor, True, cqpo[0])
    cr2 = chroma_pass(cr2, hor, True, cqpo[1])
    return y, cb2, cr2


# ---------------------------------------------------------------------------
# Per-edge parameter planes for the device filter (recon_jax._deblock).
# Everything QP/edge-map dependent resolves here on the host; the device
# pass is pure dense arithmetic.
# ---------------------------------------------------------------------------

def deblock_params(t, frame_idx: int):
    """Dense per-edge beta/tc planes for one frame.

    Returns dict with, for K = W//8 - 1 interior vertical edge columns
    and Kh = H//8 - 1 horizontal edge rows (luma 4-sample segments):
      lv_beta/lv_tc [h4, K]  lh_beta/lh_tc [Kh, w4]
      cv_tc [hc4, Kc, 2]     ch_tc [Kch, wc4, 2]   (last dim: Cb, Cr)
    Zeroed everywhere there is no edge (tc=0 AND beta=0 disables both
    filters).  All-disabled frames return all-zero planes."""
    H, W = t.height, t.width
    h4, w4 = (H + 3) >> 2, (W + 3) >> 2
    K, Kh = max(W // 8 - 1, 0), max(H // 8 - 1, 0)
    Hc, Wc = H // 2, W // 2
    hc4, wc4 = Hc >> 2, Wc >> 2
    # chroma dims are multiples of 4: the last edge can sit 4 from the
    # plane end (q1 still in-plane), so the count is (Wc-2)//8, which
    # equals the device pass's padded-block count
    Kc, Kch = max((Wc - 2) // 8, 0), max((Hc - 2) // 8, 0)
    out = {
        "lv_beta": np.zeros((h4, K), np.int32),
        "lv_tc": np.zeros((h4, K), np.int32),
        "lh_beta": np.zeros((Kh, w4), np.int32),
        "lh_tc": np.zeros((Kh, w4), np.int32),
        "cv_tc": np.zeros((hc4, Kc, 2), np.int32),
        "ch_tc": np.zeros((Kch, wc4, 2), np.int32),
    }
    if t.deblock_disabled[frame_idx]:
        return out
    qp = t.qp_map[frame_idx].astype(np.int32)
    beta_off2 = int(t.dbf[frame_idx, 0]) * 2
    tc_off2 = int(t.dbf[frame_idx, 1]) * 2
    cqpo = (int(t.dbf[frame_idx, 2]), int(t.dbf[frame_idx, 3]))
    bs_v, bs_h = bs_maps(t, frame_idx)

    def luma(bs, qpm, beta_out, tc_out, nseg, nedge):
        # edge e is at sample 8*(e+1); P block = 4x4 col 2e+1, Q = 2e+2;
        # luma filters at bS >= 1 with tc Q = qavg + 2*(bS-1) (8.7.2.5.3)
        for e in range(nedge):
            qavg = (qpm[:nseg, 2 * e + 1] + qpm[:nseg, 2 * e + 2] + 1) >> 1
            b = bs[:nseg, 2 * e + 2]
            on = b > 0
            qb = np.clip(qavg + beta_off2, 0, 51)
            qt = np.clip(qavg + 2 * (np.maximum(b, 1) - 1) + tc_off2, 0, 53)
            beta_out[:nseg, e] = np.where(on, BETA_TABLE[qb], 0)
            tc_out[:nseg, e] = np.where(on, TC_TABLE[qt], 0)

    luma(bs_v, qp, out["lv_beta"], out["lv_tc"], h4, K)
    luma(bs_h.T, qp.T, out["lh_beta"].T, out["lh_tc"].T, w4, Kh)

    def chroma(bs, qpm, tc_out, nseg, nedge):
        # edge e at chroma sample 8*(e+1) = luma 16*(e+1):
        # luma P col 4x4 = 4e+3, Q = 4e+4; luma row = 2*chroma segment;
        # chroma filters only at bS == 2 (8.7.2.3)
        for e in range(nedge):
            for ci in (0, 1):
                qavg = (qpm[: 2 * nseg : 2, 4 * e + 3]
                        + qpm[: 2 * nseg : 2, 4 * e + 4] + 1) >> 1
                qpi = np.clip(qavg + cqpo[ci], 0, 57)
                qpc = np.array([chroma_qp_from_luma(int(v)) for v in qpi],
                               np.int32)
                on = bs[: 2 * nseg : 2, 4 * e + 4] == 2
                qt = np.clip(qpc + 2 + tc_off2, 0, 53)
                tc_out[:nseg, e, ci] = np.where(on, TC_TABLE[qt], 0)

    chroma(bs_v, qp, out["cv_tc"], hc4, Kc)
    chroma(bs_h.T, qp.T,
           np.swapaxes(out["ch_tc"], 0, 1), wc4, Kch)
    return out


# ---------------------------------------------------------------------------
# SAO (8.7.3) — sample adaptive offset, applied to the deblocked picture.
# Pure per-pixel map: band offsets by intensity band, edge offsets by
# local min/max category along a per-CTB direction.  No sequential
# structure at all (neighbors read the PRE-SAO picture).
# ---------------------------------------------------------------------------

_EO_NEIGHBORS = ((0, -1, 0, 1), (-1, 0, 1, 0),
                 (-1, -1, 1, 1), (-1, 1, 1, -1))  # (dy0,dx0,dy1,dx1)


def sao_frame(y, cb, cr, t, frame_idx: int):
    """Returns SAO-filtered (y, cb, cr) uint8 planes."""
    sao = t.sao[frame_idx].astype(np.int32)  # [ctb_h, ctb_w, 3, 6]
    if not sao[..., 0].any():
        return y, cb, cr
    out = []
    for ci, pl in enumerate((y, cb, cr)):
        n = 1 << (t.ctb_log2 - (0 if ci == 0 else 1))
        p = pl.astype(np.int32)
        H, W = p.shape
        res = p.copy()
        # per-class category maps over the whole plane (boundary samples
        # whose neighbor leaves the picture take category 0)
        pp = np.pad(p, 1)
        cats = []
        for dy0, dx0, dy1, dx1 in _EO_NEIGHBORS:
            a = pp[1 + dy0:1 + dy0 + H, 1 + dx0:1 + dx0 + W]
            b = pp[1 + dy1:1 + dy1 + H, 1 + dx1:1 + dx1 + W]
            raw = 2 + np.sign(p - a) + np.sign(p - b)
            cat = np.where(raw == 2, 0, np.where(raw < 2, raw + 1, raw))
            valid = np.ones((H, W), bool)
            if dx0:
                valid[:, 0] = valid[:, -1] = False
            if dy0 or dy1:
                valid[0, :] = valid[-1, :] = False
            cats.append(np.where(valid, cat, 0))
        band = p >> 3
        for ry in range(sao.shape[0]):
            for rx in range(sao.shape[1]):
                typ = sao[ry, rx, ci, 0]
                if typ == 0:
                    continue
                offs = sao[ry, rx, ci, 1:5]
                pc = sao[ry, rx, ci, 5]
                ys, xs = ry * n, rx * n
                ye, xe = min(ys + n, H), min(xs + n, W)
                blk = p[ys:ye, xs:xe]
                add = np.zeros_like(blk)
                if typ == 1:
                    rel = (band[ys:ye, xs:xe] - pc) & 31
                    for k in range(4):
                        add += np.where(rel == k, offs[k], 0)
                else:
                    cat = cats[pc][ys:ye, xs:xe]
                    for k in range(4):
                        add += np.where(cat == k + 1, offs[k], 0)
                res[ys:ye, xs:xe] = np.clip(blk + add, 0, 255)
        out.append(res.astype(np.uint8))
    return tuple(out)
