"""Vectorized H.264 in-loop deblocking (spec 8.7) in JAX.

The filter order is per-MB raster: for each MB, its 4 vertical edges left
to right, then its 4 horizontal edges top to bottom, with filtered samples
feeding subsequent edges.  Whole-picture "all vertical then all
horizontal" is NOT equivalent (verified empirically): the right neighbor's
left-edge vertical filter touches columns this MB's horizontal filter
reads.  The true dependency graph is MB (x,y) <- (x-1,y), (x+1,y-1), so
the filter runs on the knight-move wavefront (ops/wavefront.py): a scan
over ~mb_w + 2*mb_h steps, each filtering all MBs of a diagonal (x clip
batch) in parallel, 8 luma + 4 chroma edge phases per step.

Parameters (bS, alpha, beta, tc0) for every edge line are precomputed in
one vectorized pass over the SoA metadata before the wavefront runs.

Ground truth: ref_recon.deblock_frame (validated bit-exact against
libavcodec).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import chroma_qp_from_luma
from .wavefront import schedule

_ALPHA = np.array(
    [0] * 16
    + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36, 40,
       45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203, 226,
       255, 255],
    np.int32,
)
_BETA = np.array(
    [0] * 16
    + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11,
       11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18],
    np.int32,
)


def _tc0_table():
    from ..models.h264.ref_recon import _TC0

    return _TC0


# ---------------------------------------------------------------------------
# Per-MB edge parameters
# ---------------------------------------------------------------------------


def _bs_between(meta, mb_q, mb_p, blk_q, blk_p, is_mb_edge):
    """Boundary strength between 4x4 blocks blk_q (of mb_q) and blk_p (of
    mb_p); all arrays broadcastable.  Spec 8.7.2.1 (progressive)."""
    kind = meta["kind"]
    intra_q = (kind[mb_q] >= 2) & (kind[mb_q] <= 4)
    intra_p = (kind[mb_p] >= 2) & (kind[mb_p] <= 4)
    nnz_q = jnp.take_along_axis(meta["nnz"][mb_q], blk_q[..., None], -1)[..., 0]
    nnz_p = jnp.take_along_axis(meta["nnz"][mb_p], blk_p[..., None], -1)[..., 0]
    blk8_q = (blk_q // 8) * 2 + (blk_q % 4) // 2
    blk8_p = (blk_p // 8) * 2 + (blk_p % 4) // 2
    ref_q = jnp.take_along_axis(meta["ref"][mb_q], blk8_q[..., None], -1)[..., 0]
    ref_p = jnp.take_along_axis(meta["ref"][mb_p], blk8_p[..., None], -1)[..., 0]
    mv_q = jnp.take_along_axis(
        meta["mv"][mb_q], blk_q[..., None, None], -2
    )[..., 0, :]
    mv_p = jnp.take_along_axis(
        meta["mv"][mb_p], blk_p[..., None, None], -2
    )[..., 0, :]
    mv_far = (
        (jnp.abs(mv_q[..., 0] - mv_p[..., 0]) >= 4)
        | (jnp.abs(mv_q[..., 1] - mv_p[..., 1]) >= 4)
    )
    return jnp.where(
        intra_q | intra_p,
        jnp.where(is_mb_edge, 4, 3),
        jnp.where(
            (nnz_q > 0) | (nnz_p > 0),
            2,
            jnp.where((ref_q != ref_p) | mv_far, 1, 0),
        ),
    )


def mb_edge_params(meta, mb_w: int, mb_h: int, chroma_qp_offset: int):
    """Precompute per-MB filter parameters for every edge.

    meta: dict of [M]-arrays qp,kind,idc,a_off,b_off,avail + nnz [M,24],
    mv [M,16,2], ref [M,4].

    Returns dict:
      bs_v   [M,4,4]  vertical luma edges x 4 row segments
      tc0_v  [M,4,4]
      ab_v   [M,4,2]  (alpha, beta) per vertical edge
      bs_h, tc0_h, ab_h  (horizontal)
      bs_cv  [M,2,8]  chroma vertical edges per chroma line (Cb==Cr bS)
      tc0_cv [M,2,8], ab_cv [M,2,2]
      bs_ch, tc0_ch, ab_ch
    """
    M = meta["qp"].shape[0]
    m = jnp.arange(M)
    col = m % mb_w
    row = m // mb_w
    qp = meta["qp"].astype(jnp.int32)
    idc = meta["idc"]
    a_off = meta["a_off"].astype(jnp.int32)
    b_off = meta["b_off"].astype(jnp.int32)
    avail = meta["avail"]

    left = jnp.maximum(m - 1, 0)
    top = jnp.maximum(m - mb_w, 0)
    has_left = col > 0
    has_top = row > 0
    left_ok = has_left & ((idc != 2) | (((avail >> 4) & 1) == 1))
    top_ok = has_top & ((idc != 2) | (((avail >> 5) & 1) == 1))
    enabled = idc != 1

    e = jnp.arange(4)
    sg = jnp.arange(4)
    # ---- vertical luma: edge e at x=4e, segments sg (rows 4sg..4sg+3)
    mb_p_v = jnp.where(e[None, :] == 0, left[:, None], m[:, None])  # [M,4]
    blk_q_v = sg[None, None, :] * 4 + e[None, :, None]              # [1,4,4]
    blk_p_v = sg[None, None, :] * 4 + jnp.where(e == 0, 3, e - 1)[None, :, None]
    bs_v = _bs_between(
        meta,
        jnp.broadcast_to(m[:, None, None], (M, 4, 4)),
        jnp.broadcast_to(mb_p_v[:, :, None], (M, 4, 4)),
        jnp.broadcast_to(blk_q_v, (M, 4, 4)),
        jnp.broadcast_to(blk_p_v, (M, 4, 4)),
        (e == 0)[None, :, None],
    )
    gate_v = enabled[:, None] & ((e[None, :] != 0) | left_ok[:, None])
    bs_v = jnp.where(gate_v[:, :, None], bs_v, 0)
    qp_p_v = jnp.where(e[None, :] == 0, qp[left][:, None], qp[:, None])
    qp_avg_v = (qp[:, None] + qp_p_v + 1) >> 1                       # [M,4]
    idx_a_v = jnp.clip(qp_avg_v + a_off[:, None], 0, 51)
    idx_b_v = jnp.clip(qp_avg_v + b_off[:, None], 0, 51)
    ab_v = jnp.stack(
        [jnp.asarray(_ALPHA)[idx_a_v], jnp.asarray(_BETA)[idx_b_v]], -1
    )
    tc0_v = jnp.asarray(_tc0_table())[
        idx_a_v[:, :, None], jnp.clip(bs_v, 1, 3) - 1
    ]

    # ---- horizontal luma: edge e at y=4e, segments sg (cols)
    mb_p_h = jnp.where(e[None, :] == 0, top[:, None], m[:, None])
    blk_q_h = e[None, :, None] * 4 + sg[None, None, :]
    blk_p_h = jnp.where(e == 0, 3, e - 1)[None, :, None] * 4 + sg[None, None, :]
    bs_h = _bs_between(
        meta,
        jnp.broadcast_to(m[:, None, None], (M, 4, 4)),
        jnp.broadcast_to(mb_p_h[:, :, None], (M, 4, 4)),
        jnp.broadcast_to(blk_q_h, (M, 4, 4)),
        jnp.broadcast_to(blk_p_h, (M, 4, 4)),
        (e == 0)[None, :, None],
    )
    gate_h = enabled[:, None] & ((e[None, :] != 0) | top_ok[:, None])
    bs_h = jnp.where(gate_h[:, :, None], bs_h, 0)
    qp_p_h = jnp.where(e[None, :] == 0, qp[top][:, None], qp[:, None])
    qp_avg_h = (qp[:, None] + qp_p_h + 1) >> 1
    idx_a_h = jnp.clip(qp_avg_h + a_off[:, None], 0, 51)
    idx_b_h = jnp.clip(qp_avg_h + b_off[:, None], 0, 51)
    ab_h = jnp.stack(
        [jnp.asarray(_ALPHA)[idx_a_h], jnp.asarray(_BETA)[idx_b_h]], -1
    )
    tc0_h = jnp.asarray(_tc0_table())[
        idx_a_h[:, :, None], jnp.clip(bs_h, 1, 3) - 1
    ]

    # ---- chroma: edges ce in {0,1} at chroma x=4ce*? (x = 0, 4), bS from
    # co-located luma edge (luma edge index 2*ce), per chroma line k (0..7)
    ce = jnp.arange(2)
    k = jnp.arange(8)
    # vertical: luma blk row = (2k)//4 = k//2; luma edge col blk = 2*ce
    mb_p_cv = jnp.where(ce[None, :] == 0, left[:, None], m[:, None])
    blk_q_cv = (k[None, None, :] // 2) * 4 + (2 * ce)[None, :, None]
    blk_p_cv = (k[None, None, :] // 2) * 4 + jnp.where(ce == 0, 3, 2 * ce - 1)[None, :, None]
    bs_cv = _bs_between(
        meta,
        jnp.broadcast_to(m[:, None, None], (M, 2, 8)),
        jnp.broadcast_to(mb_p_cv[:, :, None], (M, 2, 8)),
        jnp.broadcast_to(blk_q_cv, (M, 2, 8)),
        jnp.broadcast_to(blk_p_cv, (M, 2, 8)),
        (ce == 0)[None, :, None],
    )
    gate_cv = enabled[:, None] & ((ce[None, :] != 0) | left_ok[:, None])
    bs_cv = jnp.where(gate_cv[:, :, None], bs_cv, 0)
    qpc = chroma_qp_from_luma(qp, chroma_qp_offset)
    qpc_p_cv = jnp.where(ce[None, :] == 0, qpc[left][:, None], qpc[:, None])
    qpc_avg_cv = (qpc[:, None] + qpc_p_cv + 1) >> 1
    idx_a_cv = jnp.clip(qpc_avg_cv + a_off[:, None], 0, 51)
    idx_b_cv = jnp.clip(qpc_avg_cv + b_off[:, None], 0, 51)
    ab_cv = jnp.stack(
        [jnp.asarray(_ALPHA)[idx_a_cv], jnp.asarray(_BETA)[idx_b_cv]], -1
    )
    tc0_cv = jnp.asarray(_tc0_table())[
        idx_a_cv[:, :, None], jnp.clip(bs_cv, 1, 3) - 1
    ]

    # horizontal chroma
    mb_p_ch = jnp.where(ce[None, :] == 0, top[:, None], m[:, None])
    blk_q_ch = (2 * ce)[None, :, None] * 4 + (k[None, None, :] // 2)
    blk_p_ch = jnp.where(ce == 0, 3, 2 * ce - 1)[None, :, None] * 4 + (
        k[None, None, :] // 2
    )
    bs_ch = _bs_between(
        meta,
        jnp.broadcast_to(m[:, None, None], (M, 2, 8)),
        jnp.broadcast_to(mb_p_ch[:, :, None], (M, 2, 8)),
        jnp.broadcast_to(blk_q_ch, (M, 2, 8)),
        jnp.broadcast_to(blk_p_ch, (M, 2, 8)),
        (ce == 0)[None, :, None],
    )
    gate_ch = enabled[:, None] & ((ce[None, :] != 0) | top_ok[:, None])
    bs_ch = jnp.where(gate_ch[:, :, None], bs_ch, 0)
    qpc_p_ch = jnp.where(ce[None, :] == 0, qpc[top][:, None], qpc[:, None])
    qpc_avg_ch = (qpc[:, None] + qpc_p_ch + 1) >> 1
    idx_a_ch = jnp.clip(qpc_avg_ch + a_off[:, None], 0, 51)
    idx_b_ch = jnp.clip(qpc_avg_ch + b_off[:, None], 0, 51)
    ab_ch = jnp.stack(
        [jnp.asarray(_ALPHA)[idx_a_ch], jnp.asarray(_BETA)[idx_b_ch]], -1
    )
    tc0_ch = jnp.asarray(_tc0_table())[
        idx_a_ch[:, :, None], jnp.clip(bs_ch, 1, 3) - 1
    ]

    return dict(
        bs_v=bs_v, tc0_v=tc0_v, ab_v=ab_v,
        bs_h=bs_h, tc0_h=tc0_h, ab_h=ab_h,
        bs_cv=bs_cv, tc0_cv=tc0_cv, ab_cv=ab_cv,
        bs_ch=bs_ch, tc0_ch=tc0_ch, ab_ch=ab_ch,
    )


# ---------------------------------------------------------------------------
# Line filters
# ---------------------------------------------------------------------------


def filter_lines_luma(p, q, bs, alpha, beta, tc0):
    """p, q: [..., 4] int32 (p[...,0] next to the edge); params broadcast.
    Returns filtered (p, q)."""
    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    filt = (
        (bs > 0)
        & (jnp.abs(p0 - q0) < alpha)
        & (jnp.abs(p1 - p0) < beta)
        & (jnp.abs(q1 - q0) < beta)
    )
    ap = jnp.abs(p2 - p0)
    aq = jnp.abs(q2 - q0)
    tc = tc0 + (ap < beta) + (aq < beta)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    np1 = jnp.where(
        ap < beta,
        p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1, -tc0, tc0),
        p1,
    )
    nq1 = jnp.where(
        aq < beta,
        q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1, -tc0, tc0),
        q1,
    )
    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = strong & (ap < beta)
    sq = strong & (aq < beta)
    sp0 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    sp1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    sq1 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    is4 = bs == 4
    op0 = jnp.where(filt, jnp.where(is4, sp0, np0), p0)
    op1 = jnp.where(filt, jnp.where(is4, sp1, np1), p1)
    op2 = jnp.where(filt & is4, sp2, p2)
    oq0 = jnp.where(filt, jnp.where(is4, sq0, nq0), q0)
    oq1 = jnp.where(filt, jnp.where(is4, sq1, nq1), q1)
    oq2 = jnp.where(filt & is4, sq2, q2)
    return (
        jnp.stack([op0, op1, op2, p3], axis=-1),
        jnp.stack([oq0, oq1, oq2, q3], axis=-1),
    )


def filter_lines_chroma(p, q, bs, alpha, beta, tc0):
    """p, q: [..., 2] int32. Chroma filter (only p0/q0 modified)."""
    p0, p1 = p[..., 0], p[..., 1]
    q0, q1 = q[..., 0], q[..., 1]
    filt = (
        (bs > 0)
        & (jnp.abs(p0 - q0) < alpha)
        & (jnp.abs(p1 - p0) < beta)
        & (jnp.abs(q1 - q0) < beta)
    )
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    sp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    op0 = jnp.where(filt, jnp.where(is4, sp0, np0), p0)
    oq0 = jnp.where(filt, jnp.where(is4, sq0, nq0), q0)
    return (
        jnp.stack([op0, p1], axis=-1),
        jnp.stack([oq0, q1], axis=-1),
    )


# ---------------------------------------------------------------------------
# Wavefront driver
# ---------------------------------------------------------------------------


def _gather_window(flat, base_y, base_x, h, w, W, scratch_idx, mask):
    """Gather [A, h, w] windows at (base_y, base_x) per active MB from a
    flattened plane with one scratch slot appended."""
    yy = base_y[:, None, None] + jnp.arange(h)[None, :, None]
    xx = base_x[:, None, None] + jnp.arange(w)[None, None, :]
    idx = yy * W + xx
    idx = jnp.where(mask[:, None, None], idx, scratch_idx)
    return flat[idx].astype(jnp.int32), idx


def deblock_frame(Y, U, V, meta, mb_w: int, mb_h: int,
                  chroma_qp_offset: int):
    """Deblock one frame in exact per-MB wavefront order.

    Y: [H, W] int32 (or uint8); U, V: [Hc, Wc].  meta: per-MB SoA dict
    (see mb_edge_params).  Returns filtered (Y, U, V) int32.
    """
    H, W = Y.shape
    Hc, Wc = U.shape
    params = mb_edge_params(meta, mb_w, mb_h, chroma_qp_offset)
    step_mbs, step_valid = schedule(mb_w, mb_h)
    step_mbs = jnp.asarray(step_mbs)
    step_valid = jnp.asarray(step_valid)

    # planes flattened with a scratch slot for masked lanes
    yf = jnp.concatenate([Y.astype(jnp.int32).reshape(-1), jnp.zeros(8 * 16, jnp.int32)])
    uf = jnp.concatenate([U.astype(jnp.int32).reshape(-1), jnp.zeros(8 * 16, jnp.int32)])
    vf = jnp.concatenate([V.astype(jnp.int32).reshape(-1), jnp.zeros(8 * 16, jnp.int32)])
    y_scratch = H * W
    c_scratch = Hc * Wc

    def step(carry, inp):
        yf, uf, vf = carry
        mbs, valid = inp
        mx = (mbs % mb_w) * 16
        my = (mbs // mb_w) * 16
        cx = mx // 2
        cy = my // 2

        # ---- luma vertical edges (x = mx + 4e), left to right
        for e in range(4):
            base_x = mx + 4 * e - 4
            # clamp for e==0 at picture edge (bs already 0 there)
            base_x = jnp.maximum(base_x, 0)
            win, idx = _gather_window(
                yf, my, base_x, 16, 8, W, y_scratch, valid
            )
            p = win[:, :, :4][:, :, ::-1]
            q = win[:, :, 4:]
            bs = jnp.repeat(params["bs_v"][mbs, e], 4, axis=-1)      # [A,16]
            tc0 = jnp.repeat(params["tc0_v"][mbs, e], 4, axis=-1)
            alpha = params["ab_v"][mbs, e, 0][:, None]
            beta = params["ab_v"][mbs, e, 1][:, None]
            np_, nq = filter_lines_luma(p, q, bs, alpha, beta, tc0)
            out = jnp.concatenate([np_[:, :, ::-1], nq], axis=2)
            yf = yf.at[idx].set(out)
        # ---- luma horizontal edges (y = my + 4e)
        for e in range(4):
            base_y = jnp.maximum(my + 4 * e - 4, 0)
            win, idx = _gather_window(
                yf, base_y, mx, 8, 16, W, y_scratch, valid
            )
            wt = win.transpose(0, 2, 1)  # [A, 16 cols, 8]
            p = wt[:, :, :4][:, :, ::-1]
            q = wt[:, :, 4:]
            bs = jnp.repeat(params["bs_h"][mbs, e], 4, axis=-1)
            tc0 = jnp.repeat(params["tc0_h"][mbs, e], 4, axis=-1)
            alpha = params["ab_h"][mbs, e, 0][:, None]
            beta = params["ab_h"][mbs, e, 1][:, None]
            np_, nq = filter_lines_luma(p, q, bs, alpha, beta, tc0)
            out = jnp.concatenate([np_[:, :, ::-1], nq], axis=2).transpose(0, 2, 1)
            yf = yf.at[idx].set(out)
        # ---- chroma edges, both planes
        for e in range(2):
            base_x = jnp.maximum(cx + 4 * e - 2, 0)
            bs = params["bs_cv"][mbs, e]
            tc0 = params["tc0_cv"][mbs, e]
            alpha = params["ab_cv"][mbs, e, 0][:, None]
            beta = params["ab_cv"][mbs, e, 1][:, None]
            for plane in range(2):
                buf = uf if plane == 0 else vf
                win, idx = _gather_window(
                    buf, cy, base_x, 8, 4, Wc, c_scratch, valid
                )
                p = win[:, :, :2][:, :, ::-1]
                q = win[:, :, 2:]
                np_, nq = filter_lines_chroma(p, q, bs, alpha, beta, tc0)
                out = jnp.concatenate([np_[:, :, ::-1], nq], axis=2)
                if plane == 0:
                    uf = uf.at[idx].set(out)
                else:
                    vf = vf.at[idx].set(out)
        for e in range(2):
            base_y = jnp.maximum(cy + 4 * e - 2, 0)
            bs = params["bs_ch"][mbs, e]
            tc0 = params["tc0_ch"][mbs, e]
            alpha = params["ab_ch"][mbs, e, 0][:, None]
            beta = params["ab_ch"][mbs, e, 1][:, None]
            for plane in range(2):
                buf = uf if plane == 0 else vf
                win, idx = _gather_window(
                    buf, base_y, cx, 4, 8, Wc, c_scratch, valid
                )
                wt = win.transpose(0, 2, 1)
                p = wt[:, :, :2][:, :, ::-1]
                q = wt[:, :, 2:]
                np_, nq = filter_lines_chroma(p, q, bs, alpha, beta, tc0)
                out = jnp.concatenate(
                    [np_[:, :, ::-1], nq], axis=2
                ).transpose(0, 2, 1)
                if plane == 0:
                    uf = uf.at[idx].set(out)
                else:
                    vf = vf.at[idx].set(out)
        return (yf, uf, vf), None

    (yf, uf, vf), _ = jax.lax.scan(step, (yf, uf, vf), (step_mbs, step_valid))
    return (
        yf[: H * W].reshape(H, W),
        uf[: Hc * Wc].reshape(Hc, Wc),
        vf[: Hc * Wc].reshape(Hc, Wc),
    )


# ---------------------------------------------------------------------------
# Batched (leading clip dim) edge parameters
# ---------------------------------------------------------------------------


def _bs_between_b(meta, mb_q, mb_p, blk_q, blk_p, is_mb_edge):
    """Batched boundary strength: meta arrays have leading [B]; the index
    arrays are shared across the batch.  Covers P and (when meta carries
    "mv1"/"ref1") B motion: prediction-count, picture-set and per-pairing
    MV comparisons of spec 8.7.2.1."""
    kind = meta["kind"]                           # [B, M]
    intra_q = (kind[:, mb_q] >= 2) & (kind[:, mb_q] <= 4)
    intra_p = (kind[:, mb_p] >= 2) & (kind[:, mb_p] <= 4)
    nnz_q = meta["nnz"][:, mb_q, blk_q]
    nnz_p = meta["nnz"][:, mb_p, blk_p]
    blk8_q = (blk_q // 8) * 2 + (blk_q % 4) // 2
    blk8_p = (blk_p // 8) * 2 + (blk_p % 4) // 2
    ref_q = meta["ref"][:, mb_q, blk8_q]
    ref_p = meta["ref"][:, mb_p, blk8_p]
    mv_q = meta["mv"][:, mb_q, blk_q]             # [B, ..., 2]
    mv_p = meta["mv"][:, mb_p, blk_p]

    def far(a, b):
        return (jnp.abs(a[..., 0] - b[..., 0]) >= 4) | (
            jnp.abs(a[..., 1] - b[..., 1]) >= 4
        )

    if meta.get("mv1") is None:
        mv_bs = jnp.where((ref_q != ref_p) | far(mv_q, mv_p), 1, 0)
    else:
        ref1_q = meta["ref1"][:, mb_q, blk8_q]
        ref1_p = meta["ref1"][:, mb_p, blk8_p]
        mv1_q = meta["mv1"][:, mb_q, blk_q]
        mv1_p = meta["mv1"][:, mb_p, blk_p]
        bi_q = ref1_q >= 0
        bi_p = ref1_p >= 0
        uni_ok = (ref_q == ref_p) & ~far(mv_q, mv_p)
        straight = (ref_q == ref_p) & (ref1_q == ref1_p) & \
            ~far(mv_q, mv_p) & ~far(mv1_q, mv1_p)
        crossed = (ref_q == ref1_p) & (ref1_q == ref_p) & \
            ~far(mv_q, mv1_p) & ~far(mv1_q, mv_p)
        mv_bs = jnp.where(
            bi_q != bi_p,
            1,
            jnp.where(
                bi_q,
                jnp.where(straight | crossed, 0, 1),
                jnp.where(uni_ok, 0, 1),
            ),
        )
    return jnp.where(
        intra_q | intra_p,
        jnp.where(is_mb_edge[None], 4, 3),
        jnp.where((nnz_q > 0) | (nnz_p > 0), 2, mv_bs),
    )


def _mb_edge_params_b_gather(meta, mb_w, mb_h, chroma_qp_offset):
    """Batched mb_edge_params: meta arrays have a leading clip dim [B, M].

    Returns the same dict shape as mb_edge_params with [B, M, ...] arrays.
    """
    B, M = meta["qp"].shape
    m = np.arange(M)
    col = m % mb_w
    row = m // mb_w
    qp = meta["qp"].astype(jnp.int32)
    idc = meta["idc"]
    a_off = meta["a_off"].astype(jnp.int32)
    b_off = meta["b_off"].astype(jnp.int32)
    avail = meta["avail"]

    left = np.maximum(m - 1, 0)
    top = np.maximum(m - mb_w, 0)
    has_left = jnp.asarray(col > 0)
    has_top = jnp.asarray(row > 0)
    left_ok = has_left[None] & (
        (idc != 2) | (((avail >> 4) & 1) == 1)
    )
    top_ok = has_top[None] & ((idc != 2) | (((avail >> 5) & 1) == 1))
    enabled = idc != 1

    e = np.arange(4)
    sg = np.arange(4)
    ALPHA = jnp.asarray(_ALPHA)
    BETA = jnp.asarray(_BETA)
    TC0 = jnp.asarray(_tc0_table())

    # ---- vertical luma
    mb_p_v = np.where(e[None, :] == 0, left[:, None], m[:, None])     # [M,4]
    blk_q_v = sg[None, None, :] * 4 + e[None, :, None]                # [1,4,4]
    blk_p_v = sg[None, None, :] * 4 + np.where(e == 0, 3, e - 1)[None, :, None]
    bs_v = _bs_between_b(
        meta,
        jnp.asarray(np.broadcast_to(m[:, None, None], (M, 4, 4))),
        jnp.asarray(np.broadcast_to(mb_p_v[:, :, None], (M, 4, 4))),
        jnp.asarray(np.broadcast_to(blk_q_v, (M, 4, 4))),
        jnp.asarray(np.broadcast_to(blk_p_v, (M, 4, 4))),
        jnp.asarray((e == 0)[None, :, None]),
    )                                                                 # [B,M,4,4]
    gate_v = (enabled[:, :, None] & (jnp.asarray(e[None, None, :] != 0)
                                     | left_ok[:, :, None]))
    bs_v = jnp.where(gate_v[..., None], bs_v, 0)
    if meta.get("t8") is not None:
        # 8x8 transform: internal luma edges 1 and 3 are not filtered
        t8e = (meta["t8"] != 0)[:, :, None, None] & jnp.asarray(
            (e % 2 == 1)[None, None, :, None]
        )
        bs_v = jnp.where(t8e, 0, bs_v)
    qp_p_v = jnp.where(jnp.asarray(e[None, None, :] == 0),
                       qp[:, left][:, :, None], qp[:, :, None])
    qp_avg_v = (qp[:, :, None] + qp_p_v + 1) >> 1                     # [B,M,4]
    idx_a_v = jnp.clip(qp_avg_v + a_off[:, :, None], 0, 51)
    idx_b_v = jnp.clip(qp_avg_v + b_off[:, :, None], 0, 51)
    ab_v = jnp.stack([ALPHA[idx_a_v], BETA[idx_b_v]], -1)
    tc0_v = TC0[idx_a_v[..., None], jnp.clip(bs_v, 1, 3) - 1]

    # ---- horizontal luma
    mb_p_h = np.where(e[None, :] == 0, top[:, None], m[:, None])
    blk_q_h = e[None, :, None] * 4 + sg[None, None, :]
    blk_p_h = np.where(e == 0, 3, e - 1)[None, :, None] * 4 + sg[None, None, :]
    bs_h = _bs_between_b(
        meta,
        jnp.asarray(np.broadcast_to(m[:, None, None], (M, 4, 4))),
        jnp.asarray(np.broadcast_to(mb_p_h[:, :, None], (M, 4, 4))),
        jnp.asarray(np.broadcast_to(blk_q_h, (M, 4, 4))),
        jnp.asarray(np.broadcast_to(blk_p_h, (M, 4, 4))),
        jnp.asarray((e == 0)[None, :, None]),
    )
    gate_h = (enabled[:, :, None] & (jnp.asarray(e[None, None, :] != 0)
                                     | top_ok[:, :, None]))
    bs_h = jnp.where(gate_h[..., None], bs_h, 0)
    if meta.get("t8") is not None:
        t8e = (meta["t8"] != 0)[:, :, None, None] & jnp.asarray(
            (e % 2 == 1)[None, None, :, None]
        )
        bs_h = jnp.where(t8e, 0, bs_h)
    qp_p_h = jnp.where(jnp.asarray(e[None, None, :] == 0),
                       qp[:, top][:, :, None], qp[:, :, None])
    qp_avg_h = (qp[:, :, None] + qp_p_h + 1) >> 1
    idx_a_h = jnp.clip(qp_avg_h + a_off[:, :, None], 0, 51)
    idx_b_h = jnp.clip(qp_avg_h + b_off[:, :, None], 0, 51)
    ab_h = jnp.stack([ALPHA[idx_a_h], BETA[idx_b_h]], -1)
    tc0_h = TC0[idx_a_h[..., None], jnp.clip(bs_h, 1, 3) - 1]

    # ---- chroma
    ce = np.arange(2)
    k = np.arange(8)
    qpc = chroma_qp_from_luma(qp, chroma_qp_offset)

    mb_p_cv = np.where(ce[None, :] == 0, left[:, None], m[:, None])
    blk_q_cv = (k[None, None, :] // 2) * 4 + (2 * ce)[None, :, None]
    blk_p_cv = (k[None, None, :] // 2) * 4 + np.where(ce == 0, 3, 2 * ce - 1)[None, :, None]
    bs_cv = _bs_between_b(
        meta,
        jnp.asarray(np.broadcast_to(m[:, None, None], (M, 2, 8))),
        jnp.asarray(np.broadcast_to(mb_p_cv[:, :, None], (M, 2, 8))),
        jnp.asarray(np.broadcast_to(blk_q_cv, (M, 2, 8))),
        jnp.asarray(np.broadcast_to(blk_p_cv, (M, 2, 8))),
        jnp.asarray((ce == 0)[None, :, None]),
    )
    gate_cv = (enabled[:, :, None] & (jnp.asarray(ce[None, None, :] != 0)
                                      | left_ok[:, :, None]))
    bs_cv = jnp.where(gate_cv[..., None], bs_cv, 0)
    qpc_p_cv = jnp.where(jnp.asarray(ce[None, None, :] == 0),
                         qpc[:, left][:, :, None], qpc[:, :, None])
    qpc_avg_cv = (qpc[:, :, None] + qpc_p_cv + 1) >> 1
    idx_a_cv = jnp.clip(qpc_avg_cv + a_off[:, :, None], 0, 51)
    idx_b_cv = jnp.clip(qpc_avg_cv + b_off[:, :, None], 0, 51)
    ab_cv = jnp.stack([ALPHA[idx_a_cv], BETA[idx_b_cv]], -1)
    tc0_cv = TC0[idx_a_cv[..., None], jnp.clip(bs_cv, 1, 3) - 1]

    mb_p_ch = np.where(ce[None, :] == 0, top[:, None], m[:, None])
    blk_q_ch = (2 * ce)[None, :, None] * 4 + (k[None, None, :] // 2)
    blk_p_ch = np.where(ce == 0, 3, 2 * ce - 1)[None, :, None] * 4 + (
        k[None, None, :] // 2
    )
    bs_ch = _bs_between_b(
        meta,
        jnp.asarray(np.broadcast_to(m[:, None, None], (M, 2, 8))),
        jnp.asarray(np.broadcast_to(mb_p_ch[:, :, None], (M, 2, 8))),
        jnp.asarray(np.broadcast_to(blk_q_ch, (M, 2, 8))),
        jnp.asarray(np.broadcast_to(blk_p_ch, (M, 2, 8))),
        jnp.asarray((ce == 0)[None, :, None]),
    )
    gate_ch = (enabled[:, :, None] & (jnp.asarray(ce[None, None, :] != 0)
                                      | top_ok[:, :, None]))
    bs_ch = jnp.where(gate_ch[..., None], bs_ch, 0)
    qpc_p_ch = jnp.where(jnp.asarray(ce[None, None, :] == 0),
                         qpc[:, top][:, :, None], qpc[:, :, None])
    qpc_avg_ch = (qpc[:, :, None] + qpc_p_ch + 1) >> 1
    idx_a_ch = jnp.clip(qpc_avg_ch + a_off[:, :, None], 0, 51)
    idx_b_ch = jnp.clip(qpc_avg_ch + b_off[:, :, None], 0, 51)
    ab_ch = jnp.stack([ALPHA[idx_a_ch], BETA[idx_b_ch]], -1)
    tc0_ch = TC0[idx_a_ch[..., None], jnp.clip(bs_ch, 1, 3) - 1]

    return dict(
        bs_v=bs_v, tc0_v=tc0_v, ab_v=ab_v,
        bs_h=bs_h, tc0_h=tc0_h, ab_h=ab_h,
        bs_cv=bs_cv, tc0_cv=tc0_cv, ab_cv=ab_cv,
        bs_ch=bs_ch, tc0_ch=tc0_ch, ab_ch=ab_ch,
    )


# ---------------------------------------------------------------------------
# Gather-free batched edge parameters
# ---------------------------------------------------------------------------
#
# The straightforward implementation above (_mb_edge_params_b_gather)
# indexes neighbors and lookup tables with fancy indexing, which XLA:TPU
# lowers to general gathers (~85M elements/s): the parameter computation
# alone cost ~52 ms per 32-clip frame batch — as much as the whole
# deblocking stage.  This version uses only shifts (neighbor values),
# static lane slices (block patterns) and one-hot reductions (alpha/beta/
# tc0 tables), all of which stay on the VPU.


def _nb_left(a, mb_w, mb_h):
    """Left-neighbor MB values [B, M, ...] (column 0 garbage — callers
    gate those edges with left_ok, matching the clamped-index original)."""
    B = a.shape[0]
    v = a.reshape((B, mb_h, mb_w) + a.shape[2:])
    v = jnp.concatenate([v[:, :, :1], v[:, :, :-1]], axis=2)
    return v.reshape(a.shape)


def _nb_top(a, mb_w, mb_h):
    B = a.shape[0]
    v = a.reshape((B, mb_h, mb_w) + a.shape[2:])
    v = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)
    return v.reshape(a.shape)


def _sel_last(a, idxs):
    """a[..., idxs] for a static index list (slices + stack, no gather)."""
    return jnp.stack([a[..., k] for k in idxs], axis=-1)


def _sel_blk(mv, idxs):
    """mv[:, :, idxs, :] for static idxs ([B, M, 16, 2] -> [B, M, n, 2])."""
    return jnp.stack([mv[:, :, k] for k in idxs], axis=2)


def _lut1(table, idx):
    """table[idx] via one-hot reduction; table 1-D static."""
    t = jnp.asarray(table, jnp.int32)
    rng = jnp.arange(t.shape[0], dtype=jnp.int32)
    return jnp.where(idx[..., None] == rng, t, 0).sum(-1)


def _tc0_of(idx_a, bs):
    """TC0[idx_a, clip(bs,1,3)-1] with idx_a [..., E] and bs [..., E, S]."""
    T = jnp.asarray(_tc0_table(), jnp.int32)          # [52, 3]
    rng = jnp.arange(T.shape[0], dtype=jnp.int32)
    oh = idx_a[..., None] == rng                       # [..., E, 52]
    t3 = jnp.where(oh[..., None], T, 0).sum(-2)        # [..., E, 3]
    return jnp.where(
        bs <= 1, t3[..., 0:1],
        jnp.where(bs == 2, t3[..., 1:2], t3[..., 2:3]),
    )


def _bs_vals(kq, kp, nq, np_, rq, rp, mvq, mvp, b=None, is_mb_edge=False):
    """Boundary strength from pre-fetched q/p values (spec 8.7.2.1).
    `b` carries (r1q, r1p, mv1q, mv1p) for B motion when present."""
    intra_q = (kq >= 2) & (kq <= 4)
    intra_p = (kp >= 2) & (kp <= 4)

    def far(a, c):
        return (jnp.abs(a[..., 0] - c[..., 0]) >= 4) | (
            jnp.abs(a[..., 1] - c[..., 1]) >= 4
        )

    if b is None:
        mv_bs = jnp.where((rq != rp) | far(mvq, mvp), 1, 0)
    else:
        r1q, r1p, mv1q, mv1p = b
        bi_q = r1q >= 0
        bi_p = r1p >= 0
        uni_ok = (rq == rp) & ~far(mvq, mvp)
        straight = (rq == rp) & (r1q == r1p) & ~far(mvq, mvp) & ~far(mv1q, mv1p)
        crossed = (rq == r1p) & (r1q == rp) & ~far(mvq, mv1p) & ~far(mv1q, mvp)
        mv_bs = jnp.where(
            bi_q != bi_p,
            1,
            jnp.where(
                bi_q,
                jnp.where(straight | crossed, 0, 1),
                jnp.where(uni_ok, 0, 1),
            ),
        )
    return jnp.where(
        intra_q | intra_p,
        4 if is_mb_edge else 3,
        jnp.where((nq > 0) | (np_ > 0), 2, mv_bs),
    )


def mb_edge_params_b(meta, mb_w: int, mb_h: int, chroma_qp_offset: int):
    """Batched per-MB edge parameters (gather-free; see module note).

    Same output dict as _mb_edge_params_b_gather, bit-identical wherever
    bS is nonzero (boundary-garbage neighbor values differ only at edges
    that are gated to bS=0, where the filter is a no-op)."""
    B, M = meta["qp"].shape
    m = np.arange(M)
    col = m % mb_w
    row = m // mb_w
    qp = meta["qp"].astype(jnp.int32)
    idc = meta["idc"]
    a_off = meta["a_off"].astype(jnp.int32)
    b_off = meta["b_off"].astype(jnp.int32)
    avail = meta["avail"]

    has_left = jnp.asarray(col > 0)
    has_top = jnp.asarray(row > 0)
    left_ok = has_left[None] & ((idc != 2) | (((avail >> 4) & 1) == 1))
    top_ok = has_top[None] & ((idc != 2) | (((avail >> 5) & 1) == 1))
    enabled = idc != 1

    kind = meta["kind"]
    nnz = meta["nnz"]
    ref = meta["ref"]
    mv = meta["mv"]
    has_b = meta.get("mv1") is not None
    ref1 = meta.get("ref1")
    mv1 = meta.get("mv1")

    def nb(a, which):
        return _nb_left(a, mb_w, mb_h) if which == "l" else _nb_top(
            a, mb_w, mb_h
        )

    nbs = {}
    for name, a in (("kind", kind), ("nnz", nnz), ("ref", ref), ("mv", mv),
                    ("qp", qp)):
        nbs[name] = a
        nbs[name + "_l"] = nb(a, "l")
        nbs[name + "_t"] = nb(a, "t")
    if has_b:
        for name, a in (("ref1", ref1), ("mv1", mv1)):
            nbs[name] = a
            nbs[name + "_l"] = nb(a, "l")
            nbs[name + "_t"] = nb(a, "t")

    ALPHA = _ALPHA
    BETA = _BETA

    def luma_dir(which):
        """which='v' (left-neighbor MB edges) or 'h' (top)."""
        sfx = "_l" if which == "v" else "_t"
        per_e = []
        for e in range(4):
            mbedge = e == 0
            src = sfx if mbedge else ""
            if which == "v":
                bq = [sg * 4 + e for sg in range(4)]
                bp = [sg * 4 + (3 if mbedge else e - 1) for sg in range(4)]
                b8q = [(sg // 2) * 2 + e // 2 for sg in range(4)]
                b8p = [(sg // 2) * 2 + ((3 if mbedge else e - 1) // 2)
                       for sg in range(4)]
            else:
                bq = [e * 4 + sg for sg in range(4)]
                bp = [(3 if mbedge else e - 1) * 4 + sg for sg in range(4)]
                b8q = [(e // 2) * 2 + sg // 2 for sg in range(4)]
                b8p = [((3 if mbedge else e - 1) // 2) * 2 + sg // 2
                       for sg in range(4)]
            kq = kind[..., None]
            kp = nbs["kind" + src][..., None]
            nq = _sel_last(nnz, bq)
            np2 = _sel_last(nbs["nnz" + src], bp)
            rq = _sel_last(ref, b8q)
            rp = _sel_last(nbs["ref" + src], b8p)
            mvq = _sel_blk(mv, bq)
            mvp = _sel_blk(nbs["mv" + src], bp)
            bvals = None
            if has_b:
                bvals = (
                    _sel_last(ref1, b8q), _sel_last(nbs["ref1" + src], b8p),
                    _sel_blk(mv1, bq), _sel_blk(nbs["mv1" + src], bp),
                )
            per_e.append(_bs_vals(kq, kp, nq, np2, rq, rp, mvq, mvp,
                                  bvals, mbedge))
        bs = jnp.stack(per_e, axis=2)                  # [B, M, 4, 4]
        ok = left_ok if which == "v" else top_ok
        gate = enabled[:, :, None] & (
            jnp.asarray(np.arange(4)[None, None, :] != 0) | ok[:, :, None]
        )
        bs = jnp.where(gate[..., None], bs, 0)
        if meta.get("t8") is not None:
            t8e = (meta["t8"] != 0)[:, :, None, None] & jnp.asarray(
                (np.arange(4) % 2 == 1)[None, None, :, None]
            )
            bs = jnp.where(t8e, 0, bs)
        qp_p = jnp.where(
            jnp.asarray(np.arange(4)[None, None, :] == 0),
            nbs["qp" + sfx][:, :, None], qp[:, :, None],
        )
        qp_avg = (qp[:, :, None] + qp_p + 1) >> 1
        idx_a = jnp.clip(qp_avg + a_off[:, :, None], 0, 51)
        idx_b = jnp.clip(qp_avg + b_off[:, :, None], 0, 51)
        ab = jnp.stack([_lut1(ALPHA, idx_a), _lut1(BETA, idx_b)], -1)
        tc0 = _tc0_of(idx_a, bs)
        return bs, tc0, ab

    bs_v, tc0_v, ab_v = luma_dir("v")
    bs_h, tc0_h, ab_h = luma_dir("h")

    qpc = chroma_qp_from_luma(qp, chroma_qp_offset)
    qpc_l = _nb_left(qpc, mb_w, mb_h)
    qpc_t = _nb_top(qpc, mb_w, mb_h)

    def chroma_dir(which):
        sfx = "_l" if which == "v" else "_t"
        per_e = []
        for ce in range(2):
            mbedge = ce == 0
            src = sfx if mbedge else ""
            if which == "v":
                bq = [(k // 2) * 4 + 2 * ce for k in range(8)]
                bp = [(k // 2) * 4 + (3 if mbedge else 1) for k in range(8)]
                b8q = [2 * (k // 4) + ce for k in range(8)]
                b8p = [2 * (k // 4) + ((3 if mbedge else 1) // 2)
                       for k in range(8)]
            else:
                bq = [8 * ce + k // 2 for k in range(8)]
                bp = [(12 if mbedge else 4) + k // 2 for k in range(8)]
                b8q = [2 * ce + k // 4 for k in range(8)]
                b8p = [(2 if mbedge else 0) + k // 4 for k in range(8)]
            kq = kind[..., None]
            kp = nbs["kind" + src][..., None]
            nq = _sel_last(nnz, bq)
            np2 = _sel_last(nbs["nnz" + src], bp)
            rq = _sel_last(ref, b8q)
            rp = _sel_last(nbs["ref" + src], b8p)
            mvq = _sel_blk(mv, bq)
            mvp = _sel_blk(nbs["mv" + src], bp)
            bvals = None
            if has_b:
                bvals = (
                    _sel_last(ref1, b8q), _sel_last(nbs["ref1" + src], b8p),
                    _sel_blk(mv1, bq), _sel_blk(nbs["mv1" + src], bp),
                )
            per_e.append(_bs_vals(kq, kp, nq, np2, rq, rp, mvq, mvp,
                                  bvals, mbedge))
        bs = jnp.stack(per_e, axis=2)                  # [B, M, 2, 8]
        ok = left_ok if which == "v" else top_ok
        gate = enabled[:, :, None] & (
            jnp.asarray(np.arange(2)[None, None, :] != 0) | ok[:, :, None]
        )
        bs = jnp.where(gate[..., None], bs, 0)
        qpc_p = jnp.where(
            jnp.asarray(np.arange(2)[None, None, :] == 0),
            (qpc_l if which == "v" else qpc_t)[:, :, None],
            qpc[:, :, None],
        )
        qpc_avg = (qpc[:, :, None] + qpc_p + 1) >> 1
        idx_a = jnp.clip(qpc_avg + a_off[:, :, None], 0, 51)
        idx_b = jnp.clip(qpc_avg + b_off[:, :, None], 0, 51)
        ab = jnp.stack([_lut1(ALPHA, idx_a), _lut1(BETA, idx_b)], -1)
        tc0 = _tc0_of(idx_a, bs)
        return bs, tc0, ab

    bs_cv, tc0_cv, ab_cv = chroma_dir("v")
    bs_ch, tc0_ch, ab_ch = chroma_dir("h")

    return dict(
        bs_v=bs_v, tc0_v=tc0_v, ab_v=ab_v,
        bs_h=bs_h, tc0_h=tc0_h, ab_h=ab_h,
        bs_cv=bs_cv, tc0_cv=tc0_cv, ab_cv=ab_cv,
        bs_ch=bs_ch, tc0_ch=tc0_ch, ab_ch=ab_ch,
    )
