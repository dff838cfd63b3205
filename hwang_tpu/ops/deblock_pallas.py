"""Pallas TPU deblocking wavefront: the whole knight-wavefront loop runs
inside ONE kernel launch.

The XLA skewed wavefront (recon_skewed.deblock_stage_skewed) is bit-exact
but pays ~0.4 ms of fixed per-step dispatch overhead x 84 steps x F frames
— deblocking dominated the decode at ~165 ms/frame.  Here the same step
loop is a `fori_loop` INSIDE a pallas_call, so a step costs only its
actual VPU work: zero dispatch overhead.

Memory layout — clips are packed into the LANE dimension so every
wavefront step is a full-width VPU op (lane index = pixel_column * bt +
clip; 16*bt lanes are a multiple of 128 for bt >= 8, i.e. zero padding):

  luma    [G, SwP, mb_h*16, 16*bt] uint8   sublane = mb_row*16 + pix_row
  chroma  [G, SwP, mb_h*8,  16*bt] uint8   columns 0-7 = U, 8-15 = V
  params  [G, SwP, mb_h, PAR_W*bt] uint8   packed bS/tc0/alpha/beta

Mosaic constraints honored throughout: lane dims are never split/merged
in-kernel (only static lane-group slices and lane concats), reshapes only
split/merge sublane-side dims, mutable tensors always live at layout
offset (0, 0) (fresh concat/stack results), masks are materialized at
full tile extent (no sublane+lane broadcasts).

A wavefront step slices one skewed column (dim 1 is a plain batch dim, so
the dynamic index needs no tile alignment).  Tile (r, c) of the frame
lives at skewed column c + 2r (+3 lead zero columns); a step reads
columns t..t+2 (top / left+top-right lanes / current) and writes back the
current tile plus 3-pixel fix-ups into the left and top tiles.

Reference parity: hwang deblocking lived inside libavcodec (the reference
feeds FFmpeg, software_video_decoder.cpp:349-402); spec 8.7 semantics
match hwang_tpu/ops/deblock.py::filter_lines_{luma,chroma} which this
kernel inlines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.h264.skew import (
    frame_to_tiles,
    skew,
    skew_width,
    tiles_to_frame,
    unskew,
)

_LEAD = 3
PAR_W = 160  # packed per-MB edge-parameter width (uint8)


def _pack_params(params, B, M):
    """Pack mb_edge_params_b output into one [B, M, PAR_W] uint8 array."""
    parts = [
        params["bs_v"].reshape(B, M, 16),      # 0
        params["tc0_v"].reshape(B, M, 16),     # 16
        params["ab_v"].reshape(B, M, 8),       # 32
        params["bs_h"].reshape(B, M, 16),      # 40
        params["tc0_h"].reshape(B, M, 16),     # 56
        params["ab_h"].reshape(B, M, 8),       # 72
        params["bs_cv"].reshape(B, M, 16),     # 80
        params["tc0_cv"].reshape(B, M, 16),    # 96
        params["ab_cv"].reshape(B, M, 4),      # 112
        params["bs_ch"].reshape(B, M, 16),     # 116
        params["tc0_ch"].reshape(B, M, 16),    # 132
        params["ab_ch"].reshape(B, M, 4),      # 148
    ]
    packed = jnp.concatenate([p.astype(jnp.uint8) for p in parts], axis=-1)
    return jnp.pad(packed, ((0, 0), (0, 0), (0, PAR_W - packed.shape[-1])))


def _filter_luma(p0, p1, p2, p3, q0, q1, q2, q3, bs, alpha, beta, tc0):
    """Spec 8.7 luma edge filter, int32 elementwise (taps as tensors)."""
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
    return op0, op1, op2, oq0, oq1, oq2


def _filter_chroma(p0, p1, q0, q1, bs, alpha, beta, tc0):
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
    return op0, oq0


def _set_row(x, a, b, v):
    """x[..., a:b, :] = v without scatter (concat along axis -2)."""
    parts = ([x[..., :a, :]] if a > 0 else []) + [v] + (
        [x[..., b:, :]] if b < x.shape[-2] else [])
    return jnp.concatenate(parts, axis=-2) if len(parts) > 1 else v


def _shift_down(x):
    """mb-row r <- r-1 along axis 0 (row 0 zero)."""
    return jnp.pad(x, ((1, 0),) + ((0, 0),) * (x.ndim - 1))[:-1]


def _shift_up(x):
    return jnp.pad(x, ((0, 1),) + ((0, 0),) * (x.ndim - 1))[1:]


def _deblock_step(t, cur8, left8, topl8, ccur8, cleft8, ctopl8,
                  par_col, pv_col, pcv_col, *, mb_w, mb_h, bt):
    """One wavefront step on three luma + three chroma columns (values,
    uint8 [mbh*16, 16bt] / [mbh*8, 16bt]); returns the updated
    (cur, left, top) columns for both planes.  Shared by the whole-block
    and ring-DMA kernels."""
    W = 16 * bt
    mb_h_ = mb_h
    r_y = jax.lax.broadcasted_iota(jnp.int32, (mb_h_, 16, W), 0)
    r_c = jax.lax.broadcasted_iota(jnp.int32, (mb_h_, 8, W), 0)

    def masks(r):
        c_idx = t - 2 * r
        active = (c_idx >= 0) & (c_idx < mb_w)
        return active, active & (c_idx > 0), active & (r > 0)

    active, l_ok, t_ok = masks(r_y)
    active_c, l_ok_c, t_ok_c = masks(r_c)
    if True:
        par = par_col.astype(jnp.int32)              # [mbh, PAR_W*bt]
        # vertical params arrive pre-expanded to pixel-row layout (an
        # in-kernel stack along axis -2 of lane slices at different
        # offsets is not lowerable)
        pv = pv_col.astype(jnp.int32).reshape(mb_h, 16, 16 * bt)
        pcv = pcv_col.astype(jnp.int32).reshape(mb_h, 8, 16 * bt)

        def pseg(k):
            """Per-clip lanes of packed param k: [mbh, bt]."""
            return par[..., k * bt:(k + 1) * bt]

        def vpar(k):
            """Pre-expanded vertical luma param k: [mbh, 16, bt]."""
            return pv[..., k * bt:(k + 1) * bt]

        def cvpar(k):
            """Pre-expanded vertical chroma param k (planes paired):
            [mbh, 8, 2*bt]."""
            return pcv[..., k * 2 * bt:(k + 1) * 2 * bt]

        def hexp(k):
            """Param k across all 16 packed columns: [mbh, 16*bt]."""
            return jnp.concatenate([pseg(k)] * 16, axis=-1)

        def hexp4(k0):
            """Per-4-column-segment params across lanes: [mbh, 16*bt]."""
            return jnp.concatenate(
                [pseg(k0 + j // 4) for j in range(16)], axis=-1
            )

        # ---------------- luma ----------------
        CUR = cur8.astype(jnp.int32).reshape(mb_h, 16, W)
        LEFT = left8.astype(jnp.int32).reshape(mb_h, 16, W)
        TOP = _shift_down(topl8.astype(jnp.int32).reshape(mb_h, 16, W))

        def lv(x, j):
            """Packed pixel-column j: [mbh, 16, bt]."""
            return x[..., j * bt:(j + 1) * bt]

        # vertical edges: taps are packed pixel-column lane groups
        C = CUR
        L3 = None
        for e in range(4):
            cc = 4 * e
            bs = vpar(e)
            tc0 = vpar(4 + e)
            alpha = vpar(8 + e)
            beta = vpar(12 + e)
            if e == 0:
                p0, p1, p2, p3 = (lv(LEFT, 15), lv(LEFT, 14),
                                  lv(LEFT, 13), lv(LEFT, 12))
            else:
                p0, p1, p2, p3 = (lv(C, cc - 1), lv(C, cc - 2),
                                  lv(C, cc - 3), lv(C, cc - 4))
            op0, op1, op2, oq0, oq1, oq2 = _filter_luma(
                p0, p1, p2, p3, lv(C, cc), lv(C, cc + 1),
                lv(C, cc + 2), lv(C, cc + 3),
                bs, alpha, beta, tc0,
            )
            if e == 0:
                L3 = jnp.concatenate([op2, op1, op0], axis=-1)
                C = jnp.concatenate(
                    [oq0, oq1, oq2, C[..., 3 * bt:]], axis=-1
                )
            else:
                C = jnp.concatenate(
                    [C[..., :(cc - 3) * bt], op2, op1, op0, oq0, oq1, oq2,
                     C[..., (cc + 3) * bt:]], axis=-1,
                )

        newleft = jnp.concatenate([LEFT[..., :13 * bt], L3], axis=-1)
        left_w = jnp.where(
            l_ok, newleft, left8.astype(jnp.int32).reshape(mb_h, 16, W)
        )
        out_left_y = left_w.reshape(mb_h * 16, W).astype(jnp.uint8)

        # horizontal edges: taps are pixel ROWS (static axis -2 extracts)
        T3 = None
        for e in range(4):
            rr = 4 * e
            bs = hexp4(40 + e * 4)
            tc0 = hexp4(56 + e * 4)
            alpha = hexp(72 + 2 * e)
            beta = hexp(73 + 2 * e)
            if e == 0:
                p0, p1, p2, p3 = (TOP[..., 15, :], TOP[..., 14, :],
                                  TOP[..., 13, :], TOP[..., 12, :])
            else:
                p0, p1, p2, p3 = (C[..., rr - 1, :], C[..., rr - 2, :],
                                  C[..., rr - 3, :], C[..., rr - 4, :])
            op0, op1, op2, oq0, oq1, oq2 = _filter_luma(
                p0, p1, p2, p3, C[..., rr, :], C[..., rr + 1, :],
                C[..., rr + 2, :], C[..., rr + 3, :],
                bs, alpha, beta, tc0,
            )
            if e == 0:
                T3 = jnp.stack([op2, op1, op0], axis=-2)
                C = _set_row(C, 0, 3, jnp.stack([oq0, oq1, oq2], axis=-2))
            else:
                upd = jnp.stack([op2, op1, op0, oq0, oq1, oq2], axis=-2)
                C = _set_row(C, rr - 3, rr + 3, upd)

        cur_w = jnp.where(
            active, C, cur8.astype(jnp.int32).reshape(mb_h, 16, W)
        )
        out_cur_y = cur_w.reshape(mb_h * 16, W).astype(jnp.uint8)

        newtop_lane = _set_row(TOP, 13, 16, T3)
        wrote = _shift_up(t_ok.astype(jnp.int32)) > 0
        newtop = jnp.where(
            wrote, _shift_up(newtop_lane),
            topl8.astype(jnp.int32).reshape(mb_h, 16, W),
        )
        out_top_y = newtop.reshape(mb_h * 16, W).astype(jnp.uint8)

        # ------------ chroma (U in columns 0-7, V in 8-15) ------------
        CURc = ccur8.astype(jnp.int32).reshape(mb_h, 8, W)
        LEFTc = cleft8.astype(jnp.int32).reshape(mb_h, 8, W)
        TOPc = _shift_down(ctopl8.astype(jnp.int32).reshape(mb_h, 8, W))

        def pair(x, j):
            """Packed column j of both planes: [mbh, 8, 2*bt]."""
            return jnp.concatenate(
                [x[..., j * bt:(j + 1) * bt],
                 x[..., (8 + j) * bt:(9 + j) * bt]], axis=-1,
            )

        # vertical: both planes paired along the lane axis
        Cc = CURc
        newleftc = None
        for e in range(2):
            cc = 4 * e
            bs = cvpar(e)
            tc0 = cvpar(2 + e)
            alpha = cvpar(4 + e)
            beta = cvpar(6 + e)
            if e == 0:
                p0, p1 = pair(LEFTc, 7), pair(LEFTc, 6)
            else:
                p0, p1 = pair(Cc, cc - 1), pair(Cc, cc - 2)
            op0, oq0 = _filter_chroma(
                p0, p1, pair(Cc, cc), pair(Cc, cc + 1),
                bs, alpha, beta, tc0,
            )
            op0u, op0v = op0[..., :bt], op0[..., bt:]
            oq0u, oq0v = oq0[..., :bt], oq0[..., bt:]
            if e == 0:
                newleftc = jnp.concatenate(
                    [LEFTc[..., :7 * bt], op0u,
                     LEFTc[..., 8 * bt:15 * bt], op0v], axis=-1,
                )
                Cc = jnp.concatenate(
                    [oq0u, Cc[..., bt:8 * bt], oq0v, Cc[..., 9 * bt:]],
                    axis=-1,
                )
            else:
                Cc = jnp.concatenate(
                    [Cc[..., :3 * bt], op0u, oq0u, Cc[..., 5 * bt:11 * bt],
                     op0v, oq0v, Cc[..., 13 * bt:]], axis=-1,
                )

        left_wc = jnp.where(
            l_ok_c, newleftc, cleft8.astype(jnp.int32).reshape(mb_h, 8, W)
        )
        out_left_c = left_wc.reshape(mb_h * 8, W).astype(jnp.uint8)

        def chexp(k0):
            """Per-column chroma param dup'd over planes: [mbh, 16*bt]."""
            return jnp.concatenate(
                [pseg(k0 + j % 8) for j in range(16)], axis=-1
            )

        # horizontal: both planes share the lane layout -> one pass
        T1c = None
        for e in range(2):
            rr = 4 * e
            bs = chexp(116 + e * 8)
            tc0 = chexp(132 + e * 8)
            alpha = hexp(148 + 2 * e)
            beta = hexp(149 + 2 * e)
            if e == 0:
                p0, p1 = TOPc[..., 7, :], TOPc[..., 6, :]
            else:
                p0, p1 = Cc[..., rr - 1, :], Cc[..., rr - 2, :]
            op0, oq0 = _filter_chroma(
                p0, p1, Cc[..., rr, :], Cc[..., rr + 1, :],
                bs, alpha, beta, tc0,
            )
            if e == 0:
                T1c = jnp.stack([op0], axis=-2)
                Cc = _set_row(Cc, 0, 1, jnp.stack([oq0], axis=-2))
            else:
                updc = jnp.stack([op0, oq0], axis=-2)
                Cc = _set_row(Cc, rr - 1, rr + 1, updc)

        cur_wc = jnp.where(
            active_c, Cc, ccur8.astype(jnp.int32).reshape(mb_h, 8, W)
        )
        out_cur_c = cur_wc.reshape(mb_h * 8, W).astype(jnp.uint8)

        newtopc_lane = _set_row(TOPc, 7, 8, T1c)
        wrotec = _shift_up(t_ok_c.astype(jnp.int32)) > 0
        newtopc = jnp.where(
            wrotec, _shift_up(newtopc_lane),
            ctopl8.astype(jnp.int32).reshape(mb_h, 8, W),
        )
        out_top_c = newtopc.reshape(mb_h * 8, W).astype(jnp.uint8)
        return (out_cur_y, out_left_y, out_top_y,
                out_cur_c, out_left_c, out_top_c)


def _kernel(y_in, c_in, par_in, pv_in, pcv_in, y_out, c_out, *,
            mb_w, mb_h, n_steps, bt):
    y_out[...] = y_in[...]
    c_out[...] = c_in[...]

    def body(t, _):
        p = t + _LEAD
        (ncy, nly, nty, ncc, nlc, ntc) = _deblock_step(
            t, y_out[0, p], y_out[0, p - 1], y_out[0, p - 2],
            c_out[0, p], c_out[0, p - 1], c_out[0, p - 2],
            par_in[0, p], pv_in[0, p], pcv_in[0, p],
            mb_w=mb_w, mb_h=mb_h, bt=bt,
        )
        y_out[0, p - 1] = nly
        y_out[0, p] = ncy
        y_out[0, p - 2] = nty
        c_out[0, p - 1] = nlc
        c_out[0, p] = ncc
        c_out[0, p - 2] = ntc
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)


# v5e has ~128 MB VMEM; the Mosaic default scoped limit (16 MB) is far
# below it.
_VMEM_LIMIT = 100 * 1024 * 1024
_VMEM_BUDGET = 88 * 1024 * 1024


def _vmem_bytes(bt, mb_h, swp):
    """Padded VMEM bytes of one grid program's blocks (uint8): luma and
    chroma in+out, pre-expanded vertical params, compact params."""
    lanes = max(16 * bt, 128)
    return swp * mb_h * (16 * lanes * 3 + 8 * lanes * 3 + PAR_W * bt)


def _pick_bt(B, mb_h, swp):
    """Largest power-of-two clip sub-batch whose VMEM blocks fit (x2 when
    the grid pipelines more than one program)."""
    bt = 1
    while bt * 2 <= B and B % (bt * 2) == 0:
        nxt = bt * 2
        mult = 2 if B // nxt > 1 else 1
        if _vmem_bytes(nxt, mb_h, swp) * mult > _VMEM_BUDGET:
            break
        bt = nxt
    return bt


def fits_vmem(mb_w: int, mb_h: int) -> bool:
    """Whether a single-clip program fits the VMEM budget (else callers
    should use the XLA skewed fallback)."""
    swp = skew_width(mb_w, mb_h) + _LEAD
    return _vmem_bytes(1, mb_h, swp) * 2 <= _VMEM_BUDGET


def _is_tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _interpret_default():
    return not _is_tpu_backend()


def deblock_stage_pallas(Y, U, V, meta, mb_w, mb_h, chroma_qp_offset,
                         interpret=None):
    """Drop-in replacement for recon_skewed.deblock_stage_skewed."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .deblock import mb_edge_params_b

    if interpret is None:
        interpret = _interpret_default()
    B = Y.shape[0]
    M = mb_w * mb_h
    n_steps = skew_width(mb_w, mb_h)
    swp = n_steps + _LEAD
    import os as _os

    _variant = _os.environ.get("HWANG_DEBLOCK_VARIANT", "auto")
    use_ring = (_variant == "ring"
                or (_variant == "auto" and not fits_vmem(mb_w, mb_h)))
    Bp = B
    if use_ring:
        # ring kernel: DMA slices need 128-aligned lanes, so bt must be
        # a multiple of 8 (the clip batch pads up when needed); VMEM
        # only holds a 4-column ring, capped ~24 MB
        Bp = (B + 7) & ~7
        per_col = mb_h * (16 + 8 + 16 + 8) * 16 + mb_h * PAR_W
        bt = 8
        for cand in (32, 24, 16):
            if Bp % cand == 0 and 4 * per_col * cand <= 24 * 1024 * 1024:
                bt = cand
                break
    else:
        bt = _pick_bt(B, mb_h, swp)
    G = Bp // bt

    params = mb_edge_params_b(meta, mb_w, mb_h, chroma_qp_offset)
    par = _pack_params(params, B, M)

    def to_cols(a):
        """[B, mbh, mw, D] -> lead-padded, skewed, column-major
        [B, SwP, mbh, D]."""
        s = skew(a, mb_w, mb_h)
        s = jnp.pad(s, ((0, 0), (0, 0), (_LEAD, 0), (0, 0)))
        return s.transpose(0, 2, 1, 3)

    def pack_lanes(a, rows, width):
        """[B, SwP, mbh, rows*width] -> [G, SwP, mbh*rows, width*bt]
        with lane index = column*bt + clip (clip batch zero-padded to
        Bp for the ring kernel's lane alignment)."""
        if Bp != B:
            a = jnp.pad(a, ((0, Bp - B),) + ((0, 0),) * (a.ndim - 1))
        a = a.reshape(G, bt, swp, mb_h, rows, width)
        a = a.transpose(0, 2, 3, 4, 5, 1)
        return a.reshape(G, swp, mb_h * rows, width * bt)

    def unpack_lanes(a, rows, width):
        a = a.reshape(G, swp, mb_h, rows, width, bt)
        a = a.transpose(0, 5, 1, 2, 3, 4)
        return a.reshape(G * bt, swp, mb_h, rows * width)[:B]

    par_cols = to_cols(par.reshape(B, mb_h, mb_w, PAR_W))
    if Bp != B:
        par_cols = jnp.pad(par_cols, ((0, Bp - B), (0, 0), (0, 0), (0, 0)))
    par_p = (
        par_cols
        .reshape(G, bt, swp, mb_h, PAR_W)
        .transpose(0, 2, 3, 4, 1)
        .reshape(G, swp, mb_h, PAR_W * bt)
    )

    # vertical params pre-expanded to pixel-row tile layout [16 rows,
    # 16 entries]: entry k = bs(e=k), tc0(e=k-4), alpha(e=k-8), beta(e=k-12)
    def rows16(x):
        return jnp.repeat(x, 4, axis=-1)

    ab_v = params["ab_v"]
    pv = jnp.stack(
        [rows16(params["bs_v"][:, :, e]) for e in range(4)]
        + [rows16(params["tc0_v"][:, :, e]) for e in range(4)]
        + [jnp.broadcast_to(ab_v[:, :, e, 0:1], (B, M, 16))
           for e in range(4)]
        + [jnp.broadcast_to(ab_v[:, :, e, 1:2], (B, M, 16))
           for e in range(4)],
        axis=-1,
    ).astype(jnp.uint8)                            # [B, M, 16row, 16k]
    pv_p = pack_lanes(to_cols(pv.reshape(B, mb_h, mb_w, 256)), 16, 16)

    # chroma vertical: [8 rows, 16 cols] with col = entry*2 + plane
    ab_cv = params["ab_cv"]
    pcv_k = jnp.stack(
        [params["bs_cv"][:, :, e] for e in range(2)]
        + [params["tc0_cv"][:, :, e] for e in range(2)]
        + [jnp.broadcast_to(ab_cv[:, :, e, 0:1], (B, M, 8))
           for e in range(2)]
        + [jnp.broadcast_to(ab_cv[:, :, e, 1:2], (B, M, 8))
           for e in range(2)],
        axis=-1,
    )                                              # [B, M, 8row, 8k]
    pcv = jnp.stack([pcv_k, pcv_k], axis=-1).reshape(
        B, M, 8, 16
    ).astype(jnp.uint8)
    pcv_p = pack_lanes(to_cols(pcv.reshape(B, mb_h, mb_w, 128)), 8, 16)
    y_p = pack_lanes(
        to_cols(
            frame_to_tiles(Y, mb_w, mb_h, 16).reshape(B, mb_h, mb_w, 256)
            .astype(jnp.uint8)
        ), 16, 16,
    )
    # chroma tile layout: [8 rows, 16 cols] = U columns 0-7 | V columns 0-7
    Uc = frame_to_tiles(U, mb_w, mb_h, 8)          # [B, mbh, mw, 8, 8]
    Vc = frame_to_tiles(V, mb_w, mb_h, 8)
    cuv = jnp.concatenate([Uc, Vc], axis=-1).reshape(B, mb_h, mb_w, 128)
    c_p = pack_lanes(to_cols(cuv.astype(jnp.uint8)), 8, 16)

    if not use_ring:
        kern = functools.partial(_kernel, mb_w=mb_w, mb_h=mb_h,
                                 n_steps=n_steps, bt=bt)

        def blk(r, w):
            return pl.BlockSpec(
                (1, swp, r, w), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )

        y_o, c_o = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[blk(mb_h * 16, 16 * bt), blk(mb_h * 8, 16 * bt),
                      blk(mb_h, PAR_W * bt), blk(mb_h * 16, 16 * bt),
                      blk(mb_h * 8, 16 * bt)],
            out_specs=[blk(mb_h * 16, 16 * bt), blk(mb_h * 8, 16 * bt)],
            out_shape=[
                jax.ShapeDtypeStruct(y_p.shape, jnp.uint8),
                jax.ShapeDtypeStruct(c_p.shape, jnp.uint8),
            ],
            input_output_aliases={0: 0, 1: 1},
            interpret=interpret,
            **({} if interpret else {
                "compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT,
                ),
            }),
        )(y_p, c_p, par_p, pv_p, pcv_p)
    else:
        kern = functools.partial(_kernel_ring, mb_w=mb_w, mb_h=mb_h,
                                 n_steps=n_steps, bt=bt)
        mbh8 = (mb_h + 7) & ~7
        par_p = jnp.pad(par_p, ((0, 0), (0, 0), (0, mbh8 - mb_h), (0, 0)))
        anyspec = pl.BlockSpec(memory_space=pl.ANY)
        y_o, c_o = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[anyspec] * 5,
            out_specs=[anyspec] * 2,
            out_shape=[
                jax.ShapeDtypeStruct(y_p.shape, jnp.uint8),
                jax.ShapeDtypeStruct(c_p.shape, jnp.uint8),
            ],
            scratch_shapes=[
                pltpu.VMEM((4, mb_h * 16, 16 * bt), jnp.uint8),
                pltpu.VMEM((4, mb_h * 8, 16 * bt), jnp.uint8),
                pltpu.VMEM((4, mbh8, PAR_W * bt), jnp.uint8),
                pltpu.VMEM((4, mb_h * 16, 16 * bt), jnp.uint8),
                pltpu.VMEM((4, mb_h * 8, 16 * bt), jnp.uint8),
                pltpu.SemaphoreType.DMA((5, 4)),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
            interpret=interpret,
            **({} if interpret else {
                "compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT,
                ),
            }),
        )(y_p, c_p, par_p, pv_p, pcv_p)

    def from_cols(s):
        return unskew(
            s.transpose(0, 2, 1, 3)[:, :, _LEAD:].astype(jnp.int32),
            mb_w, mb_h,
        )

    tiles_y = from_cols(unpack_lanes(y_o, 16, 16)).reshape(
        B, mb_h, mb_w, 16, 16
    )
    Yn = tiles_to_frame(tiles_y, mb_w, mb_h, 16)
    tiles_c = from_cols(unpack_lanes(c_o, 8, 16)).reshape(
        B, mb_h, mb_w, 8, 16
    )
    Un = tiles_to_frame(tiles_c[..., :8], mb_w, mb_h, 8)
    Vn = tiles_to_frame(tiles_c[..., 8:], mb_w, mb_h, 8)
    return Yn, Un, Vn


def _kernel_ring(y_in, c_in, par_in, pv_in, pcv_in, y_out, c_out,
                 y_ring, c_ring, par_ring, pv_ring, pcv_ring,
                 in_sems, out_sems, *, mb_w, mb_h, n_steps, bt):
    # par arrays carry an 8-padded mb_h dim (DMA slices must be
    # tile-aligned in the sublane dimension); sliced back before use
    """Ring-DMA variant for frames whose whole skewed buffers exceed
    VMEM (1080p-class): the arrays stay in HBM; a 4-column VMEM ring is
    double-buffer DMA'd through the same wavefront step math."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)

    def in_dma(arr, ring, ai, p, slot):
        return pltpu.make_async_copy(
            arr.at[g, p], ring.at[slot], in_sems.at[ai, slot]
        )

    def out_dma(arr, ring, ai, p, slot):
        return pltpu.make_async_copy(
            ring.at[slot], arr.at[g, p], out_sems.at[ai, slot]
        )

    ins = ((y_in, y_ring, 0), (c_in, c_ring, 1), (par_in, par_ring, 2),
           (pv_in, pv_ring, 3), (pcv_in, pcv_ring, 4))
    outs = ((y_out, y_ring, 0), (c_out, c_ring, 1))

    # warmup: columns 1..3 in; a dummy out of (lead) column 0 from slot 0
    # so the steady-state prefetch can wait unconditionally
    for p in (1, 2, 3):
        for arr, ring, ai in ins:
            in_dma(arr, ring, ai, p, p % 4).start()
    for arr, ring, ai in outs:
        out_dma(arr, ring, ai, 0, 0).start()
    # columns 1-2 are only ever read as left/top, never as the current
    # column; their in-DMAs still need waiting (dangling DMA semaphores
    # fault at kernel exit) and must land before step 0 reads them
    for p in (1, 2):
        for arr, ring, ai in ins:
            in_dma(arr, ring, ai, p, p % 4).wait()

    def step(t, prefetch):
        p = t + _LEAD
        s_cur = p % 4
        s_left = (p - 1) % 4
        s_top = (p - 2) % 4
        for arr, ring, ai in ins:
            in_dma(arr, ring, ai, p, s_cur).wait()
        (ncy, nly, nty, ncc, nlc, ntc) = _deblock_step(
            t, y_ring[s_cur], y_ring[s_left], y_ring[s_top],
            c_ring[s_cur], c_ring[s_left], c_ring[s_top],
            par_ring[s_cur][:mb_h], pv_ring[s_cur], pcv_ring[s_cur],
            mb_w=mb_w, mb_h=mb_h, bt=bt,
        )
        y_ring[s_cur] = ncy
        y_ring[s_left] = nly
        y_ring[s_top] = nty
        c_ring[s_cur] = ncc
        c_ring[s_left] = nlc
        c_ring[s_top] = ntc
        # column p-2 is final: flush it
        for arr, ring, ai in outs:
            out_dma(arr, ring, ai, p - 2, s_top).start()
        if prefetch:
            # prefetch column p+1 into slot (p+1)%4 == (p-3)%4, whose
            # column was flushed LAST step — wait that flush first
            pn = p + 1
            s_next = pn % 4
            for arr, ring, ai in outs:
                out_dma(arr, ring, ai, pn - 4, s_next).wait()
            for arr, ring, ai in ins:
                in_dma(arr, ring, ai, pn, s_next).start()

    def body(t, _):
        step(t, True)
        return 0

    # the last iteration is peeled: it must not prefetch past the array
    jax.lax.fori_loop(0, n_steps - 1, body, 0)
    step(n_steps - 1, False)

    # tail: drain the two loop flushes the final prefetch no longer
    # waits for, then flush the last two columns (left and cur of the
    # final step)
    last = n_steps + _LEAD - 1
    for arr, ring, ai in outs:
        out_dma(arr, ring, ai, last - 3, (last - 3) % 4).wait()
        out_dma(arr, ring, ai, last - 2, (last - 2) % 4).wait()
        out_dma(arr, ring, ai, last - 1, (last - 1) % 4).start()
        out_dma(arr, ring, ai, last, last % 4).start()
        out_dma(arr, ring, ai, last - 1, (last - 1) % 4).wait()
        out_dma(arr, ring, ai, last, last % 4).wait()
