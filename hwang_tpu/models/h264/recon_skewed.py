"""Skewed-wavefront intra + deblock stages: zero-gather/scatter wavefronts.

See skew.py for the layout.  Each wavefront step is:
  one dynamic_slice of a few adjacent skewed columns
  -> dense compute over [B(clips) x mb_h(lanes)] macroblocks
  -> 1-3 dynamic_update_slice column writes.

These replace recon_batched._intra_stage_b / _deblock_b (which used
flat-index gathers/scatters — functionally identical but ~50x slower on
the TPU, where general scatter serializes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import intra as ops_intra
from ...ops.deblock import filter_lines_chroma, filter_lines_luma
from .recon import _BTR_STATIC, _DEC_ORDER
from .skew import (
    frame_to_tiles,
    shift_rows_down,
    shift_rows_up,
    skew,
    skew_width,
    tiles_to_frame,
    unskew,
)

_LEAD = 3  # zero lead columns so step t can always slice [t-3 .. t]


def _skew_pad(a, mb_w, mb_h):
    """[B, M, D...] -> lead-padded skewed [B, mb_h, Sw+LEAD, D...]."""
    B, M = a.shape[:2]
    s = skew(a.reshape((B, mb_h, mb_w) + a.shape[2:]), mb_w, mb_h)
    pad = [(0, 0), (0, 0), (_LEAD, 0)] + [(0, 0)] * (s.ndim - 3)
    return jnp.pad(s, pad)


def _lane_mask(mb_w: int, mb_h: int):
    """[n_steps, mb_h] bool: lane r active at step t iff 0 <= t-2r < mb_w."""
    n_steps = skew_width(mb_w, mb_h)
    t = np.arange(n_steps)[:, None]
    r = np.arange(mb_h)[None, :]
    c = t - 2 * r
    return (c >= 0) & (c < mb_w)


# ---------------------------------------------------------------------------
# Intra stage
# ---------------------------------------------------------------------------


def intra_stage_skewed(Y, U, V, fr, mb_w, mb_h, luma_blocks, luma_res16,
                       chroma_res, res8=None):
    """Y [B,H,W] int32 (inter-reconstructed); returns updated planes.
    res8 [B,M,4,8,8] (High-profile 8x8 residuals) enables the intra 8x8
    path for MBs flagged in fr["transform8"]."""
    B = Y.shape[0]
    n_steps = skew_width(mb_w, mb_h)
    lanes = jnp.asarray(_lane_mask(mb_w, mb_h))

    Sy = _skew_pad(
        frame_to_tiles(Y, mb_w, mb_h, 16).reshape(B, mb_h, mb_w, 256)
        .reshape(B, mb_h * mb_w, 256),
        mb_w, mb_h,
    )                                                  # [B, mb_h, Sw+3, 256]
    Uc = frame_to_tiles(U, mb_w, mb_h, 8).reshape(B, mb_h * mb_w, 64)
    Vc = frame_to_tiles(V, mb_w, mb_h, 8).reshape(B, mb_h * mb_w, 64)
    Sc = _skew_pad(
        jnp.stack([Uc, Vc], axis=-2), mb_w, mb_h
    )                                                  # [B, mb_h, Sw+3, 2, 64]

    kind_s = _skew_pad(fr["mb_kind"][..., None], mb_w, mb_h)[..., 0]
    avail_s = _skew_pad(fr["avail"][..., None], mb_w, mb_h)[..., 0]
    i16_s = _skew_pad(fr["i16_mode"][..., None], mb_w, mb_h)[..., 0]
    cm_s = _skew_pad(fr["chroma_mode"][..., None], mb_w, mb_h)[..., 0]
    i4_s = _skew_pad(fr["i4_modes"], mb_w, mb_h)
    res16_s = _skew_pad(luma_res16.reshape(B, -1, 256), mb_w, mb_h)
    resb_s = _skew_pad(luma_blocks.reshape(B, -1, 16, 16), mb_w, mb_h)
    cres_s = _skew_pad(chroma_res.reshape(B, -1, 2, 64), mb_w, mb_h)
    if res8 is not None:
        t8_s = _skew_pad(fr["transform8"][..., None], mb_w, mb_h)[..., 0]
        res8_s = _skew_pad(res8.reshape(B, -1, 4, 64), mb_w, mb_h)

    def col(a, t, n=1):
        start = (0, 0, t) + (0,) * (a.ndim - 3)
        size = (a.shape[0], a.shape[1], n) + a.shape[3:]
        return jax.lax.dynamic_slice(a, start, size)

    def step(carry, t):
        Sy, Sc = carry
        lane = lanes[t][None, :]                       # [1, mb_h]
        kind = col(kind_s, t + _LEAD)[:, :, 0]
        is_i4 = kind == 2
        is_i16 = kind == 3
        w_any = lane & (is_i4 | is_i16)

        def body(ops):
            Sy, Sc = ops
            av = col(avail_s, t + _LEAD)[:, :, 0]
            have_l = (av & 1) == 1
            have_t = (av & 2) == 2
            have_tr = (av & 4) == 4
            have_tl = (av & 8) == 8

            win = col(Sy, t, 4).reshape(B, mb_h, 4, 16, 16)
            TL = shift_rows_down(win[:, :, 0])
            TOP = shift_rows_down(win[:, :, 1])
            TRn = shift_rows_down(win[:, :, 2])
            LEFT = win[:, :, 2]
            CUR = win[:, :, 3]
            tl = TL[..., 15, 15]
            top16 = TOP[..., 15, :]
            tr4 = TRn[..., 15, :4]
            left16 = LEFT[..., :, 15]
            top_strip = jnp.concatenate(
                [tl[..., None], top16, tr4], axis=-1
            )                                          # [B, mb_h, 21]

            flat = lambda a: a.reshape((B * mb_h,) + a.shape[2:])

            pred16 = ops_intra.predict_i16(
                flat(col(i16_s, t + _LEAD)[:, :, 0]), flat(left16),
                flat(top_strip[..., 1:17]), flat(tl),
                flat(have_l), flat(have_t),
            ).reshape(B, mb_h, 16, 16)
            res16 = col(res16_s, t + _LEAD)[:, :, 0].reshape(B, mb_h, 16, 16)
            mb16 = jnp.clip(pred16 + res16, 0, 255)

            T = jnp.zeros((B, mb_h, 17, 21), jnp.int32)
            T = T.at[:, :, 0, :].set(top_strip)
            T = T.at[:, :, 1:, 0].set(left16)
            blocks_res = col(resb_s, t + _LEAD)[:, :, 0]  # [B, mb_h, 16, 16]
            modes4 = col(i4_s, t + _LEAD)[:, :, 0]
            for db in _DEC_ORDER:
                x4, y4 = db & 3, db >> 2
                r0, c0 = 4 * y4, 4 * x4
                left = T[:, :, r0 + 1 : r0 + 5, c0]
                top = T[:, :, r0, c0 + 1 : c0 + 5]
                tlb = T[:, :, r0, c0]
                trr = T[:, :, r0, c0 + 5 : c0 + 9]
                bl = (x4 > 0) | have_l
                bt = (y4 > 0) | have_t
                if y4 == 0:
                    btr = ((x4 < 3) & have_t) | ((x4 == 3) & have_tr)
                else:
                    btr = jnp.broadcast_to(
                        jnp.asarray(bool(_BTR_STATIC[db])), bl.shape
                    )
                tr_eff = jnp.where(
                    btr[..., None], trr,
                    jnp.where(bt[..., None], top[..., 3:4], 0),
                )
                pred = ops_intra.predict_i4x4(
                    flat(modes4[..., db]), flat(left), flat(top), flat(tlb),
                    flat(tr_eff), flat(bl), flat(bt),
                ).reshape(B, mb_h, 4, 4)
                blk = jnp.clip(
                    pred + blocks_res[:, :, db].reshape(B, mb_h, 4, 4),
                    0, 255,
                )
                T = jax.lax.dynamic_update_slice(
                    T, blk, (0, 0, r0 + 1, c0 + 1)
                )

            mbpix = jnp.where(is_i4[..., None, None], T[:, :, 1:, 1:17], mb16)

            if res8 is not None:
                # ---- intra 8x8 path (High profile): 4 quads in raster
                # order on a 17x25 canvas (tl + 16 top + 8 top-right)
                t8 = col(t8_s, t + _LEAD)[:, :, 0] != 0
                tr8 = TRn[..., 15, :8]
                strip8 = jnp.concatenate(
                    [tl[..., None], top16, tr8], axis=-1
                )                                      # [B, mb_h, 25]
                T8 = jnp.zeros((B, mb_h, 17, 25), jnp.int32)
                T8 = T8.at[:, :, 0, :].set(strip8)
                T8 = T8.at[:, :, 1:, 0].set(left16)
                res8c = col(res8_s, t + _LEAD)[:, :, 0].reshape(
                    B, mb_h, 4, 8, 8
                )
                for q in range(4):
                    qx, qy = q & 1, q >> 1
                    r0, c0 = 8 * qy, 8 * qx
                    left8 = T8[:, :, r0 + 1 : r0 + 9, c0]
                    top16b = T8[:, :, r0, c0 + 1 : c0 + 17]
                    tlb = T8[:, :, r0, c0]
                    bl = (qx > 0) | have_l
                    bt = (qy > 0) | have_t
                    if qy == 0:
                        btr = ((qx == 0) & have_t) | ((qx == 1) & have_tr)
                    else:
                        btr = jnp.broadcast_to(
                            jnp.asarray(qx == 0), bl.shape
                        )
                    if q == 0:
                        btl = have_tl
                    elif q == 1:
                        btl = have_t
                    elif q == 2:
                        btl = have_l
                    else:
                        btl = jnp.broadcast_to(jnp.asarray(True), bl.shape)
                    # top-right sample substitution before filtering
                    top16_eff = jnp.where(
                        btr[..., None],
                        top16b,
                        jnp.concatenate(
                            [top16b[..., :8],
                             jnp.repeat(top16b[..., 7:8], 8, axis=-1)],
                            axis=-1,
                        ),
                    )
                    mode8 = modes4[..., (qy * 2) * 4 + qx * 2]
                    pred8 = ops_intra.predict_i8x8(
                        flat(mode8), flat(left8), flat(top16_eff),
                        flat(tlb), flat(bl), flat(bt), flat(btl),
                    ).reshape(B, mb_h, 8, 8)
                    blk8 = jnp.clip(pred8 + res8c[:, :, q], 0, 255)
                    T8 = jax.lax.dynamic_update_slice(
                        T8, blk8, (0, 0, r0 + 1, c0 + 1)
                    )
                mbpix = jnp.where(
                    (is_i4 & t8)[..., None, None],
                    T8[:, :, 1:, 1:17],
                    mbpix,
                )

            newcur = jnp.where(w_any[..., None, None], mbpix, CUR)
            Sy = jax.lax.dynamic_update_slice(
                Sy, newcur.reshape(B, mb_h, 1, 256), (0, 0, t + _LEAD, 0)
            )

            # chroma
            cwin = col(Sc, t, 4).reshape(B, mb_h, 4, 2, 8, 8)
            TLc = shift_rows_down(cwin[:, :, 0])
            TOPc = shift_rows_down(cwin[:, :, 1])
            LEFTc = cwin[:, :, 2]
            CURc = cwin[:, :, 3]
            tlc = TLc[..., 7, 7]                       # [B, mb_h, 2]
            topc = TOPc[..., 7, :]                     # [B, mb_h, 2, 8]
            leftc = LEFTc[..., :, 7]
            cres = col(cres_s, t + _LEAD)[:, :, 0].reshape(B, mb_h, 2, 8, 8)
            cmode = col(cm_s, t + _LEAD)[:, :, 0]
            flat2 = lambda a: a.reshape((B * mb_h * 2,) + a.shape[3:])
            rep2 = lambda a: jnp.repeat(a.reshape(-1), 2)
            predc = ops_intra.predict_chroma(
                rep2(cmode), flat2(leftc), flat2(topc), flat2(tlc),
                rep2(have_l), rep2(have_t),
            ).reshape(B, mb_h, 2, 8, 8)
            mbc = jnp.clip(predc + cres, 0, 255)
            newc = jnp.where(w_any[..., None, None, None], mbc, CURc)
            Sc = jax.lax.dynamic_update_slice(
                Sc, newc.reshape(B, mb_h, 1, 2, 64), (0, 0, t + _LEAD, 0, 0)
            )
            return Sy, Sc

        Sy, Sc = jax.lax.cond(jnp.any(w_any), body, lambda o: o, (Sy, Sc))
        return (Sy, Sc), None

    (Sy, Sc), _ = jax.lax.scan(step, (Sy, Sc), jnp.arange(n_steps))

    tiles_y = unskew(Sy[:, :, _LEAD:], mb_w, mb_h).reshape(
        B, mb_h, mb_w, 16, 16
    )
    Y = tiles_to_frame(tiles_y, mb_w, mb_h, 16)
    tiles_c = unskew(Sc[:, :, _LEAD:], mb_w, mb_h).reshape(
        B, mb_h, mb_w, 2, 8, 8
    )
    U = tiles_to_frame(tiles_c[:, :, :, 0], mb_w, mb_h, 8)
    V = tiles_to_frame(tiles_c[:, :, :, 1], mb_w, mb_h, 8)
    return Y, U, V


# ---------------------------------------------------------------------------
# Deblock stage
# ---------------------------------------------------------------------------


def deblock_stage_skewed(Y, U, V, meta, mb_w, mb_h, chroma_qp_offset):
    from ...ops.deblock import mb_edge_params_b

    B = Y.shape[0]
    n_steps = skew_width(mb_w, mb_h)
    lanes = jnp.asarray(_lane_mask(mb_w, mb_h))
    has_left = jnp.asarray(
        ((np.arange(n_steps)[:, None] - 2 * np.arange(mb_h)[None, :]) > 0)
    ) & jnp.asarray(_lane_mask(mb_w, mb_h))
    has_top = lanes & (jnp.arange(mb_h)[None, :] > 0)

    params = mb_edge_params_b(meta, mb_w, mb_h, chroma_qp_offset)
    p_s = {k: _skew_pad(v, mb_w, mb_h) for k, v in params.items()}

    Sy = _skew_pad(
        frame_to_tiles(Y, mb_w, mb_h, 16).reshape(B, mb_h * mb_w, 256),
        mb_w, mb_h,
    )
    Uc = frame_to_tiles(U, mb_w, mb_h, 8).reshape(B, mb_h * mb_w, 64)
    Vc = frame_to_tiles(V, mb_w, mb_h, 8).reshape(B, mb_h * mb_w, 64)
    Sc = _skew_pad(jnp.stack([Uc, Vc], axis=-2), mb_w, mb_h)

    def col(a, t, n=1):
        start = (0, 0, t) + (0,) * (a.ndim - 3)
        size = (a.shape[0], a.shape[1], n) + a.shape[3:]
        return jax.lax.dynamic_slice(a, start, size)

    def step(carry, t):
        Sy, Sc = carry
        lane = lanes[t][None, :]
        l_ok = has_left[t][None, :]
        t_ok = has_top[t][None, :]

        # ---- luma: window cols t-2 .. t (physical t+1 .. t+3)
        win = col(Sy, t + 1, 3).reshape(B, mb_h, 3, 16, 16)
        TOPt = shift_rows_down(win[:, :, 0])   # tile (r-1, c) from col t-2
        LEFT = win[:, :, 1]                    # tile (r, c-1) at col t-1
        CUR = win[:, :, 2]
        T = jnp.zeros((B, mb_h, 20, 20), jnp.int32)
        T = T.at[:, :, 4:, 4:].set(CUR)
        T = T.at[:, :, 4:, :4].set(LEFT[..., :, 12:16])
        T = T.at[:, :, :4, 4:].set(TOPt[..., 12:16, :])

        bs_v = col(p_s["bs_v"], t + _LEAD)[:, :, 0]
        tc_v = col(p_s["tc0_v"], t + _LEAD)[:, :, 0]
        ab_v = col(p_s["ab_v"], t + _LEAD)[:, :, 0]
        for e in range(4):
            cc = 4 + 4 * e
            w = T[:, :, 4:20, cc - 4 : cc + 4]
            p = w[..., :4][..., ::-1]
            q = w[..., 4:]
            bs = jnp.repeat(bs_v[:, :, e], 4, axis=-1)
            tc0 = jnp.repeat(tc_v[:, :, e], 4, axis=-1)
            np_, nq = filter_lines_luma(
                p, q, bs, ab_v[:, :, e, 0:1], ab_v[:, :, e, 1:2], tc0
            )
            out = jnp.concatenate([np_[..., ::-1], nq], axis=-1)
            T = jax.lax.dynamic_update_slice(T, out, (0, 0, 4, cc - 4))
        bs_h = col(p_s["bs_h"], t + _LEAD)[:, :, 0]
        tc_h = col(p_s["tc0_h"], t + _LEAD)[:, :, 0]
        ab_h = col(p_s["ab_h"], t + _LEAD)[:, :, 0]
        for e in range(4):
            rr = 4 + 4 * e
            w = T[:, :, rr - 4 : rr + 4, 4:20].transpose(0, 1, 3, 2)
            p = w[..., :4][..., ::-1]
            q = w[..., 4:]
            bs = jnp.repeat(bs_h[:, :, e], 4, axis=-1)
            tc0 = jnp.repeat(tc_h[:, :, e], 4, axis=-1)
            np_, nq = filter_lines_luma(
                p, q, bs, ab_h[:, :, e, 0:1], ab_h[:, :, e, 1:2], tc0
            )
            out = jnp.concatenate(
                [np_[..., ::-1], nq], axis=-1
            ).transpose(0, 1, 3, 2)
            T = jax.lax.dynamic_update_slice(T, out, (0, 0, rr - 4, 4))

        newcur = jnp.where(lane[..., None, None], T[:, :, 4:, 4:], CUR)
        Sy = jax.lax.dynamic_update_slice(
            Sy, newcur.reshape(B, mb_h, 1, 256), (0, 0, t + _LEAD, 0)
        )
        newleft = jnp.where(
            (lane & l_ok)[..., None, None],
            LEFT.at[..., :, 13:16].set(T[:, :, 4:, 1:4]),
            LEFT,
        )
        Sy = jax.lax.dynamic_update_slice(
            Sy, newleft.reshape(B, mb_h, 1, 256), (0, 0, t - 1 + _LEAD, 0)
        )
        newtop_lane = jnp.where(
            (lane & t_ok)[..., None, None],
            TOPt.at[..., 13:16, :].set(T[:, :, 1:4, 4:]),
            TOPt,
        )
        # lane r computed the tile belonging to row r-1: shift back up,
        # keeping原 values where no write happened
        wrote = shift_rows_up(
            jnp.broadcast_to((lane & t_ok)[..., None, None],
                             newtop_lane.shape).astype(jnp.int32)
        ) > 0
        newtop = jnp.where(wrote, shift_rows_up(newtop_lane), win[:, :, 0])
        Sy = jax.lax.dynamic_update_slice(
            Sy, newtop.reshape(B, mb_h, 1, 256), (0, 0, t - 2 + _LEAD, 0)
        )

        # ---- chroma (both planes stacked)
        cwin = col(Sc, t + 1, 3).reshape(B, mb_h, 3, 2, 8, 8)
        TOPc = shift_rows_down(cwin[:, :, 0])
        LEFTc = cwin[:, :, 1]
        CURc = cwin[:, :, 2]
        Tc = jnp.zeros((B, mb_h, 2, 10, 10), jnp.int32)
        Tc = Tc.at[:, :, :, 2:, 2:].set(CURc)
        Tc = Tc.at[:, :, :, 2:, :2].set(LEFTc[..., :, 6:8])
        Tc = Tc.at[:, :, :, :2, 2:].set(TOPc[..., 6:8, :])

        bs_cv = col(p_s["bs_cv"], t + _LEAD)[:, :, 0]
        tc_cv = col(p_s["tc0_cv"], t + _LEAD)[:, :, 0]
        ab_cv = col(p_s["ab_cv"], t + _LEAD)[:, :, 0]
        for e in range(2):
            cc = 2 + 4 * e
            w = Tc[:, :, :, 2:, cc - 2 : cc + 2]
            p = w[..., :2][..., ::-1]
            q = w[..., 2:]
            np_, nq = filter_lines_chroma(
                p, q, bs_cv[:, :, None, e], ab_cv[:, :, None, e, 0:1],
                ab_cv[:, :, None, e, 1:2], tc_cv[:, :, None, e],
            )
            out = jnp.concatenate([np_[..., ::-1], nq], axis=-1)
            Tc = jax.lax.dynamic_update_slice(Tc, out, (0, 0, 0, 2, cc - 2))
        bs_ch = col(p_s["bs_ch"], t + _LEAD)[:, :, 0]
        tc_ch = col(p_s["tc0_ch"], t + _LEAD)[:, :, 0]
        ab_ch = col(p_s["ab_ch"], t + _LEAD)[:, :, 0]
        for e in range(2):
            rr = 2 + 4 * e
            w = Tc[:, :, :, rr - 2 : rr + 2, 2:].transpose(0, 1, 2, 4, 3)
            p = w[..., :2][..., ::-1]
            q = w[..., 2:]
            np_, nq = filter_lines_chroma(
                p, q, bs_ch[:, :, None, e], ab_ch[:, :, None, e, 0:1],
                ab_ch[:, :, None, e, 1:2], tc_ch[:, :, None, e],
            )
            out = jnp.concatenate(
                [np_[..., ::-1], nq], axis=-1
            ).transpose(0, 1, 2, 4, 3)
            Tc = jax.lax.dynamic_update_slice(Tc, out, (0, 0, 0, rr - 2, 2))

        newcurc = jnp.where(
            lane[..., None, None, None], Tc[:, :, :, 2:, 2:], CURc
        )
        Sc = jax.lax.dynamic_update_slice(
            Sc, newcurc.reshape(B, mb_h, 1, 2, 64), (0, 0, t + _LEAD, 0, 0)
        )
        newleftc = jnp.where(
            (lane & l_ok)[..., None, None, None],
            LEFTc.at[..., :, 7:8].set(Tc[:, :, :, 2:, 1:2]),
            LEFTc,
        )
        Sc = jax.lax.dynamic_update_slice(
            Sc, newleftc.reshape(B, mb_h, 1, 2, 64),
            (0, 0, t - 1 + _LEAD, 0, 0),
        )
        newtopc_lane = jnp.where(
            (lane & t_ok)[..., None, None, None],
            TOPc.at[..., 7:8, :].set(Tc[:, :, :, 1:2, 2:]),
            TOPc,
        )
        wrotec = shift_rows_up(
            jnp.broadcast_to((lane & t_ok)[..., None, None, None],
                             newtopc_lane.shape).astype(jnp.int32)
        ) > 0
        newtopc = jnp.where(wrotec, shift_rows_up(newtopc_lane), cwin[:, :, 0])
        Sc = jax.lax.dynamic_update_slice(
            Sc, newtopc.reshape(B, mb_h, 1, 2, 64), (0, 0, t - 2 + _LEAD, 0, 0)
        )
        return (Sy, Sc), None

    (Sy, Sc), _ = jax.lax.scan(step, (Sy, Sc), jnp.arange(n_steps))

    tiles_y = unskew(Sy[:, :, _LEAD:], mb_w, mb_h).reshape(
        B, mb_h, mb_w, 16, 16
    )
    Y = tiles_to_frame(tiles_y, mb_w, mb_h, 16)
    tiles_c = unskew(Sc[:, :, _LEAD:], mb_w, mb_h).reshape(
        B, mb_h, mb_w, 2, 8, 8
    )
    U = tiles_to_frame(tiles_c[:, :, :, 0], mb_w, mb_h, 8)
    V = tiles_to_frame(tiles_c[:, :, :, 1], mb_w, mb_h, 8)
    return Y, U, V
