"""Batched TPU H.264 GOP reconstruction — the production decode path.

Same algorithm as recon.py but with the clip batch as a native leading
dimension and tile-carried wavefront steps:

  - every wavefront step gathers ONE bordered tile per active MB (per
    clip), runs the full intra block sequence / deblock edge sequence on
    in-register tiles with STATIC offsets, and scatters once — ~6 memory
    ops per step instead of ~70, with B x diagonal-width MBs of work per
    op (the VPU stays busy and the sequential-step overhead is amortized
    across the whole clip batch);
  - no jax.vmap: vmap-of-scan of this program miscompiles on the TPU
    runtime (worker crash, empirically bisected), and the hand-batched
    form is faster anyway.

Bit-exactness contract unchanged: output == ref_recon == libavcodec
(tests/test_jax_recon.py::test_batched_*).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import intra as ops_intra
from ...ops import mc as ops_mc
from ...ops.deblock import filter_lines_chroma, filter_lines_luma
from ...ops.transforms import chroma_qp_from_luma
from ...ops.transforms_batched import chroma_residual_b, luma_residual_b
from ...ops.wavefront import schedule
from .recon import GopArrays, _DEC_ORDER, _BTR_STATIC

_MARGIN = ops_mc._MARGIN


def stack_tensors(tensors, pad_frames: int) -> GopArrays:
    """Stack a list of entropy.GopTensors into a batched GopArrays with a
    leading clip axis, padding the frame axis to `pad_frames`."""
    from .recon import weights_or_identity

    fields = {}
    names = [
        f for f in GopArrays._fields
        if f not in ("n_valid_frames", "weights", "mv_l1", "refidx_l1",
                     "ref_map_l1", "is_ref", "bi_w", "transform8",
                     "scaling_w4", "scaling_w8", "ring_slot",
                     "weights_l1", "bi_explicit", "coeff_all")
    ]
    for name in names:
        arrs = []
        for t in tensors:
            a = getattr(t, "avail" if name == "avail" else name)
            F = a.shape[0]
            if pad_frames != F:
                a = np.pad(a, [(0, pad_frames - F)] + [(0, 0)] * (a.ndim - 1))
            arrs.append(a.astype(np.int32))
        s = np.stack(arrs)
        if s.ndim > 3:  # flat at-rest contract (see packed.unpack)
            s = s.reshape(s.shape[0], s.shape[1], -1)
        fields[name] = jnp.asarray(s)
    fields["n_valid_frames"] = jnp.asarray(
        np.array([t.n_frames for t in tensors], np.int32)
    )
    from .recon import ring_slot_or_fifo

    rs = np.full((len(tensors), pad_frames), -1, np.int32)
    for b, t in enumerate(tensors):
        rs[b, : t.n_frames] = ring_slot_or_fifo(t)
    fields["ring_slot"] = jnp.asarray(rs)
    if any(t.weight_flag is not None and t.weight_flag.any() for t in tensors):
        from .recon import _IDENTITY_WEIGHT

        w = np.broadcast_to(
            _IDENTITY_WEIGHT, (len(tensors), pad_frames, 16, 8)
        ).copy().astype(np.int32)
        for b, t in enumerate(tensors):
            w[b, : t.n_frames] = weights_or_identity(t)
        fields["weights"] = jnp.asarray(w.reshape(len(tensors), pad_frames,
                                                  128))
    else:
        fields["weights"] = None
    if any(getattr(t, "scaling_w4", None) is not None for t in tensors):
        sw4 = np.full((len(tensors), 6, 16), 16, np.int32)
        sw8 = np.full((len(tensors), 2, 64), 16, np.int32)
        for b, t in enumerate(tensors):
            if getattr(t, "scaling_w4", None) is not None:
                sw4[b] = t.scaling_w4
                sw8[b] = t.scaling_w8
        fields["scaling_w4"] = jnp.asarray(sw4)
        fields["scaling_w8"] = jnp.asarray(sw8)
    else:
        fields["scaling_w4"] = None
        fields["scaling_w8"] = None
    if any(t.transform8 is not None and t.transform8.any() for t in tensors):
        a = np.zeros((len(tensors), pad_frames, tensors[0].n_mbs), np.int32)
        for b, t in enumerate(tensors):
            a[b, : t.n_frames] = t.transform8
        fields["transform8"] = jnp.asarray(a)
    else:
        fields["transform8"] = None
    if any((t.frame_type == 1).any() for t in tensors):
        from .recon import bipred_pair_weights

        def pad_stack(get, fill, shape_tail, dtype):
            a = np.full((len(tensors), pad_frames) + shape_tail, fill, dtype)
            for b, t in enumerate(tensors):
                a[b, : t.n_frames] = get(t)
            a = a.astype(np.int32)
            if a.ndim > 3:  # flat at-rest contract (see packed.unpack)
                a = a.reshape(a.shape[0], a.shape[1], -1)
            return jnp.asarray(a)

        from .recon import explicit_b_frames, weights_l1_or_identity

        if any(explicit_b_frames(t).any() for t in tensors):
            from .recon import _IDENTITY_WEIGHT

            w1 = np.broadcast_to(
                _IDENTITY_WEIGHT, (len(tensors), pad_frames, 16, 8)
            ).copy().astype(np.int32)
            be = np.zeros((len(tensors), pad_frames), np.int32)
            for b, t in enumerate(tensors):
                w1[b, : t.n_frames] = weights_l1_or_identity(t)
                be[b, : t.n_frames] = explicit_b_frames(t)
            fields["weights_l1"] = jnp.asarray(
                w1.reshape(len(tensors), pad_frames, 128))
            fields["bi_explicit"] = jnp.asarray(be)
        M = tensors[0].n_mbs
        fields["mv_l1"] = pad_stack(lambda t: t.mv_l1, 0, (
            M, 16, 2), np.int32)
        fields["refidx_l1"] = pad_stack(lambda t: t.refidx_l1, -1, (
            M, 4), np.int32)
        fields["ref_map_l1"] = pad_stack(lambda t: t.ref_map_l1, -1, (16,),
                                         np.int32)
        fields["is_ref"] = pad_stack(lambda t: t.frame_is_ref, 1, (),
                                     np.int32)
        fields["bi_w"] = pad_stack(bipred_pair_weights, 32, (16, 16, 2),
                                   np.int32)
    return GopArrays(**fields)


# ---------------------------------------------------------------------------
# Inter stage (batched)
# ---------------------------------------------------------------------------


def _assemble_b(blocks, mb_w, mb_h, s):
    """[B, M, s, s] -> [B, mb_h*s, mb_w*s]."""
    B = blocks.shape[0]
    return (
        blocks.reshape(B, mb_h, mb_w, s, s)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, mb_h * s, mb_w * s)
    )


def _rep2(a, n):
    return jnp.repeat(jnp.repeat(a, n, axis=-2), n, axis=-1)


def _repvh(a, nv, nh):
    out = jnp.repeat(a, nv, axis=-2)
    return jnp.repeat(out, nh, axis=-1) if nh > 1 else out


def _mc_mode() -> str:
    """MC gather formulation (HWANG_MC): pixel | wide | wide2 | yquad.

    Default wide2 (paired-word flat ring).  yquad's 32-byte rows halve
    the gather count (1.6x the gather stage, tools/mcab.py) but its ring
    relayout — a stride-4 row zip XLA lowers as a slow lane-crossing
    transpose — currently costs more than the gather win at every
    measured size; it stays selectable for hardware where the tradeoff
    flips."""
    import os

    return os.environ.get("HWANG_MC", "wide2")


def _inter_stage_b(fr, ring, mb_w, mb_h, luma_res, chroma_res):
    B, M = fr["mb_kind"].shape
    H, W = mb_h * 16, mb_w * 16
    planes_y, ring_u, ring_v, ring_ids = ring  # ring_u holds BOTH chroma
    # plane sets; ring_v unused in this layout.  ring_ids is [B, R].

    def mc_pass(refidx, ref_map, mv):
        """One motion-compensation pass -> (pred_y, pred_u, pred_v) raw."""
        span_ref = jnp.take_along_axis(
            ref_map, jnp.clip(refidx, 0, 15).reshape(B, -1), axis=1
        ).reshape(B, M, 4)
        slot8 = jnp.argmax(
            ring_ids[:, None, None, :] == span_ref[..., None], axis=-1
        )
        mvx_blk = _assemble_b(mv[..., 0].reshape(B, M, 4, 4), mb_w, mb_h, 4)
        mvy_blk = _assemble_b(mv[..., 1].reshape(B, M, 4, 4), mb_w, mb_h, 4)
        slot_blk = _assemble_b(slot8.reshape(B, M, 2, 2), mb_w, mb_h, 2)
        import os as _os

        mc_mode = _mc_mode()
        if mc_mode == "yquad":
            # y-quad flat ring: one gathered 32-byte row holds 4
            # consecutive plane rows' paired words, so a 4x4 luma block
            # is TWO gathered rows and a 2x2 chroma block two — half the
            # paired variant's rows again at the same ring bytes
            # (tools/gatherbench.py: 32B rows gather at ~0.93x the 8B
            # row rate), bit-identical to the per-pixel formulation
            m = _MARGIN
            R = ring_ids.shape[1]
            Hp, Wp = mb_h * 16 + 2 * m, mb_w * 16 + 2 * m
            Hcp, Wcp = mb_h * 8 + 2 * m, mb_w * 8 + 2 * m
            py = ops_mc.luma_mc_gather16_yquad_flat(
                planes_y, (B, R + 1, Hp, Wp // 4),
                _repvh(slot_blk, 2, 2), mvx_blk, mvy_blk,
            )
            puv = ops_mc.chroma_mc_gather_pair_yquad_flat(
                ring_u, (B, R + 1, Hcp, (Wcp * 2) // 4),
                _repvh(slot_blk, 2, 2), mvx_blk, mvy_blk,
            )
        elif mc_mode == "wide2":
            # paired-word flat ring: one gathered 8-byte row per 4 luma
            # px / 2 per 2-px chroma group, ring kept FLAT in the scan
            # carry (structured carries pay a per-step relayout before
            # the flat-index gather — tools/mcbench.py), bit-identical
            # to the per-pixel formulation
            m = _MARGIN
            R = ring_ids.shape[1]
            Hp, Wp = mb_h * 16 + 2 * m, mb_w * 16 + 2 * m
            Hcp, Wcp = mb_h * 8 + 2 * m, mb_w * 8 + 2 * m
            py = ops_mc.luma_mc_gather16_paired_flat(
                planes_y, (B, R + 1, Hp, Wp // 4),
                _repvh(slot_blk, 8, 2), _repvh(mvx_blk, 4, 1),
                _repvh(mvy_blk, 4, 1),
            )
            puv = ops_mc.chroma_mc_gather_pair_paired_flat(
                ring_u, (B, R + 1, Hcp, Wcp // 2),
                _repvh(slot_blk, 4, 2), _repvh(mvx_blk, 2, 1),
                _repvh(mvy_blk, 2, 1),
            )
        elif mc_mode == "wide":
            # wide word-row gathers: half the gathered rows of the
            # per-pixel formulation, bit-identical output
            py = ops_mc.luma_mc_gather16_wide_b(
                planes_y, _repvh(slot_blk, 8, 2), _repvh(mvx_blk, 4, 1),
                _repvh(mvy_blk, 4, 1),
            )
            puv = ops_mc.chroma_mc_gather_pair_wide_b(
                ring_u, _repvh(slot_blk, 4, 2), _repvh(mvx_blk, 2, 1),
                _repvh(mvy_blk, 2, 1),
            )
        else:
            py = ops_mc.luma_mc_gather16_b(
                planes_y, _rep2(slot_blk, 8), _rep2(mvx_blk, 4),
                _rep2(mvy_blk, 4),
            )
            puv = ops_mc.chroma_mc_gather_pair_b(
                ring_u, _rep2(slot_blk, 4), _rep2(mvx_blk, 2),
                _rep2(mvy_blk, 2),
            )
        return py, puv[:, 0], puv[:, 1]

    refidx = fr["refidx"]                                     # [B, M, 4]
    raw_y, raw_u, raw_v = mc_pass(refidx, fr["ref_map"], fr["mv"])
    bidx = jnp.arange(B)[:, None, None]

    from .recon import apply_weighted_pred

    def wmaps(w8, rep_y, rep_c):
        def m(k, rep):
            blk = _assemble_b(w8[..., k].reshape(B, M, 2, 2), mb_w, mb_h, 2)
            return _rep2(blk, rep)
        return m

    wts = fr.get("weights")
    if wts is not None:
        # explicit weighted uni-prediction (8.4.2.3.2): per-8x8 weight
        # rows (indexed by refIdxL0) expanded to pixel maps; identity
        # rows on unweighted frames make the formula a no-op there.
        # Bi-predicted blocks combine the RAW predictions instead.
        w8 = wts[bidx, jnp.clip(refidx, 0, 15)]             # [B, M, 4, 8]
        wm = wmaps(w8, 8, 4)
        pred_y = apply_weighted_pred(raw_y, wm(0, 8), wm(1, 8), wm(6, 8))
        pred_u = apply_weighted_pred(raw_u, wm(2, 4), wm(3, 4), wm(7, 4))
        pred_v = apply_weighted_pred(raw_v, wm(4, 4), wm(5, 4), wm(7, 4))
    else:
        pred_y, pred_u, pred_v = raw_y, raw_u, raw_v

    if fr.get("mv_l1") is not None:
        # B frames: second MC pass over list 1, then per-pixel combine —
        # bi-predicted blocks average with (w0, w1) from the POC pair
        # table (implicit mode), (32, 32) default, or the explicit
        # eq 8-272 combine of the per-list tables; uni-L1 blocks take
        # (possibly explicitly weighted) pred1.
        refidx1 = fr["refidx_l1"]
        p1_y, p1_u, p1_v = mc_pass(refidx1, fr["ref_map_l1"], fr["mv_l1"])
        wts1 = fr.get("weights_l1")
        if wts1 is not None:
            w8b = wts1[bidx, jnp.clip(refidx1, 0, 15)]
            wmb = wmaps(w8b, 8, 4)
            uni1_y = apply_weighted_pred(p1_y, wmb(0, 8), wmb(1, 8),
                                         wmb(6, 8))
            uni1_u = apply_weighted_pred(p1_u, wmb(2, 4), wmb(3, 4),
                                         wmb(7, 4))
            uni1_v = apply_weighted_pred(p1_v, wmb(4, 4), wmb(5, 4),
                                         wmb(7, 4))
        else:
            uni1_y, uni1_u, uni1_v = p1_y, p1_u, p1_v
        wpair = fr["bi_w"][
            bidx, jnp.clip(refidx, 0, 15), jnp.clip(refidx1, 0, 15)
        ]                                                     # [B, M, 4, 2]

        def emap(a, rep):  # [B, M, 4] per-8x8 -> pixel map
            return _rep2(_assemble_b(a.reshape(B, M, 2, 2), mb_w, mb_h, 2),
                         rep)

        w0_y, w1_y = emap(wpair[..., 0], 8), emap(wpair[..., 1], 8)
        bi_y = jnp.clip((raw_y * w0_y + p1_y * w1_y + 32) >> 6, 0, 255)
        w0_c, w1_c = emap(wpair[..., 0], 4), emap(wpair[..., 1], 4)
        bi_u = jnp.clip((raw_u * w0_c + p1_u * w1_c + 32) >> 6, 0, 255)
        bi_v = jnp.clip((raw_v * w0_c + p1_v * w1_c + 32) >> 6, 0, 255)

        if fr.get("bi_explicit") is not None and wts is not None \
                and wts1 is not None:
            # explicit bi (eq 8-272): per-list weights at logWD+1 with
            # the averaged offset, selected per frame by bi_explicit
            w8a = wts[bidx, jnp.clip(refidx, 0, 15)]
            w8b2 = wts1[bidx, jnp.clip(refidx1, 0, 15)]
            wma = wmaps(w8a, 8, 4)
            wmb2 = wmaps(w8b2, 8, 4)

            def bi_exp(p0, p1, ka, kc, lk, rep):
                wa, oa = wma(ka, rep), wma(ka + 1, rep)
                wb, ob = wmb2(ka, rep), wmb2(ka + 1, rep)
                lwd = wma(lk, rep)
                v = ((p0 * wa + p1 * wb + (1 << lwd)) >> (lwd + 1)) + (
                    (oa + ob + 1) >> 1
                )
                return jnp.clip(v, 0, 255)

            sel = (fr["bi_explicit"] > 0)[:, None, None]
            bi_y = jnp.where(sel, bi_exp(raw_y, p1_y, 0, 1, 6, 8), bi_y)
            bi_u = jnp.where(sel, bi_exp(raw_u, p1_u, 2, 3, 7, 4), bi_u)
            bi_v = jnp.where(sel, bi_exp(raw_v, p1_v, 4, 5, 7, 4), bi_v)

        has1_y = emap(refidx1 >= 0, 8)
        has0_y = emap(refidx >= 0, 8)
        pred_y = jnp.where(has1_y, jnp.where(has0_y, bi_y, uni1_y), pred_y)
        has1_c = emap(refidx1 >= 0, 4)
        has0_c = emap(refidx >= 0, 4)
        pred_u = jnp.where(has1_c, jnp.where(has0_c, bi_u, uni1_u), pred_u)
        pred_v = jnp.where(has1_c, jnp.where(has0_c, bi_v, uni1_v), pred_v)

    Y = jnp.clip(pred_y + _assemble_b(luma_res, mb_w, mb_h, 16), 0, 255)
    U = jnp.clip(pred_u + _assemble_b(chroma_res[:, :, 0], mb_w, mb_h, 8), 0, 255)
    V = jnp.clip(pred_v + _assemble_b(chroma_res[:, :, 1], mb_w, mb_h, 8), 0, 255)

    ipcm = fr["ipcm"]
    if ipcm is not None:
        kind = fr["mb_kind"]
        is_pcm = kind == 4
        ipcm_y = _assemble_b(ipcm[..., :256].reshape(B, M, 16, 16), mb_w, mb_h, 16)
        ipcm_u = _assemble_b(ipcm[..., 256:320].reshape(B, M, 8, 8), mb_w, mb_h, 8)
        ipcm_v = _assemble_b(ipcm[..., 320:].reshape(B, M, 8, 8), mb_w, mb_h, 8)
        pcm_y = _rep2(is_pcm.reshape(B, mb_h, mb_w), 16)
        pcm_c = _rep2(is_pcm.reshape(B, mb_h, mb_w), 8)
        Y = jnp.where(pcm_y, ipcm_y, Y)
        U = jnp.where(pcm_c, ipcm_u, U)
        V = jnp.where(pcm_c, ipcm_v, V)
    return Y, U, V


# ---------------------------------------------------------------------------
# Intra stage (batched, tile-carried wavefront)
# ---------------------------------------------------------------------------


def _intra_stage_b(Y, U, V, fr, mb_w, mb_h, luma_blocks, luma_res16,
                   chroma_res):
    B, M = fr["mb_kind"].shape
    H, W = mb_h * 16, mb_w * 16
    Hc, Wc = H // 2, W // 2
    step_mbs, step_valid = schedule(mb_w, mb_h)
    A = step_mbs.shape[1]
    step_mbs = jnp.asarray(step_mbs)
    step_valid = jnp.asarray(step_valid)

    yf = jnp.concatenate([Y.reshape(-1), jnp.zeros(256, jnp.int32)])
    uf = jnp.concatenate([U.reshape(-1), jnp.zeros(64, jnp.int32)])
    vf = jnp.concatenate([V.reshape(-1), jnp.zeros(64, jnp.int32)])
    y_scr = B * H * W
    c_scr = B * Hc * Wc
    boff_y = (jnp.arange(B) * (H * W))[:, None]          # [B, 1]
    boff_c = (jnp.arange(B) * (Hc * Wc))[:, None]

    kind_all = fr["mb_kind"]
    avail_all = fr["avail"]
    i4_all = fr["i4_modes"]
    i16_all = fr["i16_mode"]
    cm_all = fr["chroma_mode"]

    def step(carry, inp):
        mbs, valid = inp                     # [A]
        kind = kind_all[:, mbs]              # [B, A]
        av = avail_all[:, mbs]
        have_l = (av & 1) == 1
        have_t = (av & 2) == 2
        have_tr = (av & 4) == 4
        have_tl = (av & 8) == 8
        mx = ((mbs % mb_w) * 16)[None, :]    # [1, A]
        my = ((mbs // mb_w) * 16)[None, :]
        is_i4 = kind == 2
        is_i16 = kind == 3
        w_any = valid[None, :] & (is_i4 | is_i16)
        # Skip the whole step when no MB of this diagonal is intra (the
        # common case on P frames) — lax.cond executes only one branch.
        return (
            jax.lax.cond(jnp.any(w_any), _step_body, lambda c, *_: c,
                         carry, mbs, valid, kind, av, have_l, have_t,
                         have_tr, have_tl, mx, my, is_i4, is_i16, w_any),
            None,
        )

    def _step_body(carry, mbs, valid, kind, av, have_l, have_t, have_tr,
                   have_tl, mx, my, is_i4, is_i16, w_any):
        yf, uf, vf = carry

        # ---- gather luma borders: top strip [B, A, 21], left col [B, A, 16]
        tx = (mx - 1)[..., None] + jnp.arange(21)[None, None, :]
        ty = jnp.maximum(my - 1, 0)
        tidx = boff_y[..., None] + ty[..., None] * W + jnp.clip(tx, 0, W - 1)
        tidx = jnp.where(w_any[..., None], tidx, y_scr)
        top_strip = yf[tidx]                                  # [B, A, 21]
        ly = my[..., None] + jnp.arange(16)[None, None, :]
        lx = jnp.maximum(mx - 1, 0)
        lidx = boff_y[..., None] + ly * W + lx[..., None]
        lidx = jnp.where(w_any[..., None], lidx, y_scr)
        left_col = yf[lidx]                                   # [B, A, 16]

        flat = lambda a: a.reshape((B * A,) + a.shape[2:])

        # ---- I16 prediction from borders
        pred16 = ops_intra.predict_i16(
            flat(i16_all[:, mbs]), flat(left_col),
            flat(top_strip[..., 1:17]), flat(top_strip[..., 0]),
            flat(have_l), flat(have_t),
        ).reshape(B, A, 16, 16)
        res16 = luma_res16[:, mbs]                            # [B, A, 16, 16]
        mb16 = jnp.clip(pred16 + res16, 0, 255)

        # ---- I4x4: carried tile [B, A, 17, 21]
        T = jnp.zeros((B, A, 17, 21), jnp.int32)
        T = T.at[:, :, 0, :].set(top_strip)
        T = T.at[:, :, 1:, 0].set(left_col)
        blocks_res = luma_blocks[:, mbs]                      # [B, A, 16, 4, 4]
        modes4 = i4_all[:, mbs]                               # [B, A, 16]
        for db in _DEC_ORDER:
            x4, y4 = db & 3, db >> 2
            r0, c0 = 4 * y4, 4 * x4   # tile coords of the block's top/left
            left = T[:, :, r0 + 1 : r0 + 5, c0]
            top = T[:, :, r0, c0 + 1 : c0 + 5]
            tl = T[:, :, r0, c0]
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
                flat(modes4[..., db]), flat(left), flat(top), flat(tl),
                flat(tr_eff), flat(bl), flat(bt),
            ).reshape(B, A, 4, 4)
            blk = jnp.clip(pred + blocks_res[:, :, db], 0, 255)
            T = jax.lax.dynamic_update_slice(
                T, blk, (0, 0, r0 + 1, c0 + 1)
            )

        mbpix = jnp.where(is_i4[..., None, None], T[:, :, 1:, 1:17], mb16)

        # ---- scatter luma
        yy = my[..., None, None] + jnp.arange(16)[None, None, :, None]
        xx = mx[..., None, None] + jnp.arange(16)[None, None, None, :]
        sidx = boff_y[..., None, None] + yy * W + xx
        sidx = jnp.where(w_any[..., None, None], sidx, y_scr)
        yf = yf.at[sidx].set(jnp.where(w_any[..., None, None], mbpix, yf[sidx]))

        # ---- chroma prediction (no intra-MB sequencing)
        cx = mx // 2
        cy = my // 2
        cres = chroma_res[:, mbs]                             # [B, A, 2, 8, 8]
        cmode = cm_all[:, mbs]
        for plane in range(2):
            buf = uf if plane == 0 else vf
            ctx = (cx - 1)[..., None] + jnp.arange(9)[None, None, :]
            cty = jnp.maximum(cy - 1, 0)
            cidx = boff_c[..., None] + cty[..., None] * Wc + jnp.clip(ctx, 0, Wc - 1)
            cidx = jnp.where(w_any[..., None], cidx, c_scr)
            tstrip = buf[cidx]                                # [B, A, 9]
            lyc = cy[..., None] + jnp.arange(8)[None, None, :]
            lxc = jnp.maximum(cx - 1, 0)
            lcidx = boff_c[..., None] + lyc * Wc + lxc[..., None]
            lcidx = jnp.where(w_any[..., None], lcidx, c_scr)
            lcol = buf[lcidx]
            predc = ops_intra.predict_chroma(
                flat(cmode), flat(lcol), flat(tstrip[..., 1:]),
                flat(tstrip[..., 0]), flat(have_l), flat(have_t),
            ).reshape(B, A, 8, 8)
            mbc = jnp.clip(predc + cres[:, :, plane], 0, 255)
            cyy = cy[..., None, None] + jnp.arange(8)[None, None, :, None]
            cxx = cx[..., None, None] + jnp.arange(8)[None, None, None, :]
            scidx = boff_c[..., None, None] + cyy * Wc + cxx
            scidx = jnp.where(w_any[..., None, None], scidx, c_scr)
            if plane == 0:
                uf = uf.at[scidx].set(
                    jnp.where(w_any[..., None, None], mbc, uf[scidx])
                )
            else:
                vf = vf.at[scidx].set(
                    jnp.where(w_any[..., None, None], mbc, vf[scidx])
                )
        return (yf, uf, vf)

    (yf, uf, vf), _ = jax.lax.scan(step, (yf, uf, vf), (step_mbs, step_valid))
    return (
        yf[: B * H * W].reshape(B, H, W),
        uf[: B * Hc * Wc].reshape(B, Hc, Wc),
        vf[: B * Hc * Wc].reshape(B, Hc, Wc),
    )


# ---------------------------------------------------------------------------
# Deblock (batched, tile-carried wavefront)
# ---------------------------------------------------------------------------


def _deblock_b(Y, U, V, meta, mb_w, mb_h, chroma_qp_offset):
    """Exact per-MB-order deblock on [B, H, W] planes."""
    from ...ops.deblock import mb_edge_params_b

    B, H, W = Y.shape
    Hc, Wc = H // 2, W // 2
    params = mb_edge_params_b(meta, mb_w, mb_h, chroma_qp_offset)
    step_mbs, step_valid = schedule(mb_w, mb_h)
    A = step_mbs.shape[1]
    step_mbs = jnp.asarray(step_mbs)
    step_valid = jnp.asarray(step_valid)

    # padded work buffers: image origin at (4,4) luma / (2,2) chroma so the
    # tile gathers at MB (0, *) stay in range
    Hp, Wp = H + 4, W + 4
    Hcp, Wcp = Hc + 2, Wc + 2
    yb = jnp.zeros((B, Hp, Wp), jnp.int32).at[:, 4:, 4:].set(Y)
    ub = jnp.zeros((B, Hcp, Wcp), jnp.int32).at[:, 2:, 2:].set(U)
    vb = jnp.zeros((B, Hcp, Wcp), jnp.int32).at[:, 2:, 2:].set(V)
    yf = jnp.concatenate([yb.reshape(-1), jnp.zeros(512, jnp.int32)])
    cf = jnp.concatenate(
        [jnp.stack([ub, vb], axis=1).reshape(-1), jnp.zeros(512, jnp.int32)]
    )
    y_scr = B * Hp * Wp
    c_scr = B * 2 * Hcp * Wcp
    boff_y = (jnp.arange(B) * (Hp * Wp))[:, None]
    boff_c = (jnp.arange(B) * (2 * Hcp * Wcp))[:, None]

    def step(carry, inp):
        yf, cf = carry
        mbs, valid = inp
        mx = ((mbs % mb_w) * 16)[None, :]   # padded coords == my (origin 4)
        my = ((mbs // mb_w) * 16)[None, :]
        v = valid[None, :]

        # ---- luma tile [B, A, 20, 20] at padded (my, mx)
        yy = my[..., None, None] + jnp.arange(20)[None, None, :, None]
        xx = mx[..., None, None] + jnp.arange(20)[None, None, None, :]
        idx = boff_y[..., None, None] + yy * Wp + xx
        idx = jnp.where(v[..., None, None], idx, y_scr)
        T = yf[idx]
        bs_v = params["bs_v"][:, mbs]       # [B, A, 4, 4]
        tc_v = params["tc0_v"][:, mbs]
        ab_v = params["ab_v"][:, mbs]       # [B, A, 4, 2]
        for e in range(4):
            col = 4 + 4 * e
            win = T[:, :, 4:20, col - 4 : col + 4]       # [B, A, 16, 8]
            p = win[..., :4][..., ::-1]
            q = win[..., 4:]
            bs = jnp.repeat(bs_v[:, :, e], 4, axis=-1)
            tc0 = jnp.repeat(tc_v[:, :, e], 4, axis=-1)
            alpha = ab_v[:, :, e, 0:1]
            beta = ab_v[:, :, e, 1:2]
            np_, nq = filter_lines_luma(p, q, bs, alpha, beta, tc0)
            out = jnp.concatenate([np_[..., ::-1], nq], axis=-1)
            T = jax.lax.dynamic_update_slice(T, out, (0, 0, 4, col - 4))
        bs_h = params["bs_h"][:, mbs]
        tc_h = params["tc0_h"][:, mbs]
        ab_h = params["ab_h"][:, mbs]
        for e in range(4):
            row = 4 + 4 * e
            win = T[:, :, row - 4 : row + 4, 4:20].transpose(0, 1, 3, 2)
            p = win[..., :4][..., ::-1]
            q = win[..., 4:]
            bs = jnp.repeat(bs_h[:, :, e], 4, axis=-1)
            tc0 = jnp.repeat(tc_h[:, :, e], 4, axis=-1)
            alpha = ab_h[:, :, e, 0:1]
            beta = ab_h[:, :, e, 1:2]
            np_, nq = filter_lines_luma(p, q, bs, alpha, beta, tc0)
            out = jnp.concatenate(
                [np_[..., ::-1], nq], axis=-1
            ).transpose(0, 1, 3, 2)
            T = jax.lax.dynamic_update_slice(T, out, (0, 0, row - 4, 4))
        yf = yf.at[idx].set(jnp.where(v[..., None, None], T, yf[idx]))

        # ---- chroma tiles [B, A, 2, 10, 10] at padded (cy, cx), origin 2
        cx = mx // 2
        cy = my // 2
        cyy = cy[..., None, None] + jnp.arange(10)[None, None, :, None]
        cxx = cx[..., None, None] + jnp.arange(10)[None, None, None, :]
        cidx = (
            boff_c[..., None, None, None]
            + jnp.arange(2)[None, None, :, None, None] * (Hcp * Wcp)
            + cyy[:, :, None] * Wcp + cxx[:, :, None]
        )
        cidx = jnp.where(v[..., None, None, None], cidx, c_scr)
        C = cf[cidx]                                   # [B, A, 2, 10, 10]
        bs_cv = params["bs_cv"][:, mbs]                # [B, A, 2, 8]
        tc_cv = params["tc0_cv"][:, mbs]
        ab_cv = params["ab_cv"][:, mbs]
        for e in range(2):
            col = 2 + 4 * e
            win = C[:, :, :, 2:10, col - 2 : col + 2]
            p = win[..., :2][..., ::-1]
            q = win[..., 2:]
            bs = bs_cv[:, :, None, e]
            tc0 = tc_cv[:, :, None, e]
            alpha = ab_cv[:, :, None, e, 0:1]
            beta = ab_cv[:, :, None, e, 1:2]
            np_, nq = filter_lines_chroma(p, q, bs, alpha, beta, tc0)
            out = jnp.concatenate([np_[..., ::-1], nq], axis=-1)
            C = jax.lax.dynamic_update_slice(C, out, (0, 0, 0, 2, col - 2))
        bs_ch = params["bs_ch"][:, mbs]
        tc_ch = params["tc0_ch"][:, mbs]
        ab_ch = params["ab_ch"][:, mbs]
        for e in range(2):
            row = 2 + 4 * e
            win = C[:, :, :, row - 2 : row + 2, 2:10].transpose(0, 1, 2, 4, 3)
            p = win[..., :2][..., ::-1]
            q = win[..., 2:]
            bs = bs_ch[:, :, None, e]
            tc0 = tc_ch[:, :, None, e]
            alpha = ab_ch[:, :, None, e, 0:1]
            beta = ab_ch[:, :, None, e, 1:2]
            np_, nq = filter_lines_chroma(p, q, bs, alpha, beta, tc0)
            out = jnp.concatenate(
                [np_[..., ::-1], nq], axis=-1
            ).transpose(0, 1, 2, 4, 3)
            C = jax.lax.dynamic_update_slice(C, out, (0, 0, 0, row - 2, 2))
        cf = cf.at[cidx].set(jnp.where(v[..., None, None, None], C, cf[cidx]))
        return (yf, cf), None

    (yf, cf), _ = jax.lax.scan(step, (yf, cf), (step_mbs, step_valid))
    yb = yf[: B * Hp * Wp].reshape(B, Hp, Wp)
    cb = cf[: B * 2 * Hcp * Wcp].reshape(B, 2, Hcp, Wcp)
    return yb[:, 4:, 4:], cb[:, 0, 2:, 2:], cb[:, 1, 2:, 2:]


# ---------------------------------------------------------------------------
# GOP decode (batched)
# ---------------------------------------------------------------------------


def decode_gop_batched_core(g: GopArrays, mb_w: int, mb_h: int,
                            chroma_qp_offset: int, n_refs: int = 4,
                            ring_in=None, f_offset=None, ring_io=False):
    """Decode a batch of spans: every array has leading [B, F, ...].
    Returns (Y [B,F,H,W], U, V) uint8.

    Frame windowing: a long span can decode as several calls over frame
    windows — `ring_in` is the previous window's returned reference-ring
    carry, `f_offset` (traced scalar) the window's first span-global
    frame index (ring ids and `ref_map` values are span-global, so MC
    reference matching works across windows unchanged), and
    `ring_io=True` additionally returns the final ring carry.  This
    bounds the compiled program to the window size: the relay's compile
    helper is killed on 1080p F=64 executables (see pipeline.py)."""
    B, F, M = g.mb_kind.shape
    H, W = mb_h * 16, mb_w * 16
    Hc, Wc = H // 2, W // 2
    R = n_refs
    m = _MARGIN

    import os as _os

    mc_mode = _mc_mode()
    Hp, Wp = H + 2 * m, W + 2 * m
    Hcp, Wcp = Hc + 2 * m, Wc + 2 * m
    s_y = 16 * Hp * (Wp // 4)   # paired-word rows per (clip, slot)
    s_c = Hcp * (Wcp // 2)
    s_yq = 16 * (Hp // 4) * (Wp // 4)   # y-quad rows per (clip, slot)
    s_cq = (Hcp // 4) * ((Wcp * 2) // 4)
    if mc_mode == "yquad":
        # y-quad ring: 32-byte gather rows, each holding 4 consecutive
        # plane rows' paired words (pure layout permutation of the
        # paired ring — same bytes, half the gather rows per MC block;
        # see ops/mc.py y-quad variants).  Flat in the scan carry, one
        # write-off slot per clip, same as the paired layout below.
        ring_y0 = jnp.zeros((B * (R + 1) * s_yq, 8), jnp.uint32)
        ring_u0 = jnp.zeros((B * (R + 1) * s_cq, 8), jnp.uint32)
    elif mc_mode == "wide2":
        # paired-word ring: 8-byte gather windows precomputed (see
        # ops/mc.py paired variants) — a quarter of the per-pixel MC
        # gather rows at 2x ring memory.  The ring lives FLAT in the
        # scan carry (structured carries pay a per-step relayout before
        # the flat-index gather), with one extra write-off slot per clip
        # (R+1) that non-reference frames dump into so the update needs
        # no read-modify-write.
        ring_y0 = jnp.zeros((B * (R + 1) * s_y, 2), jnp.uint32)
        ring_u0 = jnp.zeros((B * (R + 1) * s_c, 2), jnp.uint32)
    else:
        ring_y0 = jnp.zeros((B, R, 16, Hp, Wp), jnp.uint8)
        ring_u0 = jnp.zeros((B, R, Hcp, Wcp, 2), jnp.uint8)
    ring_v0 = jnp.zeros((B, R, 1, 1), jnp.uint8)  # unused (kept for arity)
    ring_ids0 = jnp.full((B, R), -1, jnp.int32)

    def frame_step(carry, f):
        ring_y, ring_u, ring_v, ring_ids = carry

        # per-frame structured views: at-rest tensors are FLAT [B, F, X]
        # (lane-friendly tiling, see packed.unpack); the slice + reshape
        # back to the structured shape is per-frame transient work that
        # fuses into the consumers.
        def fv(a, *tail):
            x = a[:, f]
            if tail:
                x = x.reshape((B,) + tail)
            return x.astype(jnp.int32)

        fr = {
            "mb_kind": fv(g.mb_kind),
            "qp": fv(g.qp),
            "i4_modes": fv(g.i4_modes, M, 16),
            "i16_mode": fv(g.i16_mode),
            "chroma_mode": fv(g.chroma_mode),
            "mv": fv(g.mv, M, 16, 2),
            "refidx": fv(g.refidx, M, 4),
            "ref_map": fv(g.ref_map),
            "ipcm": fv(g.ipcm, M, 384) if g.ipcm is not None else None,
            "avail": fv(g.avail),
            "weights": fv(g.weights, 16, 8) if g.weights is not None
            else None,
            "weights_l1":
                fv(g.weights_l1, 16, 8) if g.weights_l1 is not None else None,
            "bi_explicit":
                g.bi_explicit[:, f].astype(jnp.int32)
                if g.bi_explicit is not None else None,
            "transform8":
                fv(g.transform8) if g.transform8 is not None else None,
            "mv_l1": fv(g.mv_l1, M, 16, 2) if g.mv_l1 is not None else None,
            "refidx_l1":
                fv(g.refidx_l1, M, 4) if g.refidx_l1 is not None else None,
            "ref_map_l1":
                fv(g.ref_map_l1) if g.ref_map_l1 is not None else None,
            "bi_w": fv(g.bi_w, 16, 16, 2) if g.bi_w is not None else None,
        }
        qp = fr["qp"]
        qpc = chroma_qp_from_luma(qp, chroma_qp_offset)
        is_i16 = fr["mb_kind"] == 3
        intra = (fr["mb_kind"] >= 2) & (fr["mb_kind"] <= 4)
        w4 = g.scaling_w4.astype(jnp.int32) if g.scaling_w4 is not None \
            else None
        w8 = g.scaling_w8.astype(jnp.int32) if g.scaling_w8 is not None \
            else None

        if g.coeff_all is not None:
            # combined coefficient space: [M, 26, 16] = 16 luma AC, 8
            # chroma AC, luma DC (24), chroma DC (25, 2x4 in :8)
            cf = g.coeff_all[:, f].astype(jnp.int32).reshape(B, M, 26, 16)
            luma_ac_f = cf[:, :, :16]
            luma_dc_f = cf[:, :, 24]
            chroma_ac_f = cf[:, :, 16:24].reshape(B, M, 2, 4, 16)
            chroma_dc_f = cf[:, :, 25, :8].reshape(B, M, 2, 4)
        else:
            luma_ac_f = fv(g.luma_ac, M, 16, 16)
            luma_dc_f = fv(g.luma_dc, M, 16)
            chroma_ac_f = fv(g.chroma_ac, M, 2, 4, 16)
            chroma_dc_f = fv(g.chroma_dc, M, 2, 4)

        luma_res16, luma_blocks = luma_residual_b(
            luma_ac_f, luma_dc_f, qp, is_i16, intra=intra, w4=w4
        )
        res8 = None
        if g.transform8 is not None:
            from ...ops.transforms_batched import luma_residual8_b

            res8_asm, res8 = luma_residual8_b(luma_ac_f, qp,
                                              intra=intra, w8=w8)
            t8m = fr["transform8"].astype(bool)[..., None, None]
            luma_res16 = jnp.where(t8m, res8_asm, luma_res16)
        chroma_res = chroma_residual_b(chroma_ac_f, chroma_dc_f,
                                       qpc, intra=intra, w4=w4)

        import os as _os

        from .recon_skewed import deblock_stage_skewed, intra_stage_skewed

        _ablate = _os.environ.get("HWANG_ABLATE", "")
        if _ablate == "nomc":
            # timing attribution only: residual-as-pixels, no MC gathers
            Y = jnp.clip(_assemble_b(luma_res16, mb_w, mb_h, 16), 0, 255)
            U = jnp.clip(
                _assemble_b(chroma_res[:, :, 0], mb_w, mb_h, 8), 0, 255
            )
            V = jnp.clip(
                _assemble_b(chroma_res[:, :, 1], mb_w, mb_h, 8), 0, 255
            )
        else:
            Y, U, V = _inter_stage_b(
                fr, (ring_y, ring_u, ring_v, ring_ids), mb_w, mb_h,
                luma_res16, chroma_res,
            )
        if _ablate not in ("inter", "nomc"):
            from ...ops import intra_pallas as _inp

            # pallas on TPU at every size: fits_vmem picks the in-VMEM
            # block kernel, larger frames take the ring-DMA variant
            # (intra_pallas auto) — 1080p on the skewed XLA path was the
            # dominant 1080p stage cost
            use_ip = _os.environ.get(
                "HWANG_INTRA",
                "pallas" if _inp._is_tpu_backend() else "skewed",
            )
            if use_ip == "pallas":
                # i8x8 spans compile the kernel's with_i8 branch; the 8x8
                # residual is already merged into luma_res16 above
                Y, U, V = _inp.intra_stage_pallas(
                    Y, U, V, fr, mb_w, mb_h, luma_blocks, luma_res16,
                    chroma_res,
                )
            else:
                Y, U, V = intra_stage_skewed(
                    Y, U, V, fr, mb_w, mb_h, luma_blocks, luma_res16,
                    chroma_res, res8=res8,
                )
        def resolve(refidx, ref_map):
            return jnp.where(
                refidx >= 0,
                jnp.take_along_axis(
                    ref_map, jnp.clip(refidx, 0, 15).reshape(B, -1), axis=1
                ).reshape(B, M, 4),
                -1,
            )

        meta = {
            "qp": qp,
            "kind": fr["mb_kind"],
            "idc": fv(g.deblock_idc),
            "a_off": fv(g.alpha_off),
            "b_off": fv(g.beta_off),
            "avail": fr["avail"],
            "nnz": fv(g.nnz, M, 24),
            "mv": fr["mv"],
            "ref": resolve(fr["refidx"], fr["ref_map"]),
            "mv1": fr["mv_l1"],
            "ref1": resolve(fr["refidx_l1"], fr["ref_map_l1"])
            if fr["refidx_l1"] is not None else None,
            "t8": fr["transform8"],
        }
        if _ablate not in ("inter", "nodb", "nomc"):
            from ...ops import deblock_pallas as _dbp

            use_pallas = _os.environ.get(
                "HWANG_DEBLOCK",
                "pallas" if _dbp._is_tpu_backend() else "skewed",
            )
            if use_pallas == "pallas":
                Y, U, V = _dbp.deblock_stage_pallas(
                    Y, U, V, meta, mb_w, mb_h, chroma_qp_offset
                )
            else:
                Y, U, V = deblock_stage_skewed(
                    Y, U, V, meta, mb_w, mb_h, chroma_qp_offset
                )
        Y = Y.astype(jnp.uint8)
        U = U.astype(jnp.uint8)
        V = V.astype(jnp.uint8)

        # reference ring update, per clip: only frames marked as references
        # enter the ring (B streams interleave non-ref frames), and the
        # write position advances per clip independently
        planes = ops_mc.luma_subpel16_planes(Y)       # [B, 16, Hp, Wp]
        cplanes = ops_mc.chroma_pair_planes(U, V)     # [B, Hcp, Wcp, 2]
        bidx = jnp.arange(B)
        slot = g.ring_slot[:, f]                   # [B] host-assigned
        isr = slot >= 0
        pos = jnp.where(isr, slot, 0) % R
        if mc_mode == "yquad":
            qw = ops_mc.yquad_words(planes.reshape(B, 16 * Hp, Wp))
            cq = ops_mc.yquad_words(cplanes.reshape(B, Hcp, Wcp * 2))
            pos_eff = jnp.where(isr, pos, R).astype(jnp.int32)
            for b in range(B):
                off = b * (R + 1) + pos_eff[b]
                ring_y = jax.lax.dynamic_update_slice(
                    ring_y, qw[b], (off * s_yq, 0))
                ring_u = jax.lax.dynamic_update_slice(
                    ring_u, cq[b], (off * s_cq, 0))
        elif mc_mode == "wide2":
            pw = ops_mc.pair_words(
                planes.reshape(B, 16 * Hp, Wp)).reshape(B, s_y, 2)
            cw = ops_mc.pair_words(
                cplanes.reshape(B, Hcp, Wcp * 2)).reshape(B, s_c, 2)
            # non-ref frames land in the per-clip write-off slot R
            # (int32: the packed transport ships ring_slot as int16)
            pos_eff = jnp.where(isr, pos, R).astype(jnp.int32)
            for b in range(B):
                off = (b * (R + 1) + pos_eff[b])
                ring_y = jax.lax.dynamic_update_slice(
                    ring_y, pw[b], (off * s_y, 0))
                ring_u = jax.lax.dynamic_update_slice(
                    ring_u, cw[b], (off * s_c, 0))
        else:
            isr_y = isr.reshape((B,) + (1,) * (planes.ndim - 1))
            isr_c = isr.reshape((B,) + (1,) * (cplanes.ndim - 1))
            ring_y = ring_y.at[bidx, pos].set(
                jnp.where(isr_y, planes, ring_y[bidx, pos])
            )
            ring_u = ring_u.at[bidx, pos].set(
                jnp.where(isr_c, cplanes, ring_u[bidx, pos])
            )
        gid = (f + f_off).astype(jnp.int32)  # span-global frame id
        ring_ids = ring_ids.at[bidx, pos].set(
            jnp.where(isr, gid, ring_ids[bidx, pos])
        )
        return (ring_y, ring_u, ring_v, ring_ids), (Y, U, V)

    f_off = jnp.asarray(0 if f_offset is None else f_offset, jnp.int32)
    carry0 = ring_in if ring_in is not None else (
        ring_y0, ring_u0, ring_v0, ring_ids0)
    final, (Ys, Us, Vs) = jax.lax.scan(frame_step, carry0, jnp.arange(F))
    # scan stacks on axis 0 (frames): -> [B, F, H, W]
    out = (
        Ys.transpose(1, 0, 2, 3),
        Us.transpose(1, 0, 2, 3),
        Vs.transpose(1, 0, 2, 3),
    )
    return (out, final) if ring_io else out


decode_gop_batched = jax.jit(
    decode_gop_batched_core,
    static_argnames=("mb_w", "mb_h", "chroma_qp_offset", "n_refs"),
)


# ---------------------------------------------------------------------------
# Packed entry point (single-upload host->device transport)
# ---------------------------------------------------------------------------


def decode_gop_packed_core(p, mb_w: int, mb_h: int, chroma_qp_offset: int,
                           n_refs: int = 4, ring_in=None, f_offset=None,
                           ring_io=False):
    from .packed import unpack

    if f_offset is None and getattr(p, "f_offset", None) is not None:
        f_offset = p.f_offset[0]  # rides the fused blob (see PackedBatch)
    g = unpack(p, mb_w, mb_h)
    return decode_gop_batched_core(g, mb_w, mb_h, chroma_qp_offset, n_refs,
                                   ring_in=ring_in, f_offset=f_offset,
                                   ring_io=ring_io)


decode_gop_packed = jax.jit(
    decode_gop_packed_core,
    static_argnames=("mb_w", "mb_h", "chroma_qp_offset", "n_refs"),
)


def decode_gop_fused_core(buf, layout, mb_w: int, mb_h: int,
                          chroma_qp_offset: int, n_refs: int = 4):
    """Single-upload transport: `buf` is the fuse_packed byte blob (ONE
    H2D transfer per chunk), unfused and unpacked on-device."""
    from .packed import unfuse_packed

    return decode_gop_packed_core(
        unfuse_packed(buf, layout), mb_w, mb_h, chroma_qp_offset, n_refs
    )


decode_gop_fused = jax.jit(
    decode_gop_fused_core,
    static_argnames=("layout", "mb_w", "mb_h", "chroma_qp_offset",
                     "n_refs"),
)


# Frame-window variants (ring carried across jit calls; see
# decode_gop_batched_core docstring).  The first window has no carry-in
# (the zero ring is built inside the program — it is far too large to
# upload), middle windows chain carries, and the LAST window uses the
# plain decode_gop_fused (no carry-out copy).
def _fused_win_first_core(buf, layout, mb_w, mb_h, chroma_qp_offset,
                          n_refs):
    from .packed import unfuse_packed

    return decode_gop_packed_core(
        unfuse_packed(buf, layout), mb_w, mb_h, chroma_qp_offset, n_refs,
        ring_io=True,
    )


def _fused_win_mid_core(buf, layout, mb_w, mb_h, chroma_qp_offset,
                        n_refs, ring_in):
    from .packed import unfuse_packed

    return decode_gop_packed_core(
        unfuse_packed(buf, layout), mb_w, mb_h, chroma_qp_offset, n_refs,
        ring_in=ring_in, ring_io=True,
    )


def _fused_win_last_core(buf, layout, mb_w, mb_h, chroma_qp_offset,
                         n_refs, ring_in):
    from .packed import unfuse_packed

    return decode_gop_packed_core(
        unfuse_packed(buf, layout), mb_w, mb_h, chroma_qp_offset, n_refs,
        ring_in=ring_in, ring_io=False,
    )


_WIN_STATICS = ("layout", "mb_w", "mb_h", "chroma_qp_offset", "n_refs")
decode_gop_fused_win_first = jax.jit(_fused_win_first_core,
                                     static_argnames=_WIN_STATICS)
decode_gop_fused_win_mid = jax.jit(_fused_win_mid_core,
                                   static_argnames=_WIN_STATICS)
decode_gop_fused_win_last = jax.jit(_fused_win_last_core,
                                    static_argnames=_WIN_STATICS)
