"""TPU H.264 GOP reconstruction: the dense half of the decoder in JAX.

Consumes the SoA tensors from the host entropy decoder (entropy.py) and
reconstructs every frame of a decode span on-device with exact integer
arithmetic:

  frame scan (lax.scan over frames, carrying a ring of reference planes)
    ├─ residual stage: batched dequant + IDCT over all MBs  (ops/transforms)
    ├─ inter stage: per-pixel quarter-pel MC via half-pel planes + gather
    │  (ops/mc) + residual add — fully parallel over the frame
    ├─ intra stage: knight-wavefront over MB diagonals (ops/wavefront),
    │  all 9/4/4 predictors vectorized across active MBs (ops/intra)
    ├─ deblock: exact per-MB-order wavefront filter     (ops/deblock)
    └─ reference ring update: half-pel planes of the new frame

Bit-exactness contract: output YUV == ref_recon.reconstruct_gop ==
libavcodec (enforced in tests/test_jax_recon.py).

Batching across clips is done with jax.vmap over the whole GOP decode;
multi-chip sharding shards the clip axis (parallel/sharding.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import intra as ops_intra
from ...ops import mc as ops_mc
from ...ops import transforms as T
from ...ops.deblock import deblock_frame
from ...ops.wavefront import schedule

_MARGIN = ops_mc._MARGIN

# decode order of 4x4 blocks within an MB (raster ids)
_DEC_ORDER = (0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15)


_IDENTITY_WEIGHT = np.array([1, 0, 1, 0, 1, 0, 0, 0], np.int16)


def ring_slot_or_fifo(t) -> np.ndarray:
    """Per-frame ring slots from the host decoder, or the legacy FIFO
    allocation (slot = running ref count mod ring size is applied by the
    caller; here -1 marks non-refs and refs count upward, reduced mod R
    on device via clip — callers always mod by ring size)."""
    rs = getattr(t, "ring_slot", None)
    if rs is not None:
        return rs
    isr = (
        t.frame_is_ref
        if t.frame_is_ref is not None
        else np.ones(t.n_frames, np.uint8)
    )
    out = np.full(t.n_frames, -1, np.int64)
    k = 0
    for f in range(t.n_frames):
        if isr[f]:
            out[f] = k
            k += 1
    return out


def weights_or_identity(t) -> np.ndarray:
    """Per-frame pred weights with identity rows on unweighted frames, so
    the device applies one branch-free formula to every inter pixel."""
    w = t.pred_weights.copy()
    w[t.weight_flag == 0] = _IDENTITY_WEIGHT
    return w


def weights_l1_or_identity(t) -> np.ndarray:
    """Per-frame list-1 explicit weights with identity rows off
    explicit-B frames."""
    w = t.pred_weights_l1.copy()
    w[explicit_b_frames(t) == 0] = _IDENTITY_WEIGHT
    return w


def explicit_b_frames(t) -> np.ndarray:
    """[F] u8: 1 where the frame uses explicit B weighting."""
    if getattr(t, "bipred_idc", 0) != 1 or t.weight_flag is None:
        return np.zeros(t.n_frames, np.uint8)
    return ((t.frame_type == 1) & (t.weight_flag != 0)).astype(np.uint8)


def bipred_pair_weights(t) -> np.ndarray:
    """Per (frame, refIdxL0, refIdxL1) bi-prediction weights [F,16,16,2].

    Default average = (32, 32); implicit mode (weighted_bipred_idc == 2)
    derives w0/w1 from POC distances (spec 8.4.2.3.1)."""
    F = t.n_frames
    w = np.full((F, 16, 16, 2), 32, np.int16)
    if getattr(t, "bipred_idc", 0) != 2:
        return w
    for f in range(F):
        if t.frame_type[f] != 1:
            continue
        for r0 in range(16):
            s0 = t.ref_map[f, r0]
            if s0 < 0:
                continue
            for r1 in range(16):
                s1 = t.ref_map_l1[f, r1]
                if s1 < 0:
                    continue
                td = int(np.clip(int(t.poc[s1]) - int(t.poc[s0]), -128, 127))
                if td == 0:
                    continue
                tb = int(np.clip(int(t.poc[f]) - int(t.poc[s0]), -128, 127))
                tx = (16384 + abs(td) // 2) // td
                dsf = (tb * tx + 32) >> 8
                if -64 <= dsf <= 128:
                    w[f, r0, r1] = (64 - dsf, dsf)
    return w


def apply_weighted_pred(pred, w, o, log_wd):
    """Explicit weighted uni-prediction (8.4.2.3.2).  The rounding term
    (1 << log_wd) >> 1 is 0 at log_wd == 0, so one formula covers both
    spec branches.  All args broadcastable int32; returns clipped int32."""
    return jnp.clip(((pred * w + ((1 << log_wd) >> 1)) >> log_wd) + o, 0, 255)


class GopArrays(NamedTuple):
    """Device-side SoA mirror of entropy.GopTensors (one span)."""

    frame_type: jnp.ndarray   # [F]
    ref_map: jnp.ndarray      # [F, 16] span frame index per refIdx
    mb_kind: jnp.ndarray      # [F, M]
    qp: jnp.ndarray           # [F, M]
    i4_modes: jnp.ndarray     # [F, M, 16]
    i16_mode: jnp.ndarray     # [F, M]
    chroma_mode: jnp.ndarray  # [F, M]
    mv: jnp.ndarray           # [F, M, 16, 2]
    refidx: jnp.ndarray       # [F, M, 4]
    luma_dc: jnp.ndarray      # [F, M, 16]
    luma_ac: jnp.ndarray      # [F, M, 16, 16]
    chroma_dc: jnp.ndarray    # [F, M, 2, 4]
    chroma_ac: jnp.ndarray    # [F, M, 2, 4, 16]
    nnz: jnp.ndarray          # [F, M, 24]
    deblock_idc: jnp.ndarray  # [F, M]
    alpha_off: jnp.ndarray    # [F, M]
    beta_off: jnp.ndarray     # [F, M]
    avail: jnp.ndarray        # [F, M]
    ipcm: jnp.ndarray         # [F, M, 384]
    n_valid_frames: jnp.ndarray  # [] actual frame count (<= F padding)
    # explicit weighted prediction (8.4.2.3.2): [F, 16, 8] per refIdxL0
    # (wy oy wu ou wv ov log2y log2c); identity rows (1,0,...,0,0) on
    # frames without pred weights; None when no frame in the span has any
    weights: jnp.ndarray | None = None
    # B-slice fields (None when the span has no B frames):
    mv_l1: jnp.ndarray | None = None       # [F, M, 16, 2]
    refidx_l1: jnp.ndarray | None = None   # [F, M, 4]
    ref_map_l1: jnp.ndarray | None = None  # [F, 16]
    is_ref: jnp.ndarray | None = None      # [F] enters the reference ring
    bi_w: jnp.ndarray | None = None        # [F, 16, 16, 2] (w0, w1) per
                                           # (refIdxL0, refIdxL1) pair
    transform8: jnp.ndarray | None = None  # [F, M] 8x8 luma transform flag
    scaling_w4: jnp.ndarray | None = None  # [6, 16] scaling weights (raster)
    scaling_w8: jnp.ndarray | None = None  # [2, 64] 8x8 intra/inter weights
    # [F] device reference-ring slot written by each frame (-1 = non-ref).
    # Host-computed (mirrors DPB retention incl. MMCO/long-term refs).
    ring_slot: jnp.ndarray | None = None
    # explicit B weighting (weighted_bipred_idc == 1): per-refIdxL1 uni
    # tables and the per-frame flag selecting the eq 8-272 bi combine
    weights_l1: jnp.ndarray | None = None  # [F, 16, 8]
    bi_explicit: jnp.ndarray | None = None  # [F] 1 = explicit bi combine
    # Combined coefficient space [.., M*26*16] int16 (packed-transport
    # path): when set, luma_ac/luma_dc/chroma_ac/chroma_dc above are None
    # and per-frame views are sliced out of this inside the frame scan.
    # Rationale: separate [.., M, 26, 16]-shaped at-rest tensors tile to
    # T(8,128) on TPU — 16 lanes used of 128 — a ~10x physical HBM
    # blowup; one flat [.., M*416] tensor stores ~1:1.
    coeff_all: jnp.ndarray | None = None

    @staticmethod
    def from_tensors(t, pad_frames: int | None = None) -> "GopArrays":
        """Build from entropy.GopTensors (numpy), optionally padding the
        frame axis to a bucket size for stable jit shapes."""
        F = t.n_frames
        P = pad_frames or F
        if explicit_b_frames(t).any():
            # The eq 8-272 explicit-B combine (weights_l1/bi_explicit) is
            # only implemented by the batched path (recon_batched.py);
            # decoding such a span here would silently diverge from the
            # host decoder. The production pipeline never hits this
            # single-clip path.
            raise ValueError(
                "span uses explicit B weighting (weighted_bipred_idc=1); "
                "use the batched decoder (recon_batched)"
            )

        def pad(a):
            if P == F:
                return jnp.asarray(a)
            width = [(0, P - F)] + [(0, 0)] * (a.ndim - 1)
            return jnp.asarray(np.pad(a, width))

        return GopArrays(
            frame_type=pad(t.frame_type.astype(np.int32)),
            ref_map=pad(t.ref_map.astype(np.int32)),
            mb_kind=pad(t.mb_kind.astype(np.int32)),
            qp=pad(t.qp.astype(np.int32)),
            i4_modes=pad(t.i4_modes.astype(np.int32)),
            i16_mode=pad(t.i16_mode.astype(np.int32)),
            chroma_mode=pad(t.chroma_mode.astype(np.int32)),
            mv=pad(t.mv.astype(np.int32)),
            refidx=pad(t.refidx.astype(np.int32)),
            luma_dc=pad(t.luma_dc.astype(np.int32)),
            luma_ac=pad(t.luma_ac.astype(np.int32)),
            chroma_dc=pad(t.chroma_dc.astype(np.int32)),
            chroma_ac=pad(t.chroma_ac.astype(np.int32)),
            nnz=pad(t.nnz.astype(np.int32)),
            deblock_idc=pad(t.deblock_idc.astype(np.int32)),
            alpha_off=pad(t.alpha_off.astype(np.int32)),
            beta_off=pad(t.beta_off.astype(np.int32)),
            avail=pad(t.avail.astype(np.int32)),
            ipcm=pad(t.ipcm.astype(np.int32)),
            ring_slot=jnp.asarray(np.pad(
                ring_slot_or_fifo(t).astype(np.int32), (0, P - F),
                constant_values=-1,
            )),
            n_valid_frames=jnp.asarray(F, jnp.int32),
            weights=pad(weights_or_identity(t).astype(np.int32))
            if t.weight_flag is not None and t.weight_flag.any() else None,
            **(
                {"transform8": pad(t.transform8.astype(np.int32))}
                if t.transform8 is not None and t.transform8.any()
                else {}
            ),
            **(
                {
                    "scaling_w4": jnp.asarray(t.scaling_w4.astype(np.int32)),
                    "scaling_w8": jnp.asarray(t.scaling_w8.astype(np.int32)),
                }
                if getattr(t, "scaling_w4", None) is not None
                else {}
            ),
            **(
                {
                    "mv_l1": pad(t.mv_l1.astype(np.int32)),
                    "refidx_l1": pad(t.refidx_l1.astype(np.int32)),
                    "ref_map_l1": pad(t.ref_map_l1.astype(np.int32)),
                    "is_ref": pad(t.frame_is_ref.astype(np.int32)),
                    "bi_w": pad(bipred_pair_weights(t).astype(np.int32)),
                }
                if (t.frame_type == 1).any()
                else {}
            ),
        )


# ---------------------------------------------------------------------------
# Per-frame stages
# ---------------------------------------------------------------------------


def _assemble_mb_frame(blocks: jnp.ndarray, mb_w: int, mb_h: int,
                       mb_size: int) -> jnp.ndarray:
    """[M, mb_size, mb_size] per-MB tiles -> [H, W] frame."""
    return (
        blocks.reshape(mb_h, mb_w, mb_size, mb_size)
        .transpose(0, 2, 1, 3)
        .reshape(mb_h * mb_size, mb_w * mb_size)
    )


def _frame_to_mb(frame: jnp.ndarray, mb_w: int, mb_h: int,
                 mb_size: int) -> jnp.ndarray:
    return (
        frame.reshape(mb_h, mb_size, mb_w, mb_size)
        .transpose(0, 2, 1, 3)
        .reshape(mb_h * mb_w, mb_size, mb_size)
    )


def _inter_stage(fr, ring, mb_w, mb_h, luma_res, chroma_res):
    """Full-frame inter prediction + residual add.

    fr: dict of this frame's arrays; ring: (planes_y, chroma_u, chroma_v,
    ids).  Returns (Y, U, V) int32 with inter MBs reconstructed (intra MB
    regions contain garbage, overwritten by the intra stage).
    """
    M = fr["mb_kind"].shape[0]
    H, W = mb_h * 16, mb_w * 16
    planes_y, ring_u, ring_v, ring_ids = ring
    R = ring_ids.shape[0]

    # per-8x8 span ref -> ring slot
    refidx = fr["refidx"]                                   # [M, 4]
    span_ref = fr["ref_map"][jnp.clip(refidx, 0, 15)]       # [M, 4]
    slot8 = jnp.argmax(
        ring_ids[None, None, :] == span_ref[:, :, None], axis=-1
    )                                                       # [M, 4]

    # expand per-4x4 MV and per-8x8 slot to pixels
    mv = fr["mv"]                                           # [M, 16, 2]
    mvx_blk = _assemble_mb_frame(
        mv[..., 0].reshape(M, 4, 4), mb_w, mb_h, 4
    )                                                       # [H/4, W/4]
    mvy_blk = _assemble_mb_frame(mv[..., 1].reshape(M, 4, 4), mb_w, mb_h, 4)
    slot_blk = _assemble_mb_frame(
        slot8.reshape(M, 2, 2), mb_w, mb_h, 2
    )                                                       # [H/8, W/8]
    mvx = jnp.repeat(jnp.repeat(mvx_blk, 4, 0), 4, 1)
    mvy = jnp.repeat(jnp.repeat(mvy_blk, 4, 0), 4, 1)
    slot_px = jnp.repeat(jnp.repeat(slot_blk, 8, 0), 8, 1)

    pred_y = ops_mc.luma_mc_gather(planes_y, slot_px, mvx, mvy)

    # chroma at half resolution
    mvx_c = jnp.repeat(jnp.repeat(mvx_blk, 2, 0), 2, 1)
    mvy_c = jnp.repeat(jnp.repeat(mvy_blk, 2, 0), 2, 1)
    slot_c = jnp.repeat(jnp.repeat(slot_blk, 4, 0), 4, 1)
    pred_u = ops_mc.chroma_mc_gather(ring_u, slot_c, mvx_c, mvy_c)
    pred_v = ops_mc.chroma_mc_gather(ring_v, slot_c, mvx_c, mvy_c)

    wts = fr.get("weights")
    if wts is not None:
        # explicit weighted prediction: per-8x8 (refidx-indexed) weight
        # rows expanded to pixel maps; identity rows make this a no-op on
        # unweighted frames
        w8 = wts[jnp.clip(refidx, 0, 15)]                   # [M, 4, 8]

        def wmap(k, rep):
            blk = _assemble_mb_frame(w8[..., k].reshape(M, 2, 2),
                                     mb_w, mb_h, 2)
            return jnp.repeat(jnp.repeat(blk, rep, 0), rep, 1)

        pred_y = apply_weighted_pred(pred_y, wmap(0, 8), wmap(1, 8),
                                     wmap(6, 8))
        pred_u = apply_weighted_pred(pred_u, wmap(2, 4), wmap(3, 4),
                                     wmap(7, 4))
        pred_v = apply_weighted_pred(pred_v, wmap(4, 4), wmap(5, 4),
                                     wmap(7, 4))

    res_y = _assemble_mb_frame(luma_res, mb_w, mb_h, 16)
    res_u = _assemble_mb_frame(chroma_res[:, 0], mb_w, mb_h, 8)
    res_v = _assemble_mb_frame(chroma_res[:, 1], mb_w, mb_h, 8)

    Y = jnp.clip(pred_y + res_y, 0, 255)
    U = jnp.clip(pred_u + res_u, 0, 255)
    V = jnp.clip(pred_v + res_v, 0, 255)

    # IPCM overwrite
    kind = fr["mb_kind"]
    ipcm = fr["ipcm"]
    ipcm_y = _assemble_mb_frame(ipcm[:, :256].reshape(M, 16, 16), mb_w, mb_h, 16)
    ipcm_u = _assemble_mb_frame(ipcm[:, 256:320].reshape(M, 8, 8), mb_w, mb_h, 8)
    ipcm_v = _assemble_mb_frame(ipcm[:, 320:].reshape(M, 8, 8), mb_w, mb_h, 8)
    is_pcm_y = jnp.repeat(jnp.repeat(
        (kind == 4).reshape(mb_h, mb_w), 16, 0), 16, 1).reshape(H, W)
    is_pcm_c = jnp.repeat(jnp.repeat(
        (kind == 4).reshape(mb_h, mb_w), 8, 0), 8, 1)
    Y = jnp.where(is_pcm_y, ipcm_y, Y)
    U = jnp.where(is_pcm_c, ipcm_u, U)
    V = jnp.where(is_pcm_c, ipcm_v, V)
    return Y, U, V


# static per-block top-right availability inside an MB: block (x4,y4) with
# y4>0 has a usable top-right iff x4<3 and block (x4+1, y4-1) decodes
# earlier in _DEC_ORDER.
def _static_btr():
    order_pos = {blk: i for i, blk in enumerate(_DEC_ORDER)}
    out = {}
    for db in range(16):
        x4, y4 = db & 3, db >> 2
        if y4 == 0:
            out[db] = None  # depends on MB-level avail
        else:
            out[db] = (
                x4 < 3 and order_pos[(y4 - 1) * 4 + (x4 + 1)] < order_pos[db]
            )
    return out


_BTR_STATIC = _static_btr()


def _intra_stage(Y, U, V, fr, mb_w, mb_h, luma_res_blocks, luma_res_i16,
                 chroma_res):
    """Knight-wavefront intra reconstruction over the frame buffers.

    luma_res_blocks: [M, 16, 4, 4] per-block residuals (I4x4 path);
    luma_res_i16:    [M, 16, 16] assembled residual (I16 path);
    chroma_res:      [M, 2, 8, 8].
    """
    H, W = mb_h * 16, mb_w * 16
    Hc, Wc = H // 2, W // 2
    step_mbs, step_valid = schedule(mb_w, mb_h)
    step_mbs = jnp.asarray(step_mbs)
    step_valid = jnp.asarray(step_valid)

    yf = jnp.concatenate([Y.reshape(-1), jnp.zeros(64, jnp.int32)])
    uf = jnp.concatenate([U.reshape(-1), jnp.zeros(64, jnp.int32)])
    vf = jnp.concatenate([V.reshape(-1), jnp.zeros(64, jnp.int32)])
    y_scratch = H * W
    c_scratch = Hc * Wc

    kind_all = fr["mb_kind"]
    avail_all = fr["avail"]

    def gather_line(flat, y0, x0, n, dy, dx, Wp, scratch, ok):
        yy = y0[:, None] + dy * jnp.arange(n)[None, :]
        xx = x0[:, None] + dx * jnp.arange(n)[None, :]
        yy = jnp.clip(yy, 0, None)
        xx = jnp.clip(xx, 0, None)
        idx = jnp.where(ok[:, None], yy * Wp + xx, scratch)
        return flat[idx]

    def step(carry, inp):
        yf, uf, vf = carry
        mbs, valid = inp
        kind = kind_all[mbs]
        av = avail_all[mbs]
        have_l = (av & 1) == 1
        have_t = (av & 2) == 2
        have_tr = (av & 4) == 4
        have_tl = (av & 8) == 8
        mx = (mbs % mb_w) * 16
        my = (mbs // mb_w) * 16
        cx, cy = mx // 2, my // 2
        A = mbs.shape[0]

        # ---------- I16x16 ----------
        left16 = gather_line(yf, my, mx - 1, 16, 1, 0, W, y_scratch, valid)
        top16 = gather_line(yf, my - 1, mx, 16, 0, 1, W, y_scratch, valid)
        tl16 = yf[jnp.where(valid, jnp.clip(my - 1, 0, None) * W
                            + jnp.clip(mx - 1, 0, None), y_scratch)]
        pred16 = ops_intra.predict_i16(
            fr["i16_mode"][mbs], left16, top16, tl16, have_l, have_t
        )
        res16 = luma_res_i16[mbs]
        mb16 = jnp.clip(pred16 + res16, 0, 255)
        w16 = valid & (kind == 3)
        yy = my[:, None, None] + jnp.arange(16)[None, :, None]
        xx = mx[:, None, None] + jnp.arange(16)[None, None, :]
        idx16 = jnp.where(w16[:, None, None], yy * W + xx, y_scratch)
        yf = yf.at[idx16].set(
            jnp.where(w16[:, None, None], mb16, yf[idx16])
        )

        # ---------- I4x4, 16 blocks in decode order ----------
        w4 = valid & (kind == 2)
        for db in _DEC_ORDER:
            x4, y4 = db & 3, db >> 2
            bx = mx + x4 * 4
            by = my + y4 * 4
            bl = (x4 > 0) | have_l
            bt = (y4 > 0) | have_t
            if y4 == 0:
                btr = ((x4 < 3) & have_t) | ((x4 == 3) & have_tr)
            else:
                btr = jnp.full((A,), _BTR_STATIC[db]) & jnp.full((A,), True)
            if x4 > 0 and y4 > 0:
                btl = jnp.full((A,), True)
            elif x4 == 0 and y4 > 0:
                btl = have_l
            elif y4 == 0 and x4 > 0:
                btl = have_t
            else:
                btl = have_tl
            left = gather_line(yf, by, bx - 1, 4, 1, 0, W, y_scratch, w4)
            top = gather_line(yf, by - 1, bx, 4, 0, 1, W, y_scratch, w4)
            trr = gather_line(yf, by - 1, bx + 4, 4, 0, 1, W, y_scratch, w4)
            # clamp top-right gather x within frame
            tl = yf[jnp.where(w4, jnp.clip(by - 1, 0, None) * W
                              + jnp.clip(bx - 1, 0, None), y_scratch)]
            tr_eff = jnp.where(
                btr[:, None], trr,
                jnp.where(bt[:, None], top[:, 3:4], 0),
            )
            pred = ops_intra.predict_i4x4(
                fr["i4_modes"][mbs, db], left, top, tl, tr_eff, bl, bt
            )
            res = luma_res_blocks[mbs, db]
            blk = jnp.clip(pred + res, 0, 255)
            yy = by[:, None, None] + jnp.arange(4)[None, :, None]
            xx = bx[:, None, None] + jnp.arange(4)[None, None, :]
            idxb = jnp.where(w4[:, None, None], yy * W + xx, y_scratch)
            yf = yf.at[idxb].set(jnp.where(w4[:, None, None], blk, yf[idxb]))

        # ---------- chroma (intra MBs) ----------
        wc = valid & ((kind == 2) | (kind == 3))
        cmode = fr["chroma_mode"][mbs]
        for plane in range(2):
            buf = uf if plane == 0 else vf
            leftc = gather_line(buf, cy, cx - 1, 8, 1, 0, Wc, c_scratch, wc)
            topc = gather_line(buf, cy - 1, cx, 8, 0, 1, Wc, c_scratch, wc)
            tlc = buf[jnp.where(wc, jnp.clip(cy - 1, 0, None) * Wc
                                + jnp.clip(cx - 1, 0, None), c_scratch)]
            predc = ops_intra.predict_chroma(
                cmode, leftc, topc, tlc, have_l, have_t
            )
            mbch = jnp.clip(predc + chroma_res[mbs, plane], 0, 255)
            yy = cy[:, None, None] + jnp.arange(8)[None, :, None]
            xx = cx[:, None, None] + jnp.arange(8)[None, None, :]
            idxc = jnp.where(wc[:, None, None], yy * Wc + xx, c_scratch)
            if plane == 0:
                uf = uf.at[idxc].set(
                    jnp.where(wc[:, None, None], mbch, uf[idxc])
                )
            else:
                vf = vf.at[idxc].set(
                    jnp.where(wc[:, None, None], mbch, vf[idxc])
                )
        return (yf, uf, vf), None

    (yf, uf, vf), _ = jax.lax.scan(step, (yf, uf, vf), (step_mbs, step_valid))
    return (
        yf[: H * W].reshape(H, W),
        uf[: Hc * Wc].reshape(Hc, Wc),
        vf[: Hc * Wc].reshape(Hc, Wc),
    )


# ---------------------------------------------------------------------------
# GOP decode
# ---------------------------------------------------------------------------


def decode_gop_core(g: GopArrays, mb_w: int, mb_h: int,
                    chroma_qp_offset: int, n_refs: int = 4):
    """Decode all frames of a span (unjitted core; vmap-able over a clip
    batch).  Returns (Y [F,H,W], U, V) uint8."""
    F = g.mb_kind.shape[0]
    M = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    Hc, Wc = H // 2, W // 2
    R = n_refs
    m = _MARGIN

    ring_y0 = jnp.zeros((R, 4, H + 2 * m, W + 2 * m), jnp.uint8)
    ring_u0 = jnp.zeros((R, Hc + 2 * m, Wc + 2 * m), jnp.uint8)
    ring_v0 = jnp.zeros((R, Hc + 2 * m, Wc + 2 * m), jnp.uint8)
    ring_ids0 = jnp.full((R,), -1, jnp.int32)

    def frame_step(carry, f):
        ring_y, ring_u, ring_v, ring_ids = carry
        fr = {
            "mb_kind": g.mb_kind[f],
            "qp": g.qp[f],
            "i4_modes": g.i4_modes[f],
            "i16_mode": g.i16_mode[f],
            "chroma_mode": g.chroma_mode[f],
            "mv": g.mv[f],
            "refidx": g.refidx[f],
            "ref_map": g.ref_map[f],
            "ipcm": g.ipcm[f],
            "avail": g.avail[f],
            "weights": g.weights[f] if g.weights is not None else None,
        }
        qp = g.qp[f]
        qpc = T.chroma_qp_from_luma(qp, chroma_qp_offset)
        is_i16 = g.mb_kind[f] == 3

        # residuals
        luma_res_i16 = T.mb_luma_residual(
            g.luma_ac[f], g.luma_dc[f], qp, is_i16
        )
        luma_res_blocks = (
            T.idct4x4(
                T.dequant4x4(g.luma_ac[f], qp[:, None]).reshape(M, 16, 4, 4)
            ) + 32
        ) >> 6
        chroma_res = T.mb_chroma_residual(g.chroma_ac[f], g.chroma_dc[f], qpc)

        # inter + IPCM base
        Y, U, V = _inter_stage(
            fr, (ring_y, ring_u, ring_v, ring_ids), mb_w, mb_h,
            luma_res_i16, chroma_res,
        )
        # intra wavefront
        Y, U, V = _intra_stage(
            Y, U, V, fr, mb_w, mb_h, luma_res_blocks, luma_res_i16,
            chroma_res,
        )
        # deblock
        refidx = g.refidx[f]
        span_ref = jnp.where(
            refidx >= 0, g.ref_map[f][jnp.clip(refidx, 0, 15)], -1
        )
        meta = {
            "qp": qp,
            "kind": g.mb_kind[f],
            "idc": g.deblock_idc[f],
            "a_off": g.alpha_off[f],
            "b_off": g.beta_off[f],
            "avail": g.avail[f],
            "nnz": g.nnz[f],
            "mv": g.mv[f],
            "ref": span_ref,
        }
        Y, U, V = deblock_frame(Y, U, V, meta, mb_w, mb_h, chroma_qp_offset)
        Y = Y.astype(jnp.uint8)
        U = U.astype(jnp.uint8)
        V = V.astype(jnp.uint8)

        # ring update at the host-assigned slot (mirrors DPB retention
        # incl. MMCO / long-term references); slot -1 = non-reference
        slot = g.ring_slot[f]
        isr = slot >= 0
        pos = jnp.where(isr, slot, 0) % R
        planes = ops_mc.luma_halfpel_planes(Y)
        pu = ops_mc.pad_plane(U)
        pv = ops_mc.pad_plane(V)
        old_y = jax.lax.dynamic_slice(
            ring_y, (pos, 0, 0, 0), (1,) + ring_y.shape[1:]
        )
        old_u = jax.lax.dynamic_slice(ring_u, (pos, 0, 0),
                                      (1,) + ring_u.shape[1:])
        old_v = jax.lax.dynamic_slice(ring_v, (pos, 0, 0),
                                      (1,) + ring_v.shape[1:])
        old_id = jax.lax.dynamic_slice(ring_ids, (pos,), (1,))
        ring_y = jax.lax.dynamic_update_slice(
            ring_y, jnp.where(isr, planes[None], old_y), (pos, 0, 0, 0)
        )
        ring_u = jax.lax.dynamic_update_slice(
            ring_u, jnp.where(isr, pu[None], old_u), (pos, 0, 0)
        )
        ring_v = jax.lax.dynamic_update_slice(
            ring_v, jnp.where(isr, pv[None], old_v), (pos, 0, 0)
        )
        ring_ids = jax.lax.dynamic_update_slice(
            ring_ids, jnp.where(isr, f[None].astype(jnp.int32), old_id),
            (pos,),
        )
        return (ring_y, ring_u, ring_v, ring_ids), (Y, U, V)

    _, (Ys, Us, Vs) = jax.lax.scan(
        frame_step,
        (ring_y0, ring_u0, ring_v0, ring_ids0),
        jnp.arange(F),
    )
    return Ys, Us, Vs


decode_gop = jax.jit(
    decode_gop_core,
    static_argnames=("mb_w", "mb_h", "chroma_qp_offset", "n_refs"),
)
