"""HEVC I-frame reconstruction on device (JAX/XLA, TPU-first).

Consumes the host-prepped SoA TU streams (prep.py) and reconstructs
planes with a lax.scan over TU decode positions, hand-batched over the
frame axis (one TU per frame per step; jax.vmap over the scan crashes
the TPU runtime — see CLAUDE.md).  Every stage of a step is static-shape
dense linear algebra:

  refs      one flat gather of the 66-sample raw window per frame
  subst     take_along_axis with the host-resolved 8.4.4.2.2 permutation
  smoothing (A_size @ x + 2) >> 2              [65x65 int32 matmul]
  intra     (W[widx] @ xe) >> 5, clip          [MXU bf16 matmul via a
            one-hot outer product: z = onehot(widx) x xe, pred = z @ T2;
            all operands are small integers, so bf16 products with f32
            accumulation are EXACT — see tables.py]
  dequant   int32-safe split-shift form (prep.qmul/qsh)
  itrans    two 16x16 int32 matmuls with the 8.6.4 intermediate clip
  scatter   one masked flat scatter of the 16x16 window per frame

The reference had no HEVC pixel path of its own (it delegated to
FFmpeg/NVDEC, software_video_decoder.cpp:122-136); this design has no
CUDA counterpart to mirror — it is the matmul formulation the MXU wants.

Bit-exactness contract: output == ref_recon == libavcodec
(tests/test_hevc_jax.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import tables
from .prep import MARGIN_BR, MARGIN_TL, PlanePrep


@functools.lru_cache(maxsize=1)
def _consts():
    Wt = tables.w_table()  # [210, 256, 67]
    t2 = np.transpose(Wt, (0, 2, 1)).reshape(210 * tables.N_COL, 256)
    return (
        jnp.asarray(t2, jnp.bfloat16),
        jnp.asarray(tables.filter_table(), jnp.int32),   # [3,65,65]
        jnp.asarray(tables.dc_table(), jnp.int32),       # [3,65]
        jnp.asarray(tables.m_table(), jnp.int32),        # [4,16,16]
    )


def _step(consts, Hp, Wp, plane_flat, xs):
    t2, A, dcw, M = consts
    F = xs["x0"].shape[0]
    x0, y0 = xs["x0"], xs["y0"]
    offs = jnp.arange(F, dtype=jnp.int32) * (Hp * Wp)

    # raw ref window: left column (32), corner+top row (33), const 128
    ar32 = jnp.arange(32, dtype=jnp.int32)
    ar33 = jnp.arange(33, dtype=jnp.int32)
    left_idx = offs[:, None] + (y0[:, None] + ar32[None, :]) * Wp \
        + (x0[:, None] - 1)
    ctop_idx = offs[:, None] + (y0[:, None] - 1) * Wp \
        + (x0[:, None] - 1) + ar33[None, :]
    raw = jnp.concatenate(
        [plane_flat[left_idx], plane_flat[ctop_idx],
         jnp.full((F, 1), 128, jnp.int32)], axis=1)          # [F, 66]
    x = jnp.take_along_axis(raw, xs["subst"], axis=1)        # [F, 65]

    si_oh = jax.nn.one_hot(xs["si"], 3, dtype=jnp.int32)     # [F, 3]
    dcsum = jnp.sum(jnp.einsum("fj,sj->fs", x, dcw) * si_oh, axis=1)
    dc = (dcsum + xs["dcadd"]) >> xs["dcshift"]

    xf3 = jnp.einsum("fj,skj->fsk", x, A)                    # [F, 3, 65]
    xf = (jnp.sum(xf3 * si_oh[:, :, None], axis=1) + 2) >> 2
    xsel = jnp.where(xs["filt"][:, None] == 1, xf, x)
    xe = jnp.concatenate(
        [xsel, dc[:, None], jnp.ones((F, 1), jnp.int32)], axis=1)  # [F,67]

    oh = jax.nn.one_hot(xs["widx"], 210, dtype=jnp.bfloat16)
    z = (oh[:, :, None] * xe[:, None, :].astype(jnp.bfloat16)).reshape(
        F, 210 * tables.N_COL)
    pred = jnp.dot(z, t2, preferred_element_type=jnp.float32)
    pred = jnp.clip(pred.astype(jnp.int32) >> 5, 0, 255)     # [F, 256]

    # dequant (8.6.3, int32-safe split shift) + inverse transform (8.6.4)
    qsh = xs["qsh"][:, None]
    prod = xs["coeff"].astype(jnp.int32) * xs["qmul"][:, None]
    rnd = jnp.where(qsh > 0, 1 << jnp.maximum(qsh - 1, 0), 0)
    d_r = (prod + rnd) >> jnp.maximum(qsh, 0)
    d_l = prod << jnp.maximum(-qsh, 0)
    d = jnp.clip(jnp.where(qsh >= 0, d_r, d_l), -32768, 32767)
    d = d.reshape(F, 16, 16)
    Msel = jnp.einsum("fm,mkr->fkr",
                      jax.nn.one_hot(xs["mi"], 4, dtype=jnp.int32), M)
    e = jnp.einsum("frk,frc->fkc", Msel, d)                  # M^T @ d
    e = jnp.clip((e + 64) >> 7, -32768, 32767)
    r = (jnp.einsum("fkc,fcj->fkj", e, Msel) + 2048) >> 12   # e @ M
    r = jnp.clip(r, -32768, 32767)

    rec = jnp.clip(pred.reshape(F, 16, 16) + r, 0, 255)

    # masked scatter of the 16x16 window (one TU per frame per step)
    ar16 = jnp.arange(16, dtype=jnp.int32)
    win = offs[:, None, None] \
        + (y0[:, None, None] + ar16[None, :, None]) * Wp \
        + (x0[:, None, None] + ar16[None, None, :])
    n = 4 << xs["si"]
    bm = (ar16[None, :, None] < n[:, None, None]) \
        & (ar16[None, None, :] < n[:, None, None]) \
        & (xs["mask"][:, None, None] == 1)
    flat = win.reshape(F * 256)
    old = plane_flat[flat]
    new = jnp.where(bm.reshape(F * 256), rec.reshape(F * 256), old)
    plane_flat = plane_flat.at[flat].set(new, unique_indices=True)
    return plane_flat, None


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _decode_core(consts, xs, h, w):
    Hp = h + MARGIN_TL + MARGIN_BR
    Wp = w + MARGIN_TL + MARGIN_BR
    F = xs["x0"].shape[1]
    plane = jnp.zeros(F * Hp * Wp, jnp.int32)
    step = functools.partial(_step, consts, Hp, Wp)
    plane, _ = jax.lax.scan(step, plane, xs)
    plane = plane.reshape(F, Hp, Wp)
    out = plane[:, MARGIN_TL:MARGIN_TL + h, MARGIN_TL:MARGIN_TL + w]
    return out.astype(jnp.uint8)


def decode_planes(p: PlanePrep) -> jax.Array:
    """Run one plane scan; returns [n_seq, h, w] uint8 on device."""
    xs = {
        "x0": jnp.asarray(p.x0), "y0": jnp.asarray(p.y0),
        "subst": jnp.asarray(p.subst), "widx": jnp.asarray(p.widx),
        "si": jnp.asarray(p.si), "filt": jnp.asarray(p.filt),
        "mi": jnp.asarray(p.mi), "qmul": jnp.asarray(p.qmul),
        "qsh": jnp.asarray(p.qsh), "dcadd": jnp.asarray(p.dcadd),
        "dcshift": jnp.asarray(p.dcshift), "mask": jnp.asarray(p.mask),
        "coeff": jnp.asarray(p.coeff),
    }
    return _decode_core(_consts(), xs, p.h, p.w)


# ---------------------------------------------------------------------------
# Level-batched decode (v2): one scan step reconstructs a whole
# DEPENDENCY LEVEL of TUs (prep.prep_plane_sequences_lv) — S "small"
# (4/8/16) slots and B "big" (32x32, luma-only) slots per frame.  The
# intra weight tables stream once per level instead of once per TU, and
# the plane lives as 4-pixel ROWS so the per-level scatter writes n/4
# 4-px rows per TU row instead of n scalar elements (TU x origins are
# 4-aligned; margins are 4 so padded coords stay aligned).  32x32 TUs
# add the 129-sample reference window, DCT-32, and the data-dependent
# strong-intra-smoothing select (8.4.4.2.3) evaluated ON DEVICE from the
# unfiltered reference vector.
# ---------------------------------------------------------------------------

from .prep import MARGIN_BR4, MARGIN_TL4  # noqa: E402


@functools.lru_cache(maxsize=1)
def _consts32():
    W32 = tables.w_table32()  # [35, 1024, 131]
    t32 = np.transpose(W32, (0, 2, 1)).reshape(35 * tables.N_COL32, 1024)
    return (
        jnp.asarray(t32, jnp.bfloat16),
        jnp.asarray(tables.filter_table32(), jnp.int32),  # [129, 129]
        jnp.asarray(tables.dc_table32(), jnp.int32),      # [129]
        jnp.asarray(tables.m_table32(), jnp.int32),       # [32, 32]
    )


def _dequant_split(coeff, qmul, qsh):
    """8.6.3 int32-safe split-shift dequant (see PlanePrep.qsh)."""
    prod = coeff.astype(jnp.int32) * qmul
    rnd = jnp.where(qsh > 0, 1 << jnp.maximum(qsh - 1, 0), 0)
    d_r = (prod + rnd) >> jnp.maximum(qsh, 0)
    d_l = prod << jnp.maximum(-qsh, 0)
    return jnp.clip(jnp.where(qsh >= 0, d_r, d_l), -32768, 32767)


def _step_lv(consts, consts32, Hp, Wp, has_big, rows4, xs):
    t2, A, dcw, M = consts
    F, S = xs["x0"].shape
    Wr = Wp // 4
    n_rows = rows4.shape[0] - 1  # last row is never read (drop target)
    pf = rows4[:-1].reshape(-1)  # flat pixel view for the ref gathers
    offs = jnp.arange(F, dtype=jnp.int32)[:, None] * (Hp * Wp)
    roffs = jnp.arange(F, dtype=jnp.int32)[:, None, None] * (Hp * Wr)

    # ---- small class --------------------------------------------------
    x0, y0 = xs["x0"], xs["y0"]
    ar32 = jnp.arange(32, dtype=jnp.int32)
    ar33 = jnp.arange(33, dtype=jnp.int32)
    left_idx = offs[..., None] + (y0[..., None] + ar32) * Wp \
        + (x0[..., None] - 1)
    ctop_idx = offs[..., None] + (y0[..., None] - 1) * Wp \
        + (x0[..., None] - 1) + ar33
    raw = jnp.concatenate(
        [pf[left_idx], pf[ctop_idx],
         jnp.full((F, S, 1), 128, jnp.int32)], axis=-1)       # [F, S, 66]
    x = jnp.take_along_axis(raw, xs["subst"], axis=-1)        # [F, S, 65]

    si_oh = jax.nn.one_hot(xs["si"], 3, dtype=jnp.int32)      # [F, S, 3]
    dcsum = jnp.sum(jnp.einsum("fsj,tj->fst", x, dcw) * si_oh, axis=-1)
    dc = (dcsum + xs["dcadd"]) >> xs["dcshift"]

    xf3 = jnp.einsum("fsj,tkj->fstk", x, A)                   # [F, S, 3, 65]
    xf = (jnp.sum(xf3 * si_oh[..., None], axis=2) + 2) >> 2
    xsel = jnp.where(xs["filt"][..., None] == 1, xf, x)
    xe = jnp.concatenate(
        [xsel, dc[..., None], jnp.ones((F, S, 1), jnp.int32)], axis=-1)

    oh = jax.nn.one_hot(xs["widx"], 210, dtype=jnp.bfloat16)
    z = (oh[..., None] * xe[..., None, :].astype(jnp.bfloat16)).reshape(
        F * S, 210 * tables.N_COL)
    pred = jnp.dot(z, t2, preferred_element_type=jnp.float32)
    pred = jnp.clip(pred.astype(jnp.int32) >> 5, 0, 255).reshape(F, S, 256)

    d = _dequant_split(xs["coeff"], xs["qmul"][..., None],
                       xs["qsh"][..., None]).reshape(F, S, 16, 16)
    Msel = jnp.einsum("fsm,mkr->fskr",
                      jax.nn.one_hot(xs["mi"], 4, dtype=jnp.int32), M)
    e = jnp.einsum("fsrk,fsrc->fskc", Msel, d)
    e = jnp.clip((e + 64) >> 7, -32768, 32767)
    r = (jnp.einsum("fskc,fscj->fskj", e, Msel) + 2048) >> 12
    r = jnp.clip(r, -32768, 32767)
    rec = jnp.clip(pred.reshape(F, S, 16, 16) + r, 0, 255)

    # 4-px-row scatter: rows i < n, chunks j < n/4 of each slot
    n = 4 << xs["si"]                                          # [F, S]
    ar16 = jnp.arange(16, dtype=jnp.int32)
    ar4 = jnp.arange(4, dtype=jnp.int32)
    ridx = roffs[..., None] + (y0[..., None, None] + ar16[:, None]) * Wr \
        + (x0[..., None, None] >> 2) + ar4[None, :]            # [F, S, 16, 4]
    valid = (ar16[:, None] < n[..., None, None]) \
        & (ar4[None, :] < (n[..., None, None] >> 2)) \
        & (xs["mask"][..., None, None] == 1)
    ridx = jnp.where(valid, ridx, n_rows + 1)   # out of bounds -> dropped
    rows4 = rows4.at[ridx.reshape(-1)].set(
        rec.reshape(F, S, 16, 4, 4).reshape(-1, 4),
        mode="drop")

    # ---- big class (32x32) -------------------------------------------
    if has_big:
        t32, A32, dcw32, M32 = consts32
        pf = rows4[:-1].reshape(-1)  # NOTE: reads the same level's state
        x0b, y0b = xs["x0b"], xs["y0b"]
        _, Bn = x0b.shape
        ar64 = jnp.arange(64, dtype=jnp.int32)
        ar65 = jnp.arange(65, dtype=jnp.int32)
        lidx = offs[..., None] + (y0b[..., None] + ar64) * Wp \
            + (x0b[..., None] - 1)
        ctidx = offs[..., None] + (y0b[..., None] - 1) * Wp \
            + (x0b[..., None] - 1) + ar65
        rawb = jnp.concatenate(
            [pf[lidx], pf[ctidx],
             jnp.full((F, Bn, 1), 128, jnp.int32)], axis=-1)  # [F, B, 130]
        xb = jnp.take_along_axis(rawb, xs["substb"], axis=-1)  # [F, B, 129]

        dc32 = (jnp.einsum("fbj,j->fb", xb, dcw32) + 32) >> 6
        xf = (jnp.einsum("fbj,kj->fbk", xb, A32) + 2) >> 2
        # strong smoothing (8.4.4.2.3): bilinear from corner/endpoints,
        # selected per-TU by the flatness test on the UNFILTERED refs
        corner = xb[..., 64]
        l63 = xb[..., 63]
        t63 = xb[..., 128]
        cond = (
            (jnp.abs(corner + t63 - 2 * xb[..., 65 + 31]) < 8)
            & (jnp.abs(corner + l63 - 2 * xb[..., 31]) < 8)
        )
        wgt = jnp.arange(63, dtype=jnp.int32)
        sl = (corner[..., None] * (63 - wgt) + l63[..., None] * (wgt + 1)
              + 32) >> 6
        st = (corner[..., None] * (63 - wgt) + t63[..., None] * (wgt + 1)
              + 32) >> 6
        xstrong = jnp.concatenate(
            [sl, l63[..., None], corner[..., None], st, t63[..., None]],
            axis=-1)                                           # [F, B, 129]
        fb = xs["filtb"][..., None]
        xselb = jnp.where(
            fb == 0, xb,
            jnp.where((fb == 2) & cond[..., None], xstrong, xf))
        xeb = jnp.concatenate(
            [xselb, dc32[..., None], jnp.ones((F, Bn, 1), jnp.int32)],
            axis=-1)                                           # [F, B, 131]

        ohb = jax.nn.one_hot(xs["modeb"], 35, dtype=jnp.bfloat16)
        zb = (ohb[..., None] * xeb[..., None, :].astype(jnp.bfloat16)
              ).reshape(F * Bn, 35 * tables.N_COL32)
        predb = jnp.dot(zb, t32, preferred_element_type=jnp.float32)
        predb = jnp.clip(predb.astype(jnp.int32) >> tables.SHIFT32,
                         0, 255).reshape(F, Bn, 1024)

        db = _dequant_split(xs["coeffb"], xs["qmulb"][..., None],
                            xs["qshb"][..., None]).reshape(F, Bn, 32, 32)
        eb = jnp.clip((jnp.einsum("rk,fbrc->fbkc", M32, db) + 64) >> 7,
                      -32768, 32767)
        rb = jnp.clip((jnp.einsum("fbkc,cj->fbkj", eb, M32) + 2048) >> 12,
                      -32768, 32767)
        recb = jnp.clip(predb.reshape(F, Bn, 32, 32) + rb, 0, 255)

        ar32r = jnp.arange(32, dtype=jnp.int32)
        ar8 = jnp.arange(8, dtype=jnp.int32)
        ridxb = roffs[..., None] \
            + (y0b[..., None, None] + ar32r[:, None]) * Wr \
            + (x0b[..., None, None] >> 2) + ar8[None, :]      # [F, B, 32, 8]
        validb = (xs["maskb"][..., None, None] == 1) \
            & jnp.ones((32, 8), bool)
        ridxb = jnp.where(validb, ridxb, n_rows + 1)
        rows4 = rows4.at[ridxb.reshape(-1)].set(
            recb.reshape(F, Bn, 32, 8, 4).reshape(-1, 4),
            mode="drop")
    return rows4, None


@functools.partial(jax.jit, static_argnames=("h", "w", "has_big"))
def _decode_core_lv(consts, consts32, xs, h, w, has_big):
    Hp = h + MARGIN_TL4 + MARGIN_BR4
    Wp = w + MARGIN_TL4 + MARGIN_BR4
    F = xs["x0"].shape[1]
    rows4 = jnp.zeros((F * Hp * (Wp // 4) + 1, 4), jnp.int32)
    step = functools.partial(_step_lv, consts, consts32, Hp, Wp, has_big)
    rows4, _ = jax.lax.scan(step, rows4, xs)
    plane = rows4[:-1].reshape(F, Hp, Wp)
    out = plane[:, MARGIN_TL4:MARGIN_TL4 + h, MARGIN_TL4:MARGIN_TL4 + w]
    return out.astype(jnp.uint8)


def decode_planes_lv(p) -> jax.Array:
    """Level-batched plane scan; returns [n_seq, h, w] uint8 on device."""
    has_big = p.coeffb.shape[2] > 0
    xs = {
        "x0": jnp.asarray(p.x0), "y0": jnp.asarray(p.y0),
        "subst": jnp.asarray(p.subst), "widx": jnp.asarray(p.widx),
        "si": jnp.asarray(p.si), "filt": jnp.asarray(p.filt),
        "mi": jnp.asarray(p.mi), "qmul": jnp.asarray(p.qmul),
        "qsh": jnp.asarray(p.qsh), "dcadd": jnp.asarray(p.dcadd),
        "dcshift": jnp.asarray(p.dcshift), "mask": jnp.asarray(p.mask),
        "coeff": jnp.asarray(p.coeff),
    }
    if has_big:
        xs.update(
            x0b=jnp.asarray(p.x0b), y0b=jnp.asarray(p.y0b),
            substb=jnp.asarray(p.substb), modeb=jnp.asarray(p.modeb),
            filtb=jnp.asarray(p.filtb), qmulb=jnp.asarray(p.qmulb),
            qshb=jnp.asarray(p.qshb), maskb=jnp.asarray(p.maskb),
            coeffb=jnp.asarray(p.coeffb),
        )
    return _decode_core_lv(_consts(), _consts32(), xs, p.h, p.w, has_big)


# ---------------------------------------------------------------------------
# Deblocking (8.7.2) — picture-based two-pass, dense on device.
#
# HEVC deblocking has no sequential structure: ALL vertical edges filter
# first, then ALL horizontal edges, edges sit on an 8x8 grid, and a
# filter touches <= 3 samples per side, so edges never interact within a
# pass.  Each pass is therefore one reshape into 8-column blocks plus
# pure elementwise VPU math — no wavefront, no gathers.  All QP/edge-map
# derivation happens on the host (deblock_ref.deblock_params); the
# device sees dense per-edge beta/tc planes where 0 = edge off.
# ---------------------------------------------------------------------------


def _luma_pass(pl, beta, tc):
    """One direction of luma deblock.  pl [F, H, W] int32 with edges at
    columns 8, 16, ...; beta/tc [F, H//4, W//8 - 1]."""
    F, H, W = pl.shape
    K = W // 8 - 1
    if K <= 0:
        return pl
    S = pl.reshape(F, H, W // 8, 8)
    w8 = jnp.concatenate([S[:, :, :-1, 4:], S[:, :, 1:, :4]], axis=3)
    w8 = w8.reshape(F, H // 4, 4, K, 8)
    p3, p2, p1, p0 = (w8[..., i] for i in range(4))     # [F, h4, 4, K]
    q0, q1, q2, q3 = (w8[..., i] for i in range(4, 8))
    dp = jnp.abs(p2 - 2 * p1 + p0)
    dq = jnp.abs(q2 - 2 * q1 + q0)
    d = dp[:, :, 0] + dp[:, :, 3] + dq[:, :, 0] + dq[:, :, 3]  # [F,h4,K]
    on = d < beta  # beta==0 => edge off

    def sharp(i):
        return ((2 * (dp[:, :, i] + dq[:, :, i]) < (beta >> 2))
                & (jnp.abs(p3[:, :, i] - p0[:, :, i])
                   + jnp.abs(q0[:, :, i] - q3[:, :, i]) < (beta >> 3))
                & (jnp.abs(p0[:, :, i] - q0[:, :, i])
                   < ((5 * tc + 1) >> 1)))

    strong = sharp(0) & sharp(3)
    tc4 = tc[:, :, None, :]

    def c3(lo, hi, v):
        return jnp.clip(v, lo, hi)

    # strong (8.7.2.5.6)
    p0s = c3(p0 - 2 * tc4, p0 + 2 * tc4,
             (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
    p1s = c3(p1 - 2 * tc4, p1 + 2 * tc4, (p2 + p1 + p0 + q0 + 2) >> 2)
    p2s = c3(p2 - 2 * tc4, p2 + 2 * tc4,
             (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
    q0s = c3(q0 - 2 * tc4, q0 + 2 * tc4,
             (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3)
    q1s = c3(q1 - 2 * tc4, q1 + 2 * tc4, (q2 + q1 + q0 + p0 + 2) >> 2)
    q2s = c3(q2 - 2 * tc4, q2 + 2 * tc4,
             (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)
    # weak (8.7.2.5.7)
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    won = jnp.abs(delta) < tc4 * 10
    dcl = c3(-tc4, tc4, delta)
    p0w = jnp.where(won, c3(0, 255, p0 + dcl), p0)
    q0w = jnp.where(won, c3(0, 255, q0 - dcl), q0)
    side = (beta + (beta >> 1)) >> 3
    dEp = ((dp[:, :, 0] + dp[:, :, 3]) < side)[:, :, None, :]
    dEq = ((dq[:, :, 0] + dq[:, :, 3]) < side)[:, :, None, :]
    th = tc4 >> 1
    dp1 = c3(-th, th, (((p2 + p0 + 1) >> 1) - p1 + dcl) >> 1)
    dq1 = c3(-th, th, (((q2 + q0 + 1) >> 1) - q1 - dcl) >> 1)
    p1w = jnp.where(won & dEp, c3(0, 255, p1 + dp1), p1)
    q1w = jnp.where(won & dEq, c3(0, 255, q1 + dq1), q1)

    onx = on[:, :, None, :]
    stx = strong[:, :, None, :]

    def pick(s, w, orig):
        return jnp.where(onx, jnp.where(stx, s, w), orig)

    w8n = jnp.stack(
        [p3, pick(p2s, p2, p2), pick(p1s, p1w, p1), pick(p0s, p0w, p0),
         pick(q0s, q0w, q0), pick(q1s, q1w, q1), pick(q2s, q2, q2), q3],
        axis=-1).reshape(F, H, K * 8)
    return jnp.concatenate(
        [pl[:, :, :4], w8n, pl[:, :, W - 4:]], axis=2)


def _chroma_pass(pl, tc):
    """One direction of chroma deblock.  pl [B, Hc, Wc] int32; edges at
    chroma columns 8, 16, ...; tc [B, Hc//4, Wc//8 - 1] (0 = off)."""
    B, Hc, Wc = pl.shape
    # chroma planes are multiples of 4, not 8: pad to the block grid
    # (the filter never reads q2/q3, so zero-pad cols are never read)
    Wp = -(-Wc // 8) * 8
    K = Wp // 8 - 1
    if K <= 0:
        return pl
    if Wp != Wc:
        pl = jnp.pad(pl, ((0, 0), (0, 0), (0, Wp - Wc)))
    S = pl.reshape(B, Hc, Wp // 8, 8)
    p1 = S[:, :, :-1, 6].reshape(B, Hc // 4, 4, K)
    p0 = S[:, :, :-1, 7].reshape(B, Hc // 4, 4, K)
    q0 = S[:, :, 1:, 0].reshape(B, Hc // 4, 4, K)
    q1 = S[:, :, 1:, 1].reshape(B, Hc // 4, 4, K)
    tc4 = tc[:, :, None, :]
    delta = jnp.clip(((((q0 - p0) << 2) + p1 - q1 + 4) >> 3), -tc4, tc4)
    p0n = jnp.clip(p0 + delta, 0, 255).reshape(B, Hc, K)
    q0n = jnp.clip(q0 - delta, 0, 255).reshape(B, Hc, K)
    col7 = jnp.concatenate([p0n, S[:, :, -1:, 7]], axis=2)
    col0 = jnp.concatenate([S[:, :, :1, 0], q0n], axis=2)
    S = jnp.concatenate(
        [col0[..., None], S[:, :, :, 1:7], col7[..., None]], axis=3)
    return S.reshape(B, Hc, Wp)[:, :, :Wc]


@jax.jit
def _deblock_jax(y, c, prm):
    """y [F,H,W] uint8, c [2F,Hc,Wc] uint8 (Cb/Cr interleaved), prm from
    stacked deblock_params.  Returns filtered (y, c)."""
    yl = _luma_pass(y.astype(jnp.int32), prm["lv_beta"], prm["lv_tc"])
    yl = jnp.swapaxes(_luma_pass(
        jnp.swapaxes(yl, 1, 2),
        jnp.swapaxes(prm["lh_beta"], 1, 2),
        jnp.swapaxes(prm["lh_tc"], 1, 2)), 1, 2)
    # chroma: interleave the per-plane tc as batch entries next to c
    cvs, chs = prm["cv_tc"], prm["ch_tc"]
    cv = jnp.stack([cvs[..., 0], cvs[..., 1]], axis=1).reshape(
        (2 * cvs.shape[0],) + cvs.shape[1:3])
    ch = jnp.stack([chs[..., 0], chs[..., 1]], axis=1).reshape(
        (2 * chs.shape[0],) + chs.shape[1:3])
    cl = _chroma_pass(c.astype(jnp.int32), cv)
    cl = jnp.swapaxes(_chroma_pass(
        jnp.swapaxes(cl, 1, 2), jnp.swapaxes(ch, 1, 2)), 1, 2)
    return yl.astype(jnp.uint8), cl.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# SAO (8.7.3) — per-pixel map over the deblocked picture: band offsets by
# intensity band, edge offsets by local min/max category along a per-CTB
# direction.  Neighbors read the PRE-SAO picture, so there is no
# sequential structure at all: upsample the per-CTB parameters to the
# pixel grid and apply elementwise.
# ---------------------------------------------------------------------------

_EO = ((0, -1, 0, 1), (-1, 0, 1, 0), (-1, -1, 1, 1), (-1, 1, 1, -1))


def _sao_plane(pl, prm, n):
    """pl [B,H,W] int32; prm [B,ch,cw,6] int32 per-CTB params; n = CTB
    size on this plane."""
    B, H, W = pl.shape

    def up(a):
        return jnp.repeat(jnp.repeat(a, n, axis=1), n, axis=2)[:, :H, :W]

    typ = up(prm[..., 0])
    pc = up(prm[..., 5])
    offs = [up(prm[..., 1 + k]) for k in range(4)]

    band_rel = ((pl >> 3) - pc) & 31
    boff = sum(jnp.where(band_rel == k, offs[k], 0) for k in range(4))

    pp = jnp.pad(pl, ((0, 0), (1, 1), (1, 1)))
    catsel = jnp.zeros_like(pl)
    for cls, (dy0, dx0, dy1, dx1) in enumerate(_EO):
        a = pp[:, 1 + dy0:1 + dy0 + H, 1 + dx0:1 + dx0 + W]
        b = pp[:, 1 + dy1:1 + dy1 + H, 1 + dx1:1 + dx1 + W]
        raw = 2 + jnp.sign(pl - a) + jnp.sign(pl - b)
        cat = jnp.where(raw == 2, 0, jnp.where(raw < 2, raw + 1, raw))
        # picture-boundary samples whose neighbor leaves the frame: cat 0
        valid = np.ones((H, W), bool)
        if dx0:
            valid[:, 0] = valid[:, -1] = False
        if dy0 or dy1:
            valid[0, :] = valid[-1, :] = False
        cat = jnp.where(jnp.asarray(valid)[None], cat, 0)
        catsel = jnp.where(pc == cls, cat, catsel)
    eoff = sum(jnp.where(catsel == k + 1, offs[k], 0) for k in range(4))

    out = pl + jnp.where(typ == 1, boff, jnp.where(typ == 2, eoff, 0))
    return jnp.clip(out, 0, 255)


@functools.partial(jax.jit, static_argnames=("ctb_log2",))
def _sao_jax(y, c, sao, ctb_log2):
    """sao [F, ctbh, ctbw, 3, 6] int32; c is [2F, Hc, Wc] interleaved."""
    yn = _sao_plane(y.astype(jnp.int32), sao[..., 0, :], 1 << ctb_log2)
    cprm = jnp.stack([sao[..., 1, :], sao[..., 2, :]], axis=1)
    cprm = cprm.reshape((2 * sao.shape[0],) + sao.shape[1:3] + (6,))
    cn = _sao_plane(c.astype(jnp.int32), cprm, 1 << (ctb_log2 - 1))
    return yn.astype(jnp.uint8), cn.astype(jnp.uint8)


def decode_gop_frames(t) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full-GOP decode: returns (Y [F,H,W], Cb [F,H/2,W/2], Cr) uint8 on
    device, coded size (apply t.crop for display)."""
    from .deblock_ref import deblock_params
    from .prep import UnsupportedStream, prep_plane_sequences_lv

    if t.n_pu is not None and int(np.asarray(t.n_pu).sum()) > 0:
        # inter (P/B) frames: host front-end + numpy recon support them
        # (test_hevc_inter.py); the device recon's inter stage is staged
        # next — reject so the backend takes the audited SOFTWARE path
        raise UnsupportedStream("HEVC inter frames: device recon staged")

    strong = bool(getattr(t, "strong_smoothing", 1))
    luma, chroma = prep_plane_sequences_lv(t, strong)
    y = decode_planes_lv(luma)
    c = decode_planes_lv(chroma)
    if not bool(np.asarray(t.deblock_disabled).all()):
        prm = {}
        per = [deblock_params(t, f) for f in range(t.n_frames)]
        for k in per[0]:
            prm[k] = jnp.asarray(np.stack([p[k] for p in per]))
        y, c = _deblock_jax(y, c, prm)
    if bool(np.asarray(t.sao[..., 0]).any()):
        y, c = _sao_jax(y, c, jnp.asarray(t.sao, jnp.int32), t.ctb_log2)
    return y, c[0::2], c[1::2]
