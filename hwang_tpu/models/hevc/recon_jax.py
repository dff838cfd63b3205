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


def _run_lv(consts, consts32, xs, rows4, h, w, has_big):
    """Level scan over a (possibly pre-initialized) rows4 plane state."""
    Hp = h + MARGIN_TL4 + MARGIN_BR4
    Wp = w + MARGIN_TL4 + MARGIN_BR4
    F = xs["x0"].shape[1]
    step = functools.partial(_step_lv, consts, consts32, Hp, Wp, has_big)
    rows4, _ = jax.lax.scan(step, rows4, xs)
    plane = rows4[:-1].reshape(F, Hp, Wp)
    out = plane[:, MARGIN_TL4:MARGIN_TL4 + h, MARGIN_TL4:MARGIN_TL4 + w]
    return out.astype(jnp.uint8)


def _rows4_zeros(F, h, w):
    Hp = h + MARGIN_TL4 + MARGIN_BR4
    Wp = w + MARGIN_TL4 + MARGIN_BR4
    return jnp.zeros((F * Hp * (Wp // 4) + 1, 4), jnp.int32)


def _rows4_from(init):
    """[F, h, w] int32 plane -> rows4 state with margins."""
    F, h, w = init.shape
    Hp = h + MARGIN_TL4 + MARGIN_BR4
    Wp = w + MARGIN_TL4 + MARGIN_BR4
    pad = jnp.zeros((F, Hp, Wp), jnp.int32)
    pad = pad.at[:, MARGIN_TL4:MARGIN_TL4 + h,
                 MARGIN_TL4:MARGIN_TL4 + w].set(init)
    rows4 = pad.reshape(F * Hp * (Wp // 4), 4)
    return jnp.concatenate([rows4, jnp.zeros((1, 4), jnp.int32)], axis=0)


@functools.partial(jax.jit, static_argnames=("h", "w", "has_big"))
def _decode_core_lv(consts, consts32, xs, h, w, has_big):
    F = xs["x0"].shape[1]
    return _run_lv(consts, consts32, xs, _rows4_zeros(F, h, w), h, w,
                   has_big)


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


def _prep_xs_host(p) -> dict:
    """PlanePrep -> host dict in the _run_lv key layout (numpy, no
    device transfers — the fused transport ships everything at once)."""
    xs = {k: np.asarray(getattr(p, k)) for k in (
        "x0", "y0", "subst", "widx", "si", "filt", "mi", "qmul", "qsh",
        "dcadd", "dcshift", "mask", "coeff")}
    if p.coeffb.shape[2] > 0:
        for k in ("x0b", "y0b", "substb", "modeb", "filtb", "qmulb",
                  "qshb", "maskb", "coeffb"):
            xs[k] = np.asarray(getattr(p, k))
    return xs


# The I path keeps ONE upload but FOUR stage jits that each unfuse the
# same device blob (XLA dead-code-eliminates the leaves a stage doesn't
# read): one monolithic program (lv-luma + lv-chroma + deblock + SAO)
# exceeded the relay compile helper's memory (SIGKILL) at 720p.
@functools.partial(jax.jit, static_argnames=(
    "layout", "treedef", "h", "w", "has_big", "which"))
def _i_lv_fused(consts, consts32, buf, layout, treedef, h, w, has_big,
                which):
    from ...utils.fuse import unfuse_tree

    tree = unfuse_tree(buf, layout, treedef)
    xs = tree[0] if which == 0 else tree[1]
    n_seq = xs["x0"].shape[1]  # luma: F; chroma: 2F (U/V interleaved)
    return _run_lv(consts, consts32, xs, _rows4_zeros(n_seq, h, w), h, w,
                   has_big)


@functools.partial(jax.jit, static_argnames=("layout", "treedef"))
def _i_db_fused(y, c, buf, layout, treedef):
    from ...utils.fuse import unfuse_tree

    prm = unfuse_tree(buf, layout, treedef)[2]
    return _deblock_jax(y, c, prm)


@functools.partial(jax.jit, static_argnames=("layout", "treedef",
                                             "ctb_log2"))
def _i_sao_fused(y, c, buf, layout, treedef, ctb_log2):
    from ...utils.fuse import unfuse_tree

    sao = unfuse_tree(buf, layout, treedef)[3]
    return _sao_jax(y, c, sao.astype(jnp.int32), ctb_log2)


def decode_gop_frames(t) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full-GOP decode: returns (Y [F,H,W], Cb [F,H/2,W/2], Cr) uint8 on
    device, coded size (apply t.crop for display).  Frames come back in
    DECODE order — map display positions through t.poc when the span
    has B-frame reorder.

    Transport: ONE fused host->device upload and ONE jit for the whole
    span (decode + deblock + SAO) — the per-array transfers this
    replaces paid the relay's fixed latency dozens of times per span."""
    from .deblock_ref import deblock_params
    from .prep import prep_plane_sequences_lv

    if t.n_pu is not None and int(np.asarray(t.n_pu).sum()) > 0:
        # inter (P/B) span: frame-sequential path with a reference ring
        return decode_gop_frames_seq(t)

    from ...utils.fuse import fuse_tree

    strong = bool(getattr(t, "strong_smoothing", 1))
    luma, chroma = prep_plane_sequences_lv(t, strong)
    do_db = not bool(np.asarray(t.deblock_disabled).all())
    do_sao = bool(np.asarray(t.sao[..., 0]).any())
    prm = {}
    if do_db:
        per = [deblock_params(t, f) for f in range(t.n_frames)]
        for k in per[0]:
            prm[k] = np.stack([p[k] for p in per])
    blob, layout, treedef = fuse_tree(
        (_prep_xs_host(luma), _prep_xs_host(chroma), prm,
         np.asarray(t.sao)))
    dbuf = jax.device_put(blob)
    y = _i_lv_fused(_consts(), _consts32(), dbuf, layout, treedef,
                    luma.h, luma.w, luma.coeffb.shape[2] > 0, 0)
    c = _i_lv_fused(_consts(), _consts32(), dbuf, layout, treedef,
                    chroma.h, chroma.w, False, 1)
    if do_db:
        y, c = _i_db_fused(y, c, dbuf, layout, treedef)
    if do_sao:
        y, c = _i_sao_fused(y, c, dbuf, layout, treedef, int(t.ctb_log2))
    return y, c[0::2], c[1::2]


# ---------------------------------------------------------------------------
# Inter (P/B) GOP decode: a lax.scan over FRAMES carrying a reference
# ring of precomputed subpel planes.  Per frame: dense MC gathers +
# weighted combination seed the plane state, a batched residual image
# adds inter-TU residuals, the intra level scan fills intra CUs, then
# deblock (host bs_map) + SAO run and the filtered frame's subpel
# planes enter the ring at its scheduled slot.
#
# Motion compensation follows the H.264 path's design (ops/mc.py): all
# 16 quarter-pel luma planes are precomputed per reference (8-tap
# separable, 14-bit int16 — bi-prediction combines UNROUNDED
# intermediates, 8.5.3.3.3), so prediction is ONE gathered element per
# pixel per list.  Chroma keeps 8 horizontally-filtered (U, V) planes
# and blends 4 gathered rows with the vertical 4-tap on the fly.
# ---------------------------------------------------------------------------

from .prep import MC_MARGIN  # noqa: E402

_LF_NP = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], np.int32)
_CF_NP = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], np.int32)


def _subpel_luma(y_u8):
    """[H, W] uint8 -> [16, Hp, Wp] int16 14-bit subpel planes.

    Plane p = fy*4 + fx holds, at [p, y+m, x+m], the exact 8.5.3.3.3
    14-bit prediction for base (x, y) at that fraction: the horizontal
    stage Hx' (fx == 0: ref << 6) feeds the vertical taps with a final
    >> 6 — for fx == 0 the << 6 factors out exactly, so one uniform
    formula covers all 16 fractions."""
    m = MC_MARGIN
    ext = m + 4  # margin + tap reach (offsets -3..+4)
    R = jnp.pad(y_u8.astype(jnp.int32), ((ext, ext), (ext, ext)),
                mode="edge")
    He, We = R.shape

    def hstage(fx):
        if fx == 0:
            return R << 6
        f = _LF_NP[fx]
        return sum(int(f[t]) * R[:, t:We - 7 + t] for t in range(8))

    # align all h-planes to the same x window: for fx>0 the output col c
    # corresponds to base x = c + 3 - ext; fx==0 col c -> x = c - ext.
    hx = []
    for fx in range(4):
        a = hstage(fx)
        if fx == 0:
            a = a[:, 3:We - 4]  # align with the filtered planes' window
        hx.append(a)
    # hx[fx][y, c]: base x = c + 3 - ext, full y range (He rows)
    planes = []
    for fy in range(4):
        for fx in range(4):
            a = hx[fx]
            if fy == 0:
                p = a[3:He - 4, :]  # already at 14-bit scale
            else:
                f = _LF_NP[fy]
                p = sum(int(f[t]) * a[t:He - 7 + t, :] for t in range(8))
                p = p >> 6
            planes.append(p)
    H, W = y_u8.shape
    # crop to [Hp, Wp] = [H + 2m, W + 2m]: base (x, y) from -m to +m
    out = jnp.stack(planes)  # [16, He-7, We-7]; base y = r + 3 - ext
    a0 = ext - 3 - m
    out = out[:, a0:a0 + H + 2 * m, a0:a0 + W + 2 * m]
    return out.astype(jnp.int16)


def _subpel_chroma(u_u8, v_u8):
    """Two [Hc, Wc] uint8 -> [8, Hcp, Wcp, 2] int16: horizontally
    filtered (U, V) planes per eighth-pel fx (fx == 0: ref << 6)."""
    m = MC_MARGIN
    ext = m + 2  # margin + tap reach (offsets -1..+2)
    c = jnp.stack([u_u8, v_u8], axis=-1).astype(jnp.int32)
    R = jnp.pad(c, ((ext, ext), (ext, ext), (0, 0)), mode="edge")
    He, We = R.shape[:2]
    planes = []
    for fx in range(8):
        if fx == 0:
            a = (R << 6)[:, 1:We - 2]
        else:
            f = _CF_NP[fx]
            a = sum(int(f[t]) * R[:, t:We - 3 + t] for t in range(4))
        planes.append(a)
    Hc, Wc = u_u8.shape
    out = jnp.stack(planes)  # [8, He, We-3]; base x = c + 1 - ext
    a0 = ext - 1 - m
    out = out[:, ext - m:ext - m + Hc + 2 * m, a0:a0 + Wc + 2 * m]
    return out.astype(jnp.int16)


def _rep4(a):
    return jnp.repeat(jnp.repeat(a, 4, axis=-2), 4, axis=-1)


def _rep2i(a):
    return jnp.repeat(jnp.repeat(a, 2, axis=-2), 2, axis=-1)


def _mc_lists(ring_y, ring_c, mx, H, W):
    """Raw 14-bit predictions for both lists.

    Returns (py [2, H, W], pc [2, Hc, Wc, 2]) int32."""
    Rs = ring_y.shape[0]
    Hp, Wp = H + 2 * MC_MARGIN, W + 2 * MC_MARGIN
    Hc, Wc = H // 2, W // 2
    Hcp, Wcp = Hc + 2 * MC_MARGIN, Wc + 2 * MC_MARGIN
    m = MC_MARGIN
    yflat = ring_y.reshape(-1)
    cflat = ring_c.reshape(-1, 2)
    cft = jnp.asarray(_CF_NP, jnp.int32)
    outs_y, outs_c = [], []
    for lst in range(2):
        slot = mx["slot0"] if lst == 0 else mx["slot1"]   # [h4, w4]
        mvx = mx["mv"][..., 2 * lst + 0].astype(jnp.int32)
        mvy = mx["mv"][..., 2 * lst + 1].astype(jnp.int32)
        # luma (pixel grid)
        slot_p = _rep4(slot)
        mvx_p = _rep4(mvx)
        mvy_p = _rep4(mvy)
        ys = jnp.clip(
            jnp.arange(H)[:, None] + (mvy_p >> 2) + m, 0, Hp - 1)
        xs = jnp.clip(
            jnp.arange(W)[None, :] + (mvx_p >> 2) + m, 0, Wp - 1)
        frac = (mvy_p & 3) * 4 + (mvx_p & 3)
        idx = ((slot_p * 16 + frac) * Hp + ys) * Wp + xs
        outs_y.append(yflat[idx.reshape(-1)].reshape(H, W).astype(jnp.int32))
        # chroma (chroma-pixel grid; luma mv in 1/8 chroma units)
        slot_c = _rep2i(slot)
        mvx_c = _rep2i(mvx)
        mvy_c = _rep2i(mvy)
        fx = mvx_c & 7
        fy = mvy_c & 7
        yc = jnp.arange(Hc)[:, None] + (mvy_c >> 3) + m
        xc = jnp.clip(jnp.arange(Wc)[None, :] + (mvx_c >> 3) + m,
                      0, Wcp - 1)
        base = (slot_c * 8 + fx) * Hcp
        acc = jnp.zeros((Hc, Wc, 2), jnp.int32)
        vt = cft[fy]                                     # [Hc, Wc, 4]
        for t in range(4):
            row = jnp.clip(yc - 1 + t, 0, Hcp - 1)
            g = cflat[((base + row) * Wcp + xc).reshape(-1)].reshape(
                Hc, Wc, 2).astype(jnp.int32)
            acc = acc + vt[..., t:t + 1] * g
        outs_c.append(acc >> 6)
    return jnp.stack(outs_y), jnp.stack(outs_c)


def _wp_params(wp, row_map, cols):
    """Per-4x4 weight params: wp [32, 8] int32, row_map [h4, w4]
    (255 = default) -> list of [h4, w4] for the requested columns."""
    safe = jnp.clip(row_map, 0, 31)
    got = wp[safe]                                       # [h4, w4, 8]
    return [got[..., c] for c in cols]


def _combine_uni_bi(p, pf, is_wp, w_maps):
    """Weighted sample prediction (8.5.3.3.4) for one component grid.

    p: [2, ...] int32 raw 14-bit preds.  pf: per-pixel pred flags.
    w_maps: (w0, o0, w1, o1, lwd) per-pixel maps; lwd = denom + 6.
    With default weights the explicit formulas reduce exactly to the
    default ones, so is_wp only gates table lookups, not exactness.
    """
    w0, o0, w1, o1, lwd = w_maps
    p_uni = jnp.where(pf == 2, p[1], p[0])
    wu = jnp.where(pf == 2, w1, w0)
    ou = jnp.where(pf == 2, o1, o0)
    uni_def = (p_uni + 32) >> 6
    uni_wp = ((p_uni * wu + jnp.left_shift(1, lwd - 1)) >> lwd) + ou
    bi_def = (p[0] + p[1] + 64) >> 7
    bi_wp = (p[0] * w0 + p[1] * w1
             + jnp.left_shift(o0 + o1 + 1, lwd)) >> (lwd + 1)
    uni = jnp.where(is_wp, uni_wp, uni_def)
    bi = jnp.where(is_wp, bi_wp, bi_def)
    return jnp.clip(jnp.where(pf == 3, bi, uni), 0, 255)


def _residual_images(res_classes, F, h, w, two_comp):
    """Batched inter-TU residuals -> dense [F, (2,) h, w] int32 image.

    One dequant + two transform matmuls per size class over all frames
    at once (no scan), then a flat masked scatter — inter TUs never
    overlap."""
    from .ref_recon import DCT

    total = F * (2 if two_comp else 1) * h * w
    img = jnp.zeros(total + 1, jnp.int32)
    for cls in res_classes:
        n = cls["n"]
        M = jnp.asarray(DCT[n].astype(np.int32))
        d = _dequant_split(
            jnp.asarray(cls["coeff"]),
            jnp.asarray(cls["qmul"])[..., None],
            jnp.asarray(cls["qsh"])[..., None],
        ).reshape(F, -1, n, n)
        e = jnp.clip((jnp.einsum("rk,fnrc->fnkc", M, d) + 64) >> 7,
                     -32768, 32767)
        r = jnp.clip((jnp.einsum("fnkc,cj->fnkj", e, M) + 2048) >> 12,
                     -32768, 32767)
        x0 = jnp.asarray(cls["x0"])[:, :, None, None]
        y0 = jnp.asarray(cls["y0"])[:, :, None, None]
        ar = jnp.arange(n, dtype=jnp.int32)
        fidx = jnp.arange(F, dtype=jnp.int32)[:, None, None, None]
        plane = fidx
        if two_comp:
            plane = fidx * 2 + jnp.asarray(cls["comp"])[:, :, None, None]
        idx = (plane * h + y0 + ar[None, None, :, None]) * w \
            + x0 + ar[None, None, None, :]
        idx = jnp.where(
            jnp.asarray(cls["mask"])[:, :, None, None] == 1, idx, total)
        img = img.at[idx.reshape(-1)].set(r.reshape(-1), mode="drop")
    shape = (F, 2, h, w) if two_comp else (F, h, w)
    return img[:-1].reshape(shape)


def _seq_step(consts, consts32, H, W, has_big, ctb_log2, carry, xs):
    ring_y, ring_c = carry
    Hc, Wc = H // 2, W // 2
    py, pc = _mc_lists(ring_y, ring_c, xs, H, W)
    pf4 = xs["pf"].astype(jnp.int32)
    wp = xs["wp"].astype(jnp.int32)
    # Explicit WP is flagged per list (emit_pu sets pu_wp0 only for
    # L0-using PUs, pu_wp1 only for L1): gate on the ACTIVE list's row
    # (a uni-L1 PU in a weightb stream has wp0 == 255 but wp1 set) and
    # take the weight denom from that row too — row 255 would clip to a
    # possibly-uninitialized table entry.
    row_u4 = jnp.where(pf4 == 2, xs["wp1"], xs["wp0"]).astype(jnp.int32)
    is_wp4 = (row_u4 != 255) & (pf4 > 0)

    w0l, o0l = _wp_params(wp, xs["wp0"], [0, 1])
    w1l, o1l = _wp_params(wp, xs["wp1"], [0, 1])
    (ld,) = _wp_params(wp, row_u4, [6])
    lwd = jnp.clip(ld + 6, 6, 14)
    y_pred = _combine_uni_bi(
        py, _rep4(pf4), _rep4(is_wp4),
        (_rep4(w0l), _rep4(o0l), _rep4(w1l), _rep4(o1l), _rep4(lwd)))

    cw0 = _wp_params(wp, xs["wp0"], [2, 3, 4, 5])
    cw1 = _wp_params(wp, xs["wp1"], [2, 3, 4, 5])
    (cd,) = _wp_params(wp, row_u4, [7])
    cwd = jnp.clip(cd + 6, 6, 14)
    pfc = _rep2i(pf4)
    iwc = _rep2i(is_wp4)
    c_pred = []
    for comp in range(2):
        c_pred.append(_combine_uni_bi(
            pc[..., comp], pfc, iwc,
            (_rep2i(cw0[2 * comp]), _rep2i(cw0[2 * comp + 1]),
             _rep2i(cw1[2 * comp]), _rep2i(cw1[2 * comp + 1]),
             _rep2i(cwd))))

    inter_y = _rep4(pf4) > 0
    inter_c = pfc > 0
    inity = jnp.where(inter_y, jnp.clip(y_pred + xs["resy"], 0, 255), 0)
    initc = jnp.stack([
        jnp.where(inter_c, jnp.clip(c_pred[0] + xs["resc"][0], 0, 255), 0),
        jnp.where(inter_c, jnp.clip(c_pred[1] + xs["resc"][1], 0, 255), 0),
    ])

    y_rec = _run_lv(consts, consts32, xs["lv_l"], _rows4_from(inity[None]),
                    H, W, has_big)
    c_rec = _run_lv(consts, consts32, xs["lv_c"], _rows4_from(initc),
                    Hc, Wc, False)

    y_rec, c_rec = _deblock_jax(y_rec, c_rec, xs["prm"])
    y_rec, c_rec = _sao_jax(y_rec, c_rec, xs["sao"][None], ctb_log2)

    sub_y = _subpel_luma(y_rec[0])
    sub_c = _subpel_chroma(c_rec[0], c_rec[1])
    s = xs["write_slot"]
    ring_y = jax.lax.dynamic_update_slice(ring_y, sub_y[None],
                                          (s, 0, 0, 0))
    ring_c = jax.lax.dynamic_update_slice(ring_c, sub_c[None],
                                          (s, 0, 0, 0, 0))
    return (ring_y, ring_c), (y_rec[0], c_rec[0], c_rec[1])


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "r", "has_big", "ctb_log2"))
def _decode_seq_core(consts, consts32, xs, h, w, r, has_big, ctb_log2):
    m = MC_MARGIN
    Hp, Wp = h + 2 * m, w + 2 * m
    Hcp, Wcp = h // 2 + 2 * m, w // 2 + 2 * m
    ring_y = jnp.zeros((r + 1, 16, Hp, Wp), jnp.int16)
    ring_c = jnp.zeros((r + 1, 8, Hcp, Wcp, 2), jnp.int16)
    step = functools.partial(_seq_step, consts, consts32, h, w, has_big,
                             ctb_log2)
    _, (Y, U, V) = jax.lax.scan(step, (ring_y, ring_c), xs)
    return Y, U, V


@functools.partial(jax.jit, static_argnames=(
    "layout", "treedef", "h", "w", "r", "has_big", "ctb_log2",
    "ns_l", "ns_c"))
def _decode_seq_fused(consts, consts32, buf, layout, treedef, h, w, r,
                      has_big, ctb_log2, ns_l, ns_c):
    from ...utils.fuse import unfuse_tree

    tree = unfuse_tree(buf, layout, treedef)
    xs = tree["xs"]
    F = xs["pf"].shape[0]
    Hc, Wc = h // 2, w // 2
    xs = dict(xs)
    # transform sizes are static (they select DCT matrices) — rejoin
    # them with their fused class dicts
    res_l = [dict(c, n=n) for c, n in zip(tree["res_l"], ns_l)]
    res_c = [dict(c, n=n) for c, n in zip(tree["res_c"], ns_c)]
    xs["resy"] = _residual_images(res_l, F, h, w, False)
    xs["resc"] = _residual_images(res_c, F, Hc, Wc, True)
    return _decode_seq_core(consts, consts32, xs, h, w, r, has_big,
                            ctb_log2)


def decode_gop_frames_seq(t) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Frame-sequential inter-capable GOP decode (P/B spans).

    Transport: all per-span arrays (level tables, motion fields, deblock
    params, residual classes) fuse into ONE host->device upload and ONE
    jit — the residual images build on device from the shipped sparse
    classes instead of via eager per-class transfers."""
    from .deblock_ref import deblock_params
    from .prep import prep_gop_inter

    strong = bool(getattr(t, "strong_smoothing", 1))
    g = prep_gop_inter(t, strong)
    F, H, W = g.F, g.H, g.W

    def fm(a):  # [T, F, ...] -> [F, T, 1, ...]
        return np.ascontiguousarray(np.moveaxis(a, 1, 0)[:, :, None])

    def fmc(a):  # [T, 2F, ...] -> [F, T, 2, ...]
        T = a.shape[0]
        return np.ascontiguousarray(
            np.moveaxis(a.reshape((T, F, 2) + a.shape[2:]), 1, 0))

    lv_l = {k: fm(getattr(g.luma, k)) for k in (
        "x0", "y0", "subst", "widx", "si", "filt", "mi", "qmul", "qsh",
        "dcadd", "dcshift", "mask", "coeff")}
    has_big = g.luma.coeffb.shape[2] > 0
    if has_big:
        for k in ("x0b", "y0b", "substb", "modeb", "filtb", "qmulb",
                  "qshb", "maskb", "coeffb"):
            lv_l[k] = fm(getattr(g.luma, k))
    lv_c = {k: fmc(getattr(g.chroma, k)) for k in (
        "x0", "y0", "subst", "widx", "si", "filt", "mi", "qmul", "qsh",
        "dcadd", "dcshift", "mask", "coeff")}

    per = [deblock_params(t, f) for f in range(F)]
    prm = {k: np.stack([p[k] for p in per])[:, None] for k in per[0]}
    # prm arrays get a per-frame leading axis of 1 inside the scan:
    # _deblock_jax expects [F=1, ...]

    xs = {
        "lv_l": lv_l,
        "lv_c": lv_c,
        "pf": np.asarray(g.pf),
        "slot0": np.asarray(g.slot0),
        "slot1": np.asarray(g.slot1),
        "mv": np.asarray(g.mv),
        "wp0": np.asarray(g.wp0),
        "wp1": np.asarray(g.wp1),
        "wp": np.asarray(g.wp, np.int32),
        "write_slot": np.asarray(g.write_slot),
        "prm": prm,
        "sao": np.asarray(t.sao, np.int32),
    }
    from ...utils.fuse import fuse_tree

    ns_l = tuple(int(c["n"]) for c in g.res_l)
    ns_c = tuple(int(c["n"]) for c in g.res_c)
    _static = ("n", "mi")  # python ints (select DCT tables) — not leaves
    res_l = [{k: v for k, v in c.items() if k not in _static}
             for c in g.res_l]
    res_c = [{k: v for k, v in c.items() if k not in _static}
             for c in g.res_c]
    blob, layout, treedef = fuse_tree(
        {"xs": xs, "res_l": res_l, "res_c": res_c})
    dbuf = jax.device_put(blob)
    Y, U, V = _decode_seq_fused(_consts(), _consts32(), dbuf, layout,
                                treedef, H, W, g.R, has_big,
                                int(t.ctb_log2), ns_l, ns_c)
    return Y, U, V
