"""Vectorized H.264 intra prediction (spec 8.3) in JAX.

Each function predicts a BATCH of blocks at once from batched neighbor
sample vectors: all modes are computed with exact integer arithmetic and
selected per block, so the wavefront reconstruction processes every active
block of a diagonal (x batch of clips) in one vectorized step.

Ground truth: ref_recon._i4x4_predict/_i16_predict/_chroma_predict
(validated bit-exact against libavcodec).
"""

from __future__ import annotations

import jax.numpy as jnp


def _stack_pixels(rows):
    """rows: list of 4 [N,4] -> [N,4,4]."""
    return jnp.stack(rows, axis=-2)


def predict_i4x4(mode, left, top, topleft, topright, have_l, have_t):
    """Predict 4x4 blocks.

    mode: [N] int; left/top/topright: [N,4] int32; topleft: [N] int32;
    have_l/have_t: [N] bool.  Returns [N,4,4] int32.

    `topright` must already honor the spec's sample substitution: when the
    top-right neighbors are unavailable but top is, all four entries equal
    top[3].
    """
    N = mode.shape[0]
    l = left.astype(jnp.int32)
    t = top.astype(jnp.int32)
    tr = topright.astype(jnp.int32)
    tl = topleft.astype(jnp.int32)

    # mode 0: vertical
    m0 = jnp.broadcast_to(t[:, None, :], (N, 4, 4))
    # mode 1: horizontal
    m1 = jnp.broadcast_to(l[:, :, None], (N, 4, 4))
    # mode 2: DC
    suml = l.sum(axis=1)
    sumt = t.sum(axis=1)
    dc_both = (suml + sumt + 4) >> 3
    dc_l = (suml + 2) >> 2
    dc_t = (sumt + 2) >> 2
    dc = jnp.where(
        have_l & have_t, dc_both,
        jnp.where(have_l, dc_l, jnp.where(have_t, dc_t, 128)),
    )
    m2 = jnp.broadcast_to(dc[:, None, None], (N, 4, 4))

    # mode 3: diagonal down-left; a = [t0..t3, tr0..tr3]
    a = jnp.concatenate([t, tr], axis=1)  # [N,8]
    def f3(i):  # filtered a at index i (i in 0..6), i==6 special
        return jnp.where(
            i == 6,
            (a[:, 6] + 3 * a[:, 7] + 2) >> 2,
            (a[:, i] + 2 * a[:, jnp.minimum(i + 1, 7)] + a[:, jnp.minimum(i + 2, 7)] + 2) >> 2,
        )
    rows3 = []
    for y in range(4):
        rows3.append(jnp.stack([f3(x + y) for x in range(4)], axis=-1))
    m3 = _stack_pixels(rows3)

    # helpers: extended arrays with topleft at index -1 semantics
    # tx[k] for k in -1..3 -> index k+1 of [tl, t0..t3]
    tx = jnp.concatenate([tl[:, None], t], axis=1)   # [N,5]
    lx = jnp.concatenate([tl[:, None], l], axis=1)   # [N,5]

    def T(i):  # t[i] with i >= -1
        return tx[:, i + 1]

    def L(i):
        return lx[:, i + 1]

    # mode 4: diagonal down-right
    rows4 = []
    for y in range(4):
        row = []
        for x in range(4):
            if x > y:
                i = x - y
                row.append((T(i - 2) + 2 * T(i - 1) + T(i) + 2) >> 2)
            elif x < y:
                i = y - x
                row.append((L(i - 2) + 2 * L(i - 1) + L(i) + 2) >> 2)
            else:
                row.append((T(0) + 2 * tl + L(0) + 2) >> 2)
        rows4.append(jnp.stack(row, axis=-1))
    m4 = _stack_pixels(rows4)

    # mode 5: vertical-right
    rows5 = []
    for y in range(4):
        row = []
        for x in range(4):
            z = 2 * x - y
            if z >= 0 and z % 2 == 0:
                i = x - (y >> 1)
                row.append((T(i - 1) + T(i) + 1) >> 1)
            elif z >= 0:
                i = x - (y >> 1)
                row.append((T(i - 2) + 2 * T(i - 1) + T(i) + 2) >> 2)
            elif z == -1:
                row.append((L(0) + 2 * tl + T(0) + 2) >> 2)
            else:
                i = y - 2 * x - 1
                row.append((L(i) + 2 * L(i - 1) + L(i - 2) + 2) >> 2)
        rows5.append(jnp.stack(row, axis=-1))
    m5 = _stack_pixels(rows5)

    # mode 6: horizontal-down
    rows6 = []
    for y in range(4):
        row = []
        for x in range(4):
            z = 2 * y - x
            if z >= 0 and z % 2 == 0:
                i = y - (x >> 1)
                row.append((L(i - 1) + L(i) + 1) >> 1)
            elif z >= 0:
                i = y - (x >> 1)
                row.append((L(i - 2) + 2 * L(i - 1) + L(i) + 2) >> 2)
            elif z == -1:
                row.append((T(0) + 2 * tl + L(0) + 2) >> 2)
            else:
                i = x - 2 * y - 1
                row.append((T(i) + 2 * T(i - 1) + T(i - 2) + 2) >> 2)
        rows6.append(jnp.stack(row, axis=-1))
    m6 = _stack_pixels(rows6)

    # mode 7: vertical-left
    rows7 = []
    for y in range(4):
        row = []
        for x in range(4):
            i = x + (y >> 1)
            if y % 2 == 0:
                row.append((a[:, i] + a[:, i + 1] + 1) >> 1)
            else:
                row.append((a[:, i] + 2 * a[:, i + 1] + a[:, i + 2] + 2) >> 2)
        rows7.append(jnp.stack(row, axis=-1))
    m7 = _stack_pixels(rows7)

    # mode 8: horizontal-up
    rows8 = []
    for y in range(4):
        row = []
        for x in range(4):
            z = x + 2 * y
            if z > 5:
                row.append(l[:, 3])
            elif z == 5:
                row.append((l[:, 2] + 3 * l[:, 3] + 2) >> 2)
            elif z % 2 == 0:
                i = z >> 1
                row.append((l[:, i] + l[:, i + 1] + 1) >> 1)
            else:
                i = z >> 1
                row.append((l[:, i] + 2 * l[:, i + 1] + l[:, i + 2] + 2) >> 2)
        rows8.append(jnp.stack(row, axis=-1))
    m8 = _stack_pixels(rows8)

    allm = jnp.stack([m0, m1, m2, m3, m4, m5, m6, m7, m8], axis=1)
    return jnp.take_along_axis(
        allm, mode.astype(jnp.int32)[:, None, None, None], axis=1
    )[:, 0]


def predict_i16(mode, left, top, topleft, have_l, have_t):
    """[N] mode, [N,16] left/top, [N] topleft -> [N,16,16] int32."""
    N = mode.shape[0]
    l = left.astype(jnp.int32)
    t = top.astype(jnp.int32)
    tl = topleft.astype(jnp.int32)
    m0 = jnp.broadcast_to(t[:, None, :], (N, 16, 16))
    m1 = jnp.broadcast_to(l[:, :, None], (N, 16, 16))
    suml = l.sum(axis=1)
    sumt = t.sum(axis=1)
    dc = jnp.where(
        have_l & have_t, (suml + sumt + 16) >> 5,
        jnp.where(have_l, (suml + 8) >> 4,
                  jnp.where(have_t, (sumt + 8) >> 4, 128)),
    )
    m2 = jnp.broadcast_to(dc[:, None, None], (N, 16, 16))
    # plane
    idx = jnp.arange(7)
    h = ((idx + 1)[None, :] * (t[:, 8 + idx] - t[:, 6 - idx])).sum(axis=1)
    h = h + 8 * (t[:, 15] - tl)
    v = ((idx + 1)[None, :] * (l[:, 8 + idx] - l[:, 6 - idx])).sum(axis=1)
    v = v + 8 * (l[:, 15] - tl)
    aa = 16 * (l[:, 15] + t[:, 15])
    bb = (5 * h + 32) >> 6
    cc = (5 * v + 32) >> 6
    xs = jnp.arange(16) - 7
    ys = jnp.arange(16) - 7
    plane = (
        aa[:, None, None]
        + bb[:, None, None] * xs[None, None, :]
        + cc[:, None, None] * ys[None, :, None]
        + 16
    ) >> 5
    m3 = jnp.clip(plane, 0, 255)
    allm = jnp.stack([m0, m1, m2, m3], axis=1)
    return jnp.take_along_axis(
        allm, mode.astype(jnp.int32)[:, None, None, None], axis=1
    )[:, 0]


def predict_chroma(mode, left, top, topleft, have_l, have_t):
    """8x8 chroma prediction; mode numbering 0=DC 1=H 2=V 3=Plane.

    [N] mode, [N,8] left/top, [N] topleft -> [N,8,8] int32.
    """
    N = mode.shape[0]
    l = left.astype(jnp.int32)
    t = top.astype(jnp.int32)
    tl = topleft.astype(jnp.int32)

    # DC per quadrant (spec 8.3.4.1)
    def qsum(v, q):  # sum of 4 samples of quadrant q
        return v[:, q * 4 : q * 4 + 4].sum(axis=1)

    quads = []
    for qy in range(2):
        row = []
        for qx in range(2):
            sl = qsum(l, qy)
            st = qsum(t, qx)
            both = (sl + st + 4) >> 3
            only_l = (sl + 2) >> 2
            only_t = (st + 2) >> 2
            if (qx, qy) in ((0, 0), (1, 1)):
                dc = jnp.where(have_l & have_t, both,
                               jnp.where(have_l, only_l,
                                         jnp.where(have_t, only_t, 128)))
            elif qx == 1:  # top-right: prefer top
                dc = jnp.where(have_t, only_t,
                               jnp.where(have_l, only_l, 128))
            else:  # bottom-left: prefer left
                dc = jnp.where(have_l, only_l,
                               jnp.where(have_t, only_t, 128))
            row.append(dc)
        quads.append(row)
    m0 = jnp.concatenate(
        [
            jnp.concatenate(
                [jnp.broadcast_to(quads[qy][qx][:, None, None], (N, 4, 4))
                 for qx in range(2)], axis=2)
            for qy in range(2)
        ],
        axis=1,
    )
    m1 = jnp.broadcast_to(l[:, :, None], (N, 8, 8))
    m2 = jnp.broadcast_to(t[:, None, :], (N, 8, 8))
    idx = jnp.arange(3)
    h = ((idx + 1)[None, :] * (t[:, 4 + idx] - t[:, 2 - idx])).sum(axis=1)
    h = h + 4 * (t[:, 7] - tl)
    v = ((idx + 1)[None, :] * (l[:, 4 + idx] - l[:, 2 - idx])).sum(axis=1)
    v = v + 4 * (l[:, 7] - tl)
    aa = 16 * (l[:, 7] + t[:, 7])
    bb = (17 * h + 16) >> 5
    cc = (17 * v + 16) >> 5
    xs = jnp.arange(8) - 3
    plane = (
        aa[:, None, None]
        + bb[:, None, None] * xs[None, None, :]
        + cc[:, None, None] * xs[None, :, None]
        + 16
    ) >> 5
    m3 = jnp.clip(plane, 0, 255)
    allm = jnp.stack([m0, m1, m2, m3], axis=1)
    return jnp.take_along_axis(
        allm, mode.astype(jnp.int32)[:, None, None, None], axis=1
    )[:, 0]


def predict_i8x8(mode, left, top16, topleft, have_l, have_t, have_tl):
    """Predict 8x8 blocks (spec 8.3.2) — High-profile intra 8x8.

    mode: [N] int; left: [N,8]; top16: [N,16] (p[x,-1] x=0..15, the
    top-right half already substituted when unavailable); topleft: [N];
    have_*: [N] bool.  Reference samples are low-pass filtered here
    (8.3.2.2.1).  Returns [N,8,8] int32.  Ground truth:
    ref_recon._i8x8_predict.
    """
    N = mode.shape[0]
    l0 = left.astype(jnp.int32)
    t0 = top16.astype(jnp.int32)
    tl0 = topleft.astype(jnp.int32)

    # --- reference sample filtering ---
    ft = jnp.zeros((N, 16), jnp.int32)
    ft = ft.at[:, 0].set(
        jnp.where(
            have_tl,
            (tl0 + 2 * t0[:, 0] + t0[:, 1] + 2) >> 2,
            (3 * t0[:, 0] + t0[:, 1] + 2) >> 2,
        )
    )
    ft = ft.at[:, 1:15].set(
        (t0[:, 0:14] + 2 * t0[:, 1:15] + t0[:, 2:16] + 2) >> 2
    )
    ft = ft.at[:, 15].set((t0[:, 14] + 3 * t0[:, 15] + 2) >> 2)
    ftl = jnp.where(
        have_l & have_t,
        (t0[:, 0] + 2 * tl0 + l0[:, 0] + 2) >> 2,
        jnp.where(
            have_t,
            (3 * tl0 + t0[:, 0] + 2) >> 2,
            jnp.where(have_l, (3 * tl0 + l0[:, 0] + 2) >> 2, tl0),
        ),
    )
    fl = jnp.zeros((N, 8), jnp.int32)
    fl = fl.at[:, 0].set(
        jnp.where(
            have_tl,
            (tl0 + 2 * l0[:, 0] + l0[:, 1] + 2) >> 2,
            (3 * l0[:, 0] + l0[:, 1] + 2) >> 2,
        )
    )
    fl = fl.at[:, 1:7].set((l0[:, 0:6] + 2 * l0[:, 1:7] + l0[:, 2:8] + 2) >> 2)
    fl = fl.at[:, 7].set((l0[:, 6] + 3 * l0[:, 7] + 2) >> 2)
    t, l, tl = ft, fl, ftl

    def px(rows):
        return jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )

    m0 = jnp.broadcast_to(t[:, None, :8], (N, 8, 8))
    m1 = jnp.broadcast_to(l[:, :, None], (N, 8, 8))

    suml = l.sum(axis=1)
    sumt = t[:, :8].sum(axis=1)
    dc = jnp.where(
        have_l & have_t, (suml + sumt + 8) >> 4,
        jnp.where(have_l, (suml + 4) >> 3,
                  jnp.where(have_t, (sumt + 4) >> 3, 128)),
    )
    m2 = jnp.broadcast_to(dc[:, None, None], (N, 8, 8))

    def T(i):  # filtered top with index -1 = filtered topleft
        return tl if i < 0 else t[:, i]

    def L(i):
        return tl if i < 0 else l[:, i]

    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            i = x + y
            if i == 14:
                row.append((t[:, 14] + 3 * t[:, 15] + 2) >> 2)
            else:
                row.append((t[:, i] + 2 * t[:, i + 1] + t[:, i + 2] + 2) >> 2)
        rows.append(row)
    m3 = px(rows)

    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            if x > y:
                i = x - y
                row.append((T(i - 2) + 2 * T(i - 1) + T(i) + 2) >> 2)
            elif x < y:
                i = y - x
                row.append((L(i - 2) + 2 * L(i - 1) + L(i) + 2) >> 2)
            else:
                row.append((T(0) + 2 * tl + L(0) + 2) >> 2)
        rows.append(row)
    m4 = px(rows)

    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            z = 2 * x - y
            if z >= 0 and z % 2 == 0:
                i = x - (y >> 1)
                row.append((T(i - 1) + T(i) + 1) >> 1)
            elif z >= 0:
                i = x - (y >> 1)
                row.append((T(i - 2) + 2 * T(i - 1) + T(i) + 2) >> 2)
            elif z == -1:
                row.append((L(0) + 2 * tl + T(0) + 2) >> 2)
            else:
                i = y - 2 * x - 1
                row.append((L(i) + 2 * L(i - 1) + L(i - 2) + 2) >> 2)
        rows.append(row)
    m5 = px(rows)

    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            z = 2 * y - x
            if z >= 0 and z % 2 == 0:
                i = y - (x >> 1)
                row.append((L(i - 1) + L(i) + 1) >> 1)
            elif z >= 0:
                i = y - (x >> 1)
                row.append((L(i - 2) + 2 * L(i - 1) + L(i) + 2) >> 2)
            elif z == -1:
                row.append((T(0) + 2 * tl + L(0) + 2) >> 2)
            else:
                i = x - 2 * y - 1
                row.append((T(i) + 2 * T(i - 1) + T(i - 2) + 2) >> 2)
        rows.append(row)
    m6 = px(rows)

    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            i = x + (y >> 1)
            if y % 2 == 0:
                row.append((t[:, i] + t[:, i + 1] + 1) >> 1)
            else:
                row.append((t[:, i] + 2 * t[:, i + 1] + t[:, i + 2] + 2) >> 2)
        rows.append(row)
    m7 = px(rows)

    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            z = x + 2 * y
            if z > 13:
                row.append(l[:, 7])
            elif z == 13:
                row.append((l[:, 6] + 3 * l[:, 7] + 2) >> 2)
            elif z % 2 == 0:
                row.append((l[:, z >> 1] + l[:, (z >> 1) + 1] + 1) >> 1)
            else:
                i = z >> 1
                row.append((l[:, i] + 2 * l[:, i + 1] + l[:, i + 2] + 2) >> 2)
        rows.append(row)
    m8 = px(rows)

    allm = jnp.stack([m0, m1, m2, m3, m4, m5, m6, m7, m8], axis=1)
    return jnp.take_along_axis(
        allm, mode.astype(jnp.int32)[:, None, None, None], axis=1
    )[:, 0]
