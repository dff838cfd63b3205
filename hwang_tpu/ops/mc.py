"""Vectorized H.264 motion compensation (spec 8.4.2.2) in JAX.

TPU-friendly formulation: instead of per-block filter windows (the
reference GPU path had no MC at all — NVDEC did it in hardware), we
precompute the three half-pel planes of each reference frame ONCE with
dense separable 6-tap filters (pure VPU work), then every predicted pixel
is two gathers + one average, selected by its quarter-pel fraction:

    out(x,y) = (P1[y+dy1, x+dx1] + P2[y+dy2, x+dx2] + 1) >> 1

with (P1,P2,offsets) a 16-entry LUT over (fx,fy).  Full-pel/half-pel
positions degenerate to avg(a,a)=a.

Edge handling: planes are computed on an edge-replicated pad of
``_MARGIN`` pixels and gathers clamp into the padded area.  Beyond 3 px
outside the frame every filtered value equals the replicated edge value,
so a small margin is exact for arbitrarily large motion vectors.

Ground truth: ref_recon._luma_mc_block / _chroma_mc_block.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MARGIN = 8  # >= 6 taps' reach; beyond this everything is constant

# (plane1, dy1, dx1, plane2, dy2, dx2) indexed by fy*4+fx.
# planes: 0=G (integer), 1=B (x+0.5), 2=H (y+0.5), 3=J (x+0.5, y+0.5)
_POS_LUT = np.array(
    [
        # fy = 0
        [0, 0, 0, 0, 0, 0],  # G
        [0, 0, 0, 1, 0, 0],  # a = avg(G, b)
        [1, 0, 0, 1, 0, 0],  # b
        [1, 0, 0, 0, 0, 1],  # c = avg(b, G+1x)
        # fy = 1
        [0, 0, 0, 2, 0, 0],  # d = avg(G, h)
        [1, 0, 0, 2, 0, 0],  # e = avg(b, h)
        [1, 0, 0, 3, 0, 0],  # f = avg(b, j)
        [1, 0, 0, 2, 0, 1],  # g = avg(b, m)
        # fy = 2
        [2, 0, 0, 2, 0, 0],  # h
        [2, 0, 0, 3, 0, 0],  # i = avg(h, j)
        [3, 0, 0, 3, 0, 0],  # j
        [2, 0, 1, 3, 0, 0],  # k = avg(m, j)
        # fy = 3
        [2, 0, 0, 0, 1, 0],  # n = avg(h, G+1y)
        [2, 0, 0, 1, 1, 0],  # p = avg(h, s)
        [1, 1, 0, 3, 0, 0],  # q = avg(s, j)
        [2, 0, 1, 1, 1, 0],  # r = avg(m, s)
    ],
    np.int32,
)


def pad_plane(plane: jnp.ndarray, margin: int = _MARGIN) -> jnp.ndarray:
    """Edge-replicate pad a [H,W] plane by `margin` on every side."""
    return jnp.pad(plane, ((margin, margin), (margin, margin)), mode="edge")


def luma_halfpel_planes(ref: jnp.ndarray) -> jnp.ndarray:
    """Compute the 4 luma MC planes of a reference frame.

    ref: [H, W] uint8/int.  Returns [4, H+2m, W+2m] uint8 — G, B, H, J on
    the padded grid; index [p, y+m, x+m] is the sample for base position
    (x, y) at that plane's sub-pel offset.
    """
    m = _MARGIN
    # work pad: margin + 3 extra for the 6-tap reach
    ext = m + 3
    R = jnp.pad(ref.astype(jnp.int32), ((ext, ext), (ext, ext)), mode="edge")

    def tap6_x(a):
        return (a[:, 0:-5] - 5 * a[:, 1:-4] + 20 * a[:, 2:-3]
                + 20 * a[:, 3:-2] - 5 * a[:, 4:-1] + a[:, 5:])

    def tap6_y(a):
        return (a[0:-5] - 5 * a[1:-4] + 20 * a[2:-3]
                + 20 * a[3:-2] - 5 * a[4:-1] + a[5:])

    # B half-pel at (x+0.5, y): taps over x-2..x+3
    T1 = tap6_x(R)  # [Hext, Wext-5]; T1[:, c] = raw b at x = c - ext + 2
    B = jnp.clip((T1 + 16) >> 5, 0, 255)
    # H half-pel at (x, y+0.5)
    T2 = tap6_y(R)
    Hh = jnp.clip((T2 + 16) >> 5, 0, 255)
    # J: vertical 6-tap over raw T1
    J2 = tap6_y(T1)
    J = jnp.clip((J2 + 512) >> 10, 0, 255)

    H, W = ref.shape
    # aligned [H+2m, W+2m] crops: position (x,y) with x,y in [-m, ..+m)
    # G: R[ext+y, ext+x] -> slice starting ext-m
    G = R[ext - m : ext - m + H + 2 * m, ext - m : ext - m + W + 2 * m]
    # B: T1 col c = x + ext - 2  -> for x=-m: c = ext-2-m
    Bc = B[ext - m : ext - m + H + 2 * m,
           ext - 2 - m : ext - 2 - m + W + 2 * m]
    Hc = Hh[ext - 2 - m : ext - 2 - m + H + 2 * m,
            ext - m : ext - m + W + 2 * m]
    Jc = J[ext - 2 - m : ext - 2 - m + H + 2 * m,
           ext - 2 - m : ext - 2 - m + W + 2 * m]
    return jnp.stack([G, Bc, Hc, Jc]).astype(jnp.uint8)


def luma_mc_gather(
    planes: jnp.ndarray,   # [R, 4, Hp, Wp] uint8 (R reference slots)
    ref_slot: jnp.ndarray,  # [H, W] int32 per-pixel reference slot
    mvx: jnp.ndarray,      # [H, W] int32 quarter-pel
    mvy: jnp.ndarray,      # [H, W] int32
) -> jnp.ndarray:
    """Per-pixel quarter-pel MC for a whole frame -> [H, W] int32."""
    R, P, Hp, Wp = planes.shape
    H, W = mvx.shape
    m = _MARGIN
    ys = jnp.arange(H)[:, None] + (mvy >> 2)
    xs = jnp.arange(W)[None, :] + (mvx >> 2)
    frac = (mvy & 3) * 4 + (mvx & 3)
    lut = jnp.asarray(_POS_LUT)[frac]  # [H, W, 6]

    flat = planes.reshape(R * P * Hp * Wp)

    def fetch(p, dy, dx):
        yy = jnp.clip(ys + dy + m, 0, Hp - 1)
        xx = jnp.clip(xs + dx + m, 0, Wp - 1)
        idx = ((ref_slot * P + p) * Hp + yy) * Wp + xx
        return flat[idx].astype(jnp.int32)

    a = fetch(lut[..., 0], lut[..., 1], lut[..., 2])
    b = fetch(lut[..., 3], lut[..., 4], lut[..., 5])
    return (a + b + 1) >> 1


def chroma_mc_gather(
    refs: jnp.ndarray,     # [R, Hp, Wp] uint8 padded chroma planes
    ref_slot: jnp.ndarray,  # [Hc, Wc] int32
    mvx: jnp.ndarray,      # [Hc, Wc] int32 (quarter-pel luma = eighth chroma)
    mvy: jnp.ndarray,
) -> jnp.ndarray:
    """Per-pixel eighth-pel bilinear chroma MC -> [Hc, Wc] int32."""
    R, Hp, Wp = refs.shape
    Hc, Wc = mvx.shape
    m = _MARGIN
    ys = jnp.arange(Hc)[:, None] + (mvy >> 3)
    xs = jnp.arange(Wc)[None, :] + (mvx >> 3)
    fx = (mvx & 7).astype(jnp.int32)
    fy = (mvy & 7).astype(jnp.int32)
    flat = refs.reshape(R * Hp * Wp)

    def fetch(dy, dx):
        yy = jnp.clip(ys + dy + m, 0, Hp - 1)
        xx = jnp.clip(xs + dx + m, 0, Wp - 1)
        return flat[(ref_slot * Hp + yy) * Wp + xx].astype(jnp.int32)

    A = fetch(0, 0)
    Bs = fetch(0, 1)
    C = fetch(1, 0)
    D = fetch(1, 1)
    return (
        (8 - fx) * (8 - fy) * A + fx * (8 - fy) * Bs
        + (8 - fx) * fy * C + fx * fy * D + 32
    ) >> 6


# ---------------------------------------------------------------------------
# Batched (leading clip dim) variants
# ---------------------------------------------------------------------------


def luma_halfpel_planes_b(ref: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] uint8 -> [B, 4, H+2m, W+2m] uint8 (G, B, H, J planes)."""
    m = _MARGIN
    ext = m + 3
    B, H, W = ref.shape
    R = jnp.pad(
        ref.astype(jnp.int32), ((0, 0), (ext, ext), (ext, ext)), mode="edge"
    )

    def tap6_x(a):
        return (a[..., 0:-5] - 5 * a[..., 1:-4] + 20 * a[..., 2:-3]
                + 20 * a[..., 3:-2] - 5 * a[..., 4:-1] + a[..., 5:])

    def tap6_y(a):
        return (a[..., 0:-5, :] - 5 * a[..., 1:-4, :] + 20 * a[..., 2:-3, :]
                + 20 * a[..., 3:-2, :] - 5 * a[..., 4:-1, :] + a[..., 5:, :])

    T1 = tap6_x(R)
    Bp = jnp.clip((T1 + 16) >> 5, 0, 255)
    T2 = tap6_y(R)
    Hh = jnp.clip((T2 + 16) >> 5, 0, 255)
    J = jnp.clip((tap6_y(T1) + 512) >> 10, 0, 255)

    G = R[:, ext - m : ext - m + H + 2 * m, ext - m : ext - m + W + 2 * m]
    Bc = Bp[:, ext - m : ext - m + H + 2 * m,
            ext - 2 - m : ext - 2 - m + W + 2 * m]
    Hc = Hh[:, ext - 2 - m : ext - 2 - m + H + 2 * m,
            ext - m : ext - m + W + 2 * m]
    Jc = J[:, ext - 2 - m : ext - 2 - m + H + 2 * m,
           ext - 2 - m : ext - 2 - m + W + 2 * m]
    return jnp.stack([G, Bc, Hc, Jc], axis=1).astype(jnp.uint8)


def pad_plane_b(plane: jnp.ndarray, margin: int = _MARGIN) -> jnp.ndarray:
    """[B, H, W] -> [B, H+2m, W+2m] edge pad."""
    return jnp.pad(
        plane, ((0, 0), (margin, margin), (margin, margin)), mode="edge"
    )


def luma_mc_gather_b(planes, ref_slot, mvx, mvy):
    """planes [B, R, 4, Hp, Wp] uint8; ref_slot/mvx/mvy [B, H, W] int32
    -> [B, H, W] int32 prediction."""
    B, R, P, Hp, Wp = planes.shape
    _, H, W = mvx.shape
    m = _MARGIN
    ys = jnp.arange(H)[None, :, None] + (mvy >> 2)
    xs = jnp.arange(W)[None, None, :] + (mvx >> 2)
    frac = (mvy & 3) * 4 + (mvx & 3)
    lut = jnp.asarray(_POS_LUT)[frac]  # [B, H, W, 6]
    flat = planes.reshape(B * R * P * Hp * Wp)
    boff = (jnp.arange(B) * R)[:, None, None]

    def fetch(p, dy, dx):
        yy = jnp.clip(ys + dy + m, 0, Hp - 1)
        xx = jnp.clip(xs + dx + m, 0, Wp - 1)
        idx = (((boff + ref_slot) * P + p) * Hp + yy) * Wp + xx
        return flat[idx].astype(jnp.int32)

    a = fetch(lut[..., 0], lut[..., 1], lut[..., 2])
    b = fetch(lut[..., 3], lut[..., 4], lut[..., 5])
    return (a + b + 1) >> 1


def chroma_mc_gather_b(refs, ref_slot, mvx, mvy):
    """refs [B, R, Hp, Wp] uint8; maps [B, Hc, Wc] -> [B, Hc, Wc] int32."""
    B, R, Hp, Wp = refs.shape
    _, Hc, Wc = mvx.shape
    m = _MARGIN
    ys = jnp.arange(Hc)[None, :, None] + (mvy >> 3)
    xs = jnp.arange(Wc)[None, None, :] + (mvx >> 3)
    fx = (mvx & 7).astype(jnp.int32)
    fy = (mvy & 7).astype(jnp.int32)
    flat = refs.reshape(B * R * Hp * Wp)
    boff = (jnp.arange(B) * R)[:, None, None]

    def fetch(dy, dx):
        yy = jnp.clip(ys + dy + m, 0, Hp - 1)
        xx = jnp.clip(xs + dx + m, 0, Wp - 1)
        return flat[((boff + ref_slot) * Hp + yy) * Wp + xx].astype(jnp.int32)

    A = fetch(0, 0)
    Bs = fetch(0, 1)
    C = fetch(1, 0)
    D = fetch(1, 1)
    return (
        (8 - fx) * (8 - fy) * A + fx * (8 - fy) * Bs
        + (8 - fx) * fy * C + fx * fy * D + 32
    ) >> 6


# ---------------------------------------------------------------------------
# Single-gather MC: precomputed full subpel plane sets
# ---------------------------------------------------------------------------
#
# TPU has no hardware gather; XLA executes ~85M gathered elements/s
# regardless of locality.  Minimizing gathered elements wins: precompute
# ALL 16 quarter-pel luma planes (dense VPU averages of G/B/H/J) and all
# 64 eighth-pel chroma bilinear planes, then prediction is exactly ONE
# gathered element per output pixel.


def luma_subpel16_planes(ref: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] uint8 -> [B, 16, Hp, Wp] uint8: plane p = frac fy*4+fx."""
    base = luma_halfpel_planes_b(ref).astype(jnp.int32)  # [B, 4, Hp, Wp]
    G, Bb, Hh, J = base[:, 0], base[:, 1], base[:, 2], base[:, 3]
    def shx(a):  # a at x+1, edge-replicated (rolls would wrap garbage in)
        return jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)

    def shy(a):
        return jnp.concatenate([a[..., 1:, :], a[..., -1:, :]], axis=-2)

    G1x = shx(G)
    G1y = shy(G)
    M = shx(Hh)   # h at x+1
    S = shy(Bb)   # b at y+1

    def avg(a, b):
        return (a + b + 1) >> 1

    planes = [
        G, avg(G, Bb), Bb, avg(Bb, G1x),
        avg(G, Hh), avg(Bb, Hh), avg(Bb, J), avg(Bb, M),
        Hh, avg(Hh, J), J, avg(M, J),
        avg(Hh, G1y), avg(Hh, S), avg(S, J), avg(M, S),
    ]
    return jnp.stack(planes, axis=1).astype(jnp.uint8)


def chroma_pair_planes(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, Hc, Wc] x2 uint8 -> [B, Hcp, Wcp, 2] edge-padded interleaved
    chroma, so one gathered index fetches the (U, V) pair."""
    c = jnp.stack([u, v], axis=-1)
    m = _MARGIN
    return jnp.pad(
        c, ((0, 0), (m, m), (m, m), (0, 0)), mode="edge"
    )


# ---------------------------------------------------------------------------
# Wide (word-row) gather MC
# ---------------------------------------------------------------------------
#
# XLA:TPU gather cost scales with the NUMBER of gathered rows (~100M
# rows/s); row width is nearly free up to ~8 bytes (measured, see
# docs/ARCHITECTURE.md).  MVs are constant within a 4x4 luma block (the
# minimum partition), so adjacent output pixels share (slot, mv, frac):
# bitcast the subpel planes to uint32 words and fetch two adjacent words
# (8 bytes) per FOUR luma output pixels / per TWO chroma output pixels
# instead of one byte per pixel — half the gathered rows of the
# per-pixel formulation, bit-identical output.


def _as_words(planes: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., Wp] (Wp % 4 == 0) -> flat uint32 word view."""
    import jax

    shape = planes.shape
    w = planes.reshape(shape[:-1] + (shape[-1] // 4, 4))
    return jax.lax.bitcast_convert_type(w, jnp.uint32).reshape(-1)


def _byte(w0, w1, k):
    """Byte k (0..7) of the little-endian 8-byte window (w0, w1)."""
    lo = (w0 >> jnp.uint32(8 * (k & 3))) & jnp.uint32(0xFF)
    hi = (w1 >> jnp.uint32(8 * (k & 3))) & jnp.uint32(0xFF)
    return (hi if k >= 4 else lo).astype(jnp.int32)


def _gflat(rows, idx):
    """rows[idx] with the index flattened to 1-D first: XLA:TPU lowers a
    flat-index-vector gather ~2x faster than the same gather with a
    multi-dim index array (measured, tools/mcbench.py: 784 -> 330 ms for
    the bench-shaped luma MC gather).  Result reshaped back to
    idx.shape (+ rows' trailing dims)."""
    out = rows[idx.reshape(-1)]
    return out.reshape(idx.shape + rows.shape[1:])


def luma_mc_gather16_wide_b(planes16, ref_slot_g, mvx_g, mvy_g):
    """Wide-row variant of :func:`luma_mc_gather16_b`.

    planes16: [B, R, 16, Hp, Wp] uint8 with Wp % 4 == 0.
    ref_slot_g/mvx_g/mvy_g: [B, H, W//4] per-GROUP maps — one entry per 4
    horizontally-adjacent output pixels (constant per group by H.264
    partition granularity).  Returns [B, H, W] int32 prediction equal to
    the per-pixel path.

    Two gathered uint32 rows per group (misalignment resolved by a VPU
    funnel shift) = W*H/2 gathered rows per pass instead of W*H.
    """
    B, R, P, Hp, Wp = planes16.shape
    _, H, Wg = mvx_g.shape
    m = _MARGIN
    Ww = Wp // 4
    words = _as_words(planes16)
    n_words = B * R * P * Hp * Ww
    ys = jnp.clip(jnp.arange(H)[None, :, None] + (mvy_g >> 2) + m, 0, Hp - 1)
    xs = jnp.clip(
        jnp.arange(Wg)[None, None, :] * 4 + (mvx_g >> 2) + m, 0, Wp - 4
    )
    # Clamp displacement stays inside the replicated 8-px margin, where
    # every value beyond filter reach (3 px) is constant — exactness
    # argument mirrors the per-pixel clamp.
    frac = (mvy_g & 3) * 4 + (mvx_g & 3)
    boff = (jnp.arange(B) * R)[:, None, None]
    wi = (((boff + ref_slot_g) * P + frac) * Hp + ys) * Ww + (xs >> 2)
    w0 = _gflat(words, wi)
    w1 = _gflat(words, jnp.minimum(wi + 1, n_words - 1))
    s = ((xs & 3) * 8).astype(jnp.uint32)
    comb = jnp.where(
        s == 0, w0, (w0 >> s) | (w1 << (jnp.uint32(32) - s))
    )
    bytes4 = [
        ((comb >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
        for j in range(4)
    ]
    return jnp.stack(bytes4, axis=-1).reshape(B, H, Wg * 4)


def chroma_mc_gather_pair_wide_b(pairs, ref_slot_g, mvx_g, mvy_g):
    """Wide-row variant of :func:`chroma_mc_gather_pair_b`.

    pairs: [B, R, Hcp, Wcp, 2] uint8 interleaved (U, V) with Wcp even.
    Group maps are [B, Hc, Wc//2] (one entry per 2 adjacent chroma px —
    constant per group: min partition covers a 2x2 chroma block).
    Returns [B, 2, Hc, Wc] int32 — bit-equal to the per-pixel path.

    Four gathered uint32 rows per group (top/bottom bilinear rows x 2
    words each) = Hc*Wc*2 rows instead of Hc*Wc*4.
    """
    B, R, Hp, Wp, _ = pairs.shape
    _, Hc, Wg = mvx_g.shape
    m = _MARGIN
    Wb = Wp * 2          # bytes per row
    Ww = Wb // 4         # words per row
    words = _as_words(pairs.reshape(B, R, Hp, Wb))
    ys = jnp.arange(Hc)[None, :, None] + (mvy_g >> 3) + m
    y0 = jnp.clip(ys, 0, Hp - 1)
    y1 = jnp.clip(ys + 1, 0, Hp - 1)
    # pair index of the group's first pixel; need pairs p..p+2
    p = jnp.clip(
        jnp.arange(Wg)[None, None, :] * 2 + (mvx_g >> 3) + m, 0, Wp - 3
    )
    fx = (mvx_g & 7).astype(jnp.int32)
    fy = (mvy_g & 7).astype(jnp.int32)
    boff = (jnp.arange(B) * R)[:, None, None]
    base = (boff + ref_slot_g) * Hp
    wx = (p * 2) >> 2                     # first word of the 8-byte window
    o = (p & 1) * 2                       # byte offset of pair p in window
    r0 = (base + y0) * Ww + wx
    r1 = (base + y1) * Ww + wx
    a0 = _gflat(words, r0)
    a1 = _gflat(words, r0 + 1)
    b0 = _gflat(words, r1)
    b1 = _gflat(words, r1 + 1)

    def six(w0, w1):
        """Bytes o..o+5 of the window: pairs p, p+1, p+2."""
        byt = [_byte(w0, w1, k) for k in range(8)]
        sel = o == 0
        return [jnp.where(sel, byt[i], byt[i + 2]) for i in range(6)]

    top = six(a0, a1)
    bot = six(b0, b1)

    def blend(A, Bc, C, D):
        return (
            (8 - fx) * (8 - fy) * A + fx * (8 - fy) * Bc
            + (8 - fx) * fy * C + fx * fy * D + 32
        ) >> 6

    # output pixel j (j = 0, 1) of each group, channel c (0=U, 1=V):
    # A = pair p+j, B = pair p+j+1 (top row); C, D same on bottom row.
    outs = []
    for c in range(2):
        px = []
        for j in range(2):
            k = 2 * j + c
            px.append(blend(top[k], top[k + 2], bot[k], bot[k + 2]))
        # interleave the two group pixels back to full width
        outs.append(jnp.stack(px, axis=-1).reshape(B, Hc, Wg * 2))
    return jnp.stack(outs, axis=1)


# -- paired-word ring variants: the reference ring itself stores each
# uint32 word alongside its right neighbor ([..., Ww, 2]), so the 8-byte
# window of a group is ONE gathered row (luma) / one per bilinear row
# (chroma) — half the rows of the wide variant again, at 2x ring memory.


def pair_words(planes: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B, ..., Wp] -> [B, ..., Wp//4, 2] uint32 overlapped pairs:
    out[..., w, :] = (word w, word w+1) in row-major order per batch
    entry (the final word pairs with a wrapped word — never consumed:
    misaligned windows stop one word short of the end)."""
    B = planes.shape[0]
    shape = planes.shape[:-1] + (planes.shape[-1] // 4,)
    import jax

    w = jax.lax.bitcast_convert_type(
        planes.reshape(shape + (4,)), jnp.uint32
    )
    flat = w.reshape(B, -1)
    nxt = jnp.concatenate([flat[:, 1:], flat[:, :1]], axis=1)
    return jnp.stack([flat, nxt], axis=-1).reshape(shape + (2,))


def luma_mc_gather16_paired_b(pairs16, ref_slot_g, mvx_g, mvy_g):
    """Like :func:`luma_mc_gather16_wide_b` but over a paired-word ring
    (`pair_words` of the subpel planes): pairs16 [B, R, 16, Hp, Ww, 2]
    uint32, one gathered 8-byte row per 4 output pixels."""
    B, R, P, Hp, Ww, _ = pairs16.shape
    _, H, Wg = mvx_g.shape
    Wp = Ww * 4
    m = _MARGIN
    rows = pairs16.reshape(-1, 2)
    ys = jnp.clip(jnp.arange(H)[None, :, None] + (mvy_g >> 2) + m, 0, Hp - 1)
    xs = jnp.clip(
        jnp.arange(Wg)[None, None, :] * 4 + (mvx_g >> 2) + m, 0, Wp - 4
    )
    frac = (mvy_g & 3) * 4 + (mvx_g & 3)
    boff = (jnp.arange(B) * R)[:, None, None]
    wi = (((boff + ref_slot_g) * P + frac) * Hp + ys) * Ww + (xs >> 2)
    got = _gflat(rows, wi)
    w0, w1 = got[..., 0], got[..., 1]
    s = ((xs & 3) * 8).astype(jnp.uint32)
    comb = jnp.where(s == 0, w0, (w0 >> s) | (w1 << (jnp.uint32(32) - s)))
    bytes4 = [
        ((comb >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
        for j in range(4)
    ]
    return jnp.stack(bytes4, axis=-1).reshape(B, H, Wg * 4)


def chroma_mc_gather_pair_paired_b(cpairs, ref_slot_g, mvx_g, mvy_g):
    """Like :func:`chroma_mc_gather_pair_wide_b` but over a paired-word
    chroma ring (`pair_words` of the byte-interleaved planes viewed as
    [B, R, Hcp, Wcp*2]): cpairs [B, R, Hcp, Ww, 2] uint32.  Two gathered
    rows per 2-pixel group (top + bottom bilinear rows)."""
    B, R, Hp, Ww, _ = cpairs.shape
    Wp = Ww * 2          # pairs per row
    _, Hc, Wg = mvx_g.shape
    m = _MARGIN
    rows = cpairs.reshape(-1, 2)
    ys = jnp.arange(Hc)[None, :, None] + (mvy_g >> 3) + m
    y0 = jnp.clip(ys, 0, Hp - 1)
    y1 = jnp.clip(ys + 1, 0, Hp - 1)
    p = jnp.clip(
        jnp.arange(Wg)[None, None, :] * 2 + (mvx_g >> 3) + m, 0, Wp - 3
    )
    fx = (mvx_g & 7).astype(jnp.int32)
    fy = (mvy_g & 7).astype(jnp.int32)
    boff = (jnp.arange(B) * R)[:, None, None]
    base = (boff + ref_slot_g) * Hp
    wx = (p * 2) >> 2
    o = (p & 1) * 2
    g0 = _gflat(rows, (base + y0) * Ww + wx)
    g1 = _gflat(rows, (base + y1) * Ww + wx)

    def six(g):
        w0, w1 = g[..., 0], g[..., 1]
        byt = [_byte(w0, w1, k) for k in range(8)]
        sel = o == 0
        return [jnp.where(sel, byt[i], byt[i + 2]) for i in range(6)]

    top = six(g0)
    bot = six(g1)

    def blend(A, Bc, C, D):
        return (
            (8 - fx) * (8 - fy) * A + fx * (8 - fy) * Bc
            + (8 - fx) * fy * C + fx * fy * D + 32
        ) >> 6

    outs = []
    for c in range(2):
        px = []
        for j in range(2):
            k = 2 * j + c
            px.append(blend(top[k], top[k + 2], bot[k], bot[k + 2]))
        outs.append(jnp.stack(px, axis=-1).reshape(B, Hc, Wg * 2))
    return jnp.stack(outs, axis=1)


def luma_mc_gather16_paired_flat(rows, dims, ref_slot_g, mvx_g, mvy_g):
    """:func:`luma_mc_gather16_paired_b` over a PRE-FLATTENED ring.

    rows: [B*Rs*16*Hp*Ww, 2] uint32 paired words; dims = (B, Rs, Hp, Ww)
    with Rs the slot stride (R+1 when the decoder keeps a dummy
    write-off slot).  Keeping the ring flat in the scan carry avoids the
    per-step relayout a structured carry pays before the flat-index
    gather (tools/mcbench.py carry variants: 881 -> 428 ms)."""
    B, Rs, Hp, Ww = dims
    Wp = Ww * 4
    _, H, Wg = mvx_g.shape
    m = _MARGIN
    ys = jnp.clip(jnp.arange(H)[None, :, None] + (mvy_g >> 2) + m, 0, Hp - 1)
    xs = jnp.clip(
        jnp.arange(Wg)[None, None, :] * 4 + (mvx_g >> 2) + m, 0, Wp - 4
    )
    frac = (mvy_g & 3) * 4 + (mvx_g & 3)
    boff = (jnp.arange(B) * Rs)[:, None, None]
    wi = (((boff + ref_slot_g) * 16 + frac) * Hp + ys) * Ww + (xs >> 2)
    got = _gflat(rows, wi)
    w0, w1 = got[..., 0], got[..., 1]
    s = ((xs & 3) * 8).astype(jnp.uint32)
    comb = jnp.where(s == 0, w0, (w0 >> s) | (w1 << (jnp.uint32(32) - s)))
    bytes4 = [
        ((comb >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
        for j in range(4)
    ]
    return jnp.stack(bytes4, axis=-1).reshape(B, H, Wg * 4)


def chroma_mc_gather_pair_paired_flat(rows, dims, ref_slot_g, mvx_g, mvy_g):
    """:func:`chroma_mc_gather_pair_paired_b` over a pre-flattened chroma
    ring.  rows: [B*Rs*Hcp*Ww, 2] uint32; dims = (B, Rs, Hcp, Ww)."""
    B, Rs, Hp, Ww = dims
    Wp = Ww * 2          # pairs per row
    _, Hc, Wg = mvx_g.shape
    m = _MARGIN
    ys = jnp.arange(Hc)[None, :, None] + (mvy_g >> 3) + m
    y0 = jnp.clip(ys, 0, Hp - 1)
    y1 = jnp.clip(ys + 1, 0, Hp - 1)
    p = jnp.clip(
        jnp.arange(Wg)[None, None, :] * 2 + (mvx_g >> 3) + m, 0, Wp - 3
    )
    fx = (mvx_g & 7).astype(jnp.int32)
    fy = (mvy_g & 7).astype(jnp.int32)
    boff = (jnp.arange(B) * Rs)[:, None, None]
    base = (boff + ref_slot_g) * Hp
    wx = (p * 2) >> 2
    o = (p & 1) * 2
    g0 = _gflat(rows, (base + y0) * Ww + wx)
    g1 = _gflat(rows, (base + y1) * Ww + wx)

    def six(g):
        w0, w1 = g[..., 0], g[..., 1]
        byt = [_byte(w0, w1, k) for k in range(8)]
        sel = o == 0
        return [jnp.where(sel, byt[i], byt[i + 2]) for i in range(6)]

    top = six(g0)
    bot = six(g1)

    def blend(A, Bc, C, D):
        return (
            (8 - fx) * (8 - fy) * A + fx * (8 - fy) * Bc
            + (8 - fx) * fy * C + fx * fy * D + 32
        ) >> 6

    outs = []
    for c in range(2):
        px = []
        for j in range(2):
            k = 2 * j + c
            px.append(blend(top[k], top[k + 2], bot[k], bot[k + 2]))
        outs.append(jnp.stack(px, axis=-1).reshape(B, Hc, Wg * 2))
    return jnp.stack(outs, axis=1)


# -- y-quad rings: rows/s on XLA:TPU gathers stays ~flat up to 32-byte
# rows (tools/gatherbench.py: 139M rows/s at 8B vs 129M at 32B), so the
# ring groups FOUR consecutive plane rows' paired words into one 32-byte
# gather row ([Hp/4, Ww, 4, 2] u32 — a pure layout permutation of the
# paired ring, same bytes).  A 4x4 luma block (constant mv/slot/frac by
# H.264 partition granularity) then needs TWO gathered rows (its 4
# source rows span at most 2 y-quads) instead of four; a 2x2 chroma
# block's 3 bilinear rows likewise 2 instead of 4.  In-register row
# selection is a 3-deep where-chain over ys & 3 — pure VPU.


def yquad_words(planes: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B, NR, Wp] (NR % 4 == 0, Wp % 4 == 0) -> [B, (NR/4)*Ww, 8]
    uint32: row (yb, xw) holds the paired words (w, w+1) of source rows
    4*yb .. 4*yb+3 at word xw — one 32-byte window per gather row.

    The optimization barrier keeps the transpose OUT of the producer
    fusion: fused into the subpel-plane computation it forces XLA to
    materialize the untransposed pairs anyway and re-read them (+160
    ms/step at 1080p, tools/yqprep.py); standalone the relayout costs
    ~10 ms/step over pair_words."""
    import jax

    planes = jax.lax.optimization_barrier(planes)
    B, NR, Wp = planes.shape
    pw = pair_words(planes)                    # [B, NR, Ww, 2]
    Ww = Wp // 4
    return (
        pw.reshape(B, NR // 4, 4, Ww, 2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, (NR // 4) * Ww, 8)
    )


def _sel_row(g0, g1, j0, t):
    """Row words t = (ys & 3) + r from the two fetched y-quads
    g0/g1 [..., 4, 2]: g0 row j0+r while j0+r < 4, else g1 row j0+r-4.
    `t` is the per-block row offset r; selection is a 3-deep where-chain
    over j0 (0..3)."""
    def pick(j):
        return g0[..., j, :] if j < 4 else g1[..., j - 4, :]

    out = pick(3 + t)
    for j in (2, 1, 0):
        out = jnp.where((j0 == j)[..., None], pick(j + t), out)
    return out


def luma_mc_gather16_yquad_flat(rows, dims, ref_slot_b, mvx_b, mvy_b):
    """Y-quad variant of :func:`luma_mc_gather16_paired_flat`.

    rows: [B*Rs*16*(Hp/4)*Ww, 8] uint32 (`yquad_words` of the subpel
    planes); dims = (B, Rs, Hp, Ww).  Maps are per 4x4 BLOCK:
    [B, H/4, W/4].  Two gathered 32-byte rows per 16 output pixels —
    half the paired variant's rows — bit-identical output.

    Base-clamp exactness: ys is clamped to [0, Hp-4] (vs per-row clamps
    in the per-pixel path), which only changes WHICH padded row is read
    when the true row is >= Hp-1 or < 0; every row that deep in the
    8-row edge-replicated margin holds identical values (all beyond the
    6-tap filter reach), so the fetched bytes are equal."""
    B, Rs, Hp, Ww = dims
    Hb = Hp // 4
    Wp = Ww * 4
    _, hb, wb = mvx_b.shape
    m = _MARGIN
    ys = jnp.clip(
        jnp.arange(hb)[None, :, None] * 4 + (mvy_b >> 2) + m, 0, Hp - 4
    )
    xs = jnp.clip(
        jnp.arange(wb)[None, None, :] * 4 + (mvx_b >> 2) + m, 0, Wp - 4
    )
    frac = (mvy_b & 3) * 4 + (mvx_b & 3)
    boff = (jnp.arange(B) * Rs)[:, None, None]
    yb0 = ys >> 2
    j0 = ys & 3
    base = ((boff + ref_slot_b) * 16 + frac) * Hb
    wx = xs >> 2
    g0 = _gflat(rows, (base + yb0) * Ww + wx).reshape(
        B, hb, wb, 4, 2
    )
    g1 = _gflat(rows, (base + jnp.minimum(yb0 + 1, Hb - 1)) * Ww + wx
                ).reshape(B, hb, wb, 4, 2)
    s = ((xs & 3) * 8).astype(jnp.uint32)
    out_rows = []
    for r in range(4):
        w = _sel_row(g0, g1, j0, r)
        w0, w1 = w[..., 0], w[..., 1]
        comb = jnp.where(
            s == 0, w0, (w0 >> s) | (w1 << (jnp.uint32(32) - s))
        )
        bytes4 = [
            ((comb >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(
                jnp.int32)
            for j in range(4)
        ]
        out_rows.append(jnp.stack(bytes4, axis=-1))   # [B, hb, wb, 4]
    out = jnp.stack(out_rows, axis=3)                  # [B, hb, wb, 4r, 4c]
    return out.transpose(0, 1, 3, 2, 4).reshape(B, hb * 4, wb * 4)


def chroma_mc_gather_pair_yquad_flat(rows, dims, ref_slot_b, mvx_b, mvy_b):
    """Y-quad variant of :func:`chroma_mc_gather_pair_paired_flat`.

    rows: [B*Rs*(Hcp/4)*Ww, 8] uint32 (`yquad_words` of the interleaved
    (U, V) chroma bytes); dims = (B, Rs, Hcp, Ww).  Maps are per 2x2
    chroma block: [B, Hc/2, Wc/2].  Two gathered 32-byte rows per block
    (its 3 bilinear source rows span at most 2 y-quads) instead of four.
    Returns [B, 2, Hc, Wc] int32, bit-equal to the per-pixel path."""
    B, Rs, Hp, Ww = dims
    Hb = Hp // 4
    Wp = Ww * 2          # (U, V) pairs per row
    _, hb, wb = mvx_b.shape
    m = _MARGIN
    ys = jnp.clip(
        jnp.arange(hb)[None, :, None] * 2 + (mvy_b >> 3) + m, 0, Hp - 3
    )
    p = jnp.clip(
        jnp.arange(wb)[None, None, :] * 2 + (mvx_b >> 3) + m, 0, Wp - 3
    )
    fx = (mvx_b & 7).astype(jnp.int32)
    fy = (mvy_b & 7).astype(jnp.int32)
    boff = (jnp.arange(B) * Rs)[:, None, None]
    yb0 = ys >> 2
    j0 = ys & 3
    base = (boff + ref_slot_b) * Hb
    wx = (p * 2) >> 2
    o = (p & 1) * 2
    g0 = _gflat(rows, (base + yb0) * Ww + wx).reshape(B, hb, wb, 4, 2)
    g1 = _gflat(rows, (base + jnp.minimum(yb0 + 1, Hb - 1)) * Ww + wx
                ).reshape(B, hb, wb, 4, 2)

    def six(w):
        w0, w1 = w[..., 0], w[..., 1]
        byt = [_byte(w0, w1, k) for k in range(8)]
        sel = o == 0
        return [jnp.where(sel, byt[i], byt[i + 2]) for i in range(6)]

    # bilinear source rows j0 .. j0+2
    lines = [six(_sel_row(g0, g1, j0, t)) for t in range(3)]

    def blend(A, Bc, C, D):
        return (
            (8 - fx) * (8 - fy) * A + fx * (8 - fy) * Bc
            + (8 - fx) * fy * C + fx * fy * D + 32
        ) >> 6

    outs = []
    for c in range(2):
        px = []
        for rr in range(2):          # chroma row within the block
            top, bot = lines[rr], lines[rr + 1]
            row_px = []
            for jx in range(2):      # chroma column within the block
                k = 2 * jx + c
                row_px.append(blend(top[k], top[k + 2], bot[k], bot[k + 2]))
            px.append(jnp.stack(row_px, axis=-1))     # [B, hb, wb, 2]
        o2 = jnp.stack(px, axis=3)                    # [B, hb, wb, 2r, 2c]
        outs.append(
            o2.transpose(0, 1, 3, 2, 4).reshape(B, hb * 2, wb * 2))
    return jnp.stack(outs, axis=1)


def luma_mc_gather16_b(planes16, ref_slot, mvx, mvy):
    """planes16 [B, R, 16, Hp, Wp]; maps [B, H, W] -> [B, H, W] int32."""
    B, R, P, Hp, Wp = planes16.shape
    _, H, W = mvx.shape
    m = _MARGIN
    ys = jnp.clip(jnp.arange(H)[None, :, None] + (mvy >> 2) + m, 0, Hp - 1)
    xs = jnp.clip(jnp.arange(W)[None, None, :] + (mvx >> 2) + m, 0, Wp - 1)
    frac = (mvy & 3) * 4 + (mvx & 3)
    boff = (jnp.arange(B) * R)[:, None, None]
    idx = (((boff + ref_slot) * P + frac) * Hp + ys) * Wp + xs
    return _gflat(planes16.reshape(-1), idx).astype(jnp.int32)


def chroma_mc_gather_pair_b(pairs, ref_slot, mvx, mvy):
    """pairs [B, R, Hcp, Wcp, 2] uint8; maps [B, Hc, Wc] ->
    [B, 2, Hc, Wc] int32 eighth-pel bilinear chroma prediction.

    4 gathered pair-fetches per pixel (A/B/C/D corners); both planes ride
    each fetch.
    """
    B, R, Hp, Wp, _ = pairs.shape
    _, Hc, Wc = mvx.shape
    m = _MARGIN
    ys = jnp.arange(Hc)[None, :, None] + (mvy >> 3)
    xs = jnp.arange(Wc)[None, None, :] + (mvx >> 3)
    fx = (mvx & 7).astype(jnp.int32)[:, None]
    fy = (mvy & 7).astype(jnp.int32)[:, None]
    flat2 = pairs.reshape(-1, 2)
    boff = (jnp.arange(B) * R)[:, None, None]

    def fetch(dy, dx):
        yy = jnp.clip(ys + dy + m, 0, Hp - 1)
        xx = jnp.clip(xs + dx + m, 0, Wp - 1)
        idx = ((boff + ref_slot) * Hp + yy) * Wp + xx
        got = _gflat(flat2, idx).astype(jnp.int32)  # [B, Hc, Wc, 2]
        return got.transpose(0, 3, 1, 2)          # [B, 2, Hc, Wc]

    A = fetch(0, 0)
    Bs = fetch(0, 1)
    C = fetch(1, 0)
    D = fetch(1, 1)
    return (
        (8 - fx) * (8 - fy) * A + fx * (8 - fy) * Bs
        + (8 - fx) * fy * C + fx * fy * D + 32
    ) >> 6
