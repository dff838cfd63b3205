"""MC decomposition bench: where does luma_mc_gather16_paired_b's time
go?  Times, per scan-of-16-steps jit over real ring shapes (B=32,
640x368, R=4):

  gather-only   rows[wi] with the real index computation, sum the words
  +funnel       ... plus the misalignment funnel shift
  full          the real function (byte split + interleave reshape)
  chroma full   the real chroma paired function

Run: python tools/mcbench.py   (TPU attached)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from hwang_tpu.ops import mc as ops_mc


def sync():
    np.asarray(jnp.zeros(2) + 1)


def timeit(name, fn, *args, iters=4):
    fn(*args)
    sync()
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        fn(*args)
        sync()
        best = min(best, time.time() - t0)
    print(f"  {name:26s} {best*1e3:8.1f} ms/jit", flush=True)


def main():
    B, F, R = (int(os.environ.get("SB_B", 32)),
               int(os.environ.get("SB_F", 16)), 4)
    W = int(os.environ.get("SB_W", 640))
    H = int(os.environ.get("SB_H", 368))
    m = 8
    Hp, Wp = H + 2 * m, W + 2 * m
    Ww = Wp // 4
    Hc, Wc = H // 2, W // 2
    Hcp, Wcp = Hc + 2 * m, Wc + 2 * m
    print(f"devices: {jax.devices()}  B={B} F={F} {W}x{H}")
    rng = np.random.default_rng(0)
    ring = jnp.asarray(rng.integers(
        0, 2**32, (B, R, 16, Hp, Ww, 2), np.uint32))
    cring = jnp.asarray(rng.integers(
        0, 2**32, (B, R, Hcp, (Wcp * 2) // 4, 2), np.uint32))
    mvx = jnp.asarray(rng.integers(-64, 64, (F, B, H, W // 4), np.int32))
    mvy = jnp.asarray(rng.integers(-64, 64, (F, B, H, W // 4), np.int32))
    slot = jnp.asarray(rng.integers(0, R, (F, B, H, W // 4), np.int32))
    cmvx = jnp.asarray(rng.integers(-64, 64, (F, B, Hc, Wc // 2), np.int32))
    cmvy = jnp.asarray(rng.integers(-64, 64, (F, B, Hc, Wc // 2), np.int32))
    cslot = jnp.asarray(rng.integers(0, R, (F, B, Hc, Wc // 2), np.int32))

    def idx_and_gather(pairs16, ref_slot_g, mvx_g, mvy_g):
        Bb, Rr, P, Hpp, Www, _ = pairs16.shape
        _, Hh, Wg = mvx_g.shape
        Wpp = Www * 4
        rows = pairs16.reshape(-1, 2)
        ys = jnp.clip(
            jnp.arange(Hh)[None, :, None] + (mvy_g >> 2) + m, 0, Hpp - 1)
        xs = jnp.clip(
            jnp.arange(Wg)[None, None, :] * 4 + (mvx_g >> 2) + m, 0, Wpp - 4)
        frac = (mvy_g & 3) * 4 + (mvx_g & 3)
        boff = (jnp.arange(Bb) * Rr)[:, None, None]
        wi = (((boff + ref_slot_g) * P + frac) * Hpp + ys) * Www + (xs >> 2)
        return rows[wi], xs

    @jax.jit
    def gather_only(ring, mvx, mvy, slot):
        def step(c, xs_):
            mx, my, sl = xs_
            got, _ = idx_and_gather(ring, sl, mx, my)
            return c, got[..., 0].sum() + got[..., 1].sum()
        _, o = jax.lax.scan(step, 0, (mvx, mvy, slot))
        return o.sum()

    @jax.jit
    def with_funnel(ring, mvx, mvy, slot):
        def step(c, xs_):
            mx, my, sl = xs_
            got, xs = idx_and_gather(ring, sl, mx, my)
            w0, w1 = got[..., 0], got[..., 1]
            s = ((xs & 3) * 8).astype(jnp.uint32)
            comb = jnp.where(
                s == 0, w0, (w0 >> s) | (w1 << (jnp.uint32(32) - s)))
            return c, comb.sum()
        _, o = jax.lax.scan(step, 0, (mvx, mvy, slot))
        return o.sum()

    @jax.jit
    def full(ring, mvx, mvy, slot):
        def step(c, xs_):
            mx, my, sl = xs_
            py = ops_mc.luma_mc_gather16_paired_b(ring, sl, mx, my)
            return c, py.sum()
        _, o = jax.lax.scan(step, 0, (mvx, mvy, slot))
        return o.sum()

    @jax.jit
    def cfull(cring, cmvx, cmvy, cslot):
        def step(c, xs_):
            mx, my, sl = xs_
            puv = ops_mc.chroma_mc_gather_pair_paired_b(cring, sl, mx, my)
            return c, puv.sum()
        _, o = jax.lax.scan(step, 0, (cmvx, cmvy, cslot))
        return o.sum()

    @jax.jit
    def gather_barrier(ring, mvx, mvy, slot):
        rows = ring.reshape(-1, 2)

        def step(c, xs_):
            mx, my, sl = xs_
            ys = jnp.clip(
                jnp.arange(H)[None, :, None] + (my >> 2) + m, 0, Hp - 1)
            xs = jnp.clip(
                jnp.arange(W // 4)[None, None, :] * 4 + (mx >> 2) + m,
                0, Wp - 4)
            frac = (my & 3) * 4 + (mx & 3)
            boff = (jnp.arange(B) * R)[:, None, None]
            wi = (((boff + sl) * 16 + frac) * Hp + ys) * Ww + (xs >> 2)
            wi = jax.lax.optimization_barrier(wi)
            got = rows[wi]
            return c, got[..., 0].sum() + got[..., 1].sum()
        _, o = jax.lax.scan(step, 0, (mvx, mvy, slot))
        return o.sum()

    timeit("luma gather-only", gather_only, ring, mvx, mvy, slot)
    timeit("luma gather (idx barrier)", gather_barrier, ring, mvx, mvy, slot)
    timeit("luma +funnel", with_funnel, ring, mvx, mvy, slot)
    timeit("luma full", full, ring, mvx, mvy, slot)
    timeit("chroma full", cfull, cring, cmvx, cmvy, cslot)




def variants():
    """Gather-lowering probes: what recovers the fast path?"""
    B, F, R = 32, 16, 4
    W, H = 640, 368
    m = 8
    Hp, Wp = H + 2 * m, W + 2 * m
    Ww = Wp // 4
    rng = np.random.default_rng(0)
    ring = jnp.asarray(rng.integers(
        0, 2**32, (B, R, 16, Hp, Ww, 2), np.uint32))
    flat = jnp.asarray(rng.integers(
        0, 2**32, (B * R * 16 * Hp * Ww, 2), np.uint32))
    mvx = jnp.asarray(rng.integers(-64, 64, (F, B, H, W // 4), np.int32))
    mvy = jnp.asarray(rng.integers(-64, 64, (F, B, H, W // 4), np.int32))
    slot = jnp.asarray(rng.integers(0, R, (F, B, H, W // 4), np.int32))

    def wi_of(mx, my, sl):
        Hh, Wg = H, W // 4
        ys = jnp.clip(jnp.arange(Hh)[None, :, None] + (my >> 2) + m,
                      0, Hp - 1)
        xs = jnp.clip(jnp.arange(Wg)[None, None, :] * 4 + (mx >> 2) + m,
                      0, Wp - 4)
        frac = (my & 3) * 4 + (mx & 3)
        boff = (jnp.arange(B) * R)[:, None, None]
        return (((boff + sl) * 16 + frac) * Hp + ys) * Ww + (xs >> 2)

    @jax.jit
    def v_flatidx(ring, mvx, mvy, slot):
        rows = ring.reshape(-1, 2)

        def step(c, xs_):
            mx, my, sl = xs_
            wi = wi_of(mx, my, sl).reshape(-1)
            got = rows[wi]
            return c, got[:, 0].sum() + got[:, 1].sum()
        _, o = jax.lax.scan(step, 0, (mvx, mvy, slot))
        return o.sum()

    @jax.jit
    def v_flatsrc(flat, mvx, mvy, slot):
        def step(c, xs_):
            mx, my, sl = xs_
            wi = wi_of(mx, my, sl)
            got = flat[wi]
            return c, got[..., 0].sum() + got[..., 1].sum()
        _, o = jax.lax.scan(step, 0, (mvx, mvy, slot))
        return o.sum()

    @jax.jit
    def v_both(flat, mvx, mvy, slot):
        def step(c, xs_):
            mx, my, sl = xs_
            wi = wi_of(mx, my, sl).reshape(-1)
            got = flat[wi]
            return c, got[:, 0].sum() + got[:, 1].sum()
        _, o = jax.lax.scan(step, 0, (mvx, mvy, slot))
        return o.sum()

    @jax.jit
    def v_precomp_idx(flat, wis):
        def step(c, wi):
            got = flat[wi]
            return c, got[:, 0].sum() + got[:, 1].sum()
        _, o = jax.lax.scan(step, 0, wis)
        return o.sum()

    wis = jnp.asarray(rng.integers(
        0, B * R * 16 * Hp * Ww, (F, B * H * (W // 4)), np.int32))
    timeit("v_flatidx (ring 6D)", v_flatidx, ring, mvx, mvy, slot)
    timeit("v_flatsrc (idx 3D)", v_flatsrc, flat, mvx, mvy, slot)
    timeit("v_both flat", v_both, flat, mvx, mvy, slot)
    timeit("v_precomp random idx", v_precomp_idx, flat, wis)




def variant_full_flat():
    """Full paired-luma decode with flat-idx gather + result reshape —
    the form ops/mc.py adopts if this matches v_both's speed."""
    B, F, R = 32, 16, 4
    W, H = 640, 368
    m = 8
    Hp, Wp = H + 2 * m, W + 2 * m
    Ww = Wp // 4
    rng = np.random.default_rng(0)
    ring = jnp.asarray(rng.integers(
        0, 2**32, (B, R, 16, Hp, Ww, 2), np.uint32))
    mvx = jnp.asarray(rng.integers(-64, 64, (F, B, H, W // 4), np.int32))
    mvy = jnp.asarray(rng.integers(-64, 64, (F, B, H, W // 4), np.int32))
    slot = jnp.asarray(rng.integers(0, R, (F, B, H, W // 4), np.int32))

    @jax.jit
    def vfull(ring, mvx, mvy, slot):
        rows = ring.reshape(-1, 2)

        def step(c, xs_):
            mx, my, sl = xs_
            Wg = W // 4
            ys = jnp.clip(jnp.arange(H)[None, :, None] + (my >> 2) + m,
                          0, Hp - 1)
            xs = jnp.clip(jnp.arange(Wg)[None, None, :] * 4 + (mx >> 2) + m,
                          0, Wp - 4)
            frac = (my & 3) * 4 + (mx & 3)
            boff = (jnp.arange(B) * R)[:, None, None]
            wi = (((boff + sl) * 16 + frac) * Hp + ys) * Ww + (xs >> 2)
            got = rows[wi.reshape(-1)].reshape(B, H, Wg, 2)
            w0, w1 = got[..., 0], got[..., 1]
            s = ((xs & 3) * 8).astype(jnp.uint32)
            comb = jnp.where(
                s == 0, w0, (w0 >> s) | (w1 << (jnp.uint32(32) - s)))
            b4 = [((comb >> jnp.uint32(8 * j)) & jnp.uint32(0xFF))
                  .astype(jnp.int32) for j in range(4)]
            py = jnp.stack(b4, axis=-1).reshape(B, H, Wg * 4)
            return c, py.sum()
        _, o = jax.lax.scan(step, 0, (mvx, mvy, slot))
        return o.sum()

    timeit("full flat-idx + reshape", vfull, ring, mvx, mvy, slot)




def carry_variants():
    """Decoder-shaped scan: ring is the CARRY, updated then gathered each
    step.  Structured carry pays an in-step relayout for the flat-index
    gather; flat carry updates via per-clip dynamic_update_slice."""
    B, F, R = 32, 16, 4
    W, H = 640, 368
    m = 8
    Hp, Wp = H + 2 * m, W + 2 * m
    Ww = Wp // 4
    S = 16 * Hp * Ww                       # rows per (clip, slot)
    rng = np.random.default_rng(0)
    planes_all = jnp.asarray(rng.integers(
        0, 2**32, (F, B, 16, Hp, Ww, 2), np.uint32))
    slots = jnp.asarray(rng.integers(0, R, (F, B), np.int32))
    mvx = jnp.asarray(rng.integers(-64, 64, (F, B, H, W // 4), np.int32))
    mvy = jnp.asarray(rng.integers(-64, 64, (F, B, H, W // 4), np.int32))
    slotg = jnp.asarray(rng.integers(0, R, (F, B, H, W // 4), np.int32))

    def wi_of(mx, my, sl):
        Wg = W // 4
        ys = jnp.clip(jnp.arange(H)[None, :, None] + (my >> 2) + m,
                      0, Hp - 1)
        xs = jnp.clip(jnp.arange(Wg)[None, None, :] * 4 + (mx >> 2) + m,
                      0, Wp - 4)
        frac = (my & 3) * 4 + (mx & 3)
        boff = (jnp.arange(B) * R)[:, None, None]
        return (((boff + sl) * 16 + frac) * Hp + ys) * Ww + (xs >> 2)

    @jax.jit
    def structured(planes_all, slots, mvx, mvy, slotg):
        ring0 = jnp.zeros((B, R, 16, Hp, Ww, 2), jnp.uint32)
        bidx = jnp.arange(B)

        def step(ring, xs_):
            planes, sl, mx, my, sg = xs_
            ring = ring.at[bidx, sl].set(planes)
            rows = ring.reshape(-1, 2)
            got = rows[wi_of(mx, my, sg).reshape(-1)]
            return ring, got[:, 0].sum() + got[:, 1].sum()
        _, o = jax.lax.scan(step, ring0,
                            (planes_all, slots, mvx, mvy, slotg))
        return o.sum()

    @jax.jit
    def flatcarry(planes_all, slots, mvx, mvy, slotg):
        ring0 = jnp.zeros((B * R * S, 2), jnp.uint32)

        def step(ring, xs_):
            planes, sl, mx, my, sg = xs_
            for b in range(B):
                ring = jax.lax.dynamic_update_slice(
                    ring, planes[b].reshape(S, 2),
                    ((b * R + sl[b]) * S, 0))
            got = ring[wi_of(mx, my, sg).reshape(-1)]
            return ring, got[:, 0].sum() + got[:, 1].sum()
        _, o = jax.lax.scan(step, ring0,
                            (planes_all, slots, mvx, mvy, slotg))
        return o.sum()

    timeit("carry structured+reshape", structured, planes_all, slots,
           mvx, mvy, slotg)
    timeit("carry flat + DUS", flatcarry, planes_all, slots,
           mvx, mvy, slotg)


if __name__ == "__main__":
    which = os.environ.get("MB", "main").split(",")
    for name in which:
        {"main": main, "variants": variants,
         "fullflat": variant_full_flat, "carry": carry_variants}[name]()
