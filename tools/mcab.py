"""A/B the production MC gather formulations at 1080p shapes.

Times `luma_mc_gather16_paired_flat` + `chroma_mc_gather_pair_paired_flat`
(the round-2 paired-word ring) against the y-quad variants (32-byte
gather rows, half the gather count — ops/mc.py) on identical random
rings and block-granular motion fields, scan-over-F like the decoder.

Run: python tools/mcab.py      (repo root, TPU attached)
Knobs: MCAB_B (default 4), MCAB_F (8), MCAB_W (1920), MCAB_H (1088),
MCAB_TOTAL (1024 — frames the ms/benchrun figure is scaled to).
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


def sync():
    np.asarray(jnp.zeros(2) + 1)


def timeit(name, fn, *args, iters=4, scale=1.0):
    fn(*args)
    sync()
    t0 = time.perf_counter()
    fn(*args)
    sync()
    tjit = time.perf_counter() - t0
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(*args)
        sync()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {name:36s} {best * scale * 1e3:9.1f} ms/benchrun "
          f"({best * 1e3:7.1f} ms/jit)", flush=True)
    return best * scale


def main():
    B = int(os.environ.get("MCAB_B", 4))
    F = int(os.environ.get("MCAB_F", 8))
    W = int(os.environ.get("MCAB_W", 1920))
    H = int(os.environ.get("MCAB_H", 1088))
    R = 4
    total = int(os.environ.get("MCAB_TOTAL", 1024))
    scale = total / (B * F)
    m = 8
    Hp, Wp = H + 2 * m, W + 2 * m
    Hc, Wc = H // 2, W // 2
    Hcp, Wcp = Hc + 2 * m, Wc + 2 * m
    s_y = 16 * Hp * (Wp // 4)
    s_c = Hcp * (Wcp // 2)
    s_yq = 16 * (Hp // 4) * (Wp // 4)
    s_cq = (Hcp // 4) * ((Wcp * 2) // 4)
    print(f"devices: {jax.devices()}  B={B} F={F} {W}x{H} "
          f"(x{scale:.1f} -> {total} frames)", flush=True)

    from hwang_tpu.ops import mc as ops_mc

    rng = np.random.default_rng(0)
    ring_p = jnp.asarray(
        rng.integers(0, 2**32, (B * (R + 1) * s_y, 2), np.uint32))
    cring_p = jnp.asarray(
        rng.integers(0, 2**32, (B * (R + 1) * s_c, 2), np.uint32))
    ring_q = jnp.asarray(
        rng.integers(0, 2**32, (B * (R + 1) * s_yq, 8), np.uint32))
    cring_q = jnp.asarray(
        rng.integers(0, 2**32, (B * (R + 1) * s_cq, 8), np.uint32))
    # block-granular fields (4x4 luma / 2x2 chroma = same [H/4, W/4] grid)
    hb, wb = H // 4, W // 4
    mvx = jnp.asarray(rng.integers(-64, 64, (F, B, hb, wb), np.int32))
    mvy = jnp.asarray(rng.integers(-64, 64, (F, B, hb, wb), np.int32))
    slot = jnp.asarray(rng.integers(0, R, (F, B, hb, wb), np.int32))

    def rep(a, nv, nh):
        out = jnp.repeat(a, nv, axis=-2)
        return jnp.repeat(out, nh, axis=-1) if nh > 1 else out

    @jax.jit
    def mc_paired(ring, cring, mvx, mvy, slot):
        def step(c, xs):
            mx, my, sl = xs
            py = ops_mc.luma_mc_gather16_paired_flat(
                ring, (B, R + 1, Hp, Wp // 4),
                rep(sl, 4, 1), rep(mx, 4, 1), rep(my, 4, 1))
            puv = ops_mc.chroma_mc_gather_pair_paired_flat(
                cring, (B, R + 1, Hcp, Wcp // 2),
                rep(sl, 2, 1), rep(mx, 2, 1), rep(my, 2, 1))
            return c, py.sum() + puv.sum()
        _, s = jax.lax.scan(step, 0, (mvx, mvy, slot))
        return s.sum()

    @jax.jit
    def mc_yquad(ring, cring, mvx, mvy, slot):
        def step(c, xs):
            mx, my, sl = xs
            py = ops_mc.luma_mc_gather16_yquad_flat(
                ring, (B, R + 1, Hp, Wp // 4), sl, mx, my)
            puv = ops_mc.chroma_mc_gather_pair_yquad_flat(
                cring, (B, R + 1, Hcp, (Wcp * 2) // 4), sl, mx, my)
            return c, py.sum() + puv.sum()
        _, s = jax.lax.scan(step, 0, (mvx, mvy, slot))
        return s.sum()

    timeit("MC gathers (paired flat)", mc_paired, ring_p, cring_p,
           mvx, mvy, slot, scale=scale)
    timeit("MC gathers (y-quad flat)", mc_yquad, ring_q, cring_q,
           mvx, mvy, slot, scale=scale)

    # ring-prep cost comparison (pair_words vs yquad_words epilogues)
    Y = jnp.asarray(rng.integers(0, 255, (F, B, H, W)).astype(np.uint8))
    U = jnp.asarray(rng.integers(0, 255, (F, B, Hc, Wc)).astype(np.uint8))
    V = jnp.asarray(rng.integers(0, 255, (F, B, Hc, Wc)).astype(np.uint8))

    @jax.jit
    def prep_paired(Y, U, V):
        def step(c, xs):
            y, u, v = xs
            p = ops_mc.luma_subpel16_planes(y)
            cp = ops_mc.chroma_pair_planes(u, v)
            pw = ops_mc.pair_words(p.reshape(B, 16 * Hp, Wp))
            cw = ops_mc.pair_words(cp.reshape(B, Hcp, Wcp * 2))
            return c, (pw[..., 0, 0].sum(dtype=jnp.uint32)
                       + cw[..., 0, 0].sum(dtype=jnp.uint32))
        _, s = jax.lax.scan(step, 0, (Y, U, V))
        return s.sum()

    @jax.jit
    def prep_yquad(Y, U, V):
        def step(c, xs):
            y, u, v = xs
            p = ops_mc.luma_subpel16_planes(y)
            cp = ops_mc.chroma_pair_planes(u, v)
            qw = ops_mc.yquad_words(p.reshape(B, 16 * Hp, Wp))
            cq = ops_mc.yquad_words(cp.reshape(B, Hcp, Wcp * 2))
            return c, (qw[..., 0].sum(dtype=jnp.uint32)
                       + cq[..., 0].sum(dtype=jnp.uint32))
        _, s = jax.lax.scan(step, 0, (Y, U, V))
        return s.sum()

    timeit("ring prep (pair_words)", prep_paired, Y, U, V, scale=scale)
    timeit("ring prep (yquad_words)", prep_yquad, Y, U, V, scale=scale)


if __name__ == "__main__":
    main()
