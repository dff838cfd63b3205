"""XLA:TPU gather-formulation microbench.

Measures rows/s for the candidate 8-byte-window fetch formulations used
by the MC gathers (ops/mc.py) — the envelope that decides the MC design:

  u8     flat uint8 src[idx]                 (per-pixel baseline)
  u32    flat uint32 src[idx]                (wide variant's fetch)
  u32x2  [N, 2] uint32 src[idx] (pair rows)  (paired variant's fetch)
  u64    flat uint64 src[idx]                (bitcast pair)
  u64x2  two independent flat-u64 gathers    (16-byte window)

Run: python tools/gatherbench.py   (TPU attached; SB_ROWS to resize)
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


def timeit(name, fn, *args, rows, iters=5):
    fn(*args)
    sync()
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        fn(*args)
        sync()
        best = min(best, time.time() - t0)
    print(f"  {name:28s} {best*1e3:8.1f} ms  "
          f"{rows/best/1e6:8.1f} M rows/s", flush=True)


def main():
    n_rows = int(os.environ.get("SB_ROWS", 50_000_000))
    n_src = 16 * 1024 * 1024  # 16M source rows (64-128 MB operands)
    print(f"devices: {jax.devices()}  rows/call={n_rows/1e6:.0f}M")
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_src - 2, n_rows, np.int32))
    src8 = jnp.asarray(rng.integers(0, 255, n_src, np.uint8))
    src32 = jnp.asarray(rng.integers(0, 2**32, n_src, np.uint32))
    h32x2 = rng.integers(0, 2**32, (n_src, 2), np.uint32)
    src32x2 = jnp.asarray(h32x2)
    src64 = jnp.asarray(h32x2.view(np.uint64).reshape(n_src))

    @jax.jit
    def g8(s, i):
        return s[i].astype(jnp.uint32).sum()

    @jax.jit
    def g32(s, i):
        return s[i].sum()

    @jax.jit
    def g32x2(s, i):
        r = s[i]
        return r[:, 0].sum() + r[:, 1].sum()

    @jax.jit
    def g64(s, i):
        r = s[i]
        return (r & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).sum()

    @jax.jit
    def g64x2(s, i):
        return (s[i] & jnp.uint64(1)).astype(jnp.uint32).sum() + \
               (s[i + 1] & jnp.uint64(1)).astype(jnp.uint32).sum()

    # wider single-gather rows: if rows/s stays flat past 8 B, the MC
    # gathers should fetch wider windows and serve 8/16 px per row
    h32x4 = rng.integers(0, 2**32, (n_src, 4), np.uint32)
    src32x4 = jnp.asarray(h32x4)
    src32x8 = jnp.asarray(
        rng.integers(0, 2**32, (n_src // 2, 8), np.uint32))
    idx_half = jnp.asarray(rng.integers(0, n_src // 2 - 2, n_rows, np.int32))

    @jax.jit
    def g32x4(s, i):
        r = s[i]
        return sum(r[:, k].sum() for k in range(4))

    @jax.jit
    def g32x8(s, i):
        r = s[i]
        return sum(r[:, k].sum() for k in range(8))

    src32x16 = jnp.asarray(
        rng.integers(0, 2**32, (n_src // 4, 16), np.uint32))
    src32x32 = jnp.asarray(
        rng.integers(0, 2**32, (n_src // 8, 32), np.uint32))
    idx_q = jnp.asarray(rng.integers(0, n_src // 4 - 2, n_rows, np.int32))
    idx_o = jnp.asarray(rng.integers(0, n_src // 8 - 2, n_rows, np.int32))

    @jax.jit
    def g32x16(s, i):
        r = s[i]
        return sum(r[:, k].sum() for k in range(16))

    @jax.jit
    def g32x32(s, i):
        r = s[i]
        return sum(r[:, k].sum() for k in range(32))

    timeit("u8 flat", g8, src8, idx, rows=n_rows)
    timeit("u32 flat", g32, src32, idx, rows=n_rows)
    timeit("u32x2 rows", g32x2, src32x2, idx, rows=n_rows)
    timeit("u32x4 rows (16B)", g32x4, src32x4, idx, rows=n_rows)
    timeit("u32x8 rows (32B)", g32x8, src32x8, idx_half, rows=n_rows)
    timeit("u32x16 rows (64B)", g32x16, src32x16, idx_q, rows=n_rows)
    timeit("u32x32 rows (128B)", g32x32, src32x32, idx_o, rows=n_rows)
    timeit("u64 flat", g64, src64, idx, rows=n_rows)
    timeit("u64x2 (16B window)", g64x2, src64, idx, rows=n_rows)

    # --- probe: does a scan of small per-step gathers lose throughput? --
    F = 16
    per = n_rows // F // 16
    idx_s = jnp.asarray(
        rng.integers(0, n_src - 2, (F, per), np.int32))

    @jax.jit
    def g32x2_scan(s, ii):
        def step(c, i):
            r = s[i]
            return c, r[:, 0].sum() + r[:, 1].sum()
        _, o = jax.lax.scan(step, 0, ii)
        return o.sum()

    timeit(f"u32x2 scan {F}x{per/1e3:.0f}K rows", g32x2_scan, src32x2,
           idx_s, rows=F * per)

    # --- probe: big (1 GB-class) source operand -------------------------
    big = int(os.environ.get("SB_BIG", 128 * 1024 * 1024))
    srcbig = jnp.asarray(
        rng.integers(0, 2**32, (big, 2), np.uint32))
    idxb = jnp.asarray(rng.integers(0, big - 2, n_rows, np.int32))
    timeit(f"u32x2 rows, {big*8//2**20} MB src", g32x2, srcbig, idxb,
           rows=n_rows)

    # --- probe: MC-shaped computed indices + byte decode ----------------
    B, H, Wg = 32, 368, 160
    rows_mc = B * H * Wg
    mvx = jnp.asarray(rng.integers(-256, 256, (B, H, Wg), np.int32))
    mvy = jnp.asarray(rng.integers(-256, 256, (B, H, Wg), np.int32))
    slot = jnp.asarray(rng.integers(0, 4, (B, H, Wg), np.int32))

    @jax.jit
    def gmc(s, mvx, mvy, slot):
        Hp, Ww = 384, 168
        ys = jnp.clip(jnp.arange(H)[None, :, None] + (mvy >> 2), 0, Hp - 1)
        xs = jnp.clip(jnp.arange(Wg)[None, None, :] * 4 + (mvx >> 2), 0,
                      Ww * 4 - 4)
        frac = (mvy & 3) * 4 + (mvx & 3)
        wi = ((slot * 16 + frac) * Hp + ys) * Ww + (xs >> 2)
        wi = jnp.clip(wi, 0, s.shape[0] - 1)
        r = s[wi]
        w0, w1 = r[..., 0], r[..., 1]
        sft = ((xs & 3) * 8).astype(jnp.uint32)
        comb = jnp.where(sft == 0, w0,
                         (w0 >> sft) | (w1 << (jnp.uint32(32) - sft)))
        out = [((comb >> jnp.uint32(8 * j)) & jnp.uint32(0xFF))
               .astype(jnp.int32) for j in range(4)]
        return sum(o.sum() for o in out)

    timeit(f"MC-shaped idx+decode {rows_mc/1e6:.1f}M", gmc, src32x2,
           mvx, mvy, slot, rows=rows_mc)

    @jax.jit
    def gmc_scan(s, mvx, mvy, slot):
        def step(c, _):
            return c, gmc.__wrapped__(s, mvx, mvy, slot)
        _, o = jax.lax.scan(step, 0, jnp.arange(F))
        return o.sum()

    timeit(f"MC-shaped scan x{F}", gmc_scan, src32x2, mvx, mvy, slot,
           rows=rows_mc * F)


if __name__ == "__main__":
    main()
