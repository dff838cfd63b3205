"""Time alternative lowerings of the y-quad ring relayout (pair_words
-> 32-byte gather rows) at 1080p shapes.  The 8-u32 order inside a
gather row is a free choice (gather + in-register selector just agree),
so any cheap-to-build permutation wins.

Times ONE prep application at B clips (what the decoder does per frame
step), scaled to a 1024-frame benchrun figure.

Run: python tools/yqprep.py   (repo root, TPU attached)
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


def timeit(name, fn, *args, iters=5, scale=1.0):
    out = fn(*args)
    sync()
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    del out
    print(f"  {name:44s} {best * scale * 1e3:9.1f} ms/benchrun "
          f"({best * 1e3:7.1f} ms/step)", flush=True)


def main():
    B = 4
    W, H = 1920, 1088
    m = 8
    Hp, Wp = H + 2 * m, W + 2 * m
    NR = 16 * Hp
    Ww = Wp // 4
    scale = 1024 / B      # benchrun = 1024 frames, one prep per frame
    print(f"devices: {jax.devices()}  B={B} NR={NR} Ww={Ww}", flush=True)
    rng = np.random.default_rng(0)
    from hwang_tpu.ops import mc as ops_mc

    planes = jnp.asarray(rng.integers(0, 255, (B, NR, Wp), np.uint8))

    # v0: pair_words alone (the paired-ring baseline cost)
    timeit("v0 pair_words only", jax.jit(
        lambda p: ops_mc.pair_words(p)), planes, scale=scale)

    # v1: current yquad_words (reshape + transpose of pairs)
    timeit("v1 transpose(0,1,3,2,4) [ww,r,p]", jax.jit(
        lambda p: ops_mc.yquad_words(p)), planes, scale=scale)

    # v2: four strided row-slices stacked on a new minor-2 axis
    def v2(p):
        pw = ops_mc.pair_words(p)                 # [B, NR, Ww, 2]
        q = jnp.stack([pw[:, j::4] for j in range(4)], axis=-2)
        return q.reshape(B, (NR // 4) * Ww, 8)
    timeit("v2 strided slices + stack(-2) [ww,r,p]", jax.jit(v2),
           planes, scale=scale)

    # v2b: same but row-phase on the LAST axis ([ww, p, r] order)
    def v2b(p):
        pw = ops_mc.pair_words(p)
        q = jnp.stack([pw[:, j::4] for j in range(4)], axis=-1)
        return q.reshape(B, (NR // 4) * Ww, 8)
    timeit("v2b strided slices + stack(-1) [ww,p,r]", jax.jit(v2b),
           planes, scale=scale)

    # v4: transpose moved axis to the END (0,1,3,4,2)
    def v4(p):
        pw = ops_mc.pair_words(p)
        q = pw.reshape(B, NR // 4, 4, Ww, 2).transpose(0, 1, 3, 4, 2)
        return q.reshape(B, (NR // 4) * Ww, 8)
    timeit("v4 transpose(0,1,3,4,2) [ww,p,r]", jax.jit(v4),
           planes, scale=scale)

    # v5: byte-level transpose before pairing (transpose u8, pair after)
    def v5(p):
        x = p.reshape(B, NR // 4, 4, Ww, 4).transpose(0, 1, 3, 2, 4)
        w = jax.lax.bitcast_convert_type(x, jnp.uint32)  # [B,NR4,Ww,4]
        nxt = jnp.concatenate([w[:, :, 1:], w[:, :, :1]], axis=2)
        q = jnp.stack([w, nxt], axis=-1)                 # [B,NR4,Ww,4,2]
        return q.reshape(B, (NR // 4) * Ww, 8)
    timeit("v5 u8 transpose then pair [ww,r,p]", jax.jit(v5),
           planes, scale=scale)


if __name__ == "__main__" and not os.environ.get("YQ_ZIP"):
    main()


def zip_probe():
    """stride-2 / double-stride-2 row-zip costs (y-pair ring candidate)."""
    B = 4
    W, H = 1920, 1088
    m = 8
    Hp, Wp = H + 2 * m, W + 2 * m
    NR = 16 * Hp
    scale = 1024 / B
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.integers(0, 255, (B, NR, Wp), np.uint8))
    print(f"zip probe: B={B} NR={NR} Wp={Wp}", flush=True)

    # z2: word-granular zip of adjacent row pairs
    def z2(p):
        w = jax.lax.bitcast_convert_type(
            p.reshape(B, NR, Wp // 4, 4), jnp.uint32)
        return jnp.stack([w[:, 0::2], w[:, 1::2]], axis=-1)
    timeit("z2 stride-2 word zip", jax.jit(z2), planes, scale=scale)

    # z4 = two nested stride-2 zips (row order scrambled — free choice)
    def z4(p):
        w = jax.lax.bitcast_convert_type(
            p.reshape(B, NR, Wp // 4, 4), jnp.uint32)
        a = jnp.stack([w[:, 0::2], w[:, 1::2]], axis=-1)   # [B,NR/2,Ww,2]
        return jnp.stack([a[:, 0::2], a[:, 1::2]], axis=-1)
    timeit("z4 double stride-2 zip", jax.jit(z4), planes, scale=scale)

    # z2 + overlapped 4-word windows (full y-pair ring build)
    def ypair(p):
        w = jax.lax.bitcast_convert_type(
            p.reshape(B, NR, Wp // 4, 4), jnp.uint32)
        a = jnp.stack([w[:, 0::2], w[:, 1::2]], axis=-1)
        fl = a.reshape(B, -1, 2)
        nxt = jnp.concatenate([fl[:, 1:], fl[:, :1]], axis=1)
        return jnp.concatenate([fl, nxt], axis=-1)          # [B, N, 4]
    timeit("y-pair ring build (z2+windows)", jax.jit(ypair), planes,
           scale=scale)


if __name__ == "__main__" and os.environ.get("YQ_ZIP"):
    zip_probe()
