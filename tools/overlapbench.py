"""Relay overlap probe: does a host->device transfer proceed while the
device is busy executing, and do two dispatched executables pipeline?

Times three things:
  compute alone      one heavy matmul-loop executable
  h2d alone          13 MB device_put
  h2d during compute dispatch compute (async), then device_put
  2x compute chained dispatch two executables back-to-back, one sync

If "h2d during compute" ~= max(h2d, compute) the relay overlaps
transfers with compute; if ~= h2d + compute it serializes them (and the
pipeline's chunking must minimize transfer count instead).

Run: python tools/overlapbench.py  (TPU attached)
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


def main():
    print(f"devices: {jax.devices()}", flush=True)

    @jax.jit
    def heavy(x):
        def step(c, _):
            return jnp.tanh(c @ x), 0
        out, _ = jax.lax.scan(step, x, jnp.arange(60))
        return out

    x = jnp.asarray(np.random.default_rng(0).random((4096, 4096), np.float32))
    host = np.zeros(13 * 1024 * 1024, np.uint8)

    heavy(x)
    sync()
    jax.device_put(host)
    sync()

    def best(f, n=4):
        b = float("inf")
        for _ in range(n):
            t0 = time.time()
            f()
            sync()
            b = min(b, time.time() - t0)
        return b

    t_c = best(lambda: heavy(x))
    print(f"  compute alone        {t_c*1e3:7.0f} ms", flush=True)
    t_h = best(lambda: jax.device_put(host).block_until_ready())
    print(f"  h2d 13MB alone       {t_h*1e3:7.0f} ms", flush=True)

    def both():
        r = heavy(x)          # async dispatch
        a = jax.device_put(host)
        del r, a

    t_b = best(both)
    print(f"  h2d during compute   {t_b*1e3:7.0f} ms   "
          f"(overlap if ~{max(t_c, t_h)*1e3:.0f}, serial if "
          f"~{(t_c+t_h)*1e3:.0f})", flush=True)

    def two():
        r1 = heavy(x)
        r2 = heavy(x)
        del r1, r2

    t_2 = best(two)
    print(f"  2x compute chained   {t_2*1e3:7.0f} ms   "
          f"(pipelined dispatch if ~{2*t_c*1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
