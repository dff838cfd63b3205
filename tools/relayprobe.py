"""TPU relay transfer characterization: D2H bandwidth, sync floor, and
whether D2H overlaps device compute.  Informs the pipeline's output-fetch
strategy (one monolithic np.asarray vs streamed per-chunk fetches).

Run on the real TPU (no env): python tools/relayprobe.py
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
    print("devices:", jax.devices())

    # 1. sync floor (tiny fetch round-trip)
    sync()
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync()
        lats.append(time.perf_counter() - t0)
    lats.sort()
    print(f"tiny-fetch floor: p50 {lats[2]*1e3:.0f} ms  "
          f"min {lats[0]*1e3:.0f} ms")

    # 2. D2H bandwidth at output-like sizes
    for mb in (8, 37, 150):
        n = mb * (1 << 20)
        a = jnp.zeros(n, jnp.uint8) + 1
        sync()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            h = np.asarray(a)
            best = min(best, time.perf_counter() - t0)
        del h
        print(f"D2H {mb:4d} MB: {best*1e3:7.0f} ms -> "
              f"{mb/best:7.1f} MB/s")

    # 3. H2D for comparison
    hb = np.ones(37 << 20, np.uint8)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(hb)
        d.block_until_ready()
        sync()
        best = min(best, time.perf_counter() - t0)
    print(f"H2D   37 MB: {best*1e3:7.0f} ms -> {37/best:7.1f} MB/s")

    # 4. does a D2H fetch overlap device compute?  Launch a long matmul
    #    chain, then immediately fetch a previously-computed big buffer.
    @jax.jit
    def burn(x):
        for _ in range(64):
            x = jnp.tanh(x @ x)
        return x

    x = jnp.ones((2048, 2048), jnp.bfloat16) / 2048
    big = jnp.zeros(37 << 20, jnp.uint8) + 1   # ready before the burn
    sync()

    t0 = time.perf_counter()
    y = burn(x)
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    h = np.asarray(big)          # D2H while burn runs (if overlap possible)
    t_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(y[:2, :2])        # force burn completion
    t_join = time.perf_counter() - t0
    print(f"overlap probe: dispatch {t_dispatch*1e3:.0f} ms, "
          f"fetch-during-burn {t_fetch*1e3:.0f} ms, join {t_join*1e3:.0f} ms")

    # serial reference: burn alone, then fetch alone
    sync()
    t0 = time.perf_counter()
    y = burn(x)
    np.asarray(y[:2, :2])
    t_burn = time.perf_counter() - t0
    t0 = time.perf_counter()
    h = np.asarray(big)
    t_fetch2 = time.perf_counter() - t0
    del h
    print(f"serial reference: burn {t_burn*1e3:.0f} ms, "
          f"fetch {t_fetch2*1e3:.0f} ms")
    print("=> overlap works" if t_fetch < 0.7 * t_fetch2 or t_join <
          0.5 * t_burn else "=> transfers serialize with compute")


if __name__ == "__main__":
    main()
