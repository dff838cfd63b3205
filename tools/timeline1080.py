"""Per-event timeline of one config2-shaped decode call (overlap debug).

Runs the stride-30 1080p gather twice (warmup + measured) and dumps the
profiler's absolute-time event timeline for the measured call — shows
WHICH host stages actually overlap the device decode, which the
aggregate stage budget can't.

Run: python tools/timeline1080.py   (repo root, TPU attached)
Knobs: TL_ROWS (default 24 — the full config2 request set)
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
os.environ.setdefault(
    "HWANG_FIXTURE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".fixtures"),
)

import numpy as np


def sync():
    import jax.numpy as jnp

    np.asarray(jnp.zeros(2) + 1)


def main():
    import jax

    from hwang_tpu.pipeline import ClipBatchDecoder
    from hwang_tpu.utils.fixtures import fixture
    from hwang_tpu.utils.profiler import Profiler

    n_rows = int(os.environ.get("TL_ROWS", 24))
    print(f"devices: {jax.devices()}  rows={n_rows}", flush=True)
    extra = ("keyint=60:min-keyint=60:no-scenecut=1:ref=2:"
             "subme=2:me=hex:trellis=0:rc-lookahead=10")
    p = fixture("bench_1920x1088_f720_g60_main_0", 720, 1920, 1088,
                profile="main", gop_size=60, crf=26, seed=0,
                extra_opts=extra)
    rows = list(range(0, 30 * n_rows, 30))
    prof = Profiler()
    dec = ClipBatchDecoder([p], profiler=prof)
    t0 = time.time()
    frames, _ = dec.decode([rows])
    sync()
    print(f"  warmup: {time.time()-t0:.1f}s out {frames.shape}", flush=True)
    prof.reset()
    t0 = time.time()
    frames, _ = dec.decode([rows])
    sync()
    wall = time.time() - t0
    print(f"  measured: {wall*1e3:.0f} ms", flush=True)
    print(prof.timeline(), flush=True)
    print(prof.report(), flush=True)
    dec.close()


if __name__ == "__main__":
    main()
