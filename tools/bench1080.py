"""1080p TPU-path check + timing: decode a stride-30 gather from the
config-2 fixture and (optionally) compare against libavcodec.

Knobs:
  HWANG_INTRA=pallas|skewed   intra stage variant (pallas -> ring-DMA
                              kernel at 1080p; default = recon_batched's
                              auto routing)
  B1080_ROWS   rows gathered (default 8 -> 4 spans of ~31 frames)
  B1080_CHECK  1 = bit-exact check vs the oracle (slow host decode)

Run: python tools/bench1080.py   (repo root, TPU attached)
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

    n_rows = int(os.environ.get("B1080_ROWS", 8))
    print(f"devices: {jax.devices()}  intra={os.environ.get('HWANG_INTRA')}"
          f"  rows={n_rows}", flush=True)
    extra = ("keyint=60:min-keyint=60:no-scenecut=1:ref=2:"
             "subme=2:me=hex:trellis=0:rc-lookahead=10")
    p = fixture("bench_1920x1088_f720_g60_main_0", 720, 1920, 1088,
                profile="main", gop_size=60, crf=26, seed=0,
                extra_opts=extra)
    rows = list(range(0, 30 * n_rows, 30))
    dec = ClipBatchDecoder([p])
    t0 = time.time()
    frames, _ = dec.decode([rows])
    sync()
    print(f"  warmup (incl. compile): {time.time()-t0:.1f}s "
          f"out {frames.shape}", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        frames, _ = dec.decode([rows])
        sync()
        best = min(best, time.time() - t0)
    # decoded work = full spans (keyframe..target), delivered = len(rows)
    print(f"  1080p stride-30: {best*1e3:.0f} ms for {len(rows)} delivered "
          f"frames -> {len(rows)/best:.2f} fps delivered", flush=True)
    if os.environ.get("B1080_CHECK") == "1":
        from hwang_tpu.utils.fixtures import oracle_decode_all

        truth = oracle_decode_all(p)
        out = np.asarray(frames)
        for i, r in enumerate(rows):
            assert np.array_equal(out[i], truth[r]), f"row {r} differs"
        print("  bit-exact vs libavcodec: OK", flush=True)
    dec.close()


if __name__ == "__main__":
    main()
