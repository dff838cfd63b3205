"""Benchmark: sparse/batched frame-gather throughput on the TPU decode
path vs single-core FFmpeg (the reference's backend).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The headline config mirrors BASELINE.md config 3/4: a batched ML-dataloader
gather — N clips x K frames each, decoded to RGB on-device.  vs_baseline =
ratio to single-threaded libavcodec decoding the same planned spans on this
host (the FFmpeg-per-core yardstick).

Environment note: this host reaches the TPU through a relay tunnel with
~0.5 s fixed latency per transfer and ~77 MB/s H2D bandwidth (measured) —
orders of magnitude below a real TPU-VM's PCIe/DMA path.  The pipeline
ships entropy-decoder output in a packed sparse form (see
hwang_tpu/models/h264/packed.py) to fit through it.

Env knobs:
  HWANG_BENCH_W/H       coded size        (default 640x368)
  HWANG_BENCH_CLIPS     batch of clips    (default 32)
  HWANG_BENCH_FRAMES    frames per clip   (default 64)
  HWANG_BENCH_MODE      dense|stride      (default dense)
  HWANG_BENCH_COUNT     frames gathered per clip (default 16)
  HWANG_BENCH_GOP       keyframe interval (default 16)
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "HWANG_FIXTURE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".fixtures"),
)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

W = int(os.environ.get("HWANG_BENCH_W", 640))
H = int(os.environ.get("HWANG_BENCH_H", 368))
N_CLIPS = int(os.environ.get("HWANG_BENCH_CLIPS", 64))
N_FRAMES = int(os.environ.get("HWANG_BENCH_FRAMES", 64))
MODE = os.environ.get("HWANG_BENCH_MODE", "dense")
COUNT = int(os.environ.get("HWANG_BENCH_COUNT", 16))
GOP = int(os.environ.get("HWANG_BENCH_GOP", 16))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def device_sync():
    """Reliable device sync: block_until_ready is asynchronous-broken on
    the axon relay backend; a dependent tiny fetch is not."""
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros(2) + 1)


def main():
    import numpy as np

    import jax

    from hwang_tpu import Decoder
    from hwang_tpu.pipeline import ClipBatchDecoder
    from hwang_tpu.utils.fixtures import fixture

    log(f"devices: {jax.devices()}")

    paths = [
        fixture(
            f"bench_{W}x{H}_g{GOP}_{i}", N_FRAMES, W, H, profile="baseline",
            gop_size=GOP, crf=26, seed=i,
            extra_opts=f"keyint={GOP}:min-keyint={GOP}:no-scenecut=1:ref=2",
        )
        for i in range(N_CLIPS)
    ]
    if MODE == "dense":
        rows = [list(range(COUNT)) for _ in paths]
    else:
        stride = max(1, N_FRAMES // COUNT)
        rows = [list(range(0, N_FRAMES, stride)) for _ in paths]
    n_total = sum(len(r) for r in rows)

    dec = ClipBatchDecoder(paths, io_threads=16)
    t0 = time.time()
    frames, _ = dec.decode(rows, out_size=(224, 224))
    device_sync()
    log(f"warmup (incl. compile): {time.time()-t0:.1f}s out {frames.shape}")

    # the TPU relay adds +/-30% run-to-run noise; take the best
    # of several iterations
    iters = 5
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        frames, _ = dec.decode(rows, out_size=(224, 224))
        device_sync()
        best = min(best, time.time() - t0)
    tpu_fps = n_total / best
    log(f"tpu path: {best*1e3:.0f} ms for {n_total} frames -> {tpu_fps:.1f} fps")

    # p50 seek-to-frame latency: last frame of a GOP from one clip
    # (fixed span shape = one compile; the cache covers later runs)
    lat = []
    for k in range(5):
        single = ClipBatchDecoder([paths[k % N_CLIPS]])
        row = GOP - 1
        t0 = time.time()
        fr, _ = single.decode([[row]])
        device_sync()
        lat.append(time.time() - t0)
        single.close()
    lat.sort()
    log(f"p50 seek-to-frame latency (GOP-tail frame): "
        f"{lat[len(lat)//2]*1e3:.0f} ms")

    # FFmpeg single-core baseline on the same gather (best of 3 — the
    # host CPU timing is as noisy as the relay)
    ff_time = float("inf")
    for _ in range(3):
        t0 = time.time()
        for p, r in zip(paths, rows):
            with Decoder(p, num_devices=1) as d:
                d.retrieve(r)
        ff_time = min(ff_time, time.time() - t0)
    ff_fps = n_total / ff_time
    log(f"ffmpeg 1-thread: {ff_time*1e3:.0f} ms -> {ff_fps:.1f} fps")

    result = {
        "metric": f"frames/sec/chip {MODE} gather {N_CLIPS}x{len(rows[0])} "
                  f"@{W}x{H} h264 -> 224px RGB in HBM",
        "value": round(tpu_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(tpu_fps / ff_fps, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
