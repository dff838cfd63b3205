"""Benchmark: sparse frame gather throughput, TPU decode path vs
single-core FFmpeg (the reference's backend).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

metric: frames/sec/chip on a stride-30 sparse gather (BASELINE.md config
2 shape), batched across clips on the TPU path.  vs_baseline is the ratio
to single-threaded libavcodec decoding the same spans on this host
(FFmpeg-per-core, the BASELINE.md yardstick).

Env knobs:
  HWANG_BENCH_W/H       coded size        (default 640x368)
  HWANG_BENCH_CLIPS     batch of clips    (default 8)
  HWANG_BENCH_FRAMES    frames per clip   (default 120)
  HWANG_BENCH_STRIDE    gather stride     (default 30)
  HWANG_BENCH_GOP       keyframe interval (default 30)
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "HWANG_FIXTURE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".fixtures"),
)

W = int(os.environ.get("HWANG_BENCH_W", 640))
H = int(os.environ.get("HWANG_BENCH_H", 368))
N_CLIPS = int(os.environ.get("HWANG_BENCH_CLIPS", 8))
N_FRAMES = int(os.environ.get("HWANG_BENCH_FRAMES", 120))
STRIDE = int(os.environ.get("HWANG_BENCH_STRIDE", 30))
GOP = int(os.environ.get("HWANG_BENCH_GOP", 30))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import numpy as np

    from hwang_tpu import index_video
    from hwang_tpu.pipeline import ClipBatchDecoder
    from hwang_tpu.utils.fixtures import fixture

    import jax

    log(f"devices: {jax.devices()}")

    # --- fixtures ------------------------------------------------------
    paths = [
        fixture(
            f"bench_{W}x{H}_{i}", N_FRAMES, W, H, profile="baseline",
            gop_size=GOP, crf=26, seed=i,
            extra_opts=f"keyint={GOP}:min-keyint={GOP}:no-scenecut=1:ref=2",
        )
        for i in range(N_CLIPS)
    ]
    rows = [list(range(0, N_FRAMES, STRIDE)) for _ in paths]
    n_frames_total = sum(len(r) for r in rows)

    # --- TPU path ------------------------------------------------------
    dec = ClipBatchDecoder(paths)
    # warmup (compile)
    t0 = time.time()
    frames, _ = dec.decode(rows, output="rgb")
    frames.block_until_ready()
    log(f"warmup (incl. compile): {time.time()-t0:.1f}s")

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        frames, _ = dec.decode(rows, output="rgb")
        frames.block_until_ready()
    tpu_time = (time.time() - t0) / iters
    tpu_fps = n_frames_total / tpu_time
    log(f"tpu path: {tpu_time*1e3:.1f} ms for {n_frames_total} frames "
        f"-> {tpu_fps:.1f} fps")

    # --- FFmpeg single-core baseline (same sparse gather) -------------
    from hwang_tpu import Decoder

    t0 = time.time()
    for p, r in zip(paths, rows):
        with Decoder(p, num_devices=1) as d:  # 1 thread = per-core baseline
            d.retrieve(r)
    ff_time = time.time() - t0
    ff_fps = n_frames_total / ff_time
    log(f"ffmpeg 1-thread: {ff_time*1e3:.1f} ms -> {ff_fps:.1f} fps")

    result = {
        "metric": f"frames/sec/chip sparse stride-{STRIDE} gather "
                  f"{W}x{H} h264 ({N_CLIPS} clips batched)",
        "value": round(tpu_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(tpu_fps / ff_fps, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
