"""Benchmark: sparse/batched frame-gather throughput on the TPU decode
path vs single-core FFmpeg (the reference's backend).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "extra": {...per-config figures...}}

The headline config mirrors BASELINE.md config 4: a batched ML-dataloader
gather — N clips x K frames each, decoded to RGB on-device.  vs_baseline =
ratio to single-threaded libavcodec decoding the same planned spans on this
host (the FFmpeg-per-core yardstick).  BASELINE configs 2 (stride-30 1080p)
and 3 (shuffled 1080p) run additionally and land in "extra" unless
HWANG_BENCH_FAST=1.

Environment note: this host reaches the TPU through a relay tunnel with
~0.5 s fixed latency per transfer and ~77 MB/s H2D bandwidth (measured) —
orders of magnitude below a real TPU-VM's PCIe/DMA path.  The pipeline
ships entropy-decoder output in a packed sparse form (see
hwang_tpu/models/h264/packed.py) to fit through it.

Env knobs:
  HWANG_BENCH_PRESET    config2|config3|config4|config5 — run ONE BASELINE
                        config as the headline (overrides the knobs below)
  HWANG_BENCH_FAST      1 = headline config only (skip the extra configs)
  HWANG_BENCH_BUDGET    1 = also measure the device stage budget by
                        ablation (recompiles 2 extra executables)
  HWANG_BENCH_W/H       coded size        (default 640x368)
  HWANG_BENCH_CLIPS     batch of clips    (default 64)
  HWANG_BENCH_FRAMES    frames per clip   (default 64)
  HWANG_BENCH_MODE      dense|stride|shuffle (default dense)
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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def device_sync():
    """Reliable device sync: block_until_ready is asynchronous-broken on
    the axon relay backend; a dependent tiny fetch is not."""
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros(2) + 1)


# ---------------------------------------------------------------------------
# Configs.  config4 is the headline (matches BENCH_r01 for comparability);
# configs 2/3 are the BASELINE.md primary 1080p rows, scaled to a 1-minute
# fixture (same mechanics: keyframe seek + partial-GOP decode; a 10-minute
# file only adds more identical spans).  config5 is the 4K-High stretch.
# ---------------------------------------------------------------------------

_CONFIGS = {
    # name: (W, H, clips, frames/clip, mode, count, gop, profile, bframes)
    "config2": (1920, 1088, 1, 720, "stride30", 24, 60, "main", 0),
    "config3": (1920, 1088, 1, 720, "shuffle", 24, 60, "main", 0),
    "config4": (640, 368, 64, 64, "dense", 16, 16, "baseline", 0),
    "config5": (3840, 2160, 1, 60, "stride30", 6, 30, "high", 2),
}


def _knob_config():
    W = int(os.environ.get("HWANG_BENCH_W", 640))
    H = int(os.environ.get("HWANG_BENCH_H", 368))
    n_clips = int(os.environ.get("HWANG_BENCH_CLIPS", 64))
    n_frames = int(os.environ.get("HWANG_BENCH_FRAMES", 64))
    mode = os.environ.get("HWANG_BENCH_MODE", "dense")
    count = int(os.environ.get("HWANG_BENCH_COUNT", 16))
    gop = int(os.environ.get("HWANG_BENCH_GOP", 16))
    return (W, H, n_clips, n_frames, mode, count, gop, "baseline", 0)


def _make_rows(mode, n_frames, count, n_clips, gop):
    import random

    rng = random.Random(1234)
    rows = []
    for c in range(n_clips):
        if mode == "dense":
            rows.append(list(range(count)))
        elif mode in ("stride", "stride30"):
            stride = 30 if mode == "stride30" else max(1, n_frames // count)
            rows.append(list(range(0, min(n_frames, stride * count), stride)))
        elif mode == "shuffle":
            rows.append(sorted(rng.sample(range(n_frames), count)))
        else:
            raise ValueError(mode)
    return rows


def _fixture_paths(cfg, tag):
    from hwang_tpu.utils.fixtures import fixture

    W, H, n_clips, n_frames, mode, count, gop, profile, bframes = cfg
    extra = f"keyint={gop}:min-keyint={gop}:no-scenecut=1:ref=2"
    if W * H >= 1280 * 720:
        # veryfast-class encoder settings: fixture synthesis at HD/4K is
        # otherwise minutes per clip on this 1-core host (one-time, cached)
        extra += ":subme=2:me=hex:trellis=0:rc-lookahead=10"
    del tag  # clip identity is the content parameters (configs 2/3 share)
    return [
        fixture(
            f"bench_{W}x{H}_f{n_frames}_g{gop}_{profile}_{i}", n_frames,
            W, H, profile=profile, gop_size=gop, crf=26, seed=i,
            b_frames=bframes, extra_opts=extra,
        )
        for i in range(n_clips)
    ]


def _ffmpeg_baseline(paths, rows, iters=2):
    """Single-thread libavcodec decoding the same gather (frames/s)."""
    from hwang_tpu import Decoder

    n_total = sum(len(r) for r in rows)
    ff_time = float("inf")
    for _ in range(iters):
        t0 = time.time()
        for p, r in zip(paths, rows):
            with Decoder(p, num_devices=1) as d:
                d.retrieve(r)
        ff_time = min(ff_time, time.time() - t0)
    return n_total / ff_time


def _run_tpu(paths, rows, out_size, iters=4, budget=False):
    """Returns (fps, best_seconds, profiler_report, stage_budget_ms)."""
    from hwang_tpu.pipeline import ClipBatchDecoder
    from hwang_tpu.utils.profiler import Profiler

    n_total = sum(len(r) for r in rows)
    prof = Profiler()
    dec = ClipBatchDecoder(paths, io_threads=16, profiler=prof)
    t0 = time.time()
    _mark(f"warmup decode start ({len(paths)} clips) — first device touch")
    frames, _ = dec.decode(rows, out_size=out_size)
    device_sync()
    log(f"  warmup (incl. compile): {time.time()-t0:.1f}s out {frames.shape}")
    _mark("warmup decode done")

    # the TPU relay adds +/-30% run-to-run noise; take the best of several
    best = float("inf")
    best_totals = {}
    for _ in range(iters):
        prof.reset()
        t0 = time.time()
        frames, _ = dec.decode(rows, out_size=out_size)
        device_sync()
        dt = time.time() - t0
        if dt < best:
            best, best_totals = dt, prof.totals()
    fps = n_total / best
    log(f"  tpu path: {best*1e3:.0f} ms for {n_total} frames"
        f" -> {fps:.1f} fps")
    report = prof.report()

    # host-stage budget from the best iteration's profiler spans — cheap
    # enough to land in EVERY artifact (no ablation recompiles).  Device
    # compute is what remains of wall after the host stages that are NOT
    # overlapped with it (entropy streams underneath device decode, so
    # entropy is informational, not additive).
    stage = {k: round(v * 1e3) for k, v in best_totals.items()}
    stage["wall"] = round(best * 1e3)
    if budget:
        _stage_budget(dec, rows, out_size, best)
    dec.close()
    return fps, best, report, stage


def _stage_budget(dec, rows, out_size, t_full):
    """Device stage attribution by ablation: HWANG_ABLATE skips stages at
    TRACE time, so each setting needs a fresh jit cache (recompile)."""
    from hwang_tpu.models.h264.recon_batched import (
        decode_gop_batched,
        decode_gop_fused,
        decode_gop_packed,
    )

    times = {}
    for ablate in ("nodb", "inter", "nomc"):
        os.environ["HWANG_ABLATE"] = ablate
        decode_gop_packed.clear_cache()
        decode_gop_fused.clear_cache()
        decode_gop_batched.clear_cache()
        dec.decode(rows, out_size=out_size)  # compile
        device_sync()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            dec.decode(rows, out_size=out_size)
            device_sync()
            best = min(best, time.time() - t0)
        times[ablate] = best
    os.environ.pop("HWANG_ABLATE", None)
    decode_gop_packed.clear_cache()
    decode_gop_fused.clear_cache()
    decode_gop_batched.clear_cache()
    log("  stage budget (cumulative ablation, best-of-3; finer per-stage"
        " figures: tools/stagebench.py):")
    log(f"    full            {t_full*1e3:8.0f} ms")
    log(f"    deblock         {(t_full-times['nodb'])*1e3:8.0f} ms")
    log(f"    intra           {(times['nodb']-times['inter'])*1e3:8.0f} ms")
    log(f"    inter MC        {(times['inter']-times['nomc'])*1e3:8.0f} ms")
    log(f"    base (entropy+pack+H2D+residual+ring+epilogue) "
        f"{times['nomc']*1e3:8.0f} ms")


def _p50_seek(paths, gop, k=5, route="host"):
    """p50 seek-to-one-frame latency.  route='host' is the production
    default (seek-class requests are served by the host decoder — the
    relay's ~0.5 s/transfer floor makes any device round trip lose);
    route='device' forces the TPU pipeline (HWANG_ROUTER=off) so the
    artifact reports BOTH paths instead of mislabeling one as the other."""
    from hwang_tpu.pipeline import ClipBatchDecoder

    prev = os.environ.get("HWANG_ROUTER")
    os.environ["HWANG_ROUTER"] = "off" if route == "device" else "auto"
    try:
        lat = []
        for i in range(k):
            single = ClipBatchDecoder([paths[i % len(paths)]])
            row = gop - 1
            t0 = time.time()
            single.decode([[row]])
            device_sync()
            lat.append(time.time() - t0)
            single.close()
        lat.sort()
        return lat[len(lat) // 2] * 1e3
    finally:
        if prev is None:
            os.environ.pop("HWANG_ROUTER", None)
        else:
            os.environ["HWANG_ROUTER"] = prev


def _run_config(name, cfg, out_size, budget=False, iters=4):
    W, H, n_clips, n_frames, mode, count, gop, profile, bframes = cfg
    log(f"[{name}] {n_clips} clips x {count} rows ({mode}) @{W}x{H} "
        f"{profile} gop={gop}")
    t0 = time.time()
    paths = _fixture_paths(cfg, name)
    log(f"  fixtures ready in {time.time()-t0:.1f}s")
    rows = _make_rows(mode, n_frames, count, n_clips, gop)
    fps, best, report, stage = _run_tpu(paths, rows, out_size, iters=iters,
                                        budget=budget)
    if report:
        log("  host stages:\n" + "\n".join(
            "    " + ln for ln in report.splitlines()))
    ff_fps = _ffmpeg_baseline(paths, rows)
    log(f"  ffmpeg 1-thread: {ff_fps:.1f} fps  (ratio {fps/ff_fps:.3f})")
    return {
        "fps": round(fps, 2),
        "vs_ffmpeg_1core": round(fps / ff_fps, 3),
        "stage_budget_ms": stage,
    }


def _seek_metrics(cfg, result):
    """p50 seek for both routes, into result['extra'].  Run LAST: the
    forced-device route can pay a cold executable compile (30-150 s
    through the relay) and must never crowd out the BASELINE configs."""
    paths = _fixture_paths(cfg, "seek")
    gop = cfg[6]
    p50h = _p50_seek(paths, gop, route="host")
    log(f"  p50 seek (host route, production default): {p50h:.0f} ms")
    result["extra"]["p50_seek_host_ms"] = round(p50h)
    p50d = _p50_seek(paths, gop, route="device")
    log(f"  p50 seek (forced device route): {p50d:.0f} ms")
    result["extra"]["p50_seek_device_ms"] = round(p50d)


_RESULT = None  # best JSON-able result so far (for the deadline watchdog)
_STATUS = ["startup"]  # last milestone + its wall time, for the partial emit


def _mark(stage):
    _STATUS[0] = f"{stage} at t+{time.time() - _T_START:.0f}s"
    log(f"  [mark] {_STATUS[0]}")


_T_START = time.time()


def _emit_and_exit(signum=None, frame=None):
    """Deadline watchdog: the driver kills bench runs that overrun, and a
    killed run prints nothing.  Always emit the best result we have.
    When not even the insurance mini-run landed, say WHERE the run was
    stuck (a wedged TPU worker's first touch has been observed to hang
    >30 min) so a zero artifact is diagnosable."""
    del signum, frame
    out = _RESULT or {
        "metric": "bench incomplete (deadline before headline finished; "
                  f"last milestone: {_STATUS[0]})",
        "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
    }
    out.setdefault("extra", {})["partial"] = True
    out["extra"]["last_milestone"] = _STATUS[0]
    print(json.dumps(out), flush=True)
    os._exit(0)


def main():
    global _RESULT
    import signal
    import threading

    # The SIGTERM handler below is the real kill insurance: round 2's
    # driver kill was `timeout`-style (rc=124, SIGTERM) and a handled
    # SIGTERM now emits the best JSON on the way out.  The alarm deadline
    # is therefore a BUDGET for skipping extras, not survival: 540 s was
    # too tight — a wedged-TPU-worker first touch alone has been observed
    # to eat >500 s of recovery, and configs 2+3 at 1080p need ~150 s
    # each warm.  Headline + each extra still prints the moment it lands.
    deadline = int(os.environ.get("HWANG_BENCH_DEADLINE", 1080))
    signal.signal(signal.SIGALRM, _emit_and_exit)
    # the driver wraps the run in `timeout` (SIGTERM first): emit the best
    # result on the way out instead of dying unparsed
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.alarm(deadline)
    # Signal handlers only run when the MAIN thread executes bytecode —
    # observed live: a cold remote compile blocked the main thread in a
    # native relay call for >14 min and the SIGALRM handler never ran
    # (the later SIGTERM got through only because it EINTR'd the call).
    # A daemon-thread watchdog is immune: jax's native waits release the
    # GIL, so this thread can always emit the best JSON and hard-exit.
    # (daemon=True: a plain Timer keeps the interpreter alive in
    # threading._shutdown until the deadline even after main() returns)
    wdt = threading.Timer(deadline + 30, _emit_and_exit)
    wdt.daemon = True
    wdt.start()
    t_start = time.time()

    import jax

    from hwang_tpu.utils.jaxcache import enable as enable_jax_cache

    cpu_mode = os.environ.get("HWANG_BENCH_CPU") == "1"
    if cpu_mode:
        # smoke/CI mode (tests/test_bench_smoke.py): no TPU required
        jax.config.update("jax_platforms", "cpu")

    # the env var is a no-op in this image (sitecustomize imports jax
    # first) — jax.config.update is the only working switch, and a warm
    # committed .jax_cache/ turns 30-150 s relay compiles into <1 s hits
    repo = os.path.dirname(os.path.abspath(__file__))
    log("compile cache: " + enable_jax_cache(
        os.path.join(repo, ".jax_cache_cpu" if cpu_mode else ".jax_cache")))
    log(f"devices: {jax.devices()}")
    _mark("jax initialized (device list ok)")
    budget = os.environ.get("HWANG_BENCH_BUDGET") == "1"
    fast = os.environ.get("HWANG_BENCH_FAST") == "1"
    preset = os.environ.get("HWANG_BENCH_PRESET")

    if preset:
        head_name, head_cfg = preset, _CONFIGS[preset]
        extras = []
    elif "HWANG_BENCH_W" in os.environ or "HWANG_BENCH_MODE" in os.environ \
            or "HWANG_BENCH_CLIPS" in os.environ:
        head_name, head_cfg = "custom", _knob_config()
        extras = []
    else:
        head_name, head_cfg = "config4", _CONFIGS["config4"]
        extras = [] if fast else ["config2", "config3"]

    out_size = (224, 224) if head_name in ("config4", "custom") else None

    # Insurance against a wedged TPU worker: the first device touch of a
    # fresh process has been observed to take anywhere from 4 s to >540 s
    # (relay worker recovery).  Land a REAL nonzero number early with a
    # small batch that reuses the cached size-4 executable, so a deadline
    # hit later still leaves a meaningful parsed artifact.
    if head_name == "config4" and not fast:
        try:
            mini = (640, 368, 8, 64, "dense", 16, 16, "baseline", 0)
            m = _run_config("config4-mini", mini, out_size, iters=2)
            _RESULT = {
                "metric": "frames/sec/chip dense gather 8x16 @640x368 h264"
                          " -> 224px RGB in HBM (mini insurance run)",
                "value": m["fps"], "unit": "frames/s",
                "vs_baseline": m["vs_ffmpeg_1core"],
                "extra": {"mini": True},
            }
            print(json.dumps(_RESULT), flush=True)
        except Exception as e:
            log(f"[config4-mini] FAILED: {type(e).__name__}: {e}")

    head = _run_config(head_name, head_cfg, out_size, budget=budget)

    W, H, n_clips, _, mode, count, gop, profile, _ = head_cfg
    sized = f" -> 224px RGB in HBM" if out_size else " YUV/RGB full-res"
    result = {
        "metric": f"frames/sec/chip {mode} gather {n_clips}x{count} "
                  f"@{W}x{H} h264{sized}",
        "value": head["fps"],
        "unit": "frames/s",
        "vs_baseline": head["vs_ffmpeg_1core"],
        "extra": {
            "stage_budget_ms": head.get("stage_budget_ms"),
        },
    }
    _RESULT = result
    # emit the headline NOW: if the driver kills the run during an extra
    # config, the last JSON line on stdout is still a parsed result
    print(json.dumps(result), flush=True)

    for name in extras:
        # leave >=2 min of the deadline per 1080p extra (fixtures are
        # cached after the first run; compiles are cached in .jax_cache)
        if time.time() - t_start > deadline - 120:
            log(f"[{name}] skipped: deadline budget exhausted")
            result["extra"][name] = {"skipped": "deadline"}
            continue
        try:
            result["extra"][name] = _run_config(name, _CONFIGS[name], None,
                                                iters=3)
            _RESULT = result
            print(json.dumps(result), flush=True)
        except Exception as e:  # an extra config must not sink the headline
            log(f"[{name}] FAILED: {type(e).__name__}: {e}")
            result["extra"][name] = {"error": str(e)[:200]}
            import traceback

            traceback.print_exc(file=sys.stderr)

    # seek latency LAST (secondary metric; device route may cold-compile)
    if time.time() - t_start < deadline - 60:
        try:
            _seek_metrics(head_cfg, result)
        except Exception as e:
            log(f"[seek] FAILED: {type(e).__name__}: {e}")

    _RESULT = result
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the driver needs a JSON line
        import traceback

        traceback.print_exc(file=sys.stderr)
        log(f"bench FAILED: {type(e).__name__}: {e}")
        _emit_and_exit()
