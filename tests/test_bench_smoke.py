"""Bench-harness smoke: `python bench.py` must reach its JSON line in
bounded time.  Round 2 shipped a bench that died inside a cold compile
before printing anything (BENCH_r02.json rc=124, parsed=null) — this
guards the artifact contract itself, not performance.

Runs the real bench.py in a subprocess on CPU jax (HWANG_BENCH_CPU=1)
with a tiny workload; asserts the final stdout line parses as the
driver's expected JSON shape.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_json_line():
    env = dict(os.environ)
    env.update(
        HWANG_BENCH_CPU="1",
        HWANG_BENCH_FAST="1",
        HWANG_BENCH_W="128",
        HWANG_BENCH_H="96",
        HWANG_BENCH_CLIPS="2",
        HWANG_BENCH_FRAMES="16",
        HWANG_BENCH_COUNT="4",
        HWANG_BENCH_GOP="8",
        HWANG_BENCH_DEADLINE="420",
    )
    # the subprocess must see the same virtual-device XLA_FLAGS removed:
    # a forced 8-device host platform makes tiny-batch sharding kick in
    env.pop("HWANG_ROUTER", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=480, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert lines, proc.stderr[-2000:]
    out = json.loads(lines[-1])
    assert out["unit"] == "frames/s"
    assert out["value"] > 0, out
    assert "vs_baseline" in out
    # stage budget must land in every artifact (VERDICT r2 item 3)
    assert out["extra"]["stage_budget_ms"]["wall"] > 0, out
