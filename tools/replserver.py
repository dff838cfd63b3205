"""Long-lived TPU experiment host (dev tool).

A fresh process pays minutes of TPU-worker executable (re)loading per
distinct executable even on a warm compile cache (see CLAUDE.md), which
makes one-shot experiment scripts unusably slow.  This server keeps ONE
process (and so one worker session) alive and execs job files in a
shared namespace:

    echo 'print(1+1)' > /tmp/tpu_jobs/j1.py     # queued
    cat /tmp/tpu_jobs/j1.out                    # result (after run)

Jobs run in filename order; each job's stdout/stderr + traceback land in
<job>.out, and the job file is renamed to <job>.done.  `ns` persists
between jobs.  Stop with a job containing `RAW_EXIT = True`.
"""

import contextlib
import os
import sys
import time
import traceback

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

JOBS = os.environ.get("TPU_JOBS_DIR", "/tmp/tpu_jobs")


def main():
    os.makedirs(JOBS, exist_ok=True)
    from hwang_tpu.utils import jaxcache

    print("cache:", jaxcache.enable(os.environ["JAX_COMPILATION_CACHE_DIR"]),
          flush=True)
    ns: dict = {"__name__": "__tpu_repl__"}
    print("ready", flush=True)
    while True:
        jobs = sorted(
            f for f in os.listdir(JOBS)
            if f.endswith(".py") and not f.startswith(".")
        )
        if not jobs:
            time.sleep(0.3)
            continue
        j = jobs[0]
        path = os.path.join(JOBS, j)
        with open(path) as f:
            src = f.read()
        t0 = time.time()
        # stream output live to <job>.live so long jobs are observable;
        # the .out file appears only on completion (pollers key on it)
        with open(path[:-3] + ".live", "w", buffering=1) as buf:
            try:
                with contextlib.redirect_stdout(buf), \
                        contextlib.redirect_stderr(buf):
                    exec(compile(src, j, "exec"), ns)
            except BaseException:
                buf.write(traceback.format_exc())
            buf.write(f"\n[job {j} done in {time.time()-t0:.1f}s]\n")
        os.replace(path[:-3] + ".live", path[:-3] + ".out")
        os.replace(path, path + ".done")
        print(f"ran {j} ({time.time()-t0:.1f}s)", flush=True)
        if ns.get("RAW_EXIT"):
            break


if __name__ == "__main__":
    main()
