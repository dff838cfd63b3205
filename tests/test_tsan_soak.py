"""ThreadSanitizer soak of the native runtime's threaded surfaces.

SURVEY.md §5: the reference hand-rolled its feeder/retriever threading
with zero sanitizer coverage.  Here the concurrency surface is the
entropy thread pool (per-thread native contexts) plus concurrent
encoder/decoder handles; this test rebuilds the native library with
-fsanitize=thread (separate build tree) and hammers it from many threads
in a subprocess running under libtsan.  Any ThreadSanitizer report fails
the test.

Skipped when libtsan is not installed (it is in this image's gcc).
"""

import os
import subprocess
import sys

import pytest

_SOAK = r"""
import os, threading, concurrent.futures
import jax
jax.config.update("jax_platforms", "cpu")  # never touch the TPU from here
import numpy as np
import hwang_tpu
from hwang_tpu import index_video
from hwang_tpu.models.h264.entropy import H264EntropyDecoder
from hwang_tpu.utils.fixtures import encode_video, synth_frame
from hwang_tpu.encoder import EncodeOptions, encode_clip

base = os.environ["SOAK_DIR"]
paths = []
for i in range(3):
    p = os.path.join(base, f"s{i}.mp4")
    encode_video(p, 10, 64, 48, profile="main", gop_size=5, crf=26, seed=i,
                 extra_opts="keyint=5:min-keyint=5:no-scenecut=1:ref=2")
    paths.append(p)
blobs = []
for p in paths:
    idx = index_video(p)
    blobs.append((idx.metadata_bytes, open(p, "rb").read(),
                  idx.sample_offsets, idx.sample_sizes))

def worker(k):
    # per-thread stateful contexts, as the pipeline uses them
    ex, data, offs, sizes = blobs[k % len(blobs)]
    dec = H264EntropyDecoder(ex)
    dec.set_ring_slots(4)
    for _ in range(4):
        t = dec.decode_gop(data, offs, sizes)
        assert t.n_frames == 10
    # concurrent encoder handles too
    p = os.path.join(base, f"enc{k}.mp4")
    encode_clip(p, [synth_frame(i, 48, 48) for i in range(4)],
                EncodeOptions(quality=30, profile="baseline"))
    return index_video(p).frames()

with concurrent.futures.ThreadPoolExecutor(6) as ex:
    results = list(ex.map(worker, range(12)))
assert results == [4] * 12
print("SOAK_OK")
"""


def _libtsan():
    try:
        out = subprocess.run(
            ["gcc", "-print-file-name=libtsan.so"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return None
    return out if os.path.isabs(out) and os.path.exists(out) else None


@pytest.mark.slow
def test_tsan_threaded_soak(tmp_path):
    tsan = _libtsan()
    if tsan is None:
        pytest.skip("libtsan not available")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # build the instrumented library WITHOUT libtsan preloaded — cmake's
    # own subprocesses hang under the preload
    build_env = dict(os.environ, HWANG_TSAN="1")
    build_env["PYTHONPATH"] = repo + os.pathsep + build_env.get(
        "PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c",
         "from hwang_tpu import native; print(native.build())"],
        env=build_env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    env = dict(os.environ)
    env.update(
        HWANG_TSAN="1",
        LD_PRELOAD=tsan,
        SOAK_DIR=str(tmp_path),
        # halt_on_error=0: collect every report; exitcode asserts below
        TSAN_OPTIONS="exitcode=66 halt_on_error=0",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        [sys.executable, "-c", _SOAK],
        env=env, capture_output=True, text=True, timeout=900,
    )
    out = proc.stdout + proc.stderr
    assert "WARNING: ThreadSanitizer" not in out, out[-4000:]
    assert proc.returncode == 0 and "SOAK_OK" in proc.stdout, out[-4000:]
