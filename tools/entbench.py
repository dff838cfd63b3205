"""Host entropy-decoder throughput (fps/core), standalone.

Measures the native CAVLC/CABAC entropy decode alone (no pack, no
device) over bench-style fixtures, per GOP span.  CPU-only; this is the
serial front-end that bounds 1080p throughput on a 1-core host.

Run: python tools/entbench.py            # 640x368 CAVLC + 1080p CABAC
     EB_ONLY=1080 python tools/entbench.py
     EB_ONLY=640 python tools/entbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "HWANG_FIXTURE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".fixtures"),
)
os.environ["JAX_PLATFORMS"] = "cpu"


def spans_of(path, rows):
    from hwang_tpu import index_video
    from hwang_tpu.intervals import slice_into_video_intervals

    with open(path, "rb") as f:
        idx = index_video(f)
        ivs = slice_into_video_intervals(idx, rows)
        out = []
        for s, e in ivs.sample_index_intervals:
            f.seek(idx.sample_offsets[s])
            nbytes = (idx.sample_offsets[e - 1] + idx.sample_sizes[e - 1]
                      - idx.sample_offsets[s])
            data = f.read(nbytes)
            offs = [o - idx.sample_offsets[s]
                    for o in idx.sample_offsets[s:e]]
            out.append((data, offs, list(idx.sample_sizes[s:e])))
    return idx, out


def bench(name, path, rows, iters=3):
    from hwang_tpu.models.h264.entropy import H264EntropyDecoder

    idx, spans = spans_of(path, rows)
    best = float("inf")
    nf = 0
    for _ in range(iters):
        t0 = time.time()
        nf = 0
        for data, offs, sizes in spans:
            dec = H264EntropyDecoder(idx.metadata_bytes)
            t = dec.decode_gop(data, offs, sizes)
            nf += t.n_frames
            dec.close()
        best = min(best, time.time() - t0)
    print(f"  {name:42s} {nf:4d} frames  {best*1e3:7.0f} ms"
          f"  {nf/best:8.1f} fps/core", flush=True)


def main():
    from hwang_tpu.utils.fixtures import fixture

    only = os.environ.get("EB_ONLY", "")
    if only in ("", "640"):
        paths = [
            fixture(f"bench_640x368_f64_g16_baseline_{i}", 64, 640, 368,
                    profile="baseline", gop_size=16, crf=26, seed=i,
                    b_frames=0,
                    extra_opts="keyint=16:min-keyint=16:no-scenecut=1:ref=2")
            for i in range(8)
        ]
        t0 = time.time()
        for p in paths:
            bench("640x368 CAVLC dense g16 (64f)", p, list(range(64)),
                  iters=1)
        print(f"  (total {time.time()-t0:.1f}s over {len(paths)} clips)")
    if only in ("", "1080"):
        extra = ("keyint=60:min-keyint=60:no-scenecut=1:ref=2"
                 ":subme=2:me=hex:trellis=0:rc-lookahead=10")
        p = fixture("bench_1920x1088_f720_g60_main_0", 720, 1920, 1088,
                    profile="main", gop_size=60, crf=26, seed=0,
                    b_frames=0, extra_opts=extra)
        # config2 shape: stride-30 over the first GOPs -> 31-frame spans
        rows = list(range(0, 720, 30))[:24]
        bench("1920x1088 CABAC stride-30 spans", p, rows)


if __name__ == "__main__":
    main()
