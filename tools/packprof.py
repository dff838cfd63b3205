"""Host-side profile of the entropy+pack stages at bench shapes.

Decodes one bench chunk's worth of spans (16 clips x 16 frames @640x368)
through the native entropy decoder, then times pack_gop_batch and
fuse_packed sub-phases.  CPU-only: leaves the TPU free.

Run: python tools/packprof.py
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

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from hwang_tpu import index_video
    from hwang_tpu.intervals import slice_into_video_intervals
    from hwang_tpu.models.h264.entropy import H264EntropyDecoder
    from hwang_tpu.models.h264.packed import fuse_packed, pack_gop_batch
    from hwang_tpu.utils.fixtures import fixture

    n_clips = int(os.environ.get("PP_CLIPS", 16))
    if os.environ.get("PP_1080") == "1":
        # config2 shape: 31-frame 1080p CABAC spans (PP_CLIPS of them,
        # cycled from the single bench fixture's GOPs)
        extra = ("keyint=60:min-keyint=60:no-scenecut=1:ref=2"
                 ":subme=2:me=hex:trellis=0:rc-lookahead=10")
        paths = [fixture("bench_1920x1088_f720_g60_main_0", 720, 1920, 1088,
                         profile="main", gop_size=60, crf=26, seed=0,
                         b_frames=0, extra_opts=extra)] * n_clips
        rows = list(range(31))
    else:
        paths = [
            fixture(f"bench_640x368_f64_g16_baseline_{i}", 64, 640, 368,
                    profile="baseline", gop_size=16, crf=23, seed=i)
            for i in range(n_clips)
        ]
        rows = list(range(16))  # first GOP dense

    work = []
    for p in paths:
        with open(p, "rb") as f:
            idx = index_video(f)
            ivs = slice_into_video_intervals(idx, rows)
            s, e = ivs.sample_index_intervals[0]
            e = min(e, s + len(rows))  # trim to the request (as pipeline)
            f.seek(idx.sample_offsets[s])
            nbytes = (idx.sample_offsets[e - 1] + idx.sample_sizes[e - 1]
                      - idx.sample_offsets[s])
            data = f.read(nbytes)
        offs = [o - idx.sample_offsets[s]
                for o in idx.sample_offsets[s:e]]
        work.append((idx, data, offs, list(idx.sample_sizes[s:e])))

    tensors = []
    t0 = time.time()
    for idx, data, offs, sizes in work:
        dec = H264EntropyDecoder(idx.metadata_bytes)
        tensors.append(dec.decode_gop(data, offs, sizes))
        dec.close()
    t_ent = time.time() - t0
    nf = sum(t.n_frames for t in tensors)
    print(f"entropy: {t_ent*1e3:.0f} ms for {nf} frames "
          f"({t_ent/nf*1e3:.2f} ms/frame)")

    fpad = 32 if os.environ.get("PP_1080") == "1" else 16
    for _ in range(3):
        t0 = time.time()
        batch = pack_gop_batch(tensors, fpad, to_device=False)
        t_pack = time.time() - t0
        t0 = time.time()
        buf, layout = fuse_packed(batch)
        t_fuse = time.time() - t0
    print(f"pack_gop_batch: {t_pack*1e3:.0f} ms   fuse: {t_fuse*1e3:.0f} ms"
          f"   fused bytes: {buf.size/1e6:.1f} MB")

    # sub-phase attribution via a crude re-run with internal timers
    import cProfile
    import pstats

    pr = cProfile.Profile()
    pr.enable()
    batch = pack_gop_batch(tensors, fpad, to_device=False)
    buf, layout = fuse_packed(batch)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(18)


if __name__ == "__main__":
    main()
