"""Device-only timing of decode_gop_fused at bench chunk shapes.

Packs real bench-fixture entropy output on the host, uploads it ONCE,
then times the decode executable with its input already device-resident
— the true device-compute cost per chunk, no host/H2D/relay mixing.
Also times the H2D upload of the fused buffer separately.

Knobs: DB_B (chunk clips, default 32), DB_F (frames, 16).
Run: python tools/devbench.py  (repo root, TPU attached)
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


def main():
    import jax
    import jax.numpy as jnp

    def sync():
        np.asarray(jnp.zeros(2) + 1)

    from hwang_tpu import index_video
    from hwang_tpu.intervals import slice_into_video_intervals
    from hwang_tpu.models.h264.entropy import H264EntropyDecoder
    from hwang_tpu.models.h264.packed import fuse_packed, pack_gop_batch
    from hwang_tpu.models.h264.recon_batched import decode_gop_fused
    from hwang_tpu.utils.fixtures import fixture

    B = int(os.environ.get("DB_B", 32))
    F = int(os.environ.get("DB_F", 16))
    print(f"devices: {jax.devices()}  chunk B={B} F={F}", flush=True)

    tensors = []
    n_refs = 4
    for i in range(B):
        p = fixture(f"bench_640x368_f64_g16_baseline_{i % 64}", 64, 640, 368,
                    profile="baseline", gop_size=16, crf=23, seed=i % 64)
        with open(p, "rb") as f:
            idx = index_video(f)
            ivs = slice_into_video_intervals(idx, list(range(F)))
            s, e = ivs.sample_index_intervals[0]
            f.seek(idx.sample_offsets[s])
            data = f.read(idx.sample_offsets[e - 1]
                          + idx.sample_sizes[e - 1] - idx.sample_offsets[s])
        offs = [o - idx.sample_offsets[s] for o in idx.sample_offsets[s:e]]
        d = H264EntropyDecoder(idx.metadata_bytes)
        d.set_ring_slots(n_refs)
        tensors.append(d.decode_gop(data, offs, list(idx.sample_sizes[s:e])))
        d.close()
    mb_w, mb_h = 640 // 16, 368 // 16

    t0 = time.time()
    batch = pack_gop_batch(tensors, F, to_device=False)
    buf, layout = fuse_packed(batch)
    print(f"host pack+fuse: {(time.time()-t0)*1e3:.0f} ms, "
          f"{buf.size/1e6:.1f} MB", flush=True)

    # H2D alone
    jax.device_put(buf)
    sync()
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        d = jax.device_put(buf)
        sync()
        best = min(best, time.time() - t0)
        del d
    print(f"H2D fused buffer: {best*1e3:.0f} ms", flush=True)

    dbuf = jax.device_put(buf)
    sync()
    t0 = time.time()
    out = decode_gop_fused(dbuf, layout, mb_w, mb_h, 0, n_refs)
    sync()
    print(f"warmup (incl. compile): {time.time()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        out = decode_gop_fused(dbuf, layout, mb_w, mb_h, 0, n_refs)
        sync()
        best = min(best, time.time() - t0)
    nf = B * F
    print(f"device decode (input resident): {best*1e3:.0f} ms for {nf} "
          f"frame-slots -> {nf/best:.0f} fps device-only "
          f"({best/nf*1e3:.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
