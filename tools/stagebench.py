"""Direct per-stage device timings for the batched H.264 decoder.

The bench's cumulative-ablation budget (bench.py, HWANG_BENCH_BUDGET=1)
attributes deblock/intra/MC reliably because those modes skip whole
stage calls; finer zero-the-outputs ablations measured wildly wrong
(XLA constant-collapse pathologies), so the remaining "base" is broken
down here instead: each stage runs as its OWN jit over bench-shaped
inputs and is timed with the dependent-fetch sync (the relay backend's
`block_until_ready` does not synchronize — see CLAUDE.md).

Numbers are per bench run (64 clips x 16 frames @640x368 by default,
i.e. results x(1024/(B*F)) vs the jit's B*F frames).  Isolated-jit
times exclude cross-stage fusion, so stages can sum to more than the
full pipeline: treat them as upper bounds that rank the targets.

Run: python tools/stagebench.py  (from the repo root, TPU attached)
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

import jax
import jax.numpy as jnp
import numpy as np


def sync():
    np.asarray(jnp.zeros(2) + 1)


def timeit(name, fn, *args, iters=4, scale=1.0):
    fn(*args)
    sync()
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        fn(*args)
        sync()
        best = min(best, time.time() - t0)
    print(f"  {name:34s} {best*1e3*scale:8.1f} ms/benchrun"
          f"  ({best*1e3:7.1f} ms/jit)", flush=True)
    return best * scale


def main():
    B = int(os.environ.get("SB_B", 32))
    F = int(os.environ.get("SB_F", 16))
    W = int(os.environ.get("SB_W", 640))
    H = int(os.environ.get("SB_H", 368))
    R = 4
    mb_w, mb_h = W // 16, H // 16
    M = mb_w * mb_h
    total_frames = int(os.environ.get("SB_TOTAL", 1024))
    scale = total_frames / (B * F)
    m = 8  # _MARGIN
    Hp, Wp = H + 2 * m, W + 2 * m
    Hc, Wc = H // 2, W // 2
    Hcp, Wcp = Hc + 2 * m, Wc + 2 * m
    print(f"devices: {jax.devices()}  B={B} F={F} {W}x{H} "
          f"(x{scale:.1f} -> {total_frames} frames)")

    rng = np.random.default_rng(0)
    from hwang_tpu.ops import mc as ops_mc
    from hwang_tpu.ops.transforms_batched import (
        chroma_residual_b,
        luma_residual_b,
    )
    from hwang_tpu.ops.yuv import resize_bilinear_rgb, yuv420_to_rgb

    # --- residual transforms (scan over F like the decoder) -------------
    luma_ac = jnp.asarray(
        (rng.random((F, B, M, 16, 16)) < 0.06).astype(np.int32)
        * rng.integers(-30, 30, (F, B, M, 16, 16)).astype(np.int32))
    luma_dc = jnp.asarray(
        rng.integers(-30, 30, (F, B, M, 16)).astype(np.int32))
    chroma_ac = jnp.asarray(
        (rng.random((F, B, M, 2, 4, 16)) < 0.05).astype(np.int32)
        * rng.integers(-20, 20, (F, B, M, 2, 4, 16)).astype(np.int32))
    chroma_dc = jnp.asarray(
        rng.integers(-20, 20, (F, B, M, 2, 4)).astype(np.int32))
    qp = jnp.asarray(rng.integers(20, 36, (F, B, M)).astype(np.int32))
    is_i16 = jnp.asarray(rng.random((F, B, M)) < 0.1)

    @jax.jit
    def resid(luma_ac, luma_dc, chroma_ac, chroma_dc, qp, is_i16):
        def step(c, xs):
            la, ld, ca, cd, q, i16 = xs
            a, blk = luma_residual_b(la, ld, q, i16, intra=i16)
            cres = chroma_residual_b(ca, cd, q, intra=i16)
            return c, (a.sum() + blk.sum() + cres.sum())
        _, s = jax.lax.scan(
            step, 0, (luma_ac, luma_dc, chroma_ac, chroma_dc, qp, is_i16))
        return s.sum()

    timeit("residual transforms", resid, luma_ac, luma_dc, chroma_ac,
           chroma_dc, qp, is_i16, scale=scale)

    # --- subpel planes + pair_words (reference ring prep) ---------------
    Y = jnp.asarray(rng.integers(0, 255, (F, B, H, W)).astype(np.uint8))
    U = jnp.asarray(rng.integers(0, 255, (F, B, Hc, Wc)).astype(np.uint8))
    V = jnp.asarray(rng.integers(0, 255, (F, B, Hc, Wc)).astype(np.uint8))

    @jax.jit
    def subpel(Y, U, V):
        def step(c, xs):
            y, u, v = xs
            p = ops_mc.luma_subpel16_planes(y)
            cp = ops_mc.chroma_pair_planes(u, v)
            pw = ops_mc.pair_words(p.reshape(B, 16 * Hp, Wp)).reshape(
                B, 16, Hp, Wp // 4, 2)
            cw = ops_mc.pair_words(cp.reshape(B, Hcp, Wcp * 2)).reshape(
                B, Hcp, Wcp // 2, 2)
            return c, (pw[..., 0, 0, :].sum(dtype=jnp.uint32)
                       + cw[..., 0, :].sum(dtype=jnp.uint32))
        _, s = jax.lax.scan(step, 0, (Y, U, V))
        return s.sum()

    timeit("subpel planes + pair_words", subpel, Y, U, V, scale=scale)

    # --- ring carry/update (scatter into the scan carry) ----------------
    ring0 = jnp.zeros((B, R, 16, Hp, Wp // 4, 2), jnp.uint32)
    cring0 = jnp.zeros((B, R, Hcp, Wcp // 2, 2), jnp.uint32)
    planes = jnp.asarray(rng.integers(
        0, 2**32, (B, 16, Hp, Wp // 4, 2), np.uint32))
    cplanes = jnp.asarray(rng.integers(
        0, 2**32, (B, Hcp, Wcp // 2, 2), np.uint32))
    slots = jnp.asarray(rng.integers(0, R, (F, B)).astype(np.int32))

    @jax.jit
    def ringupd(ring0, cring0, planes, cplanes, slots):
        bidx = jnp.arange(B)

        def step(carry, slot):
            ry, rc = carry
            ry = ry.at[bidx, slot].set(planes)
            rc = rc.at[bidx, slot].set(cplanes)
            return (ry, rc), slot.sum()
        (ry, rc), _ = jax.lax.scan(step, (ring0, cring0), slots)
        return ry[0, 0, 0, 0, 0] + rc[0, 0, 0, 0]

    timeit("ring update (scan carry)", ringupd, ring0, cring0, planes,
           cplanes, slots, scale=scale)

    # --- MC gathers (paired-word, full-frame group maps) ----------------
    ring = jnp.asarray(rng.integers(
        0, 2**32, (B, R, 16, Hp, Wp // 4, 2), np.uint32))
    cring = jnp.asarray(rng.integers(
        0, 2**32, (B, R, Hcp, Wcp // 2, 2), np.uint32))
    mvx = jnp.asarray(rng.integers(-64, 64, (F, B, H, W // 4), np.int32))
    mvy = jnp.asarray(rng.integers(-64, 64, (F, B, H, W // 4), np.int32))
    slot_g = jnp.asarray(rng.integers(0, R, (F, B, H, W // 4), np.int32))
    cmvx = jnp.asarray(rng.integers(-64, 64, (F, B, Hc, Wc // 2), np.int32))
    cmvy = jnp.asarray(rng.integers(-64, 64, (F, B, Hc, Wc // 2), np.int32))
    cslot = jnp.asarray(rng.integers(0, R, (F, B, Hc, Wc // 2), np.int32))

    @jax.jit
    def mc(ring, cring, mvx, mvy, slot_g, cmvx, cmvy, cslot):
        def step(c, xs):
            mx, my, sl, cx, cy, cs = xs
            py = ops_mc.luma_mc_gather16_paired_b(ring, sl, mx, my)
            puv = ops_mc.chroma_mc_gather_pair_paired_b(cring, cs, cx, cy)
            return c, py.sum() + puv.sum()
        _, s = jax.lax.scan(step, 0, (mvx, mvy, slot_g, cmvx, cmvy, cslot))
        return s.sum()

    timeit("MC gathers (paired)", mc, ring, cring, mvx, mvy, slot_g,
           cmvx, cmvy, cslot, scale=scale)

    # --- intra wavefront (Pallas kernel, per-frame loop like the scan) --
    from hwang_tpu.ops import deblock_pallas as ops_dbp
    from hwang_tpu.ops import intra_pallas as ops_inp
    from hwang_tpu.ops.transforms_batched import chroma_qp_from_luma

    kind = jnp.asarray(
        np.where(rng.random((F, B, M)) < 0.2, 2, 0).astype(np.int32))
    avail = jnp.asarray(np.full((F, B, M), 0x3F, np.int32))
    i4m = jnp.asarray(rng.integers(0, 9, (F, B, M, 16), np.int32))
    i16m = jnp.asarray(rng.integers(0, 4, (F, B, M), np.int32))
    cm = jnp.asarray(rng.integers(0, 4, (F, B, M), np.int32))
    lres = jnp.asarray(rng.integers(-20, 20, (B, M, 16, 16), np.int32))
    lblk = jnp.asarray(rng.integers(-20, 20, (B, M, 16, 16), np.int32))
    cres = jnp.asarray(rng.integers(-20, 20, (B, M, 2, 8, 8), np.int32))

    @jax.jit
    def intra_k(Y, U, V, kind, avail, i4m, i16m, cm, lres, lblk, cres):
        def step(c, xs):
            y, u, v, k, av, i4, i16, cmode = xs
            fr = {"mb_kind": k, "avail": av, "i4_modes": i4,
                  "i16_mode": i16, "chroma_mode": cmode}
            yo, uo, vo = ops_inp.intra_stage_pallas(
                y.astype(jnp.int32), u.astype(jnp.int32),
                v.astype(jnp.int32), fr, mb_w, mb_h, lblk, lres, cres)
            return c, (yo.astype(jnp.uint32).sum()
                       + uo.astype(jnp.uint32).sum()
                       + vo.astype(jnp.uint32).sum())
        _, s = jax.lax.scan(step, 0, (Y, U, V, kind, avail, i4m, i16m, cm))
        return s.sum()

    timeit("intra wavefront (pallas)", intra_k, Y, U, V, kind, avail,
           i4m, i16m, cm, lres, lblk, cres, scale=scale)

    # --- deblock (Pallas kernel, per-frame loop) ------------------------
    qpf = jnp.asarray(rng.integers(20, 36, (F, B, M), np.int32))
    nnz24 = jnp.asarray(
        (rng.random((F, B, M, 24)) < 0.3).astype(np.int32))
    mv16 = jnp.asarray(rng.integers(-64, 64, (F, B, M, 16, 2), np.int32))
    ref4 = jnp.asarray(rng.integers(0, 3, (F, B, M, 4), np.int32))

    @jax.jit
    def deblock_k(Y, U, V, qpf, kind, avail, nnz24, mv16, ref4):
        def step(c, xs):
            y, u, v, q, k, av, nz, mv, rf = xs
            meta = {"qp": q, "kind": k, "idc": jnp.zeros_like(q),
                    "a_off": jnp.zeros_like(q), "b_off": jnp.zeros_like(q),
                    "avail": av, "nnz": nz, "mv": mv, "ref": rf,
                    "mv1": None, "ref1": None}
            yo, uo, vo = ops_dbp.deblock_stage_pallas(
                y.astype(jnp.int32), u.astype(jnp.int32),
                v.astype(jnp.int32), meta, mb_w, mb_h, 0)
            return c, (yo.astype(jnp.uint32).sum()
                       + uo.astype(jnp.uint32).sum()
                       + vo.astype(jnp.uint32).sum())
        _, s = jax.lax.scan(
            step, 0, (Y, U, V, qpf, kind, avail, nnz24, mv16, ref4))
        return s.sum()

    timeit("deblock (pallas)", deblock_k, Y, U, V, qpf, kind, avail,
           nnz24, mv16, ref4, scale=scale)

    # --- epilogue: YUV420 -> RGB -> 224px resize ------------------------
    N = B * F
    Yf = jnp.asarray(rng.integers(0, 255, (N, H, W)).astype(np.uint8))
    Uf = jnp.asarray(rng.integers(0, 255, (N, Hc, Wc)).astype(np.uint8))
    Vf = jnp.asarray(rng.integers(0, 255, (N, Hc, Wc)).astype(np.uint8))

    @jax.jit
    def epilogue(Yf, Uf, Vf):
        rgb = yuv420_to_rgb(Yf, Uf, Vf)
        return resize_bilinear_rgb(rgb, 224, 224)

    timeit("epilogue yuv->rgb->224", epilogue, Yf, Uf, Vf, scale=scale)

    # --- H2D: fused-transport-sized upload ------------------------------
    host = np.zeros(13 * 1024 * 1024, np.uint8)
    nchunks = max(1, total_frames // (B * F))

    def h2d(buf):
        a = jax.device_put(buf)
        a.block_until_ready()
        sync()

    timeit(f"H2D 13MB x{nchunks} (relay)", h2d, host,
           scale=float(nchunks))

    # --- sync floor -----------------------------------------------------
    timeit("sync floor (dependent fetch)", lambda: None, scale=1.0)


if __name__ == "__main__":
    main()
