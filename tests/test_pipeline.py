"""Batched multi-clip pipeline (ClipBatchDecoder) on CPU-jax.

Covers the dataloader front door: span planning, threaded entropy decode
with per-clip parameter sets, bucketed batched device decode, fused
selection, and the row mapping.
"""

import numpy as np
import pytest

from hwang_tpu import Decoder, VideoDecoderType
from hwang_tpu.pipeline import ClipBatchDecoder
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all


def test_pipeline_mixed_clip_settings(tmp_path):
    """Clips of equal geometry but DIFFERENT encoder settings (CAVLC vs
    CABAC, weighted vs not) in one batch: each must decode against its
    own SPS/PPS (regression: clip 0's avcC was used for every clip)."""
    specs = [
        ("a", "baseline", "weightp=0:ref=1"),
        ("b", "main", "weightp=0:ref=2:bframes=0"),
        ("c", "main", "weightp=2:ref=2:bframes=0:subme=7"),
    ]
    paths = []
    for name, prof, opts in specs:
        p = str(tmp_path / f"{name}.mp4")
        encode_video(p, 8, 64, 48, profile=prof, gop_size=8, crf=24, seed=7,
                     extra_opts=f"keyint=8:min-keyint=8:no-scenecut=1:{opts}")
        paths.append(p)
    rows = [[0, 3], [1, 7], [2, 5]]
    dec = ClipBatchDecoder(paths, io_threads=3)
    frames, mapping = dec.decode(rows, output="yuv")
    frames = np.asarray(frames)
    dec.close()
    assert mapping == [(c, r) for c, rr in enumerate(rows) for r in rr]
    k = 0
    for p, rr in zip(paths, rows):
        oracle = oracle_decode_all(p, fmt="yuv")
        for r in rr:
            oy, ou, ov = oracle[r]
            want = np.concatenate(
                [oy.reshape(-1), ou.reshape(-1), ov.reshape(-1)]
            )
            assert np.array_equal(frames[k], want), f"{p} frame {r}"
            k += 1

def test_entropy_skip_nonref_bit_exact(tmp_path, monkeypatch):
    """Entropy-level skip of non-referenced, unrequested frames
    (HWANG_SKIP_NONREF): a sparse gather over a B-frame stream must stay
    bit-exact vs the oracle — skipped B frames' SoA slots are never
    read, and requested/reference frames decode identically."""
    monkeypatch.setenv("HWANG_ROUTER", "off")  # force the device pipeline
    p = str(tmp_path / "b.mp4")
    encode_video(p, 32, 64, 48, profile="main", gop_size=16, crf=24, seed=5,
                 b_frames=2,
                 extra_opts="keyint=16:min-keyint=16:no-scenecut=1:ref=2")
    rows = [[3, 9, 21, 30]]  # hits B and P display positions, both GOPs

    monkeypatch.setenv("HWANG_SKIP_NONREF", "1")
    dec = ClipBatchDecoder([p])
    frames, mapping = dec.decode(rows, output="yuv")
    frames = np.asarray(frames)
    dec.close()

    oracle = oracle_decode_all(p, fmt="yuv")
    for k, (c, r) in enumerate(mapping):
        oy, ou, ov = oracle[r]
        want = np.concatenate(
            [oy.reshape(-1), ou.reshape(-1), ov.reshape(-1)]
        )
        assert np.array_equal(frames[k], want), f"frame {r}"


def test_entropy_skip_unit():
    """decode_gop(wanted_disp=...): requested/reference frames match the
    full decode exactly; skippable frames are skipped and stay zero."""
    import os

    from hwang_tpu import index_video
    from hwang_tpu.intervals import slice_into_video_intervals
    from hwang_tpu.models.h264.entropy import H264EntropyDecoder
    from hwang_tpu.utils.fixtures import fixture

    p = fixture("skiptest_bframes", 48, 192, 144, profile="main",
                gop_size=16, crf=24, seed=3, b_frames=2,
                extra_opts="keyint=16:min-keyint=16:no-scenecut=1:ref=2")
    with open(p, "rb") as f:
        idx = index_video(f)
    ivs = slice_into_video_intervals(idx, [5, 14])
    (s, e), valid = ivs.sample_index_intervals[0], ivs.valid_frames[0]
    with open(p, "rb") as f:
        f.seek(idx.sample_offsets[s])
        nb = (idx.sample_offsets[e - 1] + idx.sample_sizes[e - 1]
              - idx.sample_offsets[s])
        data = f.read(nb)
    offs = [o - idx.sample_offsets[s] for o in idx.sample_offsets[s:e]]
    sizes = list(idx.sample_sizes[s:e])

    t_full = H264EntropyDecoder(idx.metadata_bytes).decode_gop(
        data, offs, sizes)
    want = np.zeros(len(offs), np.uint8)
    for r in valid:
        want[r - s] = 1
    t_skip = H264EntropyDecoder(idx.metadata_bytes).decode_gop(
        data, offs, sizes, wanted_disp=want)

    assert np.array_equal(t_full.poc, t_skip.poc)
    perm = np.argsort(t_full.poc, kind="stable")
    needed = {int(perm[r - s]) for r in valid} | {
        i for i in range(len(offs)) if t_full.frame_is_ref[i]
    }
    skipped = [i for i in range(len(offs)) if i not in needed]
    assert skipped, "fixture must contain skippable non-ref B frames"
    for i in sorted(needed):
        assert np.array_equal(t_full.mv[i], t_skip.mv[i])
        assert np.array_equal(t_full.luma_ac[i], t_skip.luma_ac[i])
        assert np.array_equal(t_full.mb_kind[i], t_skip.mb_kind[i])
    for i in skipped:
        # skipped frames' AC buffers are np.empty garbage BY DESIGN —
        # the read contract is nnz/mb_kind gating, which must stay zero
        assert not t_skip.mb_kind[i].any()
        assert not t_skip.nnz[i].any()


def test_yuv_numpy_mirrors_match_jax():
    """The host route's numpy epilogue mirrors must be bit-identical to
    the device epilogue (same exact-integer BT.601 / fixed-point resize)."""
    import jax.numpy as jnp

    from hwang_tpu.ops.yuv import (
        resize_bilinear_rgb,
        resize_bilinear_rgb_np,
        yuv420_to_rgb,
        yuv420_to_rgb_np,
    )

    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (48, 64), np.uint8)
    u = rng.integers(0, 256, (24, 32), np.uint8)
    v = rng.integers(0, 256, (24, 32), np.uint8)
    rj = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u),
                                  jnp.asarray(v)))
    rn = yuv420_to_rgb_np(y, u, v)
    assert np.array_equal(rj, rn)
    zj = np.asarray(resize_bilinear_rgb(jnp.asarray(rn), 20, 28))
    zn = resize_bilinear_rgb_np(rn, 20, 28)
    assert np.array_equal(zj, zn)


@pytest.mark.parametrize("output,resize", [("rgb", None), ("rgb", (24, 32)),
                                           ("yuv", None)])
def test_latency_router_bit_identical(tmp_path, monkeypatch, output, resize):
    """Small (seek-class) requests route to the host decoder; the routed
    output must be bit-identical to the device pipeline's, same mapping."""
    p = str(tmp_path / "seek.mp4")
    encode_video(p, 16, 64, 48, profile="main", gop_size=8, crf=24, seed=11,
                 extra_opts="keyint=8:min-keyint=8:no-scenecut=1:bframes=2")
    rows = [[7, 12]]

    monkeypatch.setenv("HWANG_ROUTER", "off")
    dec = ClipBatchDecoder([p])
    dev_frames, dev_map = dec.decode(rows, out_size=resize, output=output,
                                     to_host=True)
    dec.close()

    monkeypatch.setenv("HWANG_ROUTER", "auto")
    dec = ClipBatchDecoder([p])
    host_frames, host_map = dec.decode(rows, out_size=resize, output=output,
                                       to_host=True)
    dec.close()
    assert host_map == dev_map
    assert np.array_equal(np.asarray(dev_frames), np.asarray(host_frames))


def test_latency_router_threshold(tmp_path, monkeypatch):
    """Requests above HWANG_ROUTE_HOST_MAX decoded frames stay on the
    device pipeline (profiler shows no host_route span)."""
    from hwang_tpu.utils.profiler import Profiler

    p = str(tmp_path / "thresh.mp4")
    encode_video(p, 16, 64, 48, gop_size=8, crf=24, seed=5,
                 extra_opts="keyint=8:min-keyint=8:no-scenecut=1")
    monkeypatch.setenv("HWANG_ROUTER", "auto")
    monkeypatch.setenv("HWANG_ROUTE_HOST_MAX", "4")
    prof = Profiler()
    dec = ClipBatchDecoder([p], profiler=prof)
    dec.decode([[0, 15]], output="yuv", to_host=True)   # 16 decode frames
    dec.close()
    assert "host_route" not in prof.report()


def test_plan_chunk_sizes():
    """Chunk planner invariants: every span gets a slot, sizes are
    powers of two (times the mesh multiple), padding is bounded, and
    the bench's 64-span bucket no longer rounds its 44-span tail up to
    a full 64-slot chunk (24% wasted device decode)."""
    from hwang_tpu.pipeline import plan_chunk_sizes

    def check(n, max_b, n_dev=1, ramp=True):
        sizes = plan_chunk_sizes(n, max_b, n_dev, ramp)
        assert sum(sizes) >= n
        for s in sizes:
            assert s <= max(max_b, n_dev)
            assert s % n_dev == 0
            # per-device share is a power of two (pow2 meshes; each
            # size compiles once, so this must be a real assertion)
            per_dev = s // n_dev
            assert per_dev & (per_dev - 1) == 0, (s, n_dev)
        return sizes

    # the config-4 bench bucket: 64 spans, max_b=64
    sizes = check(64, 64)
    assert sum(sizes) == 64, sizes          # exact cover, zero padding
    assert sizes[0] < max(sizes)            # still ramps up
    # distinct sizes bounded by the ladder: each is a remote compile
    assert set(sizes) <= {4, 16, 64}, sizes

    assert check(4, 64) == [4]              # small request: one chunk
    assert sum(check(5, 64)) == 8
    assert sum(check(100, 64)) == 100       # 4+16+64+16
    assert sum(check(44, 64)) == 44

    # mesh multiples: every chunk divides an 8-device mesh
    for s in check(20, 64, n_dev=8):
        assert s % 8 == 0

    # no-ramp path: evenly sized power-of-two chunks
    sizes = plan_chunk_sizes(100, 32, 1, ramp=False)
    assert all(s == sizes[0] for s in sizes)
    assert sum(sizes) >= 100

    # no-ramp + mesh rounding must never emit an empty trailing chunk:
    # bpad can round above n (n=5 spans, 8-device mesh -> one 8-slot
    # chunk, NOT two); the caller slices idxs[pos:pos+sz] per chunk
    sizes = plan_chunk_sizes(5, 4, n_dev=8, ramp=False)
    pos = 0
    for s in sizes:
        assert pos < 5, (sizes, "empty chunk")
        pos += s

    # padding never exceeds the minimum chunk size, and the ladder
    # bounds distinct sizes (= distinct compiled executables) to 3
    for n in range(1, 200):
        sizes = plan_chunk_sizes(n, 64)
        assert sum(sizes) - n < max(4, 8), (n, sizes)
        assert len(set(sizes)) <= 3, (n, sizes)
