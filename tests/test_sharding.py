"""Multi-chip clip-axis sharding, exercised on the conftest 8-device
virtual CPU mesh (SURVEY.md §2.3: data parallelism = shard_map over a
batch-of-clips axis, no collectives on the decode path).

Contract: sharded decode output is BIT-IDENTICAL to the single-device
batched decode — clip decode is embarrassingly parallel, so the mesh must
be invisible in the pixels.
"""

import ctypes

import numpy as np
import pytest

import jax

from hwang_tpu import index_video
from hwang_tpu.models.h264.entropy import H264EntropyDecoder
from hwang_tpu.native import get_lib
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all


def _mesh(n):
    from hwang_tpu.parallel.sharding import clip_mesh

    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} virtual devices, have {len(devs)}")
    return clip_mesh(n, devices=devs)


@pytest.fixture(scope="module")
def clip_tensors(tmp_path_factory):
    """Four distinct small clips (shared geometry, one with B frames and
    one weighted so the optional PackedBatch fields are live)."""
    d = tmp_path_factory.mktemp("shard")
    specs = [
        ("a", "baseline", 0, "ref=1"),
        ("b", "main", 0, "ref=2:weightp=2:subme=7"),
        ("c", "main", 2, "ref=2:weightp=0"),
        ("d", "baseline", 0, "ref=2"),
    ]
    out = []
    for name, prof, bf, opts in specs:
        p = str(d / f"{name}.mp4")
        encode_video(
            p, 8, 48, 48, profile=prof, gop_size=8, crf=25, b_frames=bf,
            seed=hash(name) % 97,
            extra_opts=f"keyint=8:min-keyint=8:no-scenecut=1:{opts}",
        )
        idx = index_video(p)
        dec = H264EntropyDecoder(idx.metadata_bytes)
        lib = get_lib()
        lib.hw_h264_chroma_qp_offset.restype = ctypes.c_int
        lib.hw_h264_chroma_qp_offset.argtypes = [ctypes.c_void_p]
        cqo = lib.hw_h264_chroma_qp_offset(dec._h)
        dec.set_ring_slots(4)
        t = dec.decode_gop(open(p, "rb").read(), idx.sample_offsets,
                           idx.sample_sizes)
        out.append((p, t, cqo))
    cqos = {c for _, _, c in out}
    assert len(cqos) == 1, "fixture clips must share chroma_qp_offset"
    return out


def test_sharded_equals_unsharded(clip_tensors):
    """decode_gop_batch_sharded == decode_gop_batched, bit-exact, on a
    4-device mesh with B=4 (even division)."""
    from hwang_tpu.models.h264.recon_batched import (
        decode_gop_batched,
        stack_tensors,
    )
    from hwang_tpu.parallel.sharding import decode_gop_batch_sharded

    tensors = [t for _, t, _ in clip_tensors]
    cqo = clip_tensors[0][2]
    mb_w, mb_h = tensors[0].mb_width, tensors[0].mb_height
    g = stack_tensors(tensors, pad_frames=8)
    ref = decode_gop_batched(g, mb_w, mb_h, cqo, 4)
    mesh = _mesh(4)
    got = decode_gop_batch_sharded(g, mesh, mb_w, mb_h, cqo, 4)
    for a, b, plane in zip(got, ref, "YUV"):
        assert np.array_equal(np.asarray(a), np.asarray(b)), plane


def test_sharded_batch_not_dividing_mesh(clip_tensors):
    """B=3 on an 8-device mesh: the batch is padded to the mesh and
    sliced back; output still bit-exact for the 3 real clips."""
    from hwang_tpu.models.h264.recon_batched import (
        decode_gop_batched,
        stack_tensors,
    )
    from hwang_tpu.parallel.sharding import decode_gop_batch_sharded

    tensors = [t for _, t, _ in clip_tensors[:3]]
    cqo = clip_tensors[0][2]
    mb_w, mb_h = tensors[0].mb_width, tensors[0].mb_height
    g = stack_tensors(tensors, pad_frames=8)
    ref = decode_gop_batched(g, mb_w, mb_h, cqo, 4)
    mesh = _mesh(8)
    got = decode_gop_batch_sharded(g, mesh, mb_w, mb_h, cqo, 4)
    assert got[0].shape[0] == 3
    for a, b, plane in zip(got, ref, "YUV"):
        assert np.array_equal(np.asarray(a), np.asarray(b)), plane


def test_packed_sharded_equals_packed(clip_tensors):
    """The production transport: per-shard packed batches under shard_map
    == one global packed batch on one device, bit-exact."""
    from hwang_tpu.models.h264.packed import pack_gop_batch
    from hwang_tpu.models.h264.recon_batched import decode_gop_packed
    from hwang_tpu.parallel.sharding import (
        decode_gop_packed_sharded,
        pack_gop_batch_sharded,
    )

    tensors = [t for _, t, _ in clip_tensors]
    cqo = clip_tensors[0][2]
    mb_w, mb_h = tensors[0].mb_width, tensors[0].mb_height
    ref = decode_gop_packed(pack_gop_batch(tensors, 8), mb_w, mb_h, cqo, 4)
    mesh = _mesh(4)
    stacked = pack_gop_batch_sharded(tensors, 8, 4)
    got = decode_gop_packed_sharded(stacked, mesh, mb_w, mb_h, cqo, 4)
    for a, b, plane in zip(got, ref, "YUV"):
        assert np.array_equal(np.asarray(a), np.asarray(b)), plane


def test_sharded_output_matches_oracle(clip_tensors):
    """Sharded decode against libavcodec directly (not just self-
    consistency): decode-order output reordered by POC must equal the
    oracle's display order."""
    from hwang_tpu.models.h264.recon_batched import stack_tensors
    from hwang_tpu.parallel.sharding import decode_gop_batch_sharded

    tensors = [t for _, t, _ in clip_tensors]
    cqo = clip_tensors[0][2]
    mb_w, mb_h = tensors[0].mb_width, tensors[0].mb_height
    g = stack_tensors(tensors, pad_frames=8)
    mesh = _mesh(4)
    Ys, Us, Vs = decode_gop_batch_sharded(g, mesh, mb_w, mb_h, cqo, 4)
    Ys, Us, Vs = np.asarray(Ys), np.asarray(Us), np.asarray(Vs)
    for b, (p, t, _) in enumerate(clip_tensors):
        oracle = oracle_decode_all(p, fmt="yuv")
        order = np.argsort(t.poc[: t.n_frames], kind="stable")
        for disp in range(t.n_frames):
            f = order[disp]
            oy, ou, ov = oracle[disp]
            assert np.array_equal(Ys[b, f], oy), f"clip {b} frame {disp} Y"
            assert np.array_equal(Us[b, f], ou), f"clip {b} frame {disp} U"
            assert np.array_equal(Vs[b, f], ov), f"clip {b} frame {disp} V"


def test_pipeline_mesh_equivalence(tmp_path):
    """ClipBatchDecoder with mesh routing == without, identical frames
    and index (the batch also doesn't divide the mesh: 3 clips x 8 dev)."""
    from hwang_tpu.pipeline import ClipBatchDecoder

    paths = []
    for i in range(3):
        p = str(tmp_path / f"c{i}.mp4")
        encode_video(p, 8, 48, 48, profile="baseline", gop_size=8, crf=25,
                     seed=i,
                     extra_opts="keyint=8:min-keyint=8:no-scenecut=1:ref=1")
        paths.append(p)
    rows = [[0, 3], [1, 7], [2, 5]]

    dec0 = ClipBatchDecoder(paths, io_threads=1)
    ref, idx0 = dec0.decode(rows, output="yuv")
    dec0.close()

    mesh = _mesh(8)
    dec1 = ClipBatchDecoder(paths, io_threads=1, mesh=mesh)
    assert dec1.mesh is mesh
    got, idx1 = dec1.decode(rows, output="yuv")
    dec1.close()

    assert idx0 == idx1
    assert np.array_equal(np.asarray(ref), np.asarray(got))
