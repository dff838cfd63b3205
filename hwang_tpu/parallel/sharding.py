"""Multi-chip scaling: shard the clip batch across a device mesh.

Sparse video decode is embarrassingly parallel across clips/spans (the
reference scaled the same way: one DecoderAutomata per worker,
SURVEY.md §2.3).  The TPU-native form: the natively-batched span decoder
(models/h264/recon_batched.py) runs under `shard_map` over a 1-D "clips"
mesh — each chip decodes its shard of the clip batch with purely local
indexing, so the decode path carries NO collectives; multi-host
deployments shard the video list per host (DCN never sees pixel data).

shard_map (not plain jit-with-sharded-inputs) is load-bearing here: the
decoder's wavefront stages use flattened per-shard gather/scatter indices,
which partition trivially when the program is instantiated per-device but
would defeat XLA's automatic SPMD partitioner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.h264.recon import GopArrays
from ..models.h264.recon_batched import decode_gop_batched_core


def clip_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the clip axis."""
    import numpy as np

    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("clips",))


def shard_batch(batch: GopArrays, mesh: Mesh) -> GopArrays:
    """Place a clip batch with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P("clips"))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


@functools.lru_cache(maxsize=32)
def _sharded_decoder(mesh, mb_w, mb_h, chroma_qp_offset, n_refs):
    fn = functools.partial(
        decode_gop_batched_core,
        mb_w=mb_w, mb_h=mb_h,
        chroma_qp_offset=chroma_qp_offset, n_refs=n_refs,
    )
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("clips"),),
        out_specs=(P("clips"), P("clips"), P("clips")),
        check_vma=False,  # scan carries are created unvarying inside
    )
    return jax.jit(mapped)


def pad_clip_batch(batch: GopArrays, mesh: Mesh) -> tuple[GopArrays, int]:
    """Pad the leading clip axis up to a multiple of the mesh size by
    repeating the last clip.  Returns (padded_batch, original_B); callers
    slice the output back to original_B."""
    D = mesh.devices.size
    B = batch.mb_kind.shape[0]
    pad = (-B) % D
    if pad == 0:
        return batch, B
    padded = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])]
        )
        if a.ndim >= 1 and a.shape[0] == B
        else a,
        batch,
    )
    return padded, B


def decode_gop_batch_sharded(batch: GopArrays, mesh: Mesh, mb_w: int,
                             mb_h: int, chroma_qp_offset: int,
                             n_refs: int = 4):
    """Decode a clip batch sharded over `mesh`.  Batches that don't divide
    the mesh are padded (repeating the last clip) and sliced back."""
    padded, B = pad_clip_batch(batch, mesh)
    out = _sharded_decoder(mesh, mb_w, mb_h, chroma_qp_offset, n_refs)(
        shard_batch(padded, mesh)
    )
    if padded is not batch:
        out = tuple(a[:B] for a in out)
    return out


# ---------------------------------------------------------------------------
# Packed transport, sharded: the production multi-chip path
# ---------------------------------------------------------------------------
#
# The packed host->device transport (models/h264/packed.py) uses FLAT
# scatter positions into the batch's coefficient/MV spaces, which do not
# partition under the auto-SPMD view of a single global PackedBatch.  The
# sharded form therefore packs one PackedBatch PER DEVICE (positions local
# to the shard), stacks them on a leading shard axis, and runs the same
# unpack+decode core under shard_map — each chip scatters/decodes its own
# clips with purely local indexing, still zero collectives.


def pack_gop_batch_sharded(tensors, pad_frames: int, n_shards: int):
    """Pack clips into `n_shards` per-device PackedBatches stacked on a
    leading shard axis (host numpy).  len(tensors) must be a multiple of
    n_shards (pad the clip list by repeating entries first)."""
    import numpy as np

    from ..models.h264.packed import pack_flags, pack_gop_batch

    if len(tensors) % n_shards:
        raise ValueError(
            f"{len(tensors)} clips do not divide {n_shards} shards; pad "
            "the clip list first"
        )
    per = len(tensors) // n_shards
    flags = pack_flags(tensors)  # global, so every shard packs the same
    packs = [
        pack_gop_batch(tensors[i * per : (i + 1) * per], pad_frames,
                       force=flags, to_device=False)
        for i in range(n_shards)
    ]

    # equalize the sparse-stream bucket sizes across shards.  Delta
    # streams (uint16 grammar, packed.py) pad with 0 = "no advance, emit
    # nothing"; absolute-position streams pad with the shard-local
    # scratch index = total (sparse_pad_abs convention); vals pad with 0.
    M = tensors[0].mb_width * tensors[0].mb_height
    F = pad_frames

    def grow(pos_name, val_name, total):
        k = max(getattr(p, pos_name).shape[0] for p in packs)
        for i, p in enumerate(packs):
            pos = getattr(p, pos_name)
            val = getattr(p, val_name) if val_name else None
            if pos.shape[0] == k:
                continue
            n = k - pos.shape[0]
            fill = 0 if pos.dtype in (np.uint16, np.uint8) else total
            pos = np.concatenate([pos, np.full(n, fill, pos.dtype)])
            rep = {pos_name: pos}
            if val is not None:
                rep[val_name] = np.concatenate(
                    [val, np.zeros((n,) + val.shape[1:], val.dtype)]
                )
            packs[i] = p._replace(**rep)

    grow("coeff_tok", None, 0)  # combined tokens: 0 = pad, no val stream
    grow("coeff_big_pos", "coeff_big_val", per * F * M * 26 * 16)
    grow("i4_pos", "i4_val", per * F * M)
    grow("mv_exc_pos", "mv_exc_val", per * F * M * 16)
    grow("db_exc_pos", "db_exc_val", per * F * M)
    grow("avail_exc_pos", "avail_exc_val", per * F * M)
    grow("refidx_exc_pos", "refidx_exc_val", per * F * M)
    grow("mvb_exc_pos", "mvb_exc_val", per * F * M)
    if packs[0].mv1_exc_pos is not None:
        grow("mv1_exc_pos", "mv1_exc_val", per * F * M * 16)
        grow("mvb1_exc_pos", "mvb1_exc_val", per * F * M)

    return jax.tree.map(lambda *xs: np.stack(xs), *packs)


@functools.lru_cache(maxsize=32)
def _sharded_packed_decoder(mesh, mb_w, mb_h, chroma_qp_offset, n_refs):
    from ..models.h264.recon_batched import decode_gop_packed_core

    def local(p):
        # each device sees shard-axis extent 1: drop it, decode, restore
        p1 = jax.tree.map(lambda a: a[0], p)
        Y, U, V = decode_gop_packed_core(
            p1, mb_w, mb_h, chroma_qp_offset, n_refs
        )
        return Y[None], U[None], V[None]

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("clips"),),
        out_specs=(P("clips"), P("clips"), P("clips")),
        check_vma=False,
    )

    def run(p):
        Y, U, V = mapped(p)
        D, Bs = Y.shape[:2]
        merge = lambda a: a.reshape((D * Bs,) + a.shape[2:])
        return merge(Y), merge(U), merge(V)

    return jax.jit(run)


def decode_gop_packed_sharded(stacked, mesh: Mesh, mb_w: int, mb_h: int,
                              chroma_qp_offset: int, n_refs: int = 4):
    """Decode a pack_gop_batch_sharded result over `mesh`.  Returns
    (Y, U, V) with the merged [n_shards * per_shard] clip axis, sharded
    over the mesh."""
    sharding = NamedSharding(mesh, P("clips"))
    batch = jax.tree.map(lambda a: jax.device_put(a, sharding), stacked)
    return _sharded_packed_decoder(
        mesh, mb_w, mb_h, chroma_qp_offset, n_refs
    )(batch)
