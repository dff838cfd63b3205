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


def decode_gop_batch_sharded(batch: GopArrays, mesh: Mesh, mb_w: int,
                             mb_h: int, chroma_qp_offset: int,
                             n_refs: int = 4):
    """Decode a clip batch sharded over `mesh`; B must divide evenly."""
    return _sharded_decoder(mesh, mb_w, mb_h, chroma_qp_offset, n_refs)(
        shard_batch(batch, mesh)
    )
