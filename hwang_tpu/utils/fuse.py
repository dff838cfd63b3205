"""Generic single-transfer transport for pytrees of host arrays.

The relay to the TPU charges ~0.5 s of fixed latency per transfer; a
decode call that ships a dict of 40 small arrays pays it 40 times.  This
is the generic twin of models/h264/packed.fuse_packed: flatten any
pytree of numpy arrays into ONE uint8 blob + a hashable layout, upload
once, and rebuild the leaves on-device INSIDE the consumer jit.

    blob, layout, treedef = fuse_tree(tree)     # host
    dbuf = jax.device_put(blob)                 # one transfer
    tree = unfuse_tree(dbuf, layout, treedef)   # inside jit

Layout and treedef are hashable — pass them as static jit arguments.

Representation notes (all learned the hard way on this backend):
- Multi-byte dtypes ship as per-byte PLANES (little-endian), rebuilt
  with shifts: any reshape/bitcast whose trailing dim is the itemsize
  (2 or 4) gets lane-padded to 128 on TPU — a 32-64x physical blowup
  that OOM'd compiles on big leaves.
- Large mostly-zero integer leaves (>= sparse_min_bytes, density <=
  sparse_max_density) ship SPARSE as a uint16 delta-position stream
  (packed.delta_encode_pad grammar) + values, rebuilt by one device
  scatter.  The HEVC level-padded prep tensors are ~95% zeros.
- int64/uint64 narrow to 32 bits (x64 is disabled device-side); bool
  ships as uint8 and comes back as bool.  Scalars round-trip with
  their 0-d shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_UNSIGNED = {1: np.uint8, 2: np.uint16, 4: np.uint32}


def fuse_tree(tree, sparse_min_bytes: float = 4e6,
              sparse_max_density: float = 0.25):
    """-> (blob uint8 [N], layout tuple, treedef)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    bufs: list[np.ndarray] = []
    layout = []
    off = 0

    def emit(a):
        nonlocal off
        pad = (-off) % 8
        if pad:
            bufs.append(np.zeros(pad, np.uint8))
            off += pad
        b = np.atleast_1d(np.ascontiguousarray(a)).view(np.uint8)
        b = b.reshape(-1)
        o = off
        bufs.append(b)
        off += b.size
        return o

    def emit_planes(a):
        """Per-byte planes of a contiguous array (little-endian)."""
        it = a.dtype.itemsize
        if it == 1:
            return (emit(a),)
        pb = np.atleast_1d(a).view(np.uint8).reshape(-1, it)
        return tuple(emit(np.ascontiguousarray(pb[:, j]))
                     for j in range(it))

    for leaf in leaves:
        a = np.asarray(leaf)
        orig_bool = a.dtype == np.bool_
        if a.dtype == np.int64:
            a = a.astype(np.int32)
        elif a.dtype == np.uint64:
            a = a.astype(np.uint32)
        elif orig_bool:
            a = a.astype(np.uint8)
        shape = a.shape
        a = np.ascontiguousarray(a)
        name = "bool" if orig_bool else a.dtype.name
        if (a.nbytes >= sparse_min_bytes and a.ndim >= 1
                and a.dtype.kind in "iu"):
            flat = a.reshape(-1)
            nz = np.flatnonzero(flat)
            if len(nz) <= sparse_max_density * flat.size:
                from ..models.h264.packed import delta_encode_pad

                dpos, vals = delta_encode_pad(nz, flat[nz],
                                              min_bucket=256)
                o_pos = emit_planes(dpos)
                o_val = emit_planes(np.ascontiguousarray(vals))
                layout.append(
                    ("sp", shape, name, o_pos, len(dpos), o_val))
                continue
        layout.append(("d", shape, name, emit_planes(a)))
    blob = (np.concatenate(bufs) if bufs else np.zeros(0, np.uint8))
    return blob, tuple(layout), treedef


def _assemble(buf, offs, shape, dtype):
    """Per-byte planes at `offs` -> array of `dtype`/`shape` (device)."""
    dt = np.dtype(dtype)
    n = int(np.prod(shape, dtype=np.int64))
    it = dt.itemsize
    u = np.dtype(_UNSIGNED[it])
    acc = buf[offs[0]:offs[0] + n].astype(u)
    for j in range(1, it):
        acc = acc | (buf[offs[j]:offs[j] + n].astype(u) << (8 * j))
    if dt.kind in ("i", "f"):
        acc = jax.lax.bitcast_convert_type(acc, jnp.dtype(dt))
    elif dt != u:
        acc = acc.astype(jnp.dtype(dt))
    return acc.reshape(shape)


def unfuse_tree(buf: jnp.ndarray, layout, treedef):
    """Device-side inverse (layout/treedef static under jit)."""
    leaves = []
    for ent in layout:
        if ent[0] == "sp":
            _, shape, dtype, o_pos, k, o_val = ent
            from ..models.h264.packed import decode_delta_positions

            dt = np.dtype(dtype)
            total = int(np.prod(shape, dtype=np.int64))
            dpos = _assemble(buf, o_pos, (k,), np.uint16)
            vals = _assemble(buf, o_val, (k,), dt)
            pos = decode_delta_positions(dpos, total)
            dense = jnp.zeros(total + 1, jnp.dtype(dt))
            dense = dense.at[pos].set(vals)
            leaves.append(dense[:-1].reshape(shape))
            continue
        _, shape, dtype, offs = ent
        as_bool = dtype == "bool"
        seg = _assemble(buf, offs, shape,
                        np.dtype("uint8" if as_bool else dtype))
        if as_bool:
            seg = seg.astype(jnp.bool_)
        leaves.append(seg)
    return jax.tree_util.tree_unflatten(treedef, leaves)
