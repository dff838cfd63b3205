"""Generic single-transfer transport for pytrees of host arrays.

The relay to the TPU charges ~0.5 s of fixed latency per transfer; a
decode call that ships a dict of 40 small arrays pays it 40 times.  This
is the generic twin of models/h264/packed.fuse_packed: flatten any
pytree of numpy arrays into ONE uint8 blob + a hashable layout, upload
once, and slice/bitcast it back on-device INSIDE the consumer jit (free
under XLA — static offsets).

    blob, layout, treedef = fuse_tree(tree)     # host
    dbuf = jax.device_put(blob)                 # one transfer
    tree = unfuse_tree(dbuf, layout, treedef)   # inside jit

Layout and treedef are hashable — pass them as static jit arguments.
int64 leaves are narrowed to int32 (x64 is disabled on the device side);
bool leaves ship as uint8 and come back as bool.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fuse_tree(tree, sparse_min_bytes: float = 4e6,
              sparse_max_density: float = 0.25):
    """-> (blob uint8 [N], layout tuple, treedef).  Leaves must be
    numpy-convertible arrays (or scalars).

    Large mostly-zero leaves (>= sparse_min_bytes with nonzero density
    <= sparse_max_density) ship SPARSE: a uint16 delta-position stream
    (packed.delta_encode_pad grammar) + the nonzero values, rebuilt by a
    device scatter in unfuse_tree.  The HEVC prep tensors are
    level-padded ~95% zeros — dense they were 300+ MB per 8-frame span
    through a ~77 MB/s relay."""
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
        b = np.atleast_1d(a).view(np.uint8).reshape(-1)
        o = off
        bufs.append(b)
        off += b.size
        return o

    for leaf in leaves:
        a = np.asarray(leaf)
        orig_bool = a.dtype == np.bool_
        if a.dtype == np.int64:
            a = a.astype(np.int32)
        elif a.dtype == np.uint64:
            a = a.astype(np.uint32)
        elif orig_bool:
            a = a.astype(np.uint8)
        shape = a.shape  # before ascontiguousarray (it promotes 0-d to 1-d)
        a = np.ascontiguousarray(a)
        a = a.reshape(shape)
        name = "bool" if orig_bool else a.dtype.name
        if (a.nbytes >= sparse_min_bytes and a.ndim >= 1
                and a.dtype.kind in "iu"):
            flat = a.reshape(-1)
            nz = np.flatnonzero(flat)
            if len(nz) <= sparse_max_density * flat.size:
                from ..models.h264.packed import delta_encode_pad

                dpos, vals = delta_encode_pad(nz, flat[nz],
                                              min_bucket=256)
                o_pos = emit(dpos)
                o_val = emit(np.ascontiguousarray(vals))
                layout.append(
                    ("sp", a.shape, name, o_pos, len(dpos), o_val))
                continue
        layout.append((emit(a), a.shape, name))
    blob = (np.concatenate(bufs) if bufs
            else np.zeros(0, np.uint8))
    return blob, tuple(layout), treedef


def unfuse_tree(buf: jnp.ndarray, layout, treedef):
    """Device-side inverse (layout/treedef static under jit)."""
    def read(off, shape, dt):
        n = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
        seg = buf[off:off + n]
        if dt.itemsize > 1:
            seg = jax.lax.bitcast_convert_type(
                seg.reshape(tuple(shape) + (dt.itemsize,)),
                jnp.dtype(dt))
        else:
            if dt != np.uint8:
                seg = jax.lax.bitcast_convert_type(seg, jnp.dtype(dt))
            seg = seg.reshape(shape)
        return seg

    leaves = []
    for ent in layout:
        if ent[0] == "sp":
            _, shape, dtype, o_pos, k, o_val = ent
            from ..models.h264.packed import decode_delta_positions

            dt = np.dtype(dtype)
            total = int(np.prod(shape, dtype=np.int64))
            dpos = read(o_pos, (k,), np.dtype(np.uint16))
            vals = read(o_val, (k,), dt)
            pos = decode_delta_positions(dpos, total)
            dense = jnp.zeros(total + 1, jnp.dtype(dt))
            dense = dense.at[pos].set(vals)
            leaves.append(dense[:-1].reshape(shape))
            continue
        off, shape, dtype = ent
        as_bool = dtype == "bool"
        seg = read(off, shape, np.dtype("uint8" if as_bool else dtype))
        if as_bool:
            seg = seg.astype(jnp.bool_)
        leaves.append(seg)
    return jax.tree_util.tree_unflatten(treedef, leaves)
