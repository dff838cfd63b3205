"""Packed host->device transport for entropy-decoder output.

The SoA tensors are hugely redundant next to the bitstream they came from
(dense int32 coefficients are ~400x the H.264 payload).  Uploading them
naively costs both fixed per-transfer latency (dozens of arrays) and
bandwidth.  This module packs a whole clip batch into THREE host buffers:

  u8    [B, F, M, U8_STRIDE]   all small per-MB syntax (kinds, modes,
                               availability, nnz, refidx, qp, offsets)
  i16   [B, F, M, 32] + header per-frame fields  (motion vectors, ref_map)
  coeff sparse stream: values int16 [K], flat positions int32/int64 [K]
        into a unified [B, F, M, 26, 16] coefficient tensor
        (blocks 0-15 luma AC, 16-23 chroma AC, 24 luma DC, 25 chroma DC)

and unpacks on-device into the GopArrays the reconstruction consumes —
one scatter rebuilds the dense coefficients.  Typical transfer volume
drops from ~1 KB/MB (dense int16) to ~120 B/MB + 6-8 B per nonzero
coefficient, i.e. a few x the compressed bitstream size.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .recon import GopArrays

# u8 layout offsets (per MB)
_U8_FIELDS = [
    ("mb_kind", 1, 0),
    ("qp", 1, 0),
    ("i16_mode", 1, 1),      # stored +1
    ("chroma_mode", 1, 1),
    ("deblock_idc", 1, 0),
    ("avail", 1, 0),
    ("alpha_off", 1, 128),   # stored +128
    ("beta_off", 1, 128),
    ("i4_modes", 16, 1),
    ("refidx", 4, 1),
    ("nnzmask", 3, 0),       # 24 per-block nonzero flags, bit-packed
]
U8_STRIDE = sum(n for _, n, _ in _U8_FIELDS)  # 31


class PackedBatch(NamedTuple):
    u8: jnp.ndarray        # [B, F, M, U8_STRIDE] uint8
    mv_base: jnp.ndarray   # [B, F, M, 2] int16 (the MB's first 4x4 MV)
    mv_exc_val: jnp.ndarray  # [Kv, 2] int16 sub-partition MV exceptions
    mv_exc_pos: jnp.ndarray  # [Kv] int32/int64 into [B*F*M*16] (+1 scratch)
    hdr: jnp.ndarray       # [B, F, 36] int16 (frame_type, ref_map,
                           # ref_map_l1, is_ref, ring_slot, bi_explicit)
    coeff_val: jnp.ndarray  # [K] int16
    coeff_pos: jnp.ndarray  # [K] int32/int64 into [B*F*M*26*16] (+1 scratch)
    ipcm: jnp.ndarray | None  # [B, F, M, 384] uint8, only when present
    weights: jnp.ndarray | None  # [B, F, 16, 8] int16 pred weights (identity
                                 # rows on unweighted frames); None when no
                                 # frame in the batch is weighted
    # B-frame transport (None when the batch has no B frames):
    mv1_base: jnp.ndarray | None = None   # [B, F, M, 2] int16
    mv1_exc_val: jnp.ndarray | None = None
    mv1_exc_pos: jnp.ndarray | None = None
    refidx_l1: jnp.ndarray | None = None  # [B, F, M, 4] int8
    bi_w: jnp.ndarray | None = None       # [B, F, 16, 16, 2] int16
    transform8: jnp.ndarray | None = None  # [B, F, M] uint8 (High profile)
    weights_l1: jnp.ndarray | None = None   # [B, F, 16, 8] explicit-B L1
    scaling_w4: jnp.ndarray | None = None   # [B, 6, 16] uint8 weights
    scaling_w8: jnp.ndarray | None = None   # [B, 2, 64]


_COEFF_BLOCKS = 26


def pack_flags(tensors) -> dict:
    """Which optional PackedBatch fields a clip set needs.  Computed over
    the GLOBAL batch when packing per-device shards (pack_gop_batch's
    `force` arg) so every shard has an identical pytree structure."""
    from .recon import explicit_b_frames

    return {
        "ipcm": any((t.mb_kind == 4).any() for t in tensors),
        "weights": any(
            t.weight_flag is not None and t.weight_flag.any()
            for t in tensors
        ),
        "expb": any(explicit_b_frames(t).any() for t in tensors),
        "t8": any(
            t.transform8 is not None and t.transform8.any() for t in tensors
        ),
        "scal": any(
            getattr(t, "scaling_w4", None) is not None for t in tensors
        ),
        "b": any((t.frame_type == 1).any() for t in tensors),
    }


def pack_gop_batch(tensors, pad_frames: int, force: dict | None = None,
                   to_device: bool = True) -> PackedBatch:
    """Pack entropy.GopTensors list (one per clip) for one upload.

    The per-MB syntax, MV base+exception and sparse-coefficient passes
    run natively (hw_h264_pack_clip: one cache-friendly sweep per clip,
    count then fill); the rare per-batch extras (IPCM, pred weights,
    bi-prediction pair tables, scaling matrices) stay in numpy.

    `force` (a pack_flags dict) makes optional fields present even when
    this clip subset doesn't need them — required when packing shards of
    a larger batch.  `to_device=False` keeps buffers in host numpy (the
    sharded path device_puts them with an explicit sharding instead).
    """
    import ctypes

    from ...native import get_lib
    from .entropy import _declare, gopout_view

    B = len(tensors)
    F = pad_frames
    M = tensors[0].mb_width * tensors[0].mb_height
    lib = get_lib()
    _declare(lib)
    force = force or {}

    u8 = np.zeros((B, F, M, U8_STRIDE), np.uint8)
    hdr = np.zeros((B, F, 36), np.int16)
    hdr[:, :, 17:33] = -1
    hdr[:, :, 34] = -1
    any_ipcm = force.get("ipcm", False) or any(
        (t.mb_kind == 4).any() for t in tensors
    )
    ipcm = (
        np.zeros((B, F, M, 384), np.uint8) if any_ipcm else None
    )
    any_weights = force.get("weights", False) or any(
        t.weight_flag is not None and t.weight_flag.any() for t in tensors
    )
    weights = None
    if any_weights:
        from .recon import _IDENTITY_WEIGHT, weights_or_identity

        weights = np.broadcast_to(
            _IDENTITY_WEIGHT, (B, F, 16, 8)
        ).copy()
    from .recon import explicit_b_frames, weights_l1_or_identity

    any_expb = force.get("expb", False) or any(
        explicit_b_frames(t).any() for t in tensors
    )
    weights_l1 = None
    if any_expb:
        from .recon import _IDENTITY_WEIGHT

        weights_l1 = np.broadcast_to(
            _IDENTITY_WEIGHT, (B, F, 16, 8)
        ).copy()
    any_t8 = force.get("t8", False) or any(
        t.transform8 is not None and t.transform8.any() for t in tensors
    )
    any_scal = force.get("scal", False) or any(
        getattr(t, "scaling_w4", None) is not None for t in tensors
    )
    sw4 = sw8 = None
    if any_scal:
        sw4 = np.full((B, 6, 16), 16, np.uint8)
        sw8 = np.full((B, 2, 64), 16, np.uint8)
        for b, t in enumerate(tensors):
            if getattr(t, "scaling_w4", None) is not None:
                sw4[b] = t.scaling_w4
                sw8[b] = t.scaling_w8
    t8 = np.zeros((B, F, M), np.uint8) if any_t8 else None
    any_b = force.get("b", False) or any(
        (t.frame_type == 1).any() for t in tensors
    )
    ridx1 = bi_w = None
    if any_b:
        from .recon import bipred_pair_weights

        ridx1 = np.full((B, F, M, 4), -1, np.int8)
        bi_w = np.full((B, F, 16, 16, 2), 32, np.int16)

    views = [gopout_view(t) for t in tensors]

    def c_pack(b, bufs, counts_out):
        """One native pass over clip b; bufs None => count mode."""
        t = tensors[b]
        if bufs is None:
            u8p = mvbp = mv1bp = None
            cp = cv = mp = mvv = m1p = m1v = None
            ccap = mcap = m1cap = 0
        else:
            (u8p, mvbp, mv1bp, cp, cv, ccap, mp, mvv, mcap,
             m1p, m1v, m1cap) = bufs
        r = lib.hw_h264_pack_clip(
            ctypes.byref(views[b]), t.n_frames, M, F,
            u8p, mvbp, mv1bp,
            cp, cv, ccap, b * F * M * _COEFF_BLOCKS * 16,
            mp, mvv, mcap, b * F * M * 16,
            m1p, m1v, m1cap, b * F * M * 16,
            counts_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if r != 0:
            raise RuntimeError("hw_h264_pack_clip overflow")

    counts = np.zeros((B, 3), np.int64)
    for b in range(B):
        c_pack(b, None, counts[b])
    coff = np.concatenate(([0], np.cumsum(counts[:, 0])))
    moff = np.concatenate(([0], np.cumsum(counts[:, 1])))
    m1off = np.concatenate(([0], np.cumsum(counts[:, 2])))

    base = np.zeros((B, F, M, 2), np.int16)
    pos = np.zeros(int(coff[-1]), np.int64)
    vals = np.zeros(int(coff[-1]), np.int16)
    mpos = np.zeros(int(moff[-1]), np.int64)
    mvals = np.zeros((int(moff[-1]), 2), np.int16)
    base1 = np.zeros((B, F, M, 2), np.int16) if any_b else None
    m1pos_a = np.zeros(int(m1off[-1]), np.int64)
    m1vals = np.zeros((int(m1off[-1]), 2), np.int16)

    def p64(a, off=0):
        return ctypes.cast(
            ctypes.c_void_p(int(a.ctypes.data) + int(off) * 8),
            ctypes.POINTER(ctypes.c_int64),
        )

    def p16(a, off=0):
        return ctypes.cast(
            ctypes.c_void_p(int(a.ctypes.data) + int(off) * 2),
            ctypes.POINTER(ctypes.c_int16),
        )

    def pu8(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    counts2 = np.zeros((B, 3), np.int64)
    for b in range(B):
        c_pack(b, (
            pu8(u8[b]), p16(base, b * F * M * 2),
            p16(base1, b * F * M * 2) if any_b else None,
            p64(pos, coff[b]), p16(vals, coff[b]), int(counts[b, 0]),
            p64(mpos, moff[b]), p16(mvals, 2 * moff[b]), int(counts[b, 1]),
            p64(m1pos_a, m1off[b]), p16(m1vals, 2 * m1off[b]),
            int(counts[b, 2]),
        ), counts2[b])

    for b, t in enumerate(tensors):
        n = t.n_frames
        hdr[b, :n, 0] = t.frame_type
        hdr[b, :n, 1:17] = np.clip(t.ref_map, -1, 32766)
        hdr[b, :n, 17:33] = np.clip(t.ref_map_l1, -1, 32766)
        hdr[b, :n, 33] = (
            t.frame_is_ref if t.frame_is_ref is not None else 1
        )
        if t.ring_slot is not None:
            hdr[b, :n, 34] = t.ring_slot
        if any_expb:
            hdr[b, :n, 35] = explicit_b_frames(t)
            weights_l1[b, :n] = weights_l1_or_identity(t)
        if any_b:
            ridx1[b, :n] = t.refidx_l1
            bi_w[b, :n] = bipred_pair_weights(t)
        if any_t8:
            t8[b, :n] = t.transform8
        if any_ipcm:
            ipcm[b, :n] = t.ipcm
        if any_weights:
            weights[b, :n] = weights_or_identity(t)

    def sparse_pad(pos, vals, total, min_bucket=1024):
        k = len(pos)
        kpad = max(min_bucket, 1 << int(np.ceil(np.log2(max(k, 1)))))
        pos_dtype = np.int32 if total < 2**31 else np.int64
        pos_p = np.full(kpad, total, pos_dtype)
        pos_p[:k] = pos.astype(pos_dtype)
        if vals.ndim == 1:
            val_p = np.zeros(kpad, vals.dtype)
        else:
            val_p = np.zeros((kpad,) + vals.shape[1:], vals.dtype)
        val_p[:k] = vals
        return pos_p, val_p

    total_coeff = B * F * M * _COEFF_BLOCKS * 16
    pos_p, val_p = sparse_pad(pos, vals, total_coeff)
    total_mv = B * F * M * 16
    mpos_p, mval_p = sparse_pad(mpos, mvals, total_mv, min_bucket=256)
    if any_b:
        mpos1_p, mval1_p = sparse_pad(m1pos_a, m1vals, total_mv,
                                      min_bucket=256)

    # honor to_device: the fused/sharded transports keep buffers in
    # host numpy and upload once with their own placement
    conv = jnp.asarray if to_device else (lambda a: a)
    return PackedBatch(
        u8=conv(u8),
        mv_base=conv(base),
        mv_exc_val=conv(mval_p),
        mv_exc_pos=conv(mpos_p),
        hdr=conv(hdr),
        coeff_val=conv(val_p),
        coeff_pos=conv(pos_p),
        ipcm=conv(ipcm) if any_ipcm else None,
        weights=conv(weights) if any_weights else None,
        **(
            {"weights_l1": conv(weights_l1)} if any_expb else {}
        ),
        **({"transform8": conv(t8)} if any_t8 else {}),
        **(
            {"scaling_w4": conv(sw4), "scaling_w8": conv(sw8)}
            if any_scal
            else {}
        ),
        **(
            {
                "mv1_base": conv(base1),
                "mv1_exc_val": conv(mval1_p),
                "mv1_exc_pos": conv(mpos1_p),
                "refidx_l1": conv(ridx1),
                "bi_w": conv(bi_w),
            }
            if any_b
            else {}
        ),
    )


def fuse_packed(p: PackedBatch):
    """Concatenate every PackedBatch buffer into ONE host uint8 array plus
    a static layout, so a chunk costs a single H2D transfer (the relay —
    and any real PCIe path — charges fixed latency per transfer; a
    PackedBatch is otherwise 7-14 separate arrays).  The layout is
    hashable and passed as a static jit argument; `unfuse_packed` slices
    and bitcasts it back on-device (free under XLA: static offsets).
    """
    bufs: list[np.ndarray] = []
    layout = []
    off = 0
    for name, arr in zip(p._fields, p):
        if arr is None:
            layout.append((name, None, None, None))
            continue
        a = np.ascontiguousarray(np.asarray(arr))
        if a.dtype == np.int64:
            # x64 is disabled on the device side; positions were already
            # range-checked into int32 by sparse_pad
            a = a.astype(np.int32)
        pad = (-off) % 8
        if pad:
            bufs.append(np.zeros(pad, np.uint8))
            off += pad
        b = a.view(np.uint8).reshape(-1)
        layout.append((name, off, a.shape, a.dtype.name))
        bufs.append(b)
        off += b.size
    return np.concatenate(bufs), tuple(layout)


def unfuse_packed(buf: jnp.ndarray, layout) -> PackedBatch:
    """Inverse of fuse_packed, on-device (layout is static)."""
    fields = {}
    for name, off, shape, dtype in layout:
        if off is None:
            fields[name] = None
            continue
        dt = np.dtype(dtype)
        n = int(np.prod(shape)) * dt.itemsize
        seg = buf[off : off + n]
        if dt.itemsize > 1:
            seg = jax.lax.bitcast_convert_type(
                seg.reshape(-1, dt.itemsize), jnp.dtype(dt)
            )
        elif dt != np.uint8:
            # same-width reinterpret (int8: -1 must not become 255)
            seg = jax.lax.bitcast_convert_type(seg, jnp.dtype(dt))
        fields[name] = seg.reshape(shape)
    return PackedBatch(**fields)


def unpack(p: PackedBatch, mb_w: int, mb_h: int) -> GopArrays:
    """Device-side unpack into GopArrays (runs inside the decode jit).

    Arrays stay NARROW (int16) here; the frame scan casts its per-frame
    slices to int32 — keeping full-GOP int32 copies around blows HBM at
    large batch x frame shapes.  `ipcm` stays None when no clip has I_PCM
    macroblocks (the overwhelmingly common case).
    """
    B, F, M, _ = p.u8.shape
    u = p.u8.astype(jnp.int16)
    off = 0
    fields = {}
    for name, width, bias in _U8_FIELDS:
        a = u[..., off : off + width] - bias
        fields[name] = a[..., 0] if width == 1 else a
        off += width

    dense = jnp.zeros(B * F * M * _COEFF_BLOCKS * 16 + 1, jnp.int16)
    dense = dense.at[p.coeff_pos].set(p.coeff_val)
    coeff = dense[:-1].reshape(B, F, M, _COEFF_BLOCKS, 16)

    # rebuild per-4x4 MVs: broadcast base, scatter exceptions
    def mv_unpack(mbase, epos, eval_):
        flat = jnp.broadcast_to(
            mbase[:, :, :, None, :], (B, F, M, 16, 2)
        ).reshape(B * F * M * 16, 2)
        flat = jnp.concatenate([flat, jnp.zeros((1, 2), jnp.int16)])
        flat = flat.at[epos].set(eval_)
        return flat[:-1].reshape(B, F, M, 16, 2)

    mv16 = mv_unpack(p.mv_base, p.mv_exc_pos, p.mv_exc_val)
    mv16_l1 = (
        mv_unpack(p.mv1_base, p.mv1_exc_pos, p.mv1_exc_val)
        if p.mv1_base is not None
        else None
    )

    # unpack the nnz bitmask back to 24 per-block flags (bS only needs
    # the boolean)
    hdr = p.hdr
    nm = fields["nnzmask"].astype(jnp.int32)
    packed_bits = nm[..., 0] | (nm[..., 1] << 8) | (nm[..., 2] << 16)
    nnz24 = ((packed_bits[..., None] >> jnp.arange(24)) & 1).astype(jnp.int16)

    return GopArrays(
        frame_type=hdr[..., 0],
        ref_map=hdr[..., 1:17],
        mb_kind=fields["mb_kind"],
        qp=fields["qp"],
        i4_modes=fields["i4_modes"],
        i16_mode=fields["i16_mode"],
        chroma_mode=fields["chroma_mode"],
        mv=mv16,
        refidx=fields["refidx"],
        luma_dc=coeff[:, :, :, 24],
        luma_ac=coeff[:, :, :, :16],
        chroma_dc=coeff[:, :, :, 25, :8].reshape(B, F, M, 2, 4),
        chroma_ac=coeff[:, :, :, 16:24].reshape(B, F, M, 2, 4, 16),
        nnz=nnz24,
        ring_slot=hdr[..., 34],
        **(
            {
                "weights_l1": p.weights_l1,
                "bi_explicit": hdr[..., 35],
            }
            if p.weights_l1 is not None
            else {}
        ),
        deblock_idc=fields["deblock_idc"],
        alpha_off=fields["alpha_off"],
        beta_off=fields["beta_off"],
        avail=fields["avail"],
        ipcm=p.ipcm,
        n_valid_frames=jnp.zeros((B,), jnp.int32),
        weights=p.weights,
        **(
            {"transform8": p.transform8.astype(jnp.int16)}
            if p.transform8 is not None
            else {}
        ),
        **(
            {
                "scaling_w4": p.scaling_w4.astype(jnp.int16),
                "scaling_w8": p.scaling_w8.astype(jnp.int16),
            }
            if p.scaling_w4 is not None
            else {}
        ),
        **(
            {
                "mv_l1": mv16_l1,
                "refidx_l1": p.refidx_l1.astype(jnp.int16),
                "ref_map_l1": hdr[..., 17:33],
                "is_ref": hdr[..., 33],
                "bi_w": p.bi_w,
            }
            if p.mv1_base is not None
            else {}
        ),
    )
