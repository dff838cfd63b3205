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
    hdr: jnp.ndarray       # [B, F, 34] int16 (frame_type, ref_map,
                           # ref_map_l1, is_ref)
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
    scaling_w4: jnp.ndarray | None = None   # [B, 6, 16] uint8 weights
    scaling_w8: jnp.ndarray | None = None   # [B, 2, 64]


_COEFF_BLOCKS = 26


def pack_gop_batch(tensors, pad_frames: int) -> PackedBatch:
    """Pack entropy.GopTensors list (one per clip) for one upload."""
    B = len(tensors)
    F = pad_frames
    M = tensors[0].mb_width * tensors[0].mb_height

    u8 = np.zeros((B, F, M, U8_STRIDE), np.uint8)
    mv = np.zeros((B, F, M, 16, 2), np.int16)
    hdr = np.zeros((B, F, 34), np.int16)
    hdr[:, :, 17:33] = -1
    # sparse coefficient extraction per source tensor (never materialize
    # the dense [B,F,M,26,16] space on the host — it is ~25x the real
    # data and dominated the pack cost)
    cpos_parts: list = []
    cval_parts: list = []
    any_ipcm = any((t.mb_kind == 4).any() for t in tensors)
    ipcm = (
        np.zeros((B, F, M, 384), np.uint8) if any_ipcm else None
    )
    any_weights = any(
        t.weight_flag is not None and t.weight_flag.any() for t in tensors
    )
    weights = None
    if any_weights:
        from .recon import _IDENTITY_WEIGHT, weights_or_identity

        weights = np.broadcast_to(
            _IDENTITY_WEIGHT, (B, F, 16, 8)
        ).copy()
    any_t8 = any(
        t.transform8 is not None and t.transform8.any() for t in tensors
    )
    any_scal = any(
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
    any_b = any((t.frame_type == 1).any() for t in tensors)
    mv1 = ridx1 = bi_w = None
    if any_b:
        from .recon import bipred_pair_weights

        mv1 = np.zeros((B, F, M, 16, 2), np.int16)
        ridx1 = np.full((B, F, M, 4), -1, np.int8)
        bi_w = np.full((B, F, 16, 16, 2), 32, np.int16)

    for b, t in enumerate(tensors):
        n = t.n_frames
        off = 0
        for name, width, bias in _U8_FIELDS:
            if name == "nnzmask":
                bits = (t.nnz > 0).astype(np.uint32)
                packed = (bits << np.arange(24)[None, None, :]).sum(-1)
                a = np.stack(
                    [packed & 0xFF, (packed >> 8) & 0xFF, packed >> 16], -1
                )
            else:
                a = getattr(t, name).astype(np.int16) + bias
            u8[b, :n, :, off : off + width] = a.reshape(n, M, width)
            off += width
        mv[b, :n] = t.mv
        hdr[b, :n, 0] = t.frame_type
        hdr[b, :n, 1:17] = np.clip(t.ref_map, -1, 32766)
        hdr[b, :n, 17:33] = np.clip(t.ref_map_l1, -1, 32766)
        hdr[b, :n, 33] = (
            t.frame_is_ref if t.frame_is_ref is not None else 1
        )
        if any_b:
            mv1[b, :n] = t.mv_l1
            ridx1[b, :n] = t.refidx_l1
            bi_w[b, :n] = bipred_pair_weights(t)
        if any_t8:
            t8[b, :n] = t.transform8
        # sparse positions into the unified [B,F,M,26,16] coeff space
        mb_stride = _COEFF_BLOCKS * 16
        base_bf = (b * F) * M * mb_stride
        for arr, blk0 in (
            (t.luma_ac.reshape(n, M, 256), 0),
            (t.chroma_ac.reshape(n, M, 128), 16 * 16),
            (t.luma_dc.reshape(n, M, 16), 24 * 16),
            (t.chroma_dc.reshape(n, M, 8), 25 * 16),
        ):
            p = np.flatnonzero(arr)
            if len(p) == 0:
                continue
            w = arr.shape[-1]
            fm, k = p // w, p % w
            cpos_parts.append(base_bf + fm * mb_stride + blk0 + k)
            cval_parts.append(arr.reshape(-1)[p])
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
    if cpos_parts:
        pos = np.concatenate(cpos_parts)
        vals = np.concatenate(cval_parts)
    else:
        pos = np.zeros(0, np.int64)
        vals = np.zeros(0, np.int16)
    pos_p, val_p = sparse_pad(pos, vals, total_coeff)

    # MV transport: per-MB base (first 4x4 block) + sparse exceptions for
    # the blocks of sub-partitioned MBs (most MBs are single-partition)
    def mv_pack(mvarr):
        base = mvarr[:, :, :, 0]                        # [B, F, M, 2]
        diff = (mvarr != base[:, :, :, None]).any(-1)   # [B, F, M, 16]
        mpos = np.flatnonzero(diff.reshape(-1))
        mvals = mvarr.reshape(-1, 2)[mpos]
        return (base,) + sparse_pad(mpos, mvals, diff.size, min_bucket=256)

    base, mpos_p, mval_p = mv_pack(mv)
    if any_b:
        base1, mpos1_p, mval1_p = mv_pack(mv1)

    return PackedBatch(
        u8=jnp.asarray(u8),
        mv_base=jnp.asarray(base),
        mv_exc_val=jnp.asarray(mval_p),
        mv_exc_pos=jnp.asarray(mpos_p),
        hdr=jnp.asarray(hdr),
        coeff_val=jnp.asarray(val_p),
        coeff_pos=jnp.asarray(pos_p),
        ipcm=jnp.asarray(ipcm) if any_ipcm else None,
        weights=jnp.asarray(weights) if any_weights else None,
        **({"transform8": jnp.asarray(t8)} if any_t8 else {}),
        **(
            {"scaling_w4": jnp.asarray(sw4), "scaling_w8": jnp.asarray(sw8)}
            if any_scal
            else {}
        ),
        **(
            {
                "mv1_base": jnp.asarray(base1),
                "mv1_exc_val": jnp.asarray(mval1_p),
                "mv1_exc_pos": jnp.asarray(mpos1_p),
                "refidx_l1": jnp.asarray(ridx1),
                "bi_w": jnp.asarray(bi_w),
            }
            if any_b
            else {}
        ),
    )


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
