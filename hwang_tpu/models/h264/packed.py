"""Packed host->device transport for entropy-decoder output.

The SoA tensors are hugely redundant next to the bitstream they came from
(dense int32 coefficients are ~400x the H.264 payload).  Uploading them
naively costs both fixed per-transfer latency (dozens of arrays) and
bandwidth.  This module packs a whole clip batch into THREE host buffers:

  u8    [B, F, M, U8_STRIDE]   all small per-MB syntax (kinds, modes,
                               availability, nnz, refidx, qp, offsets)
  i16   [B, F, M, 32] + header per-frame fields  (motion vectors, ref_map)
  coeff sparse stream: values int8 [K] + uint16 position DELTAS [K]
        into a unified [B, F, M, 26, 16] coefficient tensor
        (blocks 0-15 luma AC, 16-23 chroma AC, 24 luma DC, 25 chroma DC);
        the rare |v|>127 value rides a small absolute side stream

and unpacks on-device into the GopArrays the reconstruction consumes —
a cumsum turns deltas back into positions and one scatter rebuilds the
dense coefficients.  Typical transfer volume drops from ~1 KB/MB (dense
int16) to ~120 B/MB + 3 B per nonzero coefficient, a few x the
compressed bitstream size.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .recon import GopArrays

# u8 layout offsets (per MB).  Fields that are constant per frame in
# practice (deblock idc/offsets) ship in `hdr` with a sparse per-MB
# exception stream; `avail` is geometric for single-slice frames and is
# derived on-device from the MB index (+ exceptions for multi-slice /
# constrained-intra frames); refidx packs to nibbles; i16/chroma modes
# share a byte.  i4 prediction modes are NOT here: most MBs in P/B
# content aren't I4x4, so their 16 bytes ship as a sparse
# per-I4x4-MB row stream (i4_pos/i4_val) instead of half the dense lane.
_U8_FIELDS = [
    ("mb_kind", 1, 0),
    ("qp", 1, 0),
    ("modes", 1, 0),         # (i16_mode+1) | ((chroma_mode+1) << 4)
    ("refnib", 2, 0),        # 4 refidx nibbles, each (refidx+1) clamped 15
    ("nnzmask", 3, 0),       # 24 per-block nonzero flags, bit-packed
]
U8_STRIDE = sum(n for _, n, _ in _U8_FIELDS)  # 8
_HDR_W = 40  # int16 per-frame header lanes (see pack_gop_batch fill)


class PackedBatch(NamedTuple):
    u8: jnp.ndarray        # [B, F, M, U8_STRIDE] uint8
    mv_base: jnp.ndarray   # [B, F, M, 2] int8 raster DELTAS of the MB's
                           # first 4x4 MV (cumsum along M rebuilds;
                           # |delta| > 127 rides mvb_exc as the true delta)
    mv_exc_val: jnp.ndarray  # [Kv, 2] int16 sub-partition MV exceptions
    mv_exc_pos: jnp.ndarray  # [Kv] uint16 position deltas into
                             # [B*F*M*16] (+1 scratch) — see delta grammar
    hdr: jnp.ndarray       # [B, F, 40] int16 (frame_type, ref_map,
                           # ref_map_l1, is_ref, ring_slot, bi_explicit,
                           # deblock_idc, alpha_off, beta_off)
    coeff_tok: jnp.ndarray  # [K] uint16 combined coefficient tokens
                            # (12-bit position delta + 4-bit signed value)
                            # into [B*F*M*26*16] (+1 scratch)
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
    # wide coefficient values (|v| > 127): absolute int32 positions,
    # scattered after the int8 stream so the overwrite wins
    coeff_big_pos: jnp.ndarray | None = None  # [Kb] int32 (+1 scratch)
    coeff_big_val: jnp.ndarray | None = None  # [Kb] int16
    # intra-4x4 prediction modes, one 16-byte row per I4x4 macroblock
    i4_pos: jnp.ndarray | None = None  # [Ki] uint16 deltas into [B*F*M]
    i4_val: jnp.ndarray | None = None  # [Ki, 16] uint8 modes
    # sparse per-MB exceptions against the per-frame/geometric defaults
    # (uint16 position deltas into [B*F*M]); values:
    #   db_exc   [Kd, 3] int8 (deblock_idc, alpha_off, beta_off)
    #   avail_exc [Ka] uint8 (frames with multi-slice / constrained intra)
    #   refidx_exc [Kr, 4] int8 (any refidx > 14 — nibble overflow)
    db_exc_pos: jnp.ndarray | None = None
    db_exc_val: jnp.ndarray | None = None
    avail_exc_pos: jnp.ndarray | None = None
    avail_exc_val: jnp.ndarray | None = None
    refidx_exc_pos: jnp.ndarray | None = None
    refidx_exc_val: jnp.ndarray | None = None
    # mv_base delta overflow exceptions: true int16 deltas at these MBs
    mvb_exc_pos: jnp.ndarray | None = None   # [Km] uint16 deltas, B*F*M
    mvb_exc_val: jnp.ndarray | None = None   # [Km, 2] int16
    mvb1_exc_pos: jnp.ndarray | None = None  # L1 twin (B frames)
    mvb1_exc_val: jnp.ndarray | None = None
    # frame-windowed decode: the window's first span-global frame index,
    # shipped IN the fused blob so window executables need neither a
    # per-offset recompile nor a separate scalar upload (the relay
    # charges fixed latency per transfer)
    f_offset: jnp.ndarray | None = None  # [1] int32


_COEFF_BLOCKS = 26

# ---------------------------------------------------------------------------
# Sparse-stream position coding.  Scatter positions are strictly
# increasing within a stream, so they ship as uint16 DELTAS (2 bytes vs 4
# for absolute int32 — the coefficient stream is the largest single part
# of the upload).  Stream grammar, decoded by `decode_delta_positions`
# inside the jit:
#   delta in [1, 0xFFFE]  advance by delta, emit a value here
#   0xFFFF (escape)       advance by 0xFFFE, emit nothing (bridges gaps
#                         wider than 0xFFFE; repeated as needed)
#   0 (pad)               no advance, emit nothing (bucket padding)
# Positions start at -1, i.e. pos_i = cumsum(advances)_i - 1.
# ---------------------------------------------------------------------------

_ESC = 0xFFFF
_ESC_ADV = 0xFFFE


def bucket_size(n: int, min_bucket: int = 1024) -> int:
    """Smallest of {2^k, 3*2^(k-1)} >= max(n, min_bucket).  Pure pow2
    padding wasted up to 50% of the largest upload streams (41.5%
    measured on the bench coefficient stream); half-step buckets cap the
    waste at 33% for 2x the distinct compile shapes."""
    n = max(int(n), int(min_bucket), 1)
    p = 1 << (n - 1).bit_length()
    mid = 3 * (p >> 2)  # 1.5x the previous power of two
    return mid if mid >= n else p


def delta_encode_pad(pos, vals, min_bucket=1024):
    """Delta-encode sorted positions to the uint16 grammar above, pad to
    a half-step bucket (so stream growth rarely recompiles), and keep
    `vals` aligned (zeros at escape/pad slots).  The encode itself runs
    natively (hw_h264_delta_encode) — the numpy diff/cumsum/scatter
    chain was a top pack_gop_batch cost at 1080p."""
    import ctypes

    from ...native import get_lib
    from .entropy import _declare

    pos = np.ascontiguousarray(pos, np.int64)
    k = len(pos)
    vals = np.ascontiguousarray(vals)
    elem = vals.dtype.itemsize * (
        int(np.prod(vals.shape[1:])) if vals.ndim > 1 else 1
    )
    lib = get_lib()
    _declare(lib)

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def pu8(a):
        return ctypes.cast(ctypes.c_void_p(a.ctypes.data),
                           ctypes.POINTER(ctypes.c_uint8))

    def pu16(a):
        return ctypes.cast(ctypes.c_void_p(a.ctypes.data),
                           ctypes.POINTER(ctypes.c_uint16))

    n = int(lib.hw_h264_delta_encode(p64(pos), k, None, elem,
                                     None, None, 0)) if k else 0
    if n < 0:
        raise ValueError("sparse positions must be strictly increasing")
    kpad = bucket_size(n, min_bucket)
    out = np.zeros(kpad, np.uint16)
    val_p = np.zeros((kpad,) + vals.shape[1:], vals.dtype)
    if k:
        r = lib.hw_h264_delta_encode(
            p64(pos), k, pu8(vals), elem, pu16(out), pu8(val_p), kpad
        )
        if r != n:
            raise RuntimeError("hw_h264_delta_encode overflow")
    return out, val_p


def decode_delta_positions(deltas, total):
    """Device-side inverse: uint16 delta stream -> int32 scatter
    positions, with escape/pad slots redirected to the scratch index
    `total` (the +1 slot every dense target carries)."""
    d = deltas.astype(jnp.int32)
    adv = jnp.where(d == _ESC, _ESC_ADV, d)
    posn = jnp.cumsum(adv) - 1
    emit = (d != _ESC) & (d != 0)
    return jnp.where(emit, posn, total)


# ---------------------------------------------------------------------------
# Combined coefficient tokens.  Quantized residual levels are tiny
# (99.8% in [-8, 7] measured at bench CRF) while their position deltas
# are small (87% <= 255): ONE uint16 token carries both, at 2 B per
# coefficient instead of the 3 B of separate delta+int8 streams.
#   token = (val4 << 12) | gap12
#   gap12 in [1, 0xFFE]   advance by gap12; emit the 4-bit signed value
#                         when val4 != 0 (val4 == 0: position-only token —
#                         the wide value rides the absolute big stream)
#   gap12 == 0xFFF        advance by 0xFFE, emit nothing (escape; val4=0)
#   token == 0            bucket padding (no advance, no emit)
# ---------------------------------------------------------------------------

_CW_ESC = 0xFFF
_CW_ADV = 0xFFE


def coeff_encode_pad(pos, vals, min_bucket=1024):
    """Encode sorted positions + values in [-8, 7] (0 = emit nothing;
    the caller routes wider values to the big side stream) to the
    combined-token grammar, padded to a half-step bucket."""
    pos = np.asarray(pos, np.int64)
    vals = np.asarray(vals, np.int64)
    k = len(pos)
    gap = np.diff(pos, prepend=-1)
    if k and gap.min() < 1:
        raise ValueError("sparse positions must be strictly increasing")
    if k and (vals.min() < -8 or vals.max() > 7):
        raise ValueError("combined tokens carry 4-bit values only")
    esc = (gap - 1) // _CW_ADV
    n_esc = int(esc.sum())
    n = k + n_esc
    kpad = bucket_size(n, min_bucket)
    out = np.zeros(kpad, np.uint16)
    tok = ((vals & 0xF) << 12).astype(np.uint16)
    if n_esc == 0:
        out[:k] = tok | gap.astype(np.uint16)
    else:
        out[:n] = _CW_ESC
        dst = np.arange(k) + np.cumsum(esc)
        out[dst] = tok | (gap - esc * _CW_ADV).astype(np.uint16)
    return out


def coeff_tokens_pad(pos, vals, total, min_bucket=1024):
    """Native one-pass encode of the combined-token stream PLUS the wide
    (|v| > 7) absolute side stream: returns (tokens, big_pos, big_val)
    padded to buckets.  Replaces the numpy where/diff/cumsum chain in
    pack_gop_batch (hw_h264_coeff_tokens)."""
    import ctypes

    from ...native import get_lib
    from .entropy import _declare

    pos = np.ascontiguousarray(pos, np.int64)
    vals = np.ascontiguousarray(vals, np.int16)
    k = len(pos)
    lib = get_lib()
    _declare(lib)

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def p16(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def pu16(a):
        return ctypes.cast(ctypes.c_void_p(a.ctypes.data),
                           ctypes.POINTER(ctypes.c_uint16))

    nbig = ctypes.c_int64(0)
    n = int(lib.hw_h264_coeff_tokens(
        p64(pos), p16(vals), k, None, 0, None, None, 0,
        ctypes.byref(nbig))) if k else 0
    if n < 0:
        raise ValueError("sparse positions must be strictly increasing")
    kpad = bucket_size(n, min_bucket)
    tok = np.zeros(kpad, np.uint16)
    kb = bucket_size(int(nbig.value), 64)
    big_pos = np.full(kb, total, np.int32)
    big_val = np.zeros(kb, np.int16)
    if k:
        r = lib.hw_h264_coeff_tokens(
            p64(pos), p16(vals), k, pu16(tok), kpad,
            p32(big_pos), p16(big_val), kb, ctypes.byref(nbig)
        )
        if r != n:
            raise RuntimeError("hw_h264_coeff_tokens overflow")
    return tok, big_pos, big_val


def decode_coeff_tokens(tokens, total):
    """Device-side inverse: combined-token stream -> (int32 scatter
    positions, int16 values).  Escape/pad/position-only slots redirect
    to the scratch index `total`."""
    t = tokens.astype(jnp.int32)
    gap = t & 0xFFF
    adv = jnp.where(gap == _CW_ESC, _CW_ADV, gap)
    posn = jnp.cumsum(adv) - 1
    v = t >> 12
    val = ((v ^ 8) - 8).astype(jnp.int16)  # 4-bit sign extension
    emit = (gap != 0) & (gap != _CW_ESC) & (v != 0)
    return jnp.where(emit, posn, total), val


def sparse_pad_abs(pos, vals, total, min_bucket=1024):
    """Absolute-position padding (scratch index = total) for the small
    side streams that don't warrant delta coding."""
    k = len(pos)
    kpad = bucket_size(k, min_bucket)
    pos_p = np.full(kpad, total, np.int32 if total < 2**31 else np.int64)
    pos_p[:k] = pos
    val_p = np.zeros((kpad,) + np.asarray(vals).shape[1:],
                     np.asarray(vals).dtype)
    val_p[:k] = vals
    return pos_p, val_p


def avail_geometric_np(mb_w: int, mb_h: int) -> np.ndarray:
    """The single-slice neighbor-availability bits per MB index (matches
    native avail_bits, h264_decode.cpp: bit0..3 left/top/topright/topleft
    intra-pred availability, bit4/5 left/top-in-same-slice): pure
    geometry when the frame is one slice without constrained intra."""
    mbx = np.arange(mb_w * mb_h) % mb_w
    mby = np.arange(mb_w * mb_h) // mb_w
    left = mbx > 0
    top = mby > 0
    tr = top & (mbx < mb_w - 1)
    tl = left & top
    return (
        left * 1 + top * 2 + tr * 4 + tl * 8 + left * 16 + top * 32
    ).astype(np.uint8)


def avail_geometric_jnp(mb_w: int, mb_h: int) -> jnp.ndarray:
    """Device twin of :func:`avail_geometric_np` (static per geometry —
    folds to a constant under jit)."""
    idx = jnp.arange(mb_w * mb_h)
    mbx = idx % mb_w
    mby = idx // mb_w
    left = (mbx > 0).astype(jnp.int16)
    top = (mby > 0).astype(jnp.int16)
    tr = top * (mbx < mb_w - 1).astype(jnp.int16)
    tl = left * top
    return left * 1 + top * 2 + tr * 4 + tl * 8 + left * 16 + top * 32


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


def slice_tensors_frames(t, k0: int, k1: int):
    """GopTensors restricted to decode frames [k0, k1) — the host side
    of frame-windowed decode (recon_batched decode_gop_fused_win_*).

    Only leading-F arrays slice; `ref_map`/reference ids stay
    SPAN-GLOBAL so cross-window references resolve against the carried
    ring ids.  Slices are views (leading-axis slices stay C-contiguous
    for the native packer)."""
    import dataclasses as _dc

    F = t.n_frames
    k0 = min(k0, F)
    k1 = min(k1, F)
    kw = {}
    for fld in _dc.fields(type(t)):
        v = getattr(t, fld.name)
        if (isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == F
                and fld.name not in ("scaling_w4", "scaling_w8",
                                     "sparse_counts")):
            kw[fld.name] = v[k0:k1]
        else:
            kw[fld.name] = v
    kw["n_frames"] = max(k1 - k0, 0)
    # per-SPAN sparse totals don't describe a window; pack re-counts
    kw["sparse_counts"] = None
    if getattr(t, "bipred_idc", 0) == 2 and kw["n_frames"] > 0:
        from .recon import bipred_pair_weights

        kw["bi_w_pre"] = bipred_pair_weights(t)[k0:k1]
    return type(t)(**kw)


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
    hdr = np.zeros((B, F, _HDR_W), np.int16)
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
            cp = cv = mp = mvv = m1p = m1v = i4p = i4v = None
            ccap = mcap = m1cap = i4cap = 0
        else:
            (u8p, mvbp, mv1bp, cp, cv, ccap, mp, mvv, mcap,
             m1p, m1v, m1cap, i4p, i4v, i4cap) = bufs
        r = lib.hw_h264_pack_clip(
            ctypes.byref(views[b]), t.n_frames, M, F,
            u8p, mvbp, mv1bp,
            cp, cv, ccap, b * F * M * _COEFF_BLOCKS * 16,
            mp, mvv, mcap, b * F * M * 16,
            m1p, m1v, m1cap, b * F * M * 16,
            i4p, i4v, i4cap, b * F * M,
            counts_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if r != 0:
            raise RuntimeError("hw_h264_pack_clip overflow")

    # Sparse-entry counts: the entropy decoder accumulates exact totals
    # during decode (GopOut.sparse_counts), so the usual case skips the
    # native count sweep entirely — pack becomes one pass per clip, not
    # two.  Tensors from older pickles / hand-built tests may lack the
    # field; any such clip falls back to the count pass.
    counts = np.zeros((B, 4), np.int64)
    used_entropy_counts = True
    for b, t in enumerate(tensors):
        sc = getattr(t, "sparse_counts", None)
        if sc is not None and len(sc) == 4:
            counts[b] = sc
        else:
            used_entropy_counts = False
            c_pack(b, None, counts[b])
    coff = np.concatenate(([0], np.cumsum(counts[:, 0])))
    moff = np.concatenate(([0], np.cumsum(counts[:, 1])))
    m1off = np.concatenate(([0], np.cumsum(counts[:, 2])))
    i4off = np.concatenate(([0], np.cumsum(counts[:, 3])))

    base = np.zeros((B, F, M, 2), np.int16)
    pos = np.zeros(int(coff[-1]), np.int64)
    vals = np.zeros(int(coff[-1]), np.int16)
    mpos = np.zeros(int(moff[-1]), np.int64)
    mvals = np.zeros((int(moff[-1]), 2), np.int16)
    base1 = np.zeros((B, F, M, 2), np.int16) if any_b else None
    m1pos_a = np.zeros(int(m1off[-1]), np.int64)
    m1vals = np.zeros((int(m1off[-1]), 2), np.int16)
    i4pos = np.zeros(int(i4off[-1]), np.int64)
    i4vals = np.zeros((int(i4off[-1]), 16), np.uint8)

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

    counts2 = np.zeros((B, 4), np.int64)
    for b in range(B):
        c_pack(b, (
            pu8(u8[b]), p16(base, b * F * M * 2),
            p16(base1, b * F * M * 2) if any_b else None,
            p64(pos, coff[b]), p16(vals, coff[b]), int(counts[b, 0]),
            p64(mpos, moff[b]), p16(mvals, 2 * moff[b]), int(counts[b, 1]),
            p64(m1pos_a, m1off[b]), p16(m1vals, 2 * m1off[b]),
            int(counts[b, 2]),
            p64(i4pos, i4off[b]),
            ctypes.cast(
                ctypes.c_void_p(int(i4vals.ctypes.data)
                                + int(i4off[b]) * 16),
                ctypes.POINTER(ctypes.c_uint8),
            ),
            int(counts[b, 3]),
        ), counts2[b])
    if used_entropy_counts and not np.array_equal(counts2, counts):
        # An overcount would leave zero-filled (pos=0, val=0) slots that
        # the device scatter could land on top of a real coefficient —
        # fail loudly instead (means a decoder path missed an accumulator)
        raise RuntimeError(
            f"entropy sparse_counts disagree with pack: {counts.tolist()} "
            f"vs {counts2.tolist()}"
        )

    geo_avail = avail_geometric_np(
        tensors[0].mb_width, tensors[0].mb_height
    )
    db_pos, db_val = [], []
    av_pos, av_val = [], []
    ri_pos, ri_val = [], []
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
        # per-frame deblock defaults (slice-constant in practice) + the
        # geometric-avail diff; per-MB disagreements ride the sparse
        # exception streams (multi-slice / constrained-intra frames)
        di = t.deblock_idc[:n].reshape(n, M)
        ao = t.alpha_off[:n].reshape(n, M)
        bo = t.beta_off[:n].reshape(n, M)
        hdr[b, :n, 36] = di[:, 0]
        hdr[b, :n, 37] = ao[:, 0]
        hdr[b, :n, 38] = bo[:, 0]
        diff = (
            (di != di[:, :1]) | (ao != ao[:, :1]) | (bo != bo[:, :1])
        )
        if diff.any():
            fi, mi = np.nonzero(diff)
            db_pos.append((b * F + fi) * M + mi)
            db_val.append(
                np.stack([di[diff], ao[diff], bo[diff]], -1).astype(np.int8)
            )
        av = t.avail[:n].reshape(n, M)
        adiff = av != geo_avail[None, :]
        if adiff.any():
            fi, mi = np.nonzero(adiff)
            av_pos.append((b * F + fi) * M + mi)
            av_val.append(av[adiff].astype(np.uint8))
        ri = t.refidx[:n].reshape(n, M, 4)
        rdiff = (ri > 14).any(-1)
        if rdiff.any():
            fi, mi = np.nonzero(rdiff)
            ri_pos.append((b * F + fi) * M + mi)
            ri_val.append(ri[rdiff].astype(np.int8))
        if any_expb:
            hdr[b, :n, 35] = explicit_b_frames(t)
            weights_l1[b, :n] = weights_l1_or_identity(t)
        if any_b:
            ridx1[b, :n] = t.refidx_l1
            pre = getattr(t, "bi_w_pre", None)
            # windows precompute this on the FULL span (the builder mixes
            # frame-local and span-global poc indexing) and slice it
            bi_w[b, :n] = pre if pre is not None else bipred_pair_weights(t)
        if any_t8:
            t8[b, :n] = t.transform8
        if any_ipcm:
            ipcm[b, :n] = t.ipcm
        if any_weights:
            weights[b, :n] = weights_or_identity(t)

    def _mv_delta8(base16):
        """[B, F, M, 2] int16 absolute -> int8 raster deltas + overflow
        exceptions (true int16 delta; device scatters before cumsum).
        Native pass (hw_h264_mv_delta8)."""
        base16 = np.ascontiguousarray(base16)
        groups = B * F
        ne = int(lib.hw_h264_mv_delta8(
            p16(base16), groups, M, None, None, None, 0))
        d8 = np.empty((B, F, M, 2), np.int8)
        epos = np.empty(ne, np.int64)
        evals = np.empty((ne, 2), np.int16)
        r = lib.hw_h264_mv_delta8(
            p16(base16), groups, M,
            d8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            epos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            p16(evals), ne)
        if r != ne:
            raise RuntimeError("hw_h264_mv_delta8 overflow")
        pp, vv = delta_encode_pad(epos, evals, min_bucket=64)
        return d8, pp, vv

    mv_d8, mvbp_p, mvbv_p = _mv_delta8(base)
    if any_b:
        mv1_d8, mvb1p_p, mvb1v_p = _mv_delta8(base1)

    total_coeff = B * F * M * _COEFF_BLOCKS * 16
    # 4-bit value diet: quantized residual levels are almost all in
    # [-8, 7]; the rare wide value ships in a tiny absolute-position
    # side stream whose scatter runs AFTER the main one (overwrite wins).
    # One native pass emits tokens + the big side stream together.
    tok_p, big_pos_p, big_val_p = coeff_tokens_pad(pos, vals, total_coeff)
    mpos_p, mval_p = delta_encode_pad(mpos, mvals, min_bucket=256)
    i4pos_p, i4val_p = delta_encode_pad(i4pos, i4vals, min_bucket=64)
    if any_b:
        mpos1_p, mval1_p = delta_encode_pad(m1pos_a, m1vals,
                                            min_bucket=256)

    def cat(parts, empty_shape, dtype):
        return (np.concatenate(parts) if parts
                else np.zeros(empty_shape, dtype))

    total_mbs = B * F * M
    dbp_p, dbv_p = delta_encode_pad(
        cat(db_pos, 0, np.int64), cat(db_val, (0, 3), np.int8),
        min_bucket=64)
    avp_p, avv_p = delta_encode_pad(
        cat(av_pos, 0, np.int64), cat(av_val, 0, np.uint8),
        min_bucket=64)
    rip_p, riv_p = delta_encode_pad(
        cat(ri_pos, 0, np.int64), cat(ri_val, (0, 4), np.int8),
        min_bucket=64)
    del total_mbs

    # honor to_device: the fused/sharded transports keep buffers in
    # host numpy and upload once with their own placement
    conv = jnp.asarray if to_device else (lambda a: a)
    return PackedBatch(
        u8=conv(u8),
        mv_base=conv(mv_d8),
        mvb_exc_pos=conv(mvbp_p),
        mvb_exc_val=conv(mvbv_p),
        mv_exc_val=conv(mval_p),
        mv_exc_pos=conv(mpos_p),
        hdr=conv(hdr),
        coeff_tok=conv(tok_p),
        coeff_big_pos=conv(big_pos_p),
        coeff_big_val=conv(big_val_p),
        i4_pos=conv(i4pos_p),
        i4_val=conv(i4val_p),
        db_exc_pos=conv(dbp_p),
        db_exc_val=conv(dbv_p),
        avail_exc_pos=conv(avp_p),
        avail_exc_val=conv(avv_p),
        refidx_exc_pos=conv(rip_p),
        refidx_exc_val=conv(riv_p),
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
                "mv1_base": conv(mv1_d8),
                "mvb1_exc_pos": conv(mvb1p_p),
                "mvb1_exc_val": conv(mvb1v_p),
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

    At-rest shapes are FLAT: every tensor with per-MB structure is stored
    as [B, F, M*K] (and small per-frame tables as [B, F, K]) so the
    trailing dim is lane-sized.  Structured [.., M, 16, ..] at-rest
    layouts tile to T(8,128) with 16 of 128 lanes used — a ~10x physical
    HBM blowup ([.., 2] trailing dims: 64x) that both OOMs 1080p-class
    chunks and multiplies the scan's HBM read traffic.  The frame scan
    reshapes its per-frame slices back to structured views (transient,
    fused into consumers).
    """
    B, F, M, _ = p.u8.shape
    nmb = B * F * M
    u = p.u8.astype(jnp.int16)
    fields = {
        "mb_kind": u[..., 0],
        "qp": u[..., 1],
        "i16_mode": (u[..., 2] & 0xF) - 1,
        "chroma_mode": (u[..., 2] >> 4) - 1,
        "nnzmask": u[..., 5:8],
    }
    refidx = jnp.stack(
        [u[..., 3] & 0xF, u[..., 3] >> 4, u[..., 4] & 0xF, u[..., 4] >> 4],
        axis=-1,
    ) - 1
    if p.refidx_exc_pos is not None:
        rpos = decode_delta_positions(p.refidx_exc_pos, nmb)
        rt = jnp.concatenate(
            [refidx.reshape(nmb, 4), jnp.zeros((1, 4), jnp.int16)]
        )
        refidx = rt.at[rpos].set(
            p.refidx_exc_val.astype(jnp.int16)
        )[:-1].reshape(B, F, M, 4)
    fields["refidx"] = refidx

    def _exc_flat(base_flat, pos, vals):
        t = jnp.concatenate([base_flat, jnp.zeros(1, base_flat.dtype)])
        return t.at[pos].set(vals.astype(base_flat.dtype))[:-1]

    # deblock params: per-frame hdr defaults, per-MB exceptions overwrite
    db_def = p.hdr[:, :, None, 36:39]
    if p.db_exc_pos is not None:
        dpos = decode_delta_positions(p.db_exc_pos, nmb)
        for i, name in enumerate(("deblock_idc", "alpha_off", "beta_off")):
            base = jnp.broadcast_to(db_def[..., i], (B, F, M)).reshape(nmb)
            fields[name] = _exc_flat(
                base, dpos, p.db_exc_val[:, i]
            ).reshape(B, F, M)
    else:
        for i, name in enumerate(("deblock_idc", "alpha_off", "beta_off")):
            fields[name] = jnp.broadcast_to(db_def[..., i], (B, F, M))

    # neighbor availability: geometric (single-slice) + exceptions
    avail = jnp.broadcast_to(
        avail_geometric_jnp(mb_w, mb_h)[None, None], (B, F, M)
    )
    if p.avail_exc_pos is not None:
        apos = decode_delta_positions(p.avail_exc_pos, nmb)
        avail = _exc_flat(
            avail.reshape(nmb), apos, p.avail_exc_val
        ).reshape(B, F, M)
    fields["avail"] = avail

    total_c = B * F * M * _COEFF_BLOCKS * 16
    cpos, cval = decode_coeff_tokens(p.coeff_tok, total_c)
    dense = jnp.zeros(total_c + 1, jnp.int16)
    dense = dense.at[cpos].set(cval)
    if p.coeff_big_pos is not None:
        dense = dense.at[p.coeff_big_pos].set(p.coeff_big_val)
    coeff_all = dense[:-1].reshape(B, F, M * _COEFF_BLOCKS * 16)

    # intra-4x4 modes: one 16-byte row per I4x4 MB (zeros elsewhere,
    # matching the host SoA default)
    i4p = decode_delta_positions(p.i4_pos, B * F * M)
    i4dense = jnp.zeros((B * F * M + 1, 16), jnp.int16)
    i4dense = i4dense.at[i4p].set(p.i4_val.astype(jnp.int16))
    i4_modes = i4dense[:-1].reshape(B, F, M * 16)

    # rebuild per-4x4 MVs: broadcast base, scatter exceptions.  The
    # scatter target is a FLAT interleaved [x0 y0 x1 y1 ..] vector (an
    # [N, 2] target would tile 2 lanes of 128); exception positions are
    # doubled into component positions, so the scatter stays on the fast
    # per-row path.
    def mv_base16(d8, bepos, beval):
        """int8 raster deltas (+ overflow exceptions carrying the true
        int16 delta) -> [B, F, M, 2] int16 via cumsum along M."""
        d = d8.astype(jnp.int16).reshape(nmb, 2)
        if bepos is not None:
            bt = jnp.concatenate([d, jnp.zeros((1, 2), jnp.int16)])
            d = bt.at[decode_delta_positions(bepos, nmb)].set(beval)[:-1]
        return jnp.cumsum(d.reshape(B, F, M, 2), axis=2)

    def mv_unpack(mbase, epos, eval_):
        N = B * F * M * 16
        flat = jnp.broadcast_to(
            mbase[:, :, :, None, :], (B, F, M, 16, 2)
        ).reshape(N * 2)
        flat = jnp.concatenate([flat, jnp.zeros(2, jnp.int16)])
        pos = decode_delta_positions(epos, N)  # sentinel N -> slots 2N,2N+1
        pos2 = jnp.stack([pos * 2, pos * 2 + 1], axis=-1).reshape(-1)
        flat = flat.at[pos2].set(eval_.reshape(-1))
        return flat[:-2].reshape(B, F, M * 32)

    mv16 = mv_unpack(
        mv_base16(p.mv_base, p.mvb_exc_pos, p.mvb_exc_val),
        p.mv_exc_pos, p.mv_exc_val,
    )
    mv16_l1 = (
        mv_unpack(
            mv_base16(p.mv1_base, p.mvb1_exc_pos, p.mvb1_exc_val),
            p.mv1_exc_pos, p.mv1_exc_val,
        )
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
        i4_modes=i4_modes,
        i16_mode=fields["i16_mode"],
        chroma_mode=fields["chroma_mode"],
        mv=mv16,
        refidx=fields["refidx"].reshape(B, F, M * 4),
        luma_dc=None,
        luma_ac=None,
        chroma_dc=None,
        chroma_ac=None,
        coeff_all=coeff_all,
        nnz=nnz24.reshape(B, F, M * 24),
        ring_slot=hdr[..., 34],
        **(
            {
                "weights_l1": p.weights_l1.reshape(B, F, 128),
                "bi_explicit": hdr[..., 35],
            }
            if p.weights_l1 is not None
            else {}
        ),
        deblock_idc=fields["deblock_idc"],
        alpha_off=fields["alpha_off"],
        beta_off=fields["beta_off"],
        avail=fields["avail"],
        ipcm=p.ipcm.reshape(B, F, M * 384) if p.ipcm is not None else None,
        n_valid_frames=jnp.zeros((B,), jnp.int32),
        weights=p.weights.reshape(B, F, 128) if p.weights is not None
        else None,
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
                "refidx_l1":
                    p.refidx_l1.astype(jnp.int16).reshape(B, F, M * 4),
                "ref_map_l1": hdr[..., 17:33],
                "is_ref": hdr[..., 33],
                "bi_w": p.bi_w.reshape(B, F, 512),
            }
            if p.mv1_base is not None
            else {}
        ),
    )
