"""Packed transport invariants: fuse/unfuse round trip.

The fused single-transfer transport reinterprets every PackedBatch buffer
through one uint8 blob (static slice + bitcast); a dtype/endianness slip
here silently corrupts decode inputs (int8 refidx -1 once became 255).
"""

import numpy as np
import pytest

import jax

from hwang_tpu.models.h264.packed import (
    PackedBatch,
    U8_STRIDE,
    decode_delta_positions,
    delta_encode_pad,
    fuse_packed,
    unfuse_packed,
)


def _mk_batch(with_b=True):
    rng = np.random.default_rng(7)
    B, F, M = 2, 4, 6
    kw = dict(
        u8=rng.integers(0, 255, (B, F, M, U8_STRIDE), dtype=np.uint8),
        mv_base=rng.integers(-128, 128, (B, F, M, 2)).astype(np.int8),
        mv_exc_val=rng.integers(-500, 500, (8, 2)).astype(np.int16),
        mv_exc_pos=rng.integers(0, B * F * M * 16, 8).astype(np.int32),
        hdr=rng.integers(-1, 30, (B, F, 40)).astype(np.int16),
        coeff_tok=rng.integers(0, 1 << 16, 32).astype(np.uint16),
        ipcm=None,
        weights=rng.integers(-128, 127, (B, F, 16, 8)).astype(np.int16),
    )
    if with_b:
        kw.update(
            mv1_base=rng.integers(-500, 500, (B, F, M, 2)).astype(np.int16),
            mv1_exc_val=rng.integers(-500, 500, (4, 2)).astype(np.int16),
            mv1_exc_pos=rng.integers(0, B * F * M * 16, 4).astype(np.int64),
            refidx_l1=rng.integers(-1, 3, (B, F, M, 4)).astype(np.int8),
            bi_w=rng.integers(-64, 64, (B, F, 16, 16, 2)).astype(np.int16),
        )
    return PackedBatch(**kw)


@pytest.mark.parametrize("with_b", [False, True])
def test_fuse_round_trip(with_b):
    p = _mk_batch(with_b)
    buf, layout = fuse_packed(p)
    assert buf.dtype == np.uint8

    got = jax.jit(
        lambda b: unfuse_packed(b, layout)
    )(buf)
    for name, a, b in zip(p._fields, p, got):
        if a is None:
            assert b is None, name
            continue
        a = np.asarray(a)
        if a.dtype == np.int64:
            a = a.astype(np.int32)  # device side is x32
        bb = np.asarray(b)
        assert bb.dtype == a.dtype, name
        assert np.array_equal(bb, a), name
    # int8 sign preservation is the regression of record
    if with_b:
        assert np.asarray(got.refidx_l1).min() == -1


@pytest.mark.parametrize("seed", range(5))
def test_delta_position_grammar(seed):
    """uint16-delta sparse positions: encode on host, decode in jit.
    Covers multi-escape gaps (> 2*0xFFFE), position 0, bucket padding,
    and the empty stream."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    total = int(rng.integers(1, 1_000_000))
    k = int(rng.integers(0, min(total, 400)))
    pos = np.sort(rng.choice(total, size=k, replace=False)).astype(np.int64)
    if seed == 0 and total > 3:  # pin the grammar edges
        pos = np.array([0, 1, total - 1], np.int64)
    vals = rng.integers(-300, 300, size=len(pos)).astype(np.int16)
    d, v = delta_encode_pad(pos, vals, min_bucket=8)
    assert d.dtype == np.uint16
    sp = np.asarray(
        jax.jit(lambda x: decode_delta_positions(x, total))(jnp.asarray(d))
    )
    dense = np.zeros(total + 1, np.int16)
    dense[sp] = v
    ref = np.zeros(total + 1, np.int16)
    ref[pos] = vals
    assert np.array_equal(dense, ref)


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        delta_encode_pad(np.array([3, 3]), np.array([1, 2], np.int16))


@pytest.mark.parametrize("seed", range(5))
def test_coeff_token_grammar(seed):
    """Combined 12+4-bit coefficient tokens: encode on host, decode in
    jit.  Covers escape gaps, 4-bit sign extension (incl. -8 and 7),
    position-only tokens (val 0 -> big side stream), position 0, bucket
    padding and the empty stream."""
    import jax.numpy as jnp

    from hwang_tpu.models.h264.packed import (
        coeff_encode_pad,
        decode_coeff_tokens,
    )

    rng = np.random.default_rng(seed)
    total = int(rng.integers(1, 1_000_000))
    k = int(rng.integers(0, min(total, 400)))
    pos = np.sort(rng.choice(total, size=k, replace=False)).astype(np.int64)
    vals = rng.integers(-8, 8, size=len(pos)).astype(np.int16)
    if seed == 0 and total > 3:
        pos = np.array([0, 1, total - 1], np.int64)
        vals = np.array([-8, 7, 0], np.int16)  # 0 = position-only token
    tok = coeff_encode_pad(pos, vals, min_bucket=8)
    assert tok.dtype == np.uint16
    sp, sv = jax.jit(
        lambda x: decode_coeff_tokens(x, total)
    )(jnp.asarray(tok))
    dense = np.zeros(total + 1, np.int16)
    dense[np.asarray(sp)] = np.asarray(sv)
    ref = np.zeros(total + 1, np.int16)
    ref[pos] = vals
    ref[total] = 0
    dense[total] = 0  # scratch slot is don't-care
    assert np.array_equal(dense, ref)


def test_bucket_size_half_steps():
    from hwang_tpu.models.h264.packed import bucket_size

    assert bucket_size(0, 8) == 8
    assert bucket_size(1000, 64) == 1024
    assert bucket_size(1025, 64) == 1536
    assert bucket_size(1536, 64) == 1536
    assert bucket_size(1537, 64) == 2048
