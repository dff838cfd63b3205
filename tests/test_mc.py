"""Unit tests for the MC gather variants: the wide (word-row) gather must
be bit-identical to the per-pixel gather for any group-constant MV field,
including clamp paths (huge MVs) on every side."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hwang_tpu.ops import mc as ops_mc  # noqa: E402


def _rep2(a, n):
    return jnp.repeat(jnp.repeat(a, n, axis=-2), n, axis=-1)


def _repv(a, n):
    return jnp.repeat(a, n, axis=-2)


def _mk_planes(rng, B, R, H, W):
    refs = rng.integers(0, 256, (B * R, H, W), np.uint8)
    p16 = ops_mc.luma_subpel16_planes(jnp.asarray(refs))
    p16 = p16.reshape(B, R, 16, *p16.shape[-2:])
    u = rng.integers(0, 256, (B * R, H // 2, W // 2), np.uint8)
    v = rng.integers(0, 256, (B * R, H // 2, W // 2), np.uint8)
    cp = ops_mc.chroma_pair_planes(jnp.asarray(u), jnp.asarray(v))
    cp = cp.reshape(B, R, *cp.shape[-3:])
    return p16, cp


@pytest.mark.parametrize("mv_range", [8, 120, 4000])
def test_wide_luma_matches_pixel(mv_range):
    rng = np.random.default_rng(7 + mv_range)
    B, R, mb_w, mb_h = 2, 3, 3, 2
    H, W = mb_h * 16, mb_w * 16
    p16, _ = _mk_planes(rng, B, R, H, W)
    # group-constant (4x4-block) fields
    bw, bh = mb_w * 4, mb_h * 4
    mvx_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    mvy_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    slot_b = jnp.asarray(rng.integers(0, R, (B, bh, bw)))
    ref = ops_mc.luma_mc_gather16_b(
        p16, _rep2(slot_b, 4), _rep2(mvx_b, 4), _rep2(mvy_b, 4)
    )
    wide = ops_mc.luma_mc_gather16_wide_b(
        p16, _repv(slot_b, 4), _repv(mvx_b, 4), _repv(mvy_b, 4)
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(wide))


@pytest.mark.parametrize("mv_range", [8, 120, 4000])
def test_wide_chroma_matches_pixel(mv_range):
    rng = np.random.default_rng(11 + mv_range)
    B, R, mb_w, mb_h = 2, 3, 3, 2
    H, W = mb_h * 16, mb_w * 16
    _, cp = _mk_planes(rng, B, R, H, W)
    bw, bh = mb_w * 4, mb_h * 4
    mvx_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    mvy_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    slot_b = jnp.asarray(rng.integers(0, R, (B, bh, bw)))
    ref = ops_mc.chroma_mc_gather_pair_b(
        cp, _rep2(slot_b, 2), _rep2(mvx_b, 2), _rep2(mvy_b, 2)
    )
    wide = ops_mc.chroma_mc_gather_pair_wide_b(
        cp, _repv(slot_b, 2), _repv(mvx_b, 2), _repv(mvy_b, 2)
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(wide))


@pytest.mark.parametrize("mv_range", [8, 120, 4000])
def test_paired_luma_matches_pixel(mv_range):
    rng = np.random.default_rng(21 + mv_range)
    B, R, mb_w, mb_h = 2, 3, 3, 2
    H, W = mb_h * 16, mb_w * 16
    p16, _ = _mk_planes(rng, B, R, H, W)
    pr = ops_mc.pair_words(
        p16.reshape(B, R * 16 * p16.shape[-2], p16.shape[-1])
    ).reshape(B, R, 16, p16.shape[-2], p16.shape[-1] // 4, 2)
    bw, bh = mb_w * 4, mb_h * 4
    mvx_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    mvy_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    slot_b = jnp.asarray(rng.integers(0, R, (B, bh, bw)))
    ref = ops_mc.luma_mc_gather16_b(
        p16, _rep2(slot_b, 4), _rep2(mvx_b, 4), _rep2(mvy_b, 4)
    )
    paired = ops_mc.luma_mc_gather16_paired_b(
        pr, _repv(slot_b, 4), _repv(mvx_b, 4), _repv(mvy_b, 4)
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(paired))


@pytest.mark.parametrize("mv_range", [8, 120, 4000])
def test_paired_chroma_matches_pixel(mv_range):
    rng = np.random.default_rng(31 + mv_range)
    B, R, mb_w, mb_h = 2, 3, 3, 2
    H, W = mb_h * 16, mb_w * 16
    _, cp = _mk_planes(rng, B, R, H, W)
    Hcp, Wcp = cp.shape[2], cp.shape[3]
    pr = ops_mc.pair_words(
        cp.reshape(B, R * Hcp, Wcp * 2)
    ).reshape(B, R, Hcp, (Wcp * 2) // 4, 2)
    bw, bh = mb_w * 4, mb_h * 4
    mvx_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    mvy_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    slot_b = jnp.asarray(rng.integers(0, R, (B, bh, bw)))
    ref = ops_mc.chroma_mc_gather_pair_b(
        cp, _rep2(slot_b, 2), _rep2(mvx_b, 2), _rep2(mvy_b, 2)
    )
    paired = ops_mc.chroma_mc_gather_pair_paired_b(
        pr, _repv(slot_b, 2), _repv(mvx_b, 2), _repv(mvy_b, 2)
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(paired))


def test_wide_luma_exact_corners():
    """Deterministic corner sweep: every quarter-pel fraction at every
    frame corner, including clamps past the pad on all four sides."""
    rng = np.random.default_rng(3)
    B, R, mb_w, mb_h = 1, 2, 2, 1
    H, W = mb_h * 16, mb_w * 16
    p16, _ = _mk_planes(rng, B, R, H, W)
    vals = np.array(
        [-4096, -40, -9, -8, -7, -3, -1, 0, 1, 3, 7, 8, 9, 40, 4096]
    )
    for dx in vals:
        bw, bh = mb_w * 4, mb_h * 4
        mvx_b = jnp.full((B, bh, bw), int(dx))
        for dy in (-4096, -5, 0, 5, 4096):
            mvy_b = jnp.full((B, bh, bw), int(dy))
            slot_b = jnp.ones((B, bh, bw), jnp.int32)
            ref = ops_mc.luma_mc_gather16_b(
                p16, _rep2(slot_b, 4), _rep2(mvx_b, 4), _rep2(mvy_b, 4)
            )
            wide = ops_mc.luma_mc_gather16_wide_b(
                p16, _repv(slot_b, 4), _repv(mvx_b, 4), _repv(mvy_b, 4)
            )
            np.testing.assert_array_equal(
                np.asarray(ref), np.asarray(wide),
                err_msg=f"dx={dx} dy={dy}",
            )

def _mk_yquad_rings(p16, cp, B, R):
    """Flat y-quad rings (32-byte gather rows) from structured planes."""
    Hp, Wp = p16.shape[-2:]
    Hcp, Wcp = cp.shape[2], cp.shape[3]
    ry = ops_mc.yquad_words(
        p16.reshape(B, R * 16 * Hp, Wp)).reshape(-1, 8)
    rc = ops_mc.yquad_words(
        cp.reshape(B, R * Hcp, Wcp * 2)).reshape(-1, 8)
    return ry, (B, R, Hp, Wp // 4), rc, (B, R, Hcp, (Wcp * 2) // 4)


@pytest.mark.parametrize("mv_range", [8, 120, 4000])
def test_yquad_luma_matches_pixel(mv_range):
    rng = np.random.default_rng(41 + mv_range)
    B, R, mb_w, mb_h = 2, 3, 3, 2
    H, W = mb_h * 16, mb_w * 16
    p16, cp = _mk_planes(rng, B, R, H, W)
    ry, dy_, rc, dc_ = _mk_yquad_rings(p16, cp, B, R)
    bw, bh = mb_w * 4, mb_h * 4
    mvx_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    mvy_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    slot_b = jnp.asarray(rng.integers(0, R, (B, bh, bw)))
    ref = ops_mc.luma_mc_gather16_b(
        p16, _rep2(slot_b, 4), _rep2(mvx_b, 4), _rep2(mvy_b, 4)
    )
    got = ops_mc.luma_mc_gather16_yquad_flat(ry, dy_, slot_b, mvx_b, mvy_b)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("mv_range", [8, 120, 4000])
def test_yquad_chroma_matches_pixel(mv_range):
    rng = np.random.default_rng(51 + mv_range)
    B, R, mb_w, mb_h = 2, 3, 3, 2
    H, W = mb_h * 16, mb_w * 16
    p16, cp = _mk_planes(rng, B, R, H, W)
    ry, dy_, rc, dc_ = _mk_yquad_rings(p16, cp, B, R)
    bw, bh = mb_w * 4, mb_h * 4
    mvx_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    mvy_b = jnp.asarray(rng.integers(-mv_range, mv_range, (B, bh, bw)))
    slot_b = jnp.asarray(rng.integers(0, R, (B, bh, bw)))
    ref = ops_mc.chroma_mc_gather_pair_b(
        cp, _rep2(slot_b, 2), _rep2(mvx_b, 2), _rep2(mvy_b, 2)
    )
    got = ops_mc.chroma_mc_gather_pair_yquad_flat(
        rc, dc_, slot_b, mvx_b, mvy_b)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_yquad_exact_corners():
    """Every quarter-pel fraction at every frame corner, incl. clamps
    past the pad on all four sides, for both planes."""
    rng = np.random.default_rng(5)
    B, R, mb_w, mb_h = 1, 2, 2, 1
    H, W = mb_h * 16, mb_w * 16
    p16, cp = _mk_planes(rng, B, R, H, W)
    ry, dy_, rc, dc_ = _mk_yquad_rings(p16, cp, B, R)
    bw, bh = mb_w * 4, mb_h * 4
    for dx in (-4096, -40, -9, -8, -7, -3, -1, 0, 1, 3, 7, 8, 9, 40, 4096):
        mvx_b = jnp.full((B, bh, bw), int(dx))
        for dyv in (-4096, -6, -5, 0, 5, 6, 4096):
            mvy_b = jnp.full((B, bh, bw), int(dyv))
            slot_b = jnp.ones((B, bh, bw), jnp.int32)
            ref = ops_mc.luma_mc_gather16_b(
                p16, _rep2(slot_b, 4), _rep2(mvx_b, 4), _rep2(mvy_b, 4)
            )
            got = ops_mc.luma_mc_gather16_yquad_flat(
                ry, dy_, slot_b, mvx_b, mvy_b)
            np.testing.assert_array_equal(
                np.asarray(ref), np.asarray(got),
                err_msg=f"luma dx={dx} dy={dyv}")
            cref = ops_mc.chroma_mc_gather_pair_b(
                cp, _rep2(slot_b, 2), _rep2(mvx_b, 2), _rep2(mvy_b, 2)
            )
            cgot = ops_mc.chroma_mc_gather_pair_yquad_flat(
                rc, dc_, slot_b, mvx_b, mvy_b)
            np.testing.assert_array_equal(
                np.asarray(cref), np.asarray(cgot),
                err_msg=f"chroma dx={dx} dy={dyv}")
