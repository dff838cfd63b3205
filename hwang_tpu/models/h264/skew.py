"""Skewed MB-tile layout for wavefront stages.

The knight wavefront activates MBs {(r, c) : c + 2r = d} at step d.  In a
skewed array S with tile (r, c) stored at S[r, c + 2r], each step's active
set is exactly one COLUMN — so a wavefront step is one dynamic_slice (a few
trailing columns for the left/top/top-right neighbors), dense compute over
all rows x the clip batch, and one dynamic_update_slice back.  No gathers
or scatters anywhere (XLA:TPU executes general gather/scatter orders of
magnitude slower than dense ops).

Skewing is free: storing row r with stride (Sw + 2) instead of Sw shifts
it right by 2r, so skew/unskew are a pad + reshape.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew_width(mb_w: int, mb_h: int) -> int:
    return mb_w + 2 * (mb_h - 1)


def skew(a: jnp.ndarray, mb_w: int, mb_h: int) -> jnp.ndarray:
    """[B, mb_h, mb_w, D...] -> [B, mb_h, Sw, D...] with row r shifted 2r."""
    Sw = skew_width(mb_w, mb_h)
    B = a.shape[0]
    rest = a.shape[3:]
    a = a.reshape(B, mb_h, mb_w, -1)
    D = a.shape[-1]
    pad = jnp.pad(a, ((0, 0), (0, 0), (0, Sw + 2 - mb_w), (0, 0)))
    flat = pad.reshape(B, mb_h * (Sw + 2), D)[:, : mb_h * Sw]
    return flat.reshape((B, mb_h, Sw) + rest)


def unskew(s: jnp.ndarray, mb_w: int, mb_h: int) -> jnp.ndarray:
    """[B, mb_h, Sw, D...] -> [B, mb_h, mb_w, D...]."""
    Sw = skew_width(mb_w, mb_h)
    B = s.shape[0]
    rest = s.shape[3:]
    s = s.reshape(B, mb_h, Sw, -1)
    D = s.shape[-1]
    flat = s.reshape(B, mb_h * Sw, D)
    flat = jnp.pad(flat, ((0, 0), (0, 2 * mb_h), (0, 0)))
    return flat.reshape(B, mb_h, Sw + 2, D)[:, :, :mb_w].reshape(
        (B, mb_h, mb_w) + rest
    )


def frame_to_tiles(frame: jnp.ndarray, mb_w: int, mb_h: int,
                   ts: int) -> jnp.ndarray:
    """[B, mb_h*ts, mb_w*ts] -> [B, mb_h, mb_w, ts, ts]."""
    B = frame.shape[0]
    return (
        frame.reshape(B, mb_h, ts, mb_w, ts).transpose(0, 1, 3, 2, 4)
    )


def tiles_to_frame(tiles: jnp.ndarray, mb_w: int, mb_h: int,
                   ts: int) -> jnp.ndarray:
    B = tiles.shape[0]
    return (
        tiles.transpose(0, 1, 3, 2, 4).reshape(B, mb_h * ts, mb_w * ts)
    )


def shift_rows_down(x: jnp.ndarray) -> jnp.ndarray:
    """x[:, r] <- x[:, r-1] (row 0 becomes zeros): neighbor (r-1, .)
    viewed from lane r."""
    return jnp.pad(x, ((0, 0), (1, 0)) + ((0, 0),) * (x.ndim - 2))[:, :-1]


def shift_rows_up(x: jnp.ndarray) -> jnp.ndarray:
    """x[:, r] <- x[:, r+1] (last row becomes zeros): write-back direction
    for values lane r computed for tile (r-1, .)."""
    return jnp.pad(x, ((0, 0), (0, 1)) + ((0, 0),) * (x.ndim - 2))[:, 1:]
