"""Knight-move macroblock wavefront schedule.

H.264's in-frame dependencies (intra prediction neighbors, deblock filter
order) run left/top/top-right/top-left — MB (x, y) depends on (x-1, y),
(x, y-1), (x+1, y-1), (x-1, y-1).  Assigning MB (x, y) to step d = x + 2y
puts every dependency at a strictly smaller step, so all MBs of a step are
processed in parallel (the classic wavefront, as used by WPP encoders).

Parallel width is ~min(mb_w/2, mb_h) MBs per step x the clip batch; total
steps = mb_w + 2*mb_h - 2.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=64)
def schedule(mb_w: int, mb_h: int) -> tuple[np.ndarray, np.ndarray]:
    """Returns (step_mbs [n_steps, width], valid [n_steps, width]) where
    step_mbs[s] lists the raster MB indices active at step s (padded with
    0 where invalid)."""
    n_steps = (mb_w - 1) + 2 * (mb_h - 1) + 1
    buckets: list[list[int]] = [[] for _ in range(n_steps)]
    for y in range(mb_h):
        for x in range(mb_w):
            buckets[x + 2 * y].append(y * mb_w + x)
    width = max(len(b) for b in buckets)
    mbs = np.zeros((n_steps, width), np.int32)
    valid = np.zeros((n_steps, width), bool)
    for s, b in enumerate(buckets):
        mbs[s, : len(b)] = b
        valid[s, : len(b)] = True
    return mbs, valid
