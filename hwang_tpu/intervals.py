"""Span planner: map a sparse set of requested frames to minimal decode spans.

This is the sparse-gather scheduler kernel of the whole framework.  Given a
sorted list of requested frame numbers, group them into keyframe-bounded
spans that a stateful decoder can decode independently.  Two consecutive GOPs
are merged into one span only when their data is byte-adjacent in the file
(end byte of the last sample of GOP k == start byte of the keyframe of GOP
k+1), so one contiguous file read serves the merged span.

Behavioral parity with the reference `slice_into_video_intervals`
(hwang/video_index.cpp:62-109):
  - spans always start at a keyframe and end at a keyframe boundary (or EOF),
    i.e. they cover whole GOPs;
  - skipped keyframes or non-adjacent GOP data start a new span;
  - requested rows must be sorted ascending.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from .video_index import VideoIndex


@dataclasses.dataclass
class VideoIntervals:
    """Parity with reference VideoIntervals (hwang/video_index.h:79-82)."""

    # [(start_sample, end_sample_exclusive)] — both are keyframe positions
    sample_index_intervals: list[tuple[int, int]]
    # per-interval absolute frame numbers the caller actually wants
    valid_frames: list[list[int]]

    def __iter__(self):
        return iter(zip(self.sample_index_intervals, self.valid_frames))

    def __len__(self):
        return len(self.sample_index_intervals)


def slice_into_video_intervals(
    index: VideoIndex, rows: Sequence[int], merge_adjacent: bool = False
) -> VideoIntervals:
    """Plan decode spans for the requested rows.

    merge_adjacent=True reproduces the reference's merge rule
    (video_index.cpp:76-100): consecutive GOPs whose bytes are contiguous
    in the file fuse into one span.  MP4 mdat payloads are virtually always
    contiguous, so under that rule a sparse gather decodes every
    intervening GOP (e.g. stride-30 over 30-frame GOPs decodes ~every
    frame to deliver 1 in 30).  The default (False) keeps spans per-GOP:
    each span still starts at a keyframe and is independently decodable,
    and the file reads stay contiguous per span, but intervening frames
    are never decoded.
    """
    rows = [int(r) for r in rows]
    n_frames = index.frames()
    if any(r < 0 or r >= n_frames for r in rows):
        raise ValueError(f"requested frame out of range [0, {n_frames})")
    if any(b < a for a, b in zip(rows, rows[1:])):
        raise ValueError("requested rows must be sorted ascending")
    if not rows:
        return VideoIntervals([], [])

    # Keyframe positions with an EOF sentinel.
    kp = [int(k) for k in index.keyframe_indices] + [n_frames]
    if len(kp) < 2 or kp[0] != 0:
        raise ValueError("index has no keyframe at sample 0")
    offs = index.sample_offsets
    sizes = index.sample_sizes

    intervals: list[tuple[int, int]] = []
    valids: list[list[int]] = []

    # Start at the GOP containing the FIRST requested row.  (The reference
    # instead always starts its cursor at keyframe 0, so a first request
    # inside a later byte-adjacent GOP silently extends the span back to
    # frame 0 and decodes every preceding GOP — an inefficiency we fix.)
    import bisect

    start_kf = bisect.bisect_right(kp, rows[0]) - 1
    end_kf = start_kf + 1
    cur_valid: list[int] = []

    for row in rows:
        if row >= kp[end_kf]:
            boundary = kp[end_kf]
            last_end_byte = int(offs[boundary - 1]) + int(sizes[boundary - 1])
            adjacent = merge_adjacent and (
                last_end_byte == int(offs[boundary])
            )
            end_kf += 1
            if row >= kp[end_kf] or not adjacent:
                # Skipped a keyframe or the next GOP is not byte-adjacent:
                # close out the current span and start a new one at the GOP
                # containing `row`.
                if cur_valid:
                    intervals.append((kp[start_kf], kp[end_kf - 1]))
                    valids.append(cur_valid)
                while row >= kp[end_kf]:
                    end_kf += 1
                cur_valid = []
                start_kf = end_kf - 1
        cur_valid.append(row)

    intervals.append((kp[start_kf], kp[end_kf]))
    valids.append(cur_valid)
    return VideoIntervals(intervals, valids)
