import numpy as np
import pytest

from hwang_tpu import VideoIndex, slice_into_video_intervals


def make_index(n_frames, keyframes, adjacent=True):
    """Synthetic index; when adjacent=False a byte gap follows each GOP."""
    sizes = np.full(n_frames, 100, np.uint64)
    offsets = np.zeros(n_frames, np.uint64)
    pos = 0
    kf = set(keyframes)
    for i in range(n_frames):
        if i in kf and i != 0 and not adjacent:
            pos += 13  # gap before each keyframe
        offsets[i] = pos
        pos += 100
    return VideoIndex(
        timescale=25, duration=n_frames, frame_width=64, frame_height=64,
        format="avc1", sample_offsets=offsets, sample_sizes=sizes,
        keyframe_indices=np.array(sorted(kf), np.uint64),
    )


def covered(intervals):
    out = []
    for (s, e), valid in intervals:
        assert all(s <= v < e for v in valid)
        out.extend(valid)
    return out


def test_single_gop():
    idx = make_index(30, [0])
    iv = slice_into_video_intervals(idx, [3, 7, 20])
    assert iv.sample_index_intervals == [(0, 30)]
    assert iv.valid_frames == [[3, 7, 20]]


def test_spans_start_on_keyframes():
    idx = make_index(90, [0, 30, 60])
    iv = slice_into_video_intervals(idx, [35, 65])
    starts = [s for (s, e) in iv.sample_index_intervals]
    for s in starts:
        assert s in (0, 30, 60)


def test_adjacent_gops_merge():
    idx = make_index(90, [0, 30, 60], adjacent=True)
    iv = slice_into_video_intervals(idx, [5, 35], merge_adjacent=True)
    # byte-adjacent consecutive GOPs merge into one span
    assert iv.sample_index_intervals == [(0, 60)]
    assert iv.valid_frames == [[5, 35]]


def test_non_adjacent_gops_split():
    idx = make_index(90, [0, 30, 60], adjacent=False)
    iv = slice_into_video_intervals(idx, [5, 35])
    assert iv.sample_index_intervals == [(0, 30), (30, 60)]
    assert iv.valid_frames == [[5], [35]]


def test_skipped_keyframe_splits():
    idx = make_index(90, [0, 30, 60], adjacent=True)
    iv = slice_into_video_intervals(idx, [5, 65], merge_adjacent=True)
    assert iv.sample_index_intervals == [(0, 30), (60, 90)]
    assert iv.valid_frames == [[5], [65]]


def test_every_requested_frame_covered_exactly_once():
    rng = np.random.default_rng(0)
    idx = make_index(300, [0, 30, 60, 90, 120, 150, 180, 210, 240, 270],
                     adjacent=False)
    for _ in range(20):
        rows = sorted(rng.choice(300, size=rng.integers(1, 40), replace=False))
        iv = slice_into_video_intervals(idx, rows)
        assert covered(iv) == list(rows)


def test_stride_pattern():
    idx = make_index(300, list(range(0, 300, 30)), adjacent=False)
    rows = list(range(0, 300, 30))  # every keyframe
    iv = slice_into_video_intervals(idx, rows)
    assert len(iv) == 10
    for (s, e), valid in iv:
        assert valid == [s]


def test_unsorted_raises():
    idx = make_index(30, [0])
    with pytest.raises(ValueError):
        slice_into_video_intervals(idx, [5, 3])


def test_out_of_range_raises():
    idx = make_index(30, [0])
    with pytest.raises(ValueError):
        slice_into_video_intervals(idx, [30])


def test_empty_rows():
    idx = make_index(30, [0])
    iv = slice_into_video_intervals(idx, [])
    assert len(iv) == 0


def test_no_merge_by_default():
    """Per-GOP spans by default: a stride gather never decodes intervening
    GOPs (deviation from the reference, which merges byte-adjacent GOPs)."""
    idx = make_index(90, [0, 30, 60], adjacent=True)
    iv = slice_into_video_intervals(idx, [0, 30, 60])
    assert iv.sample_index_intervals == [(0, 30), (30, 60), (60, 90)]
