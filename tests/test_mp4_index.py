import numpy as np
import pytest

from hwang_tpu import MP4IndexCreator, index_video
from hwang_tpu.utils.fixtures import oracle_decode_all


def test_index_golden_fields(small_h264):
    idx = index_video(small_h264)
    assert idx.frames() == 75
    assert idx.frame_width == 128
    assert idx.frame_height == 96
    assert idx.format == "avc1"
    assert list(idx.keyframe_indices) == [0, 25, 50]
    assert idx.timescale > 0 and idx.duration > 0
    # avcC extradata: configurationVersion == 1
    assert len(idx.metadata_bytes) > 6
    assert idx.metadata_bytes[0] == 1
    # offsets strictly increasing for x264 mp4 output, sizes positive
    offs = idx.sample_offsets.astype(np.int64)
    assert np.all(np.diff(offs) > 0)
    assert np.all(idx.sample_sizes.astype(np.int64) > 0)


def test_index_offsets_point_at_avcc_samples(small_h264):
    """Every indexed sample must start with a valid AVCC length prefix that
    fits inside the sample — a strong structural check on offsets/sizes."""
    idx = index_video(small_h264)
    data = open(small_h264, "rb").read()
    for s in range(idx.frames()):
        off = int(idx.sample_offsets[s])
        size = int(idx.sample_sizes[s])
        pos = off
        end = off + size
        while pos < end:
            nal_len = int.from_bytes(data[pos : pos + 4], "big")
            assert nal_len > 0 and pos + 4 + nal_len <= end, f"sample {s}"
            pos += 4 + nal_len
        assert pos == end


def test_fragmented_index(small_h264_frag):
    idx = index_video(small_h264_frag)
    assert idx.frames() == 60
    assert list(idx.keyframe_indices) == [0, 20, 40]
    assert idx.frame_width == 128 and idx.frame_height == 96
    # samples must lie inside the file
    import os

    fsize = os.path.getsize(small_h264_frag)
    assert np.all(
        idx.sample_offsets.astype(np.int64) + idx.sample_sizes.astype(np.int64)
        <= fsize
    )


def test_fragmented_equals_oracle_frame_count(small_h264_frag):
    frames = oracle_decode_all(small_h264_frag)
    idx = index_video(small_h264_frag)
    assert len(frames) == idx.frames()


def test_hevc_index(small_hevc):
    idx = index_video(small_hevc)
    assert idx.frames() == 50
    assert idx.format in ("hvc1", "hev1")
    assert list(idx.keyframe_indices) == [0, 25]
    # hvcC extradata present
    assert len(idx.metadata_bytes) > 20


def test_incremental_protocol_minimal_reads(small_h264):
    """The pull-parser must request bounded windows, not the whole file."""
    import os

    fsize = os.path.getsize(small_h264)
    creator = MP4IndexCreator(fsize)
    f = open(small_h264, "rb")
    data = f.read(1024)
    total_read = len(data)
    windows = []
    while not creator.is_done():
        needs_more, off, size = creator.feed(data)
        if not needs_more:
            break
        windows.append((off, size))
        f.seek(off)
        data = f.read(size)
        total_read += len(data)
    f.close()
    assert not creator.is_error(), creator.error_message()
    idx = creator.get_video_index()
    assert idx.frames() == 75
    # mdat samples are never read during indexing
    assert total_read < fsize


def test_error_latching():
    creator = MP4IndexCreator(1000)
    ret, _, _ = creator.feed(b"\x00" * 64)  # not a valid box
    # either immediately done with error or error on subsequent feeds
    assert creator.is_done() and creator.is_error()
    with pytest.raises(RuntimeError):
        creator.get_video_index()


def test_bframes_index(bframes_h264):
    idx = index_video(bframes_h264)
    assert idx.frames() == 60
    assert 0 in list(idx.keyframe_indices)
