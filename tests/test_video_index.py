import numpy as np

from hwang_tpu import VideoIndex, index_video


def test_serialize_round_trip():
    idx = VideoIndex(
        timescale=12800,
        duration=38400,
        frame_width=1920,
        frame_height=1080,
        format="avc1",
        sample_offsets=np.array([48, 1000, 2000], np.uint64),
        sample_sizes=np.array([952, 1000, 500], np.uint64),
        keyframe_indices=np.array([0, 2], np.uint64),
        metadata_bytes=b"\x01\x64\x00\x0a",
    )
    data = idx.serialize()
    assert VideoIndex.deserialize(data) == idx


def test_wire_format_golden():
    """Field numbers must match the reference proto schema
    (hwang/hwang_descriptors.proto:5-15) for cross-implementation compat."""
    idx = VideoIndex(
        timescale=3, duration=4, frame_width=1, frame_height=2,
        format="a", sample_offsets=[5], sample_sizes=[6],
        keyframe_indices=[7], metadata_bytes=b"\x08",
    )
    data = idx.serialize()
    # tag bytes: field<<3|wiretype
    assert bytes([1 << 3 | 0, 1]) in data          # frame_width=1
    assert bytes([2 << 3 | 0, 2]) in data          # frame_height=2
    assert bytes([3 << 3 | 2, 1, 5]) in data       # packed offsets
    assert bytes([4 << 3 | 2, 1, 6]) in data       # packed sizes
    assert bytes([5 << 3 | 2, 1, 7]) in data       # packed keyframes
    assert bytes([6 << 3 | 2, 1, 8]) in data       # metadata
    assert bytes([7 << 3 | 0, 3]) in data          # timescale
    assert bytes([8 << 3 | 0, 4]) in data          # duration
    assert bytes([9 << 3 | 2, 1, ord("a")]) in data  # format


def test_file_round_trip(tmp_path, small_h264):
    idx = index_video(small_h264)
    p = str(tmp_path / "index.bin")
    idx.to_file(p)
    idx2 = VideoIndex.from_file(p)
    assert idx2 == idx


def test_unpacked_repeated_accepted():
    """proto3 parsers must accept unpacked encodings of packed fields."""
    # field 3 (sample_offsets) as unpacked varints: tag 0x18 value 5, tag 0x18 value 9
    data = bytes([3 << 3 | 0, 5, 3 << 3 | 0, 9])
    idx = VideoIndex.deserialize(data)
    assert list(idx.sample_offsets) == [5, 9]
