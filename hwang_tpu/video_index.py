"""VideoIndex: the persistent per-video artifact.

Index once, seek forever: per-sample byte offsets/sizes, keyframe sample
indices, stream geometry, and the codec extradata (avcC/hvcC) needed to
initialize a decoder mid-file.

Parity notes: mirrors the reference value type (hwang/video_index.h:26-76)
and is wire-compatible with its protobuf schema
(hwang/hwang_descriptors.proto:5-15 — field numbers preserved below), so
indexes serialized by the reference deserialize here and vice versa.  The
serialization is a hand-rolled proto3 codec: the schema is 9 fields and this
avoids a protoc codegen step.

Schema (proto3, package hwang.proto, message VideoIndex):
    uint32 frame_width  = 1;
    uint32 frame_height = 2;
    repeated uint64 sample_offsets   = 3 [packed=true];
    repeated uint64 sample_sizes     = 4 [packed=true];
    repeated uint64 keyframe_indices = 5 [packed=true];
    bytes  metadata_bytes = 6;
    uint32 timescale = 7;
    uint64 duration  = 8;
    string format    = 9;
"""

from __future__ import annotations

import dataclasses
import io
from typing import Sequence

import numpy as np


# ---------------------------------------------------------------------------
# proto3 wire helpers
# ---------------------------------------------------------------------------

def _write_varint(out: io.BytesIO, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_tag(out: io.BytesIO, field: int, wire_type: int) -> None:
    _write_varint(out, (field << 3) | wire_type)


def _write_packed_u64(out: io.BytesIO, field: int, values: Sequence[int]) -> None:
    if len(values) == 0:
        return
    payload = io.BytesIO()
    for v in values:
        _write_varint(payload, int(v))
    data = payload.getvalue()
    _write_tag(out, field, 2)
    _write_varint(out, len(data))
    out.write(data)


# ---------------------------------------------------------------------------


@dataclasses.dataclass
class VideoIndex:
    timescale: int = 0
    duration: int = 0
    frame_width: int = 0
    frame_height: int = 0
    format: str = ""
    sample_offsets: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.uint64)
    )
    sample_sizes: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.uint64)
    )
    keyframe_indices: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.uint64)
    )
    metadata_bytes: bytes = b""
    # decode order != display order (from mp4 ctts; not serialized — None
    # when unknown, e.g. an index loaded from file)
    has_reorder: "bool | None" = None

    def __post_init__(self):
        self.sample_offsets = np.asarray(self.sample_offsets, np.uint64)
        self.sample_sizes = np.asarray(self.sample_sizes, np.uint64)
        self.keyframe_indices = np.asarray(self.keyframe_indices, np.uint64)

    # -- derived ----------------------------------------------------------
    def frames(self) -> int:
        """Number of samples (frames in decode order). Ref video_index.h:55."""
        return int(len(self.sample_offsets))

    def fps(self) -> float:
        """Frames per second. Ref video_index.h:57 (timescale/duration based)."""
        if self.duration == 0:
            return 0.0
        return self.frames() / (self.duration / self.timescale)

    def duration_seconds(self) -> float:
        if self.timescale == 0:
            return 0.0
        return self.duration / self.timescale

    # -- serialization (proto3 wire compatible) ---------------------------
    def serialize(self) -> bytes:
        out = io.BytesIO()
        if self.frame_width:
            _write_tag(out, 1, 0)
            _write_varint(out, self.frame_width)
        if self.frame_height:
            _write_tag(out, 2, 0)
            _write_varint(out, self.frame_height)
        _write_packed_u64(out, 3, self.sample_offsets)
        _write_packed_u64(out, 4, self.sample_sizes)
        _write_packed_u64(out, 5, self.keyframe_indices)
        if self.metadata_bytes:
            _write_tag(out, 6, 2)
            _write_varint(out, len(self.metadata_bytes))
            out.write(self.metadata_bytes)
        if self.timescale:
            _write_tag(out, 7, 0)
            _write_varint(out, self.timescale)
        if self.duration:
            _write_tag(out, 8, 0)
            _write_varint(out, self.duration)
        if self.format:
            _write_tag(out, 9, 2)
            encoded = self.format.encode("utf-8")
            _write_varint(out, len(encoded))
            out.write(encoded)
        return out.getvalue()

    @staticmethod
    def deserialize(data: bytes) -> "VideoIndex":
        idx = VideoIndex()
        pos = 0
        n = len(data)
        packed: dict[int, list[int]] = {3: [], 4: [], 5: []}
        while pos < n:
            tag, pos = _read_varint(data, pos)
            field, wt = tag >> 3, tag & 7
            if wt == 0:
                v, pos = _read_varint(data, pos)
                if field == 1:
                    idx.frame_width = v
                elif field == 2:
                    idx.frame_height = v
                elif field == 7:
                    idx.timescale = v
                elif field == 8:
                    idx.duration = v
                elif field in packed:  # unpacked repeated encoding
                    packed[field].append(v)
            elif wt == 2:
                ln, pos = _read_varint(data, pos)
                payload = data[pos : pos + ln]
                if len(payload) != ln:
                    raise ValueError("truncated length-delimited field")
                pos += ln
                if field in packed:
                    p = 0
                    while p < ln:
                        v, p = _read_varint(payload, p)
                        packed[field].append(v)
                elif field == 6:
                    idx.metadata_bytes = payload
                elif field == 9:
                    idx.format = payload.decode("utf-8")
            elif wt == 5:
                pos += 4
            elif wt == 1:
                pos += 8
            else:
                raise ValueError(f"unsupported wire type {wt}")
        idx.sample_offsets = np.array(packed[3], np.uint64)
        idx.sample_sizes = np.array(packed[4], np.uint64)
        idx.keyframe_indices = np.array(packed[5], np.uint64)
        return idx

    # -- file helpers (parity: python/hwang/video_index.py:5-15) ----------
    def to_file(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.serialize())

    @staticmethod
    def from_file(path: str) -> "VideoIndex":
        with open(path, "rb") as f:
            return VideoIndex.deserialize(f.read())

    def __eq__(self, other) -> bool:
        if not isinstance(other, VideoIndex):
            return NotImplemented
        return (
            self.timescale == other.timescale
            and self.duration == other.duration
            and self.frame_width == other.frame_width
            and self.frame_height == other.frame_height
            and self.format == other.format
            and np.array_equal(self.sample_offsets, other.sample_offsets)
            and np.array_equal(self.sample_sizes, other.sample_sizes)
            and np.array_equal(self.keyframe_indices, other.keyframe_indices)
            and self.metadata_bytes == other.metadata_bytes
        )
