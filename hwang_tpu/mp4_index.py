"""MP4IndexCreator: incremental pull-parser over MP4 sample tables.

Builds a :class:`~hwang_tpu.video_index.VideoIndex` from an MP4 container
without reading the whole file: the caller feeds byte windows and the parser
answers with the next (offset, size) window it needs, so indexing a multi-GB
file touches only box headers, the moov box, and (for fragmented files) each
moof box.

Protocol parity with the reference MP4IndexCreator
(hwang/mp4_index_creator.h:27-35, mp4_index_creator.cpp:79-112):

    creator = MP4IndexCreator(file_size)
    data = f.read(1024)                      # window at offset 0
    while not creator.is_done():
        needs_more, off, size = creator.feed(data)
        if not needs_more: break
        f.seek(off); data = f.read(size)
    index = creator.get_video_index()

Behavioral notes:
  - Handles 64-bit `largesize` boxes, size==0 (extends to EOF), and `uuid`
    extended types.
  - Unfragmented: expands stsc/stco/stsz into absolute per-sample file
    offsets (vectorized with numpy); keyframes from stss (1-based -> 0-based;
    absent => every sample is a keyframe, matching mp4_index_creator.cpp:413-417).
  - Fragmented (mvex present): collects trex defaults then walks every
    moof/traf/trun resolving the tfhd base-offset modes; keyframe =
    not (sample_flags & 0x00010000).  The reference's trun bug (clobbering
    the default size when sample sizes are present, mp4_index_creator.cpp:660-662)
    is NOT replicated.
  - Codec extradata = payload of the avcC/hvcC child of the stsd visual
    sample entry; `format` = the sample entry fourcc (avc1/hvc1/hev1/...).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .utils.bits import ByteReader
from .video_index import VideoIndex

_VIDEO_SAMPLE_ENTRIES = {
    "avc1", "avc2", "avc3", "avc4",
    "hvc1", "hev1",
    "mp4v", "vp08", "vp09", "av01",
}

_ACCEPTED_BRANDS = {
    "isom", "iso2", "iso3", "iso4", "iso5", "iso6",
    "avc1", "mp41", "mp42", "dash", "hvc1", "hev1", "M4V ",
}


@dataclasses.dataclass
class _BoxHeader:
    type: str
    size: int          # total box size in bytes (incl. header)
    header_size: int   # bytes consumed by the header itself


def _parse_box_header(r: ByteReader, file_remaining: int) -> _BoxHeader:
    size = r.u32()
    typ = r.fourcc()
    hsize = 8
    if size == 1:
        size = r.u64()
        hsize += 8
    elif size == 0:
        size = file_remaining
    if typ == "uuid":
        r.skip(16)
        hsize += 16
    if size < hsize:
        raise ValueError(f"invalid box size {size} for '{typ}'")
    return _BoxHeader(typ, size, hsize)


def _fullbox(r: ByteReader) -> tuple[int, int]:
    version = r.u8()
    flags = r.u24()
    return version, flags


def _walk_children(r: ByteReader):
    """Yield (box_type, payload ByteReader) for each child box of `r`.

    Handles 64-bit largesize and uuid extended headers; the payload reader
    spans exactly the box body.
    """
    while r.remaining() >= 8:
        box_start = r.pos
        hdr = _parse_box_header(r, r.remaining())
        payload_start = box_start + hdr.header_size
        box_end = box_start + hdr.size
        if box_end > r.end:
            raise ValueError(f"child box '{hdr.type}' overruns parent")
        yield hdr.type, ByteReader(r.buf, payload_start, box_end)
        r.pos = box_end


@dataclasses.dataclass
class _TrexDefaults:
    track_id: int = 0
    default_sample_description_index: int = 0
    default_sample_duration: int = 0
    default_sample_size: int = 0
    default_sample_flags: int = 0


@dataclasses.dataclass
class _Track:
    """Parsed state for the selected video track."""

    track_id: int = 0
    timescale: int = 0
    duration: int = 0
    width: int = 0
    height: int = 0
    format: str = ""
    extradata: bytes = b""
    # stbl tables
    sample_sizes: Optional[np.ndarray] = None       # uint64 [n]
    samples_per_chunk: Optional[np.ndarray] = None  # uint32 [nchunks]
    chunk_offsets: Optional[np.ndarray] = None      # uint64 [nchunks]
    sync_samples: Optional[np.ndarray] = None       # uint64 [k], 0-based
    has_stss: bool = False
    stsc_runs: Optional[np.ndarray] = None          # [k,3] raw stsc entries
    has_reorder: bool = False  # ctts with nonzero offsets (B frames):
                               # decode order != display order


class MP4IndexCreator:
    """Incremental MP4 indexer.  See module docstring for the protocol."""

    _PROBE_SIZE = 1024

    def __init__(self, file_size: int):
        if file_size <= 8:
            raise ValueError("file too small to be an MP4")
        self._file_size = int(file_size)
        self._pos = 0                    # absolute offset of next unparsed box
        self._want = (0, min(self._PROBE_SIZE, file_size))
        self._done = False
        self._error = False
        self._error_message = ""
        self._saw_ftyp = False
        self._track: Optional[_Track] = None
        self._fragmented = False
        self._trex: dict[int, _TrexDefaults] = {}
        # accumulated fragment samples
        self._frag_offsets: list[np.ndarray] = []
        self._frag_sizes: list[np.ndarray] = []
        self._frag_sync: list[np.ndarray] = []
        self._frag_duration = 0
        self._frag_sample_base = 0
        self._index: Optional[VideoIndex] = None

    # -- protocol ---------------------------------------------------------
    def is_done(self) -> bool:
        return self._done

    def is_error(self) -> bool:
        return self._error

    def error_message(self) -> str:
        return self._error_message

    def next_window(self) -> tuple[int, int]:
        return self._want

    def feed(self, data: bytes) -> tuple[bool, int, int]:
        """Consume the window previously requested; returns
        (needs_more_data, next_offset, next_size)."""
        if self._done:
            return (False, 0, 0)
        try:
            self._step(bytes(data))
        except Exception as e:  # latch errors, parity with is_error()
            self._fail(f"{type(e).__name__}: {e}")
        if self._done:
            return (False, 0, 0)
        off, size = self._want
        return (True, off, size)

    def get_video_index(self) -> VideoIndex:
        if not self._done or self._error or self._index is None:
            raise RuntimeError(
                "index not available: " + (self._error_message or "not done")
            )
        return self._index

    # -- state machine ----------------------------------------------------
    def _fail(self, msg: str) -> None:
        self._error = True
        self._error_message = msg
        self._done = True

    def _request(self, offset: int, size: int) -> None:
        size = min(size, self._file_size - offset)
        if size <= 0:
            self._finalize()
        else:
            self._want = (offset, size)

    def _step(self, data: bytes) -> None:
        avail = len(data)
        if avail == 0:
            self._finalize()
            return
        if avail < 16 and self._pos + avail < self._file_size:
            # Not enough for a header probe; ask again with more.
            self._request(self._pos, max(32, avail * 2))
            return

        r = ByteReader(data)
        hdr = _parse_box_header(r, self._file_size - self._pos)
        box_end = self._pos + hdr.size

        if hdr.type in ("ftyp", "moov", "moof"):
            if avail < hdr.size:
                # need the complete box in one window
                self._request(self._pos, hdr.size)
                return
            payload = ByteReader(data, hdr.header_size, hdr.size)
            if hdr.type == "ftyp":
                self._parse_ftyp(payload)
            elif hdr.type == "moov":
                self._parse_moov(payload)
            elif hdr.type == "moof":
                if self._fragmented and self._track is not None:
                    self._parse_moof(payload, moof_offset=self._pos)
            if self._error:
                return
        # advance past this box
        self._pos = box_end
        if self._pos >= self._file_size:
            self._finalize()
        else:
            self._request(self._pos, self._PROBE_SIZE)

    def _finalize(self) -> None:
        if self._done:
            return
        if self._track is None:
            self._fail("no video track found (missing moov or 'vide' handler)")
            return
        t = self._track
        if self._fragmented:
            if self._frag_offsets:
                offsets = np.concatenate(self._frag_offsets)
                sizes = np.concatenate(self._frag_sizes)
                sync = (
                    np.concatenate(self._frag_sync)
                    if self._frag_sync
                    else np.zeros(0, np.uint64)
                )
            else:
                offsets = np.zeros(0, np.uint64)
                sizes = np.zeros(0, np.uint64)
                sync = np.zeros(0, np.uint64)
            duration = t.duration if t.duration else self._frag_duration
        else:
            if t.sample_sizes is None or t.chunk_offsets is None:
                self._fail("moov missing sample tables (stsz/stco)")
                return
            offsets = self._expand_chunk_offsets(t)
            sizes = t.sample_sizes
            if t.has_stss and t.sync_samples is not None:
                sync = t.sync_samples
            else:
                # No stss box: every sample is a sync sample.
                sync = np.arange(len(sizes), dtype=np.uint64)
            duration = t.duration
        self._index = VideoIndex(
            timescale=t.timescale,
            duration=int(duration),
            frame_width=t.width,
            frame_height=t.height,
            format=t.format,
            sample_offsets=offsets,
            sample_sizes=sizes,
            keyframe_indices=sync,
            metadata_bytes=t.extradata,
            has_reorder=t.has_reorder,
        )
        self._done = True

    @staticmethod
    def _expand_chunk_offsets(t: _Track) -> np.ndarray:
        """Per-sample absolute file offsets from stsc/stco/stsz (vectorized)."""
        spc = t.samples_per_chunk.astype(np.int64)
        n_samples = len(t.sample_sizes)
        total = int(spc.sum())
        if total < n_samples:
            raise ValueError(
                f"stsc expansion covers {total} samples < stsz count {n_samples}"
            )
        # chunk id for each sample
        chunk_id = np.repeat(np.arange(len(spc)), spc)[:n_samples]
        sizes = t.sample_sizes.astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(sizes)[:-1]))  # exclusive prefix
        # offset within chunk = csum[i] - csum[first sample of chunk]
        chunk_first = np.concatenate(([0], np.cumsum(spc)[:-1]))
        within = csum - csum[chunk_first[chunk_id]]
        offsets = t.chunk_offsets.astype(np.int64)[chunk_id] + within
        return offsets.astype(np.uint64)

    # -- box parsers ------------------------------------------------------
    def _parse_ftyp(self, r: ByteReader) -> None:
        major = r.fourcc()
        r.u32()  # minor version
        brands = {major}
        while r.remaining() >= 4:
            brands.add(r.fourcc())
        self._saw_ftyp = True
        if not (brands & _ACCEPTED_BRANDS):
            self._fail(f"unsupported ftyp brands: {sorted(brands)}")

    def _parse_moov(self, r: ByteReader) -> None:
        for typ, body in _walk_children(r):
            if typ == "trak" and self._track is None:
                track = self._parse_trak(body)
                if track is not None:
                    self._track = track
            elif typ == "mvex":
                self._parse_mvex(body)
                if self._error:
                    return

    def _parse_mvex(self, r: ByteReader) -> None:
        self._fragmented = True
        for typ, body in _walk_children(r):
            if typ == "trex":
                _fullbox(body)
                tx = _TrexDefaults(
                    track_id=body.u32(),
                    default_sample_description_index=body.u32(),
                    default_sample_duration=body.u32(),
                    default_sample_size=body.u32(),
                    default_sample_flags=body.u32(),
                )
                self._trex[tx.track_id] = tx
            elif typ == "leva":
                # Level assignment interleaves sample data; a linear offset
                # model would be wrong (parity: mp4_index_creator.cpp:539-545
                # also rejects these files).
                self._fail("leva (level assignment) boxes are not supported")
                return

    def _parse_trak(self, r: ByteReader) -> Optional[_Track]:
        t = _Track()
        is_video = False
        for typ, body in _walk_children(r):
            if typ == "tkhd":
                ver, _ = _fullbox(body)
                if ver == 1:
                    body.skip(8 + 8)  # creation, modification
                    t.track_id = body.u32()
                    body.skip(4 + 8)  # reserved, duration
                else:
                    body.skip(4 + 4)
                    t.track_id = body.u32()
                    body.skip(4 + 4)
                # reserved[2], layer, alt group, volume, reserved, matrix[9]
                body.skip(8 + 2 + 2 + 2 + 2 + 36)
                # 16.16 fixed point; stsd's VisualSampleEntry overrides later
                t.width = body.u32() >> 16
                t.height = body.u32() >> 16
            elif typ == "mdia":
                is_video = self._parse_mdia(body, t)
        return t if is_video else None

    def _parse_mdia(self, r: ByteReader, t: _Track) -> bool:
        is_video = False
        for typ, body in _walk_children(r):
            if typ == "mdhd":
                ver, _ = _fullbox(body)
                if ver == 1:
                    body.skip(16)
                    t.timescale = body.u32()
                    t.duration = body.u64()
                else:
                    body.skip(8)
                    t.timescale = body.u32()
                    t.duration = body.u32()
            elif typ == "hdlr":
                _fullbox(body)
                body.skip(4)  # pre_defined
                is_video = body.fourcc() == "vide"
            elif typ == "minf":
                self._parse_minf(body, t)
        return is_video

    def _parse_minf(self, r: ByteReader, t: _Track) -> None:
        for typ, body in _walk_children(r):
            if typ == "stbl":
                self._parse_stbl(body, t)

    def _parse_stbl(self, r: ByteReader, t: _Track) -> None:
        for typ, body in _walk_children(r):
            if typ == "stsd":
                self._parse_stsd(body, t)
            elif typ == "stsz":
                _fullbox(body)
                uniform = body.u32()
                count = body.u32()
                if uniform:
                    t.sample_sizes = np.full(count, uniform, np.uint64)
                else:
                    raw = body.read(4 * count)
                    t.sample_sizes = np.frombuffer(raw, ">u4").astype(np.uint64)
            elif typ == "stz2":
                _fullbox(body)
                body.skip(3)
                field_size = body.u8()
                count = body.u32()
                if field_size == 16:
                    raw = body.read(2 * count)
                    t.sample_sizes = np.frombuffer(raw, ">u2").astype(np.uint64)
                elif field_size == 8:
                    raw = body.read(count)
                    t.sample_sizes = np.frombuffer(raw, "u1").astype(np.uint64)
                elif field_size == 4:
                    raw = np.frombuffer(body.read((count + 1) // 2), "u1")
                    both = np.stack([raw >> 4, raw & 0xF], 1).reshape(-1)[:count]
                    t.sample_sizes = both.astype(np.uint64)
                else:
                    raise ValueError(f"bad stz2 field size {field_size}")
            elif typ == "stsc":
                _fullbox(body)
                count = body.u32()
                t.stsc_runs = np.frombuffer(
                    body.read(12 * count), ">u4"
                ).reshape(count, 3)
            elif typ in ("stco", "co64"):
                _fullbox(body)
                count = body.u32()
                if typ == "stco":
                    t.chunk_offsets = np.frombuffer(
                        body.read(4 * count), ">u4"
                    ).astype(np.uint64)
                else:
                    t.chunk_offsets = np.frombuffer(
                        body.read(8 * count), ">u8"
                    ).astype(np.uint64)
            elif typ == "stss":
                _fullbox(body)
                count = body.u32()
                raw = np.frombuffer(body.read(4 * count), ">u4").astype(np.uint64)
                t.sync_samples = raw - 1  # 1-based -> 0-based
                t.has_stss = True
            elif typ == "ctts":
                # composition offsets: any spread in sample_offset means
                # the stream reorders (B frames)
                _fullbox(body)
                count = body.u32()
                raw = np.frombuffer(body.read(8 * count), ">u4").reshape(
                    count, 2
                )
                offs = raw[:, 1].astype(np.int64)
                t.has_reorder = bool(count > 0 and
                                     (offs != offs[0]).any())
        # expand stsc runs into per-chunk sample counts
        if t.chunk_offsets is not None:
            nchunks = len(t.chunk_offsets)
            if t.stsc_runs is None or len(t.stsc_runs) == 0:
                t.samples_per_chunk = np.ones(nchunks, np.uint32)
            else:
                firsts = t.stsc_runs[:, 0].astype(np.int64) - 1  # 0-based
                spcs = t.stsc_runs[:, 1].astype(np.int64)
                bounds = np.concatenate((firsts, [nchunks]))
                runs = np.diff(bounds)
                if np.any(runs < 0):
                    raise ValueError("stsc first_chunk not increasing")
                t.samples_per_chunk = np.repeat(spcs, runs).astype(np.uint32)

    def _parse_stsd(self, r: ByteReader, t: _Track) -> None:
        _fullbox(r)
        entry_count = r.u32()
        if entry_count < 1:
            return
        box_start = r.pos
        hdr = _parse_box_header(r, r.remaining())
        t.format = hdr.type
        if hdr.type not in _VIDEO_SAMPLE_ENTRIES:
            return
        body = ByteReader(r.buf, box_start + hdr.header_size, box_start + hdr.size)
        # VisualSampleEntry (ISO 14496-12 12.1.3)
        body.skip(6)  # reserved
        body.u16()  # data_reference_index
        body.skip(2 + 2 + 12)  # pre_defined, reserved, pre_defined[3]
        t.width = body.u16()
        t.height = body.u16()
        body.skip(4 + 4 + 4)  # horizresolution, vertresolution, reserved
        body.u16()  # frame_count
        body.skip(32)  # compressorname
        body.u16()  # depth
        body.skip(2)  # pre_defined
        # child boxes: avcC / hvcC / pasp / ...
        for ctyp, cbody in _walk_children(body):
            if ctyp in ("avcC", "hvcC", "vpcC", "av1C", "esds"):
                t.extradata = bytes(cbody.buf[cbody.pos : cbody.end])

    # -- fragments --------------------------------------------------------
    def _parse_moof(self, r: ByteReader, moof_offset: int) -> None:
        for typ, body in _walk_children(r):
            if typ == "traf":
                self._parse_traf(body, moof_offset)

    def _parse_traf(self, r: ByteReader, moof_offset: int) -> None:
        track_id = None
        base_data_offset = None
        default_sample_duration = None
        default_sample_size = None
        default_sample_flags = None
        truns = []
        for typ, body in _walk_children(r):
            if typ == "tfhd":
                _, flags = _fullbox(body)
                track_id = body.u32()
                if flags & 0x000001:
                    base_data_offset = body.u64()
                if flags & 0x000002:
                    body.u32()  # sample_description_index
                if flags & 0x000008:
                    default_sample_duration = body.u32()
                if flags & 0x000010:
                    default_sample_size = body.u32()
                if flags & 0x000020:
                    default_sample_flags = body.u32()
            elif typ == "trun":
                ver, flags = _fullbox(body)
                count = body.u32()
                data_offset = body.s32() if flags & 0x000001 else None
                first_flags = body.u32() if flags & 0x000004 else None
                sizes = np.empty(count, np.int64)
                durations = np.empty(count, np.int64)
                sflags = np.empty(count, np.int64)
                for i in range(count):
                    durations[i] = body.u32() if flags & 0x000100 else -1
                    sizes[i] = body.u32() if flags & 0x000200 else -1
                    sflags[i] = body.u32() if flags & 0x000400 else -1
                    if flags & 0x000800:
                        # composition time offset (s32 in v1): any nonzero
                        # offset means decode order != display order
                        if body.u32() != 0 and self._track is not None:
                            self._track.has_reorder = True
                truns.append((data_offset, first_flags, sizes, durations, sflags))

        if track_id is None or self._track is None:
            return
        if track_id != self._track.track_id:
            return  # fragment for a non-video track
        trex = self._trex.get(track_id, _TrexDefaults())
        d_dur = (
            default_sample_duration
            if default_sample_duration is not None
            else trex.default_sample_duration
        )
        d_size = (
            default_sample_size
            if default_sample_size is not None
            else trex.default_sample_size
        )
        d_flags = (
            default_sample_flags
            if default_sample_flags is not None
            else trex.default_sample_flags
        )
        if base_data_offset is not None:
            base = base_data_offset
        else:
            # default-base-is-moof, and in practice also the fallback case
            # (first traf of the moof references data following the moof).
            base = moof_offset
        cursor = base
        for data_offset, first_flags, sizes, durations, sflags in truns:
            if data_offset is not None:
                cursor = base + data_offset
            n = len(sizes)
            sizes = np.where(sizes < 0, d_size, sizes)
            durations = np.where(durations < 0, d_dur, durations)
            sflags = np.where(sflags < 0, d_flags, sflags)
            if first_flags is not None and n > 0:
                sflags[0] = first_flags
            offsets = cursor + np.concatenate(([0], np.cumsum(sizes)[:-1]))
            cursor = cursor + int(sizes.sum())
            sync_mask = (sflags & 0x00010000) == 0
            sync_idx = np.nonzero(sync_mask)[0] + self._frag_sample_base
            self._frag_offsets.append(offsets.astype(np.uint64))
            self._frag_sizes.append(sizes.astype(np.uint64))
            self._frag_sync.append(sync_idx.astype(np.uint64))
            self._frag_duration += int(durations.sum())
            self._frag_sample_base += n


def index_video(f) -> VideoIndex:
    """Index an MP4 from a file object or path.

    Parity: python/hwang/__init__.py:5-26 — drives the pull-parser loop,
    starting with a 1KB read at offset 0.
    """
    import io as _io
    import os

    close = False
    if isinstance(f, (str, bytes, os.PathLike)):
        f = open(f, "rb")
        close = True
    try:
        f.seek(0, _io.SEEK_END)
        file_size = f.tell()
        f.seek(0)
        creator = MP4IndexCreator(file_size)
        data = f.read(min(1024, file_size))
        while not creator.is_done():
            needs_more, off, size = creator.feed(data)
            if not needs_more:
                break
            f.seek(off)
            data = f.read(size)
        if creator.is_error():
            raise ValueError(f"failed to index video: {creator.error_message()}")
        return creator.get_video_index()
    finally:
        if close:
            f.close()


def index_video_bytes(data: bytes) -> VideoIndex:
    """Index an MP4 already resident in memory."""
    import io as _io

    return index_video(_io.BytesIO(data))
