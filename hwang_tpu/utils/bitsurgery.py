"""H.264 bitstream surgery: parse, modify and re-emit parameter sets and
slice headers, then rebuild the MP4.

No encoder emits several spec features the decoder must support
(long-term references, MMCO 2-6, pic_order_cnt_type=1, explicit B
weighting) — x264 never produces them.  This module synthesizes
conformant test streams by rewriting x264 output at the bit level:

  * SPS/PPS are fully re-encoded from parsed field dicts (subset
    matching native/src/h264/h264_decode.cpp's parser).
  * Slice headers are re-emitted field by field with modifications;
    the slice DATA is copied verbatim — bit-shifted for CAVLC, or
    byte-aligned after fresh cabac_alignment bits for CABAC.
  * Samples are re-packed into a minimal unfragmented MP4 the indexer
    understands.

Rewritten streams stay decodable by libavcodec, which remains the
bit-exact ground truth: modifications may change WHICH pixels are
predicted (reference lists shift), but two correct decoders still agree
exactly.  The reference had no such tooling (its tests downloaded real
videos, decoder_automata_test.cpp); this is the TPU rebuild's fixture
synthesizer for the features x264 cannot produce.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .bits import BitReader

SLICE_P, SLICE_B, SLICE_I = 0, 1, 2


class BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def u1(self, v: int):
        self._bits.append(v & 1)

    def u(self, n: int, v: int):
        for i in range(n - 1, -1, -1):
            self._bits.append((v >> i) & 1)

    def ue(self, v: int):
        v += 1
        n = v.bit_length()
        self.u(2 * n - 1, v)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def copy_bits(self, r: BitReader, n: int):
        for _ in range(n):
            self._bits.append(r.u1())

    def align_ones(self):
        while len(self._bits) % 8:
            self._bits.append(1)

    def rbsp_trailing(self):
        self._bits.append(1)
        while len(self._bits) % 8:
            self._bits.append(0)

    def bit_length(self) -> int:
        return len(self._bits)

    def to_bytes(self) -> bytes:
        out = bytearray()
        acc, n = 0, 0
        for b in self._bits:
            acc = (acc << 1) | b
            n += 1
            if n == 8:
                out.append(acc)
                acc = n = 0
        if n:
            out.append(acc << (8 - n))
        return bytes(out)


def strip_ep(data: bytes) -> bytes:
    """Remove emulation-prevention bytes from an RBSP."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        b = data[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def add_ep(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


# ---------------------------------------------------------------------------
# SPS / PPS codecs (subset matching the native parser)
# ---------------------------------------------------------------------------


@dataclass
class Sps:
    profile_idc: int = 0
    constraint_flags: int = 0
    level_idc: int = 0
    sps_id: int = 0
    chroma_format_idc: int = 1
    bit_depth_luma: int = 8
    bit_depth_chroma: int = 8
    qpprime_bypass: int = 0
    seq_scaling_present: int = 0
    log2_max_frame_num: int = 4
    pic_order_cnt_type: int = 0
    log2_max_poc_lsb: int = 4
    delta_pic_order_always_zero: int = 0
    offset_for_non_ref_pic: int = 0
    offset_for_top_to_bottom_field: int = 0
    offsets_for_ref_frame: list = field(default_factory=list)
    max_num_ref_frames: int = 1
    gaps_allowed: int = 0
    pic_width_in_mbs: int = 0
    pic_height_in_map_units: int = 0
    frame_mbs_only: int = 1
    direct_8x8_inference: int = 1
    crop: tuple = (0, 0, 0, 0)
    vui_bits: list = field(default_factory=list)  # raw tail (VUI + trailing)


def parse_sps(rbsp: bytes) -> Sps:
    r = BitReader(rbsp)
    s = Sps()
    s.profile_idc = r.u(8)
    s.constraint_flags = r.u(8)
    s.level_idc = r.u(8)
    s.sps_id = r.ue()
    if s.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        s.chroma_format_idc = r.ue()
        if s.chroma_format_idc == 3:
            r.u1()
        s.bit_depth_luma = r.ue() + 8
        s.bit_depth_chroma = r.ue() + 8
        s.qpprime_bypass = r.u1()
        s.seq_scaling_present = r.u1()
        if s.seq_scaling_present:
            raise NotImplementedError("SPS scaling lists not supported here")
    s.log2_max_frame_num = r.ue() + 4
    s.pic_order_cnt_type = r.ue()
    if s.pic_order_cnt_type == 0:
        s.log2_max_poc_lsb = r.ue() + 4
    elif s.pic_order_cnt_type == 1:
        s.delta_pic_order_always_zero = r.u1()
        s.offset_for_non_ref_pic = r.se()
        s.offset_for_top_to_bottom_field = r.se()
        n = r.ue()
        s.offsets_for_ref_frame = [r.se() for _ in range(n)]
    s.max_num_ref_frames = r.ue()
    s.gaps_allowed = r.u1()
    s.pic_width_in_mbs = r.ue() + 1
    s.pic_height_in_map_units = r.ue() + 1
    s.frame_mbs_only = r.u1()
    if not s.frame_mbs_only:
        r.u1()
    s.direct_8x8_inference = r.u1()
    if r.u1():
        s.crop = (r.ue(), r.ue(), r.ue(), r.ue())
    else:
        s.crop = None
    # keep the rest (vui_parameters_present + VUI + trailing) verbatim
    s.vui_bits = [r.u1() for _ in range(r.bits_left())]
    return s


def emit_sps(s: Sps) -> bytes:
    w = BitWriter()
    w.u(8, s.profile_idc)
    w.u(8, s.constraint_flags)
    w.u(8, s.level_idc)
    w.ue(s.sps_id)
    if s.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        w.ue(s.chroma_format_idc)
        w.ue(s.bit_depth_luma - 8)
        w.ue(s.bit_depth_chroma - 8)
        w.u1(s.qpprime_bypass)
        w.u1(0)  # seq_scaling_matrix_present
    w.ue(s.log2_max_frame_num - 4)
    w.ue(s.pic_order_cnt_type)
    if s.pic_order_cnt_type == 0:
        w.ue(s.log2_max_poc_lsb - 4)
    elif s.pic_order_cnt_type == 1:
        w.u1(s.delta_pic_order_always_zero)
        w.se(s.offset_for_non_ref_pic)
        w.se(s.offset_for_top_to_bottom_field)
        w.ue(len(s.offsets_for_ref_frame))
        for v in s.offsets_for_ref_frame:
            w.se(v)
    w.ue(s.max_num_ref_frames)
    w.u1(s.gaps_allowed)
    w.ue(s.pic_width_in_mbs - 1)
    w.ue(s.pic_height_in_map_units - 1)
    w.u1(s.frame_mbs_only)
    w.u1(s.direct_8x8_inference)
    if s.crop is not None:
        w.u1(1)
        for v in s.crop:
            w.ue(v)
    else:
        w.u1(0)
    for b in s.vui_bits:
        w.u1(b)
    # vui_bits already contains rbsp trailing bits
    return w.to_bytes()


@dataclass
class Pps:
    pps_id: int = 0
    sps_id: int = 0
    entropy_coding_mode: int = 0
    bottom_field_poc_present: int = 0
    num_slice_groups: int = 1
    num_ref_idx_l0_default: int = 1
    num_ref_idx_l1_default: int = 1
    weighted_pred: int = 0
    weighted_bipred_idc: int = 0
    pic_init_qp: int = 26
    pic_init_qs: int = 26
    chroma_qp_index_offset: int = 0
    deblocking_control_present: int = 0
    constrained_intra_pred: int = 0
    redundant_pic_cnt_present: int = 0
    tail_bits: list = field(default_factory=list)  # High-profile extras


def parse_pps(rbsp: bytes) -> Pps:
    r = BitReader(rbsp)
    p = Pps()
    p.pps_id = r.ue()
    p.sps_id = r.ue()
    p.entropy_coding_mode = r.u1()
    p.bottom_field_poc_present = r.u1()
    p.num_slice_groups = r.ue() + 1
    if p.num_slice_groups != 1:
        raise NotImplementedError("FMO surgery not supported")
    p.num_ref_idx_l0_default = r.ue() + 1
    p.num_ref_idx_l1_default = r.ue() + 1
    p.weighted_pred = r.u1()
    p.weighted_bipred_idc = r.u(2)
    p.pic_init_qp = r.se() + 26
    p.pic_init_qs = r.se() + 26
    p.chroma_qp_index_offset = r.se()
    p.deblocking_control_present = r.u1()
    p.constrained_intra_pred = r.u1()
    p.redundant_pic_cnt_present = r.u1()
    p.tail_bits = [r.u1() for _ in range(r.bits_left())]
    return p


def emit_pps(p: Pps) -> bytes:
    w = BitWriter()
    w.ue(p.pps_id)
    w.ue(p.sps_id)
    w.u1(p.entropy_coding_mode)
    w.u1(p.bottom_field_poc_present)
    w.ue(p.num_slice_groups - 1)
    w.ue(p.num_ref_idx_l0_default - 1)
    w.ue(p.num_ref_idx_l1_default - 1)
    w.u1(p.weighted_pred)
    w.u(2, p.weighted_bipred_idc)
    w.se(p.pic_init_qp - 26)
    w.se(p.pic_init_qs - 26)
    w.se(p.chroma_qp_index_offset)
    w.u1(p.deblocking_control_present)
    w.u1(p.constrained_intra_pred)
    w.u1(p.redundant_pic_cnt_present)
    for b in p.tail_bits:
        w.u1(b)
    return w.to_bytes()


# ---------------------------------------------------------------------------
# Slice-header rewrite
# ---------------------------------------------------------------------------


@dataclass
class SliceEdit:
    """Per-slice modification request, applied by rewrite_stream.

    mmco: list of (op, v1, v2) memory-management ops to install (sets
      adaptive_ref_pic_marking); None leaves marking untouched.
    idr_long_term: set long_term_reference_flag on IDR slices.
    weight_tables: (luma_log2, chroma_log2, l0, l1) explicit prediction
      weights to insert, each list entry (wy, oy, [(wu, ou), (wv, ov)]) or
      None for defaults; installed when the (new) PPS requires a
      pred_weight_table the original stream did not carry.
    """

    mmco: list | None = None
    idr_long_term: bool = False
    weight_tables: tuple | None = None


def _rewrite_slice_header(rbsp: bytes, nal_ref_idc: int, is_idr: bool,
                          sps_old: Sps, sps_new: Sps, pps_old: Pps,
                          pps_new: Pps, edit: SliceEdit | None) -> bytes:
    """Re-emit one slice NAL's RBSP with header changes; payload copied."""
    r = BitReader(rbsp)
    w = BitWriter()

    first_mb = r.ue()
    w.ue(first_mb)
    slice_type_raw = r.ue()
    w.ue(slice_type_raw)
    st = slice_type_raw % 5
    w.ue(r.ue())  # pps id
    frame_num = r.u(sps_old.log2_max_frame_num)
    w.u(sps_new.log2_max_frame_num, frame_num)
    if is_idr:
        w.ue(r.ue())  # idr_pic_id
    if sps_old.pic_order_cnt_type == 0:
        poc_lsb = r.u(sps_old.log2_max_poc_lsb)
        if pps_old.bottom_field_poc_present:
            r.se()
    else:
        poc_lsb = None
        if (sps_old.pic_order_cnt_type == 1
                and not sps_old.delta_pic_order_always_zero):
            r.se()
            if pps_old.bottom_field_poc_present:
                r.se()
    if sps_new.pic_order_cnt_type == 0:
        w.u(sps_new.log2_max_poc_lsb,
            poc_lsb if poc_lsb is not None else (2 * frame_num) %
            (1 << sps_new.log2_max_poc_lsb))
        if pps_new.bottom_field_poc_present:
            w.se(0)
    elif (sps_new.pic_order_cnt_type == 1
          and not sps_new.delta_pic_order_always_zero):
        w.se(0)
        if pps_new.bottom_field_poc_present:
            w.se(0)
    if pps_old.redundant_pic_cnt_present:
        w.ue(r.ue())
    n_l0 = pps_old.num_ref_idx_l0_default
    n_l1 = pps_old.num_ref_idx_l1_default
    if st == SLICE_B:
        w.u1(r.u1())  # direct_spatial
    if st in (SLICE_P, SLICE_B):
        override = r.u1()
        w.u1(override)
        if override:
            n_l0 = r.ue() + 1
            w.ue(n_l0 - 1)
            if st == SLICE_B:
                n_l1 = r.ue() + 1
                w.ue(n_l1 - 1)
    # ref_pic_list_modification (copied verbatim)
    if st != SLICE_I:
        flag = r.u1()
        w.u1(flag)
        if flag:
            while True:
                idc = r.ue()
                w.ue(idc)
                if idc == 3:
                    break
                w.ue(r.ue())
        if st == SLICE_B:
            flag = r.u1()
            w.u1(flag)
            if flag:
                while True:
                    idc = r.ue()
                    w.ue(idc)
                    if idc == 3:
                        break
                    w.ue(r.ue())
    # pred_weight_table
    had_weights = (
        (pps_old.weighted_pred and st == SLICE_P)
        or (pps_old.weighted_bipred_idc == 1 and st == SLICE_B)
    )
    need_weights = (
        (pps_new.weighted_pred and st == SLICE_P)
        or (pps_new.weighted_bipred_idc == 1 and st == SLICE_B)
    )
    if had_weights:
        # consume the existing table; re-emit it only if the new PPS still
        # requires one (an edit may turn weighted_pred/bipred off, in which
        # case writing the table would corrupt the stream)
        emit = need_weights

        def cp_ue():
            v = r.ue()
            if emit:
                w.ue(v)

        def cp_u1():
            v = r.u1()
            if emit:
                w.u1(v)
            return v

        def cp_se():
            v = r.se()
            if emit:
                w.se(v)

        cp_ue()  # luma_log2_weight_denom
        cp_ue()  # chroma_log2_weight_denom
        counts = [n_l0] + ([n_l1] if st == SLICE_B else [])
        for n_active in counts:
            for _ in range(n_active):
                if cp_u1():
                    cp_se()
                    cp_se()
                if cp_u1():
                    for _ in range(4):
                        cp_se()
    elif need_weights:
        wt = (edit.weight_tables if edit and edit.weight_tables
              else (5, 5, None, None))
        ll, lc, l0w, l1w = wt
        w.ue(ll)
        w.ue(lc)
        tables = [(n_l0, l0w)] + ([(n_l1, l1w)] if st == SLICE_B else [])
        for n_active, entries in tables:
            for i in range(n_active):
                e = entries[i] if entries and i < len(entries) else None
                if e is None:
                    w.u1(0)
                    w.u1(0)
                else:
                    wy, oy, chroma = e
                    w.u1(1)
                    w.se(wy)
                    w.se(oy)
                    if chroma is None:
                        w.u1(0)
                    else:
                        w.u1(1)
                        for wc, oc in chroma:
                            w.se(wc)
                            w.se(oc)
    # dec_ref_pic_marking
    if nal_ref_idc != 0:
        if is_idr:
            w.u1(r.u1())  # no_output_of_prior_pics
            lt = r.u1()
            w.u1(1 if (edit and edit.idr_long_term) else lt)
        else:
            adaptive = r.u1()
            ops_src = []
            if adaptive:
                while True:
                    op = r.ue()
                    if op == 0:
                        break
                    v1 = v2 = 0
                    if op in (1, 3):
                        v1 = r.ue()
                    if op == 2:
                        v1 = r.ue()
                    if op in (3, 6):
                        v2 = r.ue()
                    if op == 4:
                        v1 = r.ue()
                    ops_src.append((op, v1, v2))
            ops = edit.mmco if (edit and edit.mmco is not None) else (
                ops_src if adaptive else None)
            if ops is None:
                w.u1(0)
            else:
                w.u1(1)
                for op, v1, v2 in ops:
                    w.ue(op)
                    if op in (1, 3):
                        w.ue(v1)
                    if op == 2:
                        w.ue(v1)
                    if op in (3, 6):
                        w.ue(v2)
                    if op == 4:
                        w.ue(v1)
                w.ue(0)
    if pps_old.entropy_coding_mode and st != SLICE_I:
        w.ue(r.ue())  # cabac_init_idc
    w.se(r.se())      # slice_qp_delta
    if pps_old.deblocking_control_present:
        idc = r.ue()
        w.ue(idc)
        if idc != 1:
            w.se(r.se())
            w.se(r.se())

    # ---- payload ----
    if pps_old.entropy_coding_mode:
        # cabac_alignment_one_bit then byte-aligned data
        while not r.is_byte_aligned():
            r.u1()
        w.align_ones()
        return w.to_bytes() + rbsp[r.pos // 8:]
    # CAVLC: copy the remaining bits (includes rbsp trailing)
    w.copy_bits(r, r.bits_left())
    return w.to_bytes()


# ---------------------------------------------------------------------------
# MP4-level rewrite
# ---------------------------------------------------------------------------


def _walk_nals(sample: bytes, nls: int):
    pos = 0
    while pos + nls <= len(sample):
        ln = int.from_bytes(sample[pos:pos + nls], "big")
        yield sample[pos + nls:pos + nls + ln]
        pos += nls + ln


def rewrite_stream(path_in: str, path_out: str,
                   sps_fn=None, pps_fn=None, edit_fn=None):
    """Rewrite every parameter set and slice of an MP4's video track.

    sps_fn(Sps) / pps_fn(Pps) mutate the parameter sets in place;
    edit_fn(frame_index, slice_type, is_idr, nal_ref_idc) returns a
    SliceEdit (or None).  Produces a fresh unfragmented MP4.
    """
    from ..mp4_index import index_video

    vi = index_video(path_in)
    avcc = vi.metadata_bytes
    nls = (avcc[4] & 3) + 1
    # parse avcC parameter sets
    pos = 5
    n_sps = avcc[pos] & 0x1F
    pos += 1
    sps_nals = []
    for _ in range(n_sps):
        ln = struct.unpack(">H", avcc[pos:pos + 2])[0]
        pos += 2
        sps_nals.append(avcc[pos:pos + ln])
        pos += ln
    n_pps = avcc[pos]
    pos += 1
    pps_nals = []
    for _ in range(n_pps):
        ln = struct.unpack(">H", avcc[pos:pos + 2])[0]
        pos += 2
        pps_nals.append(avcc[pos:pos + ln])
        pos += ln

    sps_old = parse_sps(strip_ep(sps_nals[0][1:]))
    pps_old = parse_pps(strip_ep(pps_nals[0][1:]))
    import copy

    sps_new = copy.deepcopy(sps_old)
    pps_new = copy.deepcopy(pps_old)
    if sps_fn:
        sps_fn(sps_new)
    if pps_fn:
        pps_fn(pps_new)

    new_sps_nal = sps_nals[0][:1] + add_ep(emit_sps(sps_new))
    new_pps_nal = pps_nals[0][:1] + add_ep(emit_pps(pps_new))

    data = open(path_in, "rb").read()
    new_samples = []
    for i in range(vi.frames()):
        off = int(vi.sample_offsets[i])
        size = int(vi.sample_sizes[i])
        sample = data[off:off + size]
        out = bytearray()
        for nal in _walk_nals(sample, nls):
            nal_type = nal[0] & 0x1F
            ref_idc = (nal[0] >> 5) & 3
            if nal_type == 7:
                nal = new_sps_nal
            elif nal_type == 8:
                nal = new_pps_nal
            elif nal_type in (1, 5):
                rbsp = strip_ep(nal[1:])
                r = BitReader(rbsp)
                r.ue()
                st = r.ue() % 5
                edit = edit_fn(i, st, nal_type == 5, ref_idc) \
                    if edit_fn else None
                new_rbsp = _rewrite_slice_header(
                    rbsp, ref_idc, nal_type == 5, sps_old, sps_new,
                    pps_old, pps_new, edit,
                )
                nal = nal[:1] + add_ep(new_rbsp)
            out += len(nal).to_bytes(4, "big") + nal
        new_samples.append(bytes(out))

    new_avcc = bytearray(avcc[:4])
    new_avcc.append(0xFC | 3)  # 4-byte NAL lengths
    new_avcc.append(0xE0 | 1)
    new_avcc += struct.pack(">H", len(new_sps_nal)) + new_sps_nal
    new_avcc.append(1)
    new_avcc += struct.pack(">H", len(new_pps_nal)) + new_pps_nal

    keyframes = set(int(k) for k in vi.keyframe_indices)
    write_mp4(
        path_out, new_samples, sorted(keyframes), vi.frame_width, vi.frame_height,
        bytes(new_avcc), timescale=vi.timescale or 12800,
        sample_delta=max(1, (vi.duration or len(new_samples) * 512)
                         // max(1, len(new_samples))),
    )


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, ver_flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", ver_flags) + payload)


def write_mp4(path: str, samples: list, keyframes: list, width: int,
              height: int, avcc: bytes, timescale: int = 12800,
              sample_delta: int = 512):
    """Minimal unfragmented single-video-track MP4 writer."""
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mdat_payload = b"".join(samples)
    # layout: ftyp | moov | mdat; compute moov size via a two-pass build
    duration = n * sample_delta

    def build_moov(chunk_offset: int) -> bytes:
        mvhd = _full(b"mvhd", 0, struct.pack(
            ">IIII", 0, 0, timescale, duration
        ) + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + b"\x00" * 8
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + b"\x00" * 24 + struct.pack(">I", 2))
        tkhd = _full(b"tkhd", 7, struct.pack(
            ">IIIII", 0, 0, 1, 0, duration
        ) + b"\x00" * 16
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", width << 16, height << 16))
        mdhd = _full(b"mdhd", 0, struct.pack(
            ">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4,
                                                              0))
        hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + b"vide"
                     + b"\x00" * 12 + b"hwang\x00")
        vmhd = _full(b"vmhd", 1, b"\x00" * 8)
        dref = _full(b"dref", 0, struct.pack(">I", 1) + _full(b"url ", 1,
                                                              b""))
        dinf = _box(b"dinf", dref)
        avc1 = _box(b"avc1", b"\x00" * 6 + struct.pack(">H", 1)
                    + b"\x00" * 16
                    + struct.pack(">HH", width, height)
                    + struct.pack(">II", 0x480000, 0x480000)
                    + struct.pack(">I", 0) + struct.pack(">H", 1)
                    + b"\x00" * 32
                    + struct.pack(">H", 0x18) + struct.pack(">h", -1)
                    + _box(b"avcC", avcc))
        stsd = _full(b"stsd", 0, struct.pack(">I", 1) + avc1)
        stts = _full(b"stts", 0, struct.pack(">III", 1, n, sample_delta))
        stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, n, 1))
        stsz = _full(b"stsz", 0, struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", len(s)) for s in samples))
        stco = _full(b"stco", 0, struct.pack(">II", 1, chunk_offset))
        stss = _full(b"stss", 0, struct.pack(">I", len(keyframes))
                     + b"".join(struct.pack(">I", k + 1) for k in keyframes))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    moov = build_moov(0)
    chunk_offset = len(ftyp) + len(moov) + 8
    moov = build_moov(chunk_offset)
    with open(path, "wb") as f:
        f.write(ftyp)
        f.write(moov)
        f.write(_box(b"mdat", mdat_payload))


# ---------------------------------------------------------------------------
# Raw I_PCM stream synthesis (the one MB type an encoder can emit without
# any rate-distortion machinery).  x264 never produces I_PCM in practice,
# so conformance coverage needs streams built from scratch.
# ---------------------------------------------------------------------------


class CabacEnc:
    """Minimal CABAC encoder (spec 9.3.4): context bins, terminate,
    flush — just enough to emit I_PCM macroblock headers."""

    def __init__(self, writer: BitWriter):
        self.w = writer
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True

    def _put(self, b: int):
        if self.first:
            self.first = False
        else:
            self.w.u1(b)
        while self.outstanding:
            self.w.u1(1 - b)
            self.outstanding -= 1

    def _renorm(self):
        while self.range < 256:
            if self.low >= 512:
                self._put(1)
                self.low -= 512
            elif self.low < 256:
                self._put(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.low <<= 1
            self.range <<= 1

    def encode(self, states: bytearray, idx: int, binval: int):
        lps, trans_lps = _tables()
        s = states[idx]
        state = s >> 1
        mps = s & 1
        rlps = lps[state][(self.range >> 6) & 3]
        self.range -= rlps
        if binval != mps:
            self.low += self.range
            self.range = rlps
            if state == 0:
                mps = 1 - mps
            states[idx] = (trans_lps[state] << 1) | mps
        else:
            states[idx] = (min(state + 1, 62) << 1) | mps
        self._renorm()

    def terminate(self, binval: int):
        self.range -= 2
        if binval:
            self.low += self.range
            self.range = 2
            self._flush()
        else:
            self._renorm()

    def _flush(self):
        self.range = 2
        self._renorm()
        self._put((self.low >> 9) & 1)
        # WriteBits(((low >> 7) & 3) | 1, 2)
        v = ((self.low >> 7) & 3) | 1
        self._put((v >> 1) & 1)
        # second bit written directly (no outstanding handling needed)
        self.w.u1(v & 1)

    def restart(self):
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True


# CABAC engine tables (spec 9.3.3.2.1 / Table 9-44 and state transitions),
# mirrored from native/src/h264/h264_cabac_tables.h.
def _load_cabac_tables():
    import pathlib
    import re

    hdr = (pathlib.Path(__file__).resolve().parents[2]
           / "native" / "src" / "h264" / "h264_cabac_tables.h")
    if not hdr.is_file():
        raise FileNotFoundError(
            f"CABAC tables header not found at {hdr}; bitsurgery's CABAC "
            "writer needs a source checkout with native/src/h264/ present"
        )
    src = hdr.read_text()
    def grab(name, n):
        m = re.search(name + r"\[\]?[^{]*\{(.*?)\};", src, re.S)
        vals = [int(x) for x in re.findall(r"\d+", m.group(1))]
        return vals
    lps = grab(r"kRangeTabLPS", 64 * 4)
    lps = [lps[i * 4:(i + 1) * 4] for i in range(64)]
    return lps, grab(r"kTransIdxLPS", 64)


_LPS_TABLE = None
_TRANS_LPS = None


def _tables():
    global _LPS_TABLE, _TRANS_LPS
    if _LPS_TABLE is None:
        _LPS_TABLE, _TRANS_LPS = _load_cabac_tables()
    return _LPS_TABLE, _TRANS_LPS


def _cabac_ctx_init(qp: int):
    """Initial context states for I slices (cabac_init_idc n/a): spec
    9.3.1.1 with the (m, n) of ctx 0..67 (we only use mb_type ctx 3-5)."""
    # (m, n) for ctxIdx 0..10 (Table 9-12 subset; mb_type I contexts 3-7)
    mn = {3: (20, -15), 4: (2, 54), 5: (3, 74), 6: (20, -15), 7: (2, 54)}
    states = bytearray(1024)
    for idx, (m, n) in mn.items():
        pre = max(1, min(126, ((m * max(0, min(51, qp))) >> 4) + n))
        if pre <= 63:
            states[idx] = ((63 - pre) << 1) | 0
        else:
            states[idx] = ((pre - 64) << 1) | 1
    return states


def make_ipcm_mp4(path: str, n_frames: int, width: int, height: int,
                  cabac: bool = False, seed: int = 0):
    """Write an MP4 whose every macroblock is I_PCM (raw samples).

    Exercises the raw-passthrough path and, under CABAC, the engine
    flush / byte-align / re-init around pcm samples (spec 9.3.1.2).
    Returns the per-frame YUV planes for direct comparison.
    """
    import numpy as np

    mb_w, mb_h = width // 16, height // 16
    assert width % 16 == 0 and height % 16 == 0
    rng = np.random.RandomState(seed)
    sps = Sps(profile_idc=66 if not cabac else 77, level_idc=30,
              log2_max_frame_num=4, log2_max_poc_lsb=4,
              max_num_ref_frames=1, pic_width_in_mbs=mb_w,
              pic_height_in_map_units=mb_h, crop=None,
              vui_bits=[0, 1])  # vui_present=0 + rbsp stop bit
    pps = Pps(entropy_coding_mode=1 if cabac else 0,
              tail_bits=[1])  # rbsp stop bit
    sps_nal = bytes([0x67]) + add_ep(emit_sps(sps))
    pps_nal = bytes([0x68]) + add_ep(emit_pps(pps))

    frames = []
    samples = []
    for f in range(n_frames):
        Y = rng.randint(0, 256, (height, width)).astype(np.uint8)
        U = rng.randint(0, 256, (height // 2, width // 2)).astype(np.uint8)
        V = rng.randint(0, 256, (height // 2, width // 2)).astype(np.uint8)
        frames.append((Y, U, V))

        w = BitWriter()
        # slice header: IDR I slice every frame
        w.ue(0)            # first_mb_in_slice
        w.ue(7)            # slice_type = I (all slices)
        w.ue(0)            # pps id
        w.u(4, 0)          # frame_num
        w.ue(f)            # idr_pic_id
        w.u(4, 0)          # pic_order_cnt_lsb
        w.u1(0)            # no_output_of_prior_pics
        w.u1(0)            # long_term_reference_flag
        w.se(0)            # slice_qp_delta

        def pcm_payload(mb):
            my, mx = (mb // mb_w) * 16, (mb % mb_w) * 16
            out = bytearray()
            out += Y[my:my + 16, mx:mx + 16].tobytes()
            out += U[my // 2:my // 2 + 8, mx // 2:mx // 2 + 8].tobytes()
            out += V[my // 2:my // 2 + 8, mx // 2:mx // 2 + 8].tobytes()
            return bytes(out)

        if not cabac:
            for mb in range(mb_w * mb_h):
                w.ue(25)   # mb_type I_PCM
                while w.bit_length() % 8:
                    w.u1(0)  # pcm_alignment_zero_bit
                for b in pcm_payload(mb):
                    w.u(8, b)
            w.rbsp_trailing()
        else:
            w.align_ones()  # cabac_alignment_one_bit
            states = _cabac_ctx_init(26)
            enc = CabacEnc(w)
            n_mbs = mb_w * mb_h
            for mb in range(n_mbs):
                # mb_type prefix: ctxIdxOffset 3, inc from available
                # non-I_NxN neighbors (I_PCM counts)
                inc = 0
                if mb % mb_w:
                    inc += 1
                if mb >= mb_w:
                    inc += 1
                enc.encode(states, 3 + inc, 1)
                enc.terminate(1)  # I_PCM escape
                while w.bit_length() % 8:
                    w.u1(0)
                for b in pcm_payload(mb):
                    w.u(8, b)
                enc.restart()
                enc.terminate(0 if mb + 1 < n_mbs else 1)  # end_of_slice
            while w.bit_length() % 8:
                w.u1(0)  # cabac_zero / pad to byte
        slice_nal = bytes([0x65]) + add_ep(w.to_bytes())
        samples.append(
            len(sps_nal).to_bytes(4, "big") + sps_nal
            + len(pps_nal).to_bytes(4, "big") + pps_nal
            + len(slice_nal).to_bytes(4, "big") + slice_nal
        )

    avcc = bytes([1, sps.profile_idc, 0, sps.level_idc, 0xFC | 3,
                  0xE0 | 1])
    avcc += struct.pack(">H", len(sps_nal)) + sps_nal
    avcc += bytes([1]) + struct.pack(">H", len(pps_nal)) + pps_nal
    write_mp4(path, samples, list(range(n_frames)), width, height, avcc)
    return frames
