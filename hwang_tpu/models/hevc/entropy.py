"""ctypes binding for the native HEVC host entropy decoder.

Mirrors models/h264/entropy.py: the C decoder (native/src/hevc/
hevc_decode.cpp) parses parameter sets + I-slice CTU CABAC and emits
flat transform-unit entries in decode order — spatial position, size,
intra prediction mode, QP, and raster-order coefficients — which a
reconstruction path (ref_recon.py now; the JAX/TPU path next) consumes.

Reference parity: the upstream reference's HEVC support is codec
selection into FFmpeg/NVDEC (software_video_decoder.cpp:122-136); it
has no entropy layer of its own.
"""

from __future__ import annotations

import ctypes
import dataclasses

import numpy as np

from ...native import as_u8p, get_lib


class _HevcOut(ctypes.Structure):
    _fields_ = [
        ("n_tu", ctypes.c_void_p),
        ("tu_off", ctypes.c_void_p),
        ("tu_x", ctypes.c_void_p),
        ("tu_y", ctypes.c_void_p),
        ("tu_log2", ctypes.c_void_p),
        ("tu_cidx", ctypes.c_void_p),
        ("tu_mode", ctypes.c_void_p),
        ("tu_qp", ctypes.c_void_p),
        ("tu_cbf", ctypes.c_void_p),
        ("tu_coef_off", ctypes.c_void_p),
        ("coeff", ctypes.c_void_p),
        ("deblock_disabled", ctypes.c_void_p),
        ("qp_map", ctypes.c_void_p),
        ("dbf", ctypes.c_void_p),
        ("sao", ctypes.c_void_p),
        ("cap_tu", ctypes.c_int64),
        ("cap_coeff", ctypes.c_int64),
        ("used_tu", ctypes.c_int64),
        ("used_coeff", ctypes.c_int64),
        # inter outputs
        ("n_pu", ctypes.c_void_p),
        ("pu_off", ctypes.c_void_p),
        ("pu_x", ctypes.c_void_p),
        ("pu_y", ctypes.c_void_p),
        ("pu_w", ctypes.c_void_p),
        ("pu_h", ctypes.c_void_p),
        ("pu_flags", ctypes.c_void_p),
        ("pu_ref0", ctypes.c_void_p),
        ("pu_ref1", ctypes.c_void_p),
        ("pu_mv", ctypes.c_void_p),
        ("pu_wp0", ctypes.c_void_p),
        ("pu_wp1", ctypes.c_void_p),
        ("frame_type", ctypes.c_void_p),
        ("poc", ctypes.c_void_p),
        ("wp_rows", ctypes.c_void_p),
        ("bs_map", ctypes.c_void_p),
        ("cap_pu", ctypes.c_int64),
        ("used_pu", ctypes.c_int64),
    ]


_DECLARED = set()


def _declare(lib):
    if id(lib) in _DECLARED:
        return
    c = ctypes
    lib.hw_hevc_open.restype = c.c_void_p
    lib.hw_hevc_open.argtypes = [
        c.POINTER(c.c_uint8), c.c_int, c.c_char_p, c.c_int,
    ]
    lib.hw_hevc_close.argtypes = [c.c_void_p]
    lib.hw_hevc_error.restype = c.c_char_p
    lib.hw_hevc_error.argtypes = [c.c_void_p]
    lib.hw_hevc_dims.argtypes = [
        c.c_void_p, c.POINTER(c.c_int), c.POINTER(c.c_int),
        c.POINTER(c.c_int),
    ]
    lib.hw_hevc_ctb_log2.argtypes = [c.c_void_p]
    lib.hw_hevc_strong_smoothing.argtypes = [c.c_void_p]
    lib.hw_hevc_decode_gop.restype = c.c_int
    lib.hw_hevc_decode_gop.argtypes = [
        c.c_void_p, c.POINTER(c.c_uint8), c.POINTER(c.c_uint64),
        c.POINTER(c.c_uint64), c.c_int, c.POINTER(_HevcOut),
    ]
    _DECLARED.add(id(lib))


@dataclasses.dataclass
class HevcGopTensors:
    """Flat TU-entry output for one decode span (decode order)."""

    n_frames: int
    width: int                  # coded luma dims
    height: int
    crop: tuple                 # (left, right, top, bottom) luma samples
    n_tu: np.ndarray            # [F] int32
    tu_off: np.ndarray          # [F] int32
    tu_x: np.ndarray            # [NT] uint16 (component-plane coords)
    tu_y: np.ndarray
    tu_log2: np.ndarray         # [NT] uint8
    tu_cidx: np.ndarray         # [NT] uint8 (0=Y 1=Cb 2=Cr)
    tu_mode: np.ndarray         # [NT] uint8 intra mode 0..34
    tu_qp: np.ndarray           # [NT] int8 (chroma already mapped)
    tu_cbf: np.ndarray          # [NT] uint8
    tu_coef_off: np.ndarray     # [NT] int64 into coeff
    coeff: np.ndarray           # [NC] int16 raster within each TU
    deblock_disabled: np.ndarray  # [F] uint8
    qp_map: np.ndarray          # [F, h4, w4] int8 luma QpY per 4x4
    dbf: np.ndarray             # [F, 4] int8: slice beta/tc offsets
    #   (as-parsed /2 values), PPS cb/cr QP offsets (deblock, 8.7.2.5.5)
    sao: np.ndarray             # [F, ctb_h, ctb_w, 3, 6] int8 per-CTB SAO:
    #   (type 0/1/2, resolved offsets for bands / edge cats 1..4,
    #    band_position or eo_class)
    # ---- inter outputs (PU records in decode order) ----
    n_pu: np.ndarray = None     # [F] int32
    pu_off: np.ndarray = None   # [F] int32
    pu_x: np.ndarray = None     # [NP] uint16 luma coords
    pu_y: np.ndarray = None
    pu_w: np.ndarray = None     # [NP] uint8 luma sizes
    pu_h: np.ndarray = None
    pu_flags: np.ndarray = None  # [NP] uint8: bit0 L0, bit1 L1
    pu_ref0: np.ndarray = None  # [NP] uint8 span decode index of the ref
    pu_ref1: np.ndarray = None
    pu_mv: np.ndarray = None    # [NP, 4] int16: mv0x mv0y mv1x mv1y (q-pel)
    pu_wp0: np.ndarray = None   # [NP] uint8 wp_rows row (list*16+ref) or 255
    pu_wp1: np.ndarray = None
    frame_type: np.ndarray = None  # [F] uint8: 0=B 1=P 2=I 3=skipped RASL
    poc: np.ndarray = None      # [F] int32 PicOrderCntVal
    wp_rows: np.ndarray = None  # [F, 32, 8] int16 weighted-pred rows:
    #   (lw, lo, cw0, co0, cw1, co1, luma_log2_denom, chroma_log2_denom)
    bs_map: np.ndarray = None   # [F, h4, w4, 2] uint8 deblock boundary
    #   strengths (vertical edge of each 4x4 col on the 8-grid, then
    #   horizontal)
    ctb_log2: int = 6
    strong_smoothing: int = 1  # SPS strong_intra_smoothing_enabled_flag


class HevcEntropyDecoder:
    def __init__(self, hvcc_extradata: bytes):
        self._lib = get_lib()
        _declare(self._lib)
        err = ctypes.create_string_buffer(512)
        ptr, owner = as_u8p(hvcc_extradata)
        self._h = self._lib.hw_hevc_open(ptr, len(hvcc_extradata), err,
                                         len(err))
        del owner
        if not self._h:
            raise ValueError(f"hevc open failed: {err.value.decode()}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        crop = (ctypes.c_int * 4)()
        self._lib.hw_hevc_dims(self._h, ctypes.byref(w), ctypes.byref(h),
                               crop)
        self.width = w.value
        self.height = h.value
        self.crop = tuple(crop)
        self.ctb_log2 = self._lib.hw_hevc_ctb_log2(self._h)
        self.strong_smoothing = self._lib.hw_hevc_strong_smoothing(self._h)

    def close(self):
        if self._h:
            self._lib.hw_hevc_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def decode_gop(self, data: bytes, sample_offsets,
                   sample_sizes) -> HevcGopTensors:
        F = len(sample_offsets)
        W, H = self.width, self.height
        # capacity: every 4x4 of luma + both chroma planes could be its
        # own TU entry; coefficients bounded by total plane samples
        cap_tu = F * ((W * H) // 16 + 2 * ((W * H) // 64) + 64)
        cap_coeff = F * (W * H + (W * H) // 2)
        # PUs: at most one per 8x4/4x8 luma block
        cap_pu = F * ((W * H) // 32 + 16)
        h4, w4 = (H + 3) >> 2, (W + 3) >> 2

        t = HevcGopTensors(
            n_frames=F, width=W, height=H, crop=self.crop,
            n_tu=np.zeros(F, np.int32), tu_off=np.zeros(F, np.int32),
            tu_x=np.zeros(cap_tu, np.uint16),
            tu_y=np.zeros(cap_tu, np.uint16),
            tu_log2=np.zeros(cap_tu, np.uint8),
            tu_cidx=np.zeros(cap_tu, np.uint8),
            tu_mode=np.zeros(cap_tu, np.uint8),
            tu_qp=np.zeros(cap_tu, np.int8),
            tu_cbf=np.zeros(cap_tu, np.uint8),
            tu_coef_off=np.zeros(cap_tu, np.int64),
            coeff=np.zeros(cap_coeff, np.int16),
            deblock_disabled=np.zeros(F, np.uint8),
            qp_map=np.zeros((F, (H + 3) >> 2, (W + 3) >> 2), np.int8),
            dbf=np.zeros((F, 4), np.int8),
            sao=np.zeros((F, -(-H // (1 << self.ctb_log2)),
                          -(-W // (1 << self.ctb_log2)), 3, 6), np.int8),
            n_pu=np.zeros(F, np.int32), pu_off=np.zeros(F, np.int32),
            pu_x=np.zeros(cap_pu, np.uint16),
            pu_y=np.zeros(cap_pu, np.uint16),
            pu_w=np.zeros(cap_pu, np.uint8),
            pu_h=np.zeros(cap_pu, np.uint8),
            pu_flags=np.zeros(cap_pu, np.uint8),
            pu_ref0=np.zeros(cap_pu, np.uint8),
            pu_ref1=np.zeros(cap_pu, np.uint8),
            pu_mv=np.zeros((cap_pu, 4), np.int16),
            pu_wp0=np.zeros(cap_pu, np.uint8),
            pu_wp1=np.zeros(cap_pu, np.uint8),
            frame_type=np.zeros(F, np.uint8),
            poc=np.zeros(F, np.int32),
            wp_rows=np.zeros((F, 32, 8), np.int16),
            bs_map=np.zeros((F, h4, w4, 2), np.uint8),
            ctb_log2=self.ctb_log2,
            strong_smoothing=self.strong_smoothing,
        )

        def vp(a):
            return a.ctypes.data_as(ctypes.c_void_p)

        out = _HevcOut(
            n_tu=vp(t.n_tu), tu_off=vp(t.tu_off), tu_x=vp(t.tu_x),
            tu_y=vp(t.tu_y), tu_log2=vp(t.tu_log2), tu_cidx=vp(t.tu_cidx),
            tu_mode=vp(t.tu_mode), tu_qp=vp(t.tu_qp), tu_cbf=vp(t.tu_cbf),
            tu_coef_off=vp(t.tu_coef_off), coeff=vp(t.coeff),
            deblock_disabled=vp(t.deblock_disabled),
            qp_map=vp(t.qp_map), dbf=vp(t.dbf), sao=vp(t.sao),
            cap_tu=cap_tu, cap_coeff=cap_coeff,
            n_pu=vp(t.n_pu), pu_off=vp(t.pu_off), pu_x=vp(t.pu_x),
            pu_y=vp(t.pu_y), pu_w=vp(t.pu_w), pu_h=vp(t.pu_h),
            pu_flags=vp(t.pu_flags), pu_ref0=vp(t.pu_ref0),
            pu_ref1=vp(t.pu_ref1), pu_mv=vp(t.pu_mv),
            pu_wp0=vp(t.pu_wp0), pu_wp1=vp(t.pu_wp1),
            frame_type=vp(t.frame_type), poc=vp(t.poc),
            wp_rows=vp(t.wp_rows), bs_map=vp(t.bs_map),
            cap_pu=cap_pu,
        )
        dptr, downer = as_u8p(data)
        offs = np.ascontiguousarray(sample_offsets, np.uint64)
        sizes = np.ascontiguousarray(sample_sizes, np.uint64)
        n = self._lib.hw_hevc_decode_gop(
            self._h, dptr,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            F, ctypes.byref(out),
        )
        del downer
        if n < 0:
            raise ValueError(
                "hevc entropy decode failed: "
                f"{self._lib.hw_hevc_error(self._h).decode()}"
            )
        # trim to used sizes
        nt, nc = out.used_tu, out.used_coeff
        for f in ("tu_x", "tu_y", "tu_log2", "tu_cidx", "tu_mode", "tu_qp",
                  "tu_cbf", "tu_coef_off"):
            setattr(t, f, getattr(t, f)[:nt])
        t.coeff = t.coeff[:nc]
        np_used = out.used_pu
        for f in ("pu_x", "pu_y", "pu_w", "pu_h", "pu_flags", "pu_ref0",
                  "pu_ref1", "pu_mv", "pu_wp0", "pu_wp1"):
            setattr(t, f, getattr(t, f)[:np_used])
        return t
