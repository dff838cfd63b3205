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
        return t
