"""Python interface to the host H.264 entropy decoder (native/src/h264/).

`decode_gop` runs the sequential entropy decode (NAL/slice/CAVLC) on the
host CPU and returns dense SoA numpy arrays — one tensor per syntax family,
shaped [F, M, ...] (F frames, M macroblocks in raster order).  These feed
the TPU reconstruction pipeline (recon.py / ops/*) where all dense math
runs.

Array semantics (see native/src/h264/h264_types.h GopOut):
  frame_type [F]       0=P 1=B 2=I (SliceType of the first slice)
  poc        [F]       picture order count (display order key)
  ref_map    [F,16]    refIdxL0 -> span frame index (-1 = unused)
  ref_map_l1 [F,16]    refIdxL1 -> span frame index (B slices)
  mv_l1 / refidx_l1    list-1 motion field (refidx -1 = no L1 pred)
  mb_kind    [F,M]     0=P_SKIP 1=INTER 2=I4x4 3=I16x16 4=IPCM
  qp         [F,M]     luma QP after mb_qp_delta
  cbp        [F,M]     coded block pattern (bits0-3 luma 8x8s, 4-5 chroma)
  i4_modes   [F,M,16]  intra 4x4 pred mode per block (raster in MB)
  i16_mode   [F,M]     intra 16x16 pred mode
  chroma_mode[F,M]     intra chroma pred mode
  mv         [F,M,16,2] L0 motion vectors, quarter-pel, per 4x4 block
  refidx     [F,M,4]   L0 reference index per 8x8 (-1 = intra)
  luma_dc    [F,M,16]  I16x16 luma DC coeffs (raster within MB)
  luma_ac    [F,M,16,16] per-4x4-block coeffs, raster order in block
  chroma_dc  [F,M,2,4] chroma DC (2x2 per component, raster)
  chroma_ac  [F,M,2,4,16] chroma AC coeffs
  nnz        [F,M,24]  CAVLC total_coeff per block (deblock bS input)
  deblock_idc[F,M]     disable_deblocking_filter_idc of the MB's slice
  alpha_off / beta_off [F,M] slice deblock offsets (already *2)
  avail      [F,M]     neighbor availability bits (b0..3 intra LTRL',
                       b4/b5 left/top same-slice for deblock)
  ipcm       [F,M,384] raw I_PCM samples
"""

from __future__ import annotations

import ctypes
import dataclasses

import numpy as np

from ...native import as_u8p, get_lib


class _GopOut(ctypes.Structure):
    _fields_ = [
        ("frame_type", ctypes.c_void_p),
        ("poc", ctypes.c_void_p),
        ("ref_map", ctypes.c_void_p),
        ("ref_map_l1", ctypes.c_void_p),
        ("mb_kind", ctypes.c_void_p),
        ("qp", ctypes.c_void_p),
        ("cbp", ctypes.c_void_p),
        ("i4_modes", ctypes.c_void_p),
        ("i16_mode", ctypes.c_void_p),
        ("chroma_mode", ctypes.c_void_p),
        ("mv", ctypes.c_void_p),
        ("mv_l1", ctypes.c_void_p),
        ("refidx", ctypes.c_void_p),
        ("refidx_l1", ctypes.c_void_p),
        ("luma_dc", ctypes.c_void_p),
        ("luma_ac", ctypes.c_void_p),
        ("chroma_dc", ctypes.c_void_p),
        ("chroma_ac", ctypes.c_void_p),
        ("nnz", ctypes.c_void_p),
        ("deblock_idc", ctypes.c_void_p),
        ("alpha_off", ctypes.c_void_p),
        ("beta_off", ctypes.c_void_p),
        ("ipcm", ctypes.c_void_p),
        ("intra_pred_avail", ctypes.c_void_p),
        ("transform8", ctypes.c_void_p),
        ("frame_is_ref", ctypes.c_void_p),
        ("pred_weights", ctypes.c_void_p),
        ("weight_flag", ctypes.c_void_p),
        ("pred_weights_l1", ctypes.c_void_p),
        ("ring_slot", ctypes.c_void_p),
        ("sparse_counts", ctypes.c_void_p),
    ]


_declared = False


def _declare(lib):
    global _declared
    if _declared:
        return
    c = ctypes
    lib.hw_h264_open.restype = c.c_void_p
    lib.hw_h264_open.argtypes = [
        c.POINTER(c.c_uint8), c.c_int, c.c_char_p, c.c_int
    ]
    lib.hw_h264_close.argtypes = [c.c_void_p]
    lib.hw_h264_error.restype = c.c_char_p
    lib.hw_h264_error.argtypes = [c.c_void_p]
    lib.hw_h264_dims.restype = c.c_int
    lib.hw_h264_dims.argtypes = [
        c.c_void_p, c.POINTER(c.c_int), c.POINTER(c.c_int),
        c.POINTER(c.c_int),
    ]
    lib.hw_h264_profile.restype = c.c_int
    lib.hw_h264_profile.argtypes = [c.c_void_p]
    lib.hw_h264_is_cabac.restype = c.c_int
    lib.hw_h264_is_cabac.argtypes = [c.c_void_p]
    lib.hw_h264_decode_gop.restype = c.c_int
    lib.hw_h264_decode_gop.argtypes = [
        c.c_void_p, c.POINTER(c.c_uint8), c.POINTER(c.c_uint64),
        c.POINTER(c.c_uint64), c.c_int, c.POINTER(c.c_uint8),
        c.POINTER(_GopOut),
    ]
    lib.hw_h264_chroma_qp_offset.restype = c.c_int
    lib.hw_h264_chroma_qp_offset.argtypes = [c.c_void_p]
    lib.hw_h264_max_refs.restype = c.c_int
    lib.hw_h264_max_refs.argtypes = [c.c_void_p]
    lib.hw_h264_bipred_idc.restype = c.c_int
    lib.hw_h264_bipred_idc.argtypes = [c.c_void_p]
    lib.hw_h264_scaling.restype = c.c_int
    lib.hw_h264_scaling.argtypes = [
        c.c_void_p, c.POINTER(c.c_uint8), c.POINTER(c.c_uint8)
    ]
    i64p = c.POINTER(c.c_int64)
    i16p = c.POINTER(c.c_int16)
    lib.hw_h264_set_ring_slots.restype = None
    lib.hw_h264_set_ring_slots.argtypes = [c.c_void_p, c.c_int]
    lib.hw_h264_pack_clip.restype = c.c_int
    lib.hw_h264_pack_clip.argtypes = [
        c.POINTER(_GopOut), c.c_int, c.c_int, c.c_int,
        c.POINTER(c.c_uint8), i16p, i16p,
        i64p, i16p, c.c_int64, c.c_int64,
        i64p, i16p, c.c_int64, c.c_int64,
        i64p, i16p, c.c_int64, c.c_int64,
        i64p, c.POINTER(c.c_uint8), c.c_int64, c.c_int64,
        i64p,
    ]
    u8p = c.POINTER(c.c_uint8)
    u16p = c.POINTER(c.c_uint16)
    lib.hw_h264_coeff_tokens.restype = c.c_int64
    lib.hw_h264_coeff_tokens.argtypes = [
        i64p, i16p, c.c_int64, u16p, c.c_int64,
        c.POINTER(c.c_int32), i16p, c.c_int64, i64p,
    ]
    lib.hw_h264_delta_encode.restype = c.c_int64
    lib.hw_h264_delta_encode.argtypes = [
        i64p, c.c_int64, u8p, c.c_int64, u16p, u8p, c.c_int64,
    ]
    lib.hw_h264_mv_delta8.restype = c.c_int64
    lib.hw_h264_mv_delta8.argtypes = [
        i16p, c.c_int64, c.c_int64, c.POINTER(c.c_int8),
        i64p, i16p, c.c_int64,
    ]
    _declared = True


@dataclasses.dataclass
class GopTensors:
    """SoA output of the host entropy decode for one span."""

    n_frames: int
    mb_width: int
    mb_height: int
    crop: tuple  # (left, top, right, bottom) in luma pixels
    frame_type: np.ndarray
    poc: np.ndarray
    ref_map: np.ndarray
    ref_map_l1: np.ndarray
    mb_kind: np.ndarray
    qp: np.ndarray
    cbp: np.ndarray
    i4_modes: np.ndarray
    i16_mode: np.ndarray
    chroma_mode: np.ndarray
    mv: np.ndarray
    refidx: np.ndarray
    mv_l1: np.ndarray
    refidx_l1: np.ndarray
    luma_dc: np.ndarray
    luma_ac: np.ndarray
    chroma_dc: np.ndarray
    chroma_ac: np.ndarray
    nnz: np.ndarray
    deblock_idc: np.ndarray
    alpha_off: np.ndarray
    beta_off: np.ndarray
    avail: np.ndarray
    ipcm: np.ndarray
    # explicit weighted prediction (8.4.2.3): [F,16,8] per refIdxL0
    # (wy oy wu ou wv ov log2y log2c); weight_flag [F] gates application
    pred_weights: np.ndarray = None
    weight_flag: np.ndarray = None
    # [F,16,8] per refIdxL1, filled on explicit-B frames (bipred_idc == 1)
    pred_weights_l1: np.ndarray = None
    # [F] device reference-ring slot this frame writes (-1 = non-ref);
    # host-computed so long-term/MMCO retention maps onto the ring
    ring_slot: np.ndarray = None
    frame_is_ref: np.ndarray = None  # [F] u8: enters the reference ring
    transform8: np.ndarray = None    # [F,M] u8: 8x8 luma transform
    # [4] int64 exact sparse-entry counts accumulated during entropy
    # decode (nonzero coeffs, L0 MV exceptions, L1, I4x4 MBs) — lets
    # pack_gop_batch size its buffers without a separate count pass
    sparse_counts: np.ndarray = None
    bipred_idc: int = 0  # PPS weighted_bipred_idc (2 = implicit POC weights)
    # frame-window slices carry the implicit-B pair weights precomputed
    # on the FULL span (the builder mixes local and span-global poc
    # indexing); None everywhere else
    bi_w_pre: np.ndarray = None
    scaling_w4: np.ndarray = None  # [6,16] raster weights (None = flat 16)
    scaling_w8: np.ndarray = None  # [2,64] 8x8 intra/inter weights

    @property
    def n_mbs(self) -> int:
        return self.mb_width * self.mb_height


def gopout_view(t: "GopTensors") -> "_GopOut":
    """A _GopOut struct of pointers into a GopTensors' numpy arrays (for
    native passes over already-decoded spans, e.g. hw_h264_pack_clip).
    The struct does NOT own the arrays — keep `t` alive while using it."""
    import ctypes as c

    def vp(a):
        return a.ctypes.data_as(c.c_void_p)

    return _GopOut(
        frame_type=vp(t.frame_type), poc=vp(t.poc), ref_map=vp(t.ref_map),
        ref_map_l1=vp(t.ref_map_l1), mb_kind=vp(t.mb_kind), qp=vp(t.qp),
        cbp=vp(t.cbp), i4_modes=vp(t.i4_modes), i16_mode=vp(t.i16_mode),
        chroma_mode=vp(t.chroma_mode), mv=vp(t.mv), mv_l1=vp(t.mv_l1),
        refidx=vp(t.refidx), refidx_l1=vp(t.refidx_l1),
        luma_dc=vp(t.luma_dc), luma_ac=vp(t.luma_ac),
        chroma_dc=vp(t.chroma_dc), chroma_ac=vp(t.chroma_ac),
        nnz=vp(t.nnz), deblock_idc=vp(t.deblock_idc),
        alpha_off=vp(t.alpha_off), beta_off=vp(t.beta_off),
        ipcm=vp(t.ipcm), intra_pred_avail=vp(t.avail),
        frame_is_ref=vp(t.frame_is_ref), transform8=vp(t.transform8),
        pred_weights=vp(t.pred_weights), weight_flag=vp(t.weight_flag),
        pred_weights_l1=vp(t.pred_weights_l1), ring_slot=vp(t.ring_slot),
    )


class H264EntropyDecoder:
    """Wraps the native entropy decode context for one stream (avcC)."""

    def __init__(self, avcc_extradata: bytes):
        self._lib = get_lib()
        _declare(self._lib)
        err = ctypes.create_string_buffer(512)
        ptr, owner = as_u8p(avcc_extradata)
        self._h = self._lib.hw_h264_open(
            ptr, len(avcc_extradata), err, len(err)
        )
        del owner
        if not self._h:
            raise ValueError(f"h264 open failed: {err.value.decode()}")
        mbw = ctypes.c_int()
        mbh = ctypes.c_int()
        crop = (ctypes.c_int * 4)()
        self._lib.hw_h264_dims(self._h, ctypes.byref(mbw), ctypes.byref(mbh), crop)
        self.mb_width = mbw.value
        self.mb_height = mbh.value
        self.crop = tuple(crop)
        self.profile = self._lib.hw_h264_profile(self._h)
        self.is_cabac = self._lib.hw_h264_is_cabac(self._h) == 1
        self.chroma_qp_offset = self._lib.hw_h264_chroma_qp_offset(self._h)
        self.max_num_ref_frames = self._lib.hw_h264_max_refs(self._h)
        self.bipred_idc = self._lib.hw_h264_bipred_idc(self._h)
        w4 = np.zeros((6, 16), np.uint8)
        w8 = np.zeros((2, 64), np.uint8)
        nonflat = self._lib.hw_h264_scaling(
            self._h,
            w4.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        self.has_scaling = bool(nonflat)
        self._ring_slots = 0
        self.scaling_w4 = w4 if nonflat else None
        self.scaling_w8 = w8 if nonflat else None

    def set_ring_slots(self, n: int):
        """Mirror the device reference-ring size for slot allocation."""
        self._ring_slots = n
        self._lib.hw_h264_set_ring_slots(self._h, int(n))

    def close(self):
        if self._h:
            self._lib.hw_h264_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def decode_gop(
        self, data: bytes, sample_offsets, sample_sizes, wanted_disp=None
    ) -> GopTensors:
        """Entropy-decode the samples of one span into SoA tensors.

        `wanted_disp` (optional bool array [n_samples]): marks the
        span-relative DISPLAY positions the caller will read.  Frames
        that are neither referenced (nal_ref_idc == 0) nor wanted skip
        slice-data decode entirely (their SoA slots stay zero — safe
        because nothing reads them)."""
        F = len(sample_offsets)
        M = self.mb_width * self.mb_height

        # recycled mmap-backed buffers: per-span malloc of the ~200 MB
        # SoA on a pool thread hits glibc's per-thread-arena mmap path
        # and pays fresh-page faults + munmap on every span (4-12x
        # entropy slowdown, timeline-measured — see native.pool_array)
        from ...native import pool_array

        def z(shape, dtype):
            return pool_array(shape, dtype, fill=0)

        t = GopTensors(
            n_frames=F,
            mb_width=self.mb_width,
            mb_height=self.mb_height,
            crop=self.crop,
            frame_type=z(F, np.uint8),
            poc=z(F, np.int32),
            ref_map=pool_array((F, 16), np.int32, fill=-1),
            ref_map_l1=pool_array((F, 16), np.int32, fill=-1),
            mb_kind=z((F, M), np.uint8),
            qp=z((F, M), np.int8),
            cbp=z((F, M), np.uint8),
            i4_modes=z((F, M, 16), np.int8),
            i16_mode=z((F, M), np.int8),
            chroma_mode=z((F, M), np.int8),
            mv=z((F, M, 16, 2), np.int16),
            refidx=pool_array((F, M, 4), np.int8, fill=-1),
            mv_l1=z((F, M, 16, 2), np.int16),
            refidx_l1=pool_array((F, M, 4), np.int8, fill=-1),
            luma_dc=z((F, M, 16), np.int16),
            # np.empty for the three big buffers: their calloc memset
            # was 27% of the 1080p entropy wall (gprofng).  AC blocks
            # are zeroed per-MB by the native decoder (cache-warm);
            # ipcm content is mb_kind==4-gated everywhere.
            luma_ac=pool_array((F, M, 16, 16), np.int16),
            chroma_dc=z((F, M, 2, 4), np.int16),
            chroma_ac=pool_array((F, M, 2, 4, 16), np.int16),
            nnz=z((F, M, 24), np.uint8),
            deblock_idc=z((F, M), np.uint8),
            alpha_off=z((F, M), np.int8),
            beta_off=z((F, M), np.int8),
            avail=z((F, M), np.uint8),
            ipcm=pool_array((F, M, 384), np.uint8),
            pred_weights=z((F, 16, 8), np.int16),
            weight_flag=z(F, np.uint8),
            pred_weights_l1=z((F, 16, 8), np.int16),
            ring_slot=pool_array(F, np.int16, fill=-1),
            frame_is_ref=z(F, np.uint8),
            transform8=z((F, M), np.uint8),
            sparse_counts=z(4, np.int64),
            bipred_idc=self.bipred_idc,
            scaling_w4=self.scaling_w4,
            scaling_w8=self.scaling_w8,
        )
        def vp(a):
            return a.ctypes.data_as(ctypes.c_void_p)

        out = _GopOut(
            frame_type=vp(t.frame_type), poc=vp(t.poc), ref_map=vp(t.ref_map),
            ref_map_l1=vp(t.ref_map_l1), mb_kind=vp(t.mb_kind), qp=vp(t.qp),
            cbp=vp(t.cbp), i4_modes=vp(t.i4_modes), i16_mode=vp(t.i16_mode),
            chroma_mode=vp(t.chroma_mode), mv=vp(t.mv), mv_l1=vp(t.mv_l1),
            refidx=vp(t.refidx), refidx_l1=vp(t.refidx_l1),
            luma_dc=vp(t.luma_dc), luma_ac=vp(t.luma_ac),
            chroma_dc=vp(t.chroma_dc), chroma_ac=vp(t.chroma_ac),
            nnz=vp(t.nnz), deblock_idc=vp(t.deblock_idc),
            alpha_off=vp(t.alpha_off), beta_off=vp(t.beta_off),
            ipcm=vp(t.ipcm), intra_pred_avail=vp(t.avail),
            frame_is_ref=vp(t.frame_is_ref), transform8=vp(t.transform8),
            pred_weights=vp(t.pred_weights), weight_flag=vp(t.weight_flag),
            pred_weights_l1=vp(t.pred_weights_l1),
            ring_slot=vp(t.ring_slot),
            sparse_counts=vp(t.sparse_counts),
        )

        dptr, downer = as_u8p(data)
        offs = np.ascontiguousarray(sample_offsets, np.uint64)
        sizes = np.ascontiguousarray(sample_sizes, np.uint64)
        if wanted_disp is not None:
            wd = np.ascontiguousarray(
                np.asarray(wanted_disp, np.uint8).reshape(F)
            )
            wd_ptr = wd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        else:
            wd = None
            wd_ptr = None
        n = self._lib.hw_h264_decode_gop(
            self._h, dptr,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            F, wd_ptr, ctypes.byref(out),
        )
        del wd
        del downer
        if n < 0:
            raise ValueError(
                f"entropy decode failed: {self._lib.hw_h264_error(self._h).decode()}"
            )
        if n != F:
            raise ValueError(f"decoded {n} frames, expected {F}")
        return t
