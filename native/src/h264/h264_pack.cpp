// Packed host->device transport: native fill of the per-clip portions.
//
// pack_gop_batch (hwang_tpu/models/h264/packed.py) assembles the three
// upload buffers (small per-MB syntax, motion vectors, sparse residual
// coefficients) from the entropy decoder's SoA tensors.  The numpy inner
// loops cost ~2.2 s per 32-clip bench chunk (broadcast temporaries +
// flatnonzero scans); this single cache-friendly sweep does the same work
// in one pass per clip and runs GIL-free under ctypes, so the Python
// thread pool parallelizes it across clips.
//
// Call once with u8 == NULL to count the sparse entries (coefficients,
// MV exceptions), then again with buffers sized from the counts.
// Positions are emitted into the caller's global index space via the
// *_base offsets, matching packed.py's layout:
//   coeff: [B, F_pad, M, 26, 16] flattened (blocks 0-15 luma AC,
//          16-23 chroma AC, 24 luma DC, 25 chroma DC)
//   mv:    [B, F_pad, M, 16] flattened per 4x4 block
//
// Reference parity note: the reference ships compressed bitstream to
// FFmpeg/NVDEC; this transport is the TPU-native analog (SURVEY.md §7),
// shipping entropy-decoded syntax in a few dense+sparse buffers.

#include <cstdint>
#include <cstring>

#include "h264_types.h"

#define HW_API extern "C" __attribute__((visibility("default")))

using namespace hwh264;

namespace {

constexpr int U8_STRIDE = 8;
constexpr int MB_STRIDE = 26 * 16;  // unified coeff lanes per MB

}  // namespace

// Returns 0 on success, -1 if a sparse buffer capacity was exceeded.
// counts[0] = coefficient entries, counts[1] = L0 MV exceptions,
// counts[2] = L1 MV exceptions, counts[3] = I4x4 macroblocks (whose
// prediction modes ship as a sparse 16-byte-row stream — most MBs in
// P/B-heavy content are not I4x4, so the dense u8 lane would be ~half
// wasted bytes).  Count-only mode when u8 == NULL.
HW_API int hw_h264_pack_clip(
    const GopOut* t, int n_frames, int n_mbs, int f_pad,
    uint8_t* u8,            // [F_pad, M, 15] this clip's slice
    int16_t* mv_base,       // [F_pad, M, 2]
    int16_t* mv1_base,      // [F_pad, M, 2] or NULL (no B frames)
    int64_t* cpos, int16_t* cval, int64_t ccap, int64_t cbase,
    int64_t* mpos, int16_t* mval, int64_t mcap, int64_t mbase,
    int64_t* m1pos, int16_t* m1val, int64_t m1cap, int64_t m1base,
    int64_t* i4pos, uint8_t* i4val, int64_t i4cap, int64_t i4base,
    int64_t* counts) {
  const bool count_only = u8 == nullptr;
  int64_t nc = 0, nm = 0, nm1 = 0, ni4 = 0;

  for (int f = 0; f < n_frames; f++) {
    for (int mb = 0; mb < n_mbs; mb++) {
      const size_t fm = (size_t)f * n_mbs + mb;
      const uint8_t* nnz = t->nnz + fm * 24;
      uint32_t nnz_bits = 0;
      for (int k = 0; k < 24; k++) nnz_bits |= (uint32_t)(nnz[k] > 0) << k;
      if (!count_only) {
        // Deblock idc/offsets and neighbor availability are NOT here:
        // they ship as per-frame hdr defaults / device-side geometry
        // with sparse per-MB exception streams (packed.py).
        uint8_t* d = u8 + fm * U8_STRIDE;
        d[0] = t->mb_kind[fm];
        d[1] = (uint8_t)t->qp[fm];
        d[2] = (uint8_t)((t->i16_mode[fm] + 1) |
                         ((t->chroma_mode[fm] + 1) << 4));
        const int8_t* ri = t->refidx + fm * 4;
        auto nib = [](int v) {
          int x = v + 1;
          return (uint8_t)(x < 0 ? 0 : (x > 15 ? 15 : x));
        };
        d[3] = nib(ri[0]) | (nib(ri[1]) << 4);
        d[4] = nib(ri[2]) | (nib(ri[3]) << 4);
        d[5] = nnz_bits & 0xFF;
        d[6] = (nnz_bits >> 8) & 0xFF;
        d[7] = nnz_bits >> 16;
      }

      if (t->mb_kind[fm] == 2 /* MB_I4x4 */) {
        if (!count_only) {
          if (ni4 >= i4cap) return -1;
          i4pos[ni4] = i4base + (int64_t)fm;
          const int8_t* i4 = t->i4_modes + fm * 16;
          for (int k = 0; k < 16; k++)
            i4val[ni4 * 16 + k] = (uint8_t)i4[k];
        }
        ni4++;
      }

      // L0 motion: per-MB base (block 0) + sparse per-4x4 exceptions
      const int16_t* mv = t->mv + fm * 32;
      const int16_t bx = mv[0], by = mv[1];
      if (!count_only) {
        mv_base[fm * 2] = bx;
        mv_base[fm * 2 + 1] = by;
      }
      for (int k = 1; k < 16; k++) {
        if (mv[2 * k] != bx || mv[2 * k + 1] != by) {
          if (!count_only) {
            if (nm >= mcap) return -1;
            mpos[nm] = mbase + ((int64_t)f * n_mbs + mb) * 16 + k;
            mval[2 * nm] = mv[2 * k];
            mval[2 * nm + 1] = mv[2 * k + 1];
          }
          nm++;
        }
      }
      if (mv1_base || count_only) {
        const int16_t* mv1 = t->mv_l1 ? t->mv_l1 + fm * 32 : nullptr;
        if (mv1) {
          const int16_t b1x = mv1[0], b1y = mv1[1];
          if (!count_only) {
            mv1_base[fm * 2] = b1x;
            mv1_base[fm * 2 + 1] = b1y;
          }
          for (int k = 1; k < 16; k++) {
            if (mv1[2 * k] != b1x || mv1[2 * k + 1] != b1y) {
              if (!count_only) {
                if (nm1 >= m1cap) return -1;
                m1pos[nm1] = m1base + ((int64_t)f * n_mbs + mb) * 16 + k;
                m1val[2 * nm1] = mv1[2 * k];
                m1val[2 * nm1 + 1] = mv1[2 * k + 1];
              }
              nm1++;
            }
          }
        }
      }

      // sparse coefficients into the unified [26, 16] per-MB lane space.
      // The AC sweeps are nnz-guided: a block whose decoded total_coeff
      // is 0 has an all-zero SoA slice by construction, so ~5x less
      // memory is scanned on typical inter content (the DC groups are
      // 24 lanes total and stay unconditional — I16 DC energy is not in
      // nnz).
      const int64_t mb_off = cbase + ((int64_t)f * n_mbs + mb) * MB_STRIDE;
      const int16_t* la = t->luma_ac + fm * 256;
      const int16_t* ca = t->chroma_ac + fm * 128;
      const int16_t* ld = t->luma_dc + fm * 16;
      const int16_t* cd = t->chroma_dc + fm * 8;
      auto sweep16 = [&](const int16_t* a, int o) {
        for (int k = 0; k < 16; k++) {
          if (a[k] != 0) {
            if (!count_only) {
              if (nc >= ccap) return false;
              cpos[nc] = mb_off + o + k;
              cval[nc] = a[k];
            }
            nc++;
          }
        }
        return true;
      };
      if (nnz_bits & 0xFFFF) {
        for (int b = 0; b < 16; b++)
          if ((nnz_bits >> b) & 1)
            if (!sweep16(la + b * 16, b * 16)) return -1;
      }
      if (nnz_bits >> 16) {
        for (int b = 0; b < 8; b++)
          if ((nnz_bits >> (16 + b)) & 1)
            if (!sweep16(ca + b * 16, 256 + b * 16)) return -1;
      }
      if (!sweep16(ld, 384)) return -1;
      for (int k = 0; k < 8; k++) {
        if (cd[k] != 0) {
          if (!count_only) {
            if (nc >= ccap) return -1;
            cpos[nc] = mb_off + 400 + k;
            cval[nc] = cd[k];
          }
          nc++;
        }
      }
    }
  }
  counts[0] = nc;
  counts[1] = nm;
  counts[2] = nm1;
  counts[3] = ni4;
  return 0;
}

// ---------------------------------------------------------------------------
// Stream encoders: the numpy passes that turned the sparse (pos, val)
// streams into the upload grammars (combined coefficient tokens, uint16
// delta positions, int8 mv-base deltas) were the largest remaining
// Python-side pack cost (~60% of pack_gop_batch at 1080p).  Same
// grammars, one cache-friendly pass each; see packed.py for the decode
// side.
// ---------------------------------------------------------------------------

// Combined coefficient tokens: token = (val4 << 12) | gap12 with
// gap12 == 0xFFF an escape advancing 0xFFE and val4 == 0 meaning
// "position only" (the wide value rides the absolute big stream).
// Count mode: out == NULL; returns the token count n and sets
// *nbig_out.  Fill mode: writes out[0..n) (caller zero-pads to bucket),
// big_pos/big_val[0..nbig).  Returns -1 on capacity overflow.
HW_API int64_t hw_h264_coeff_tokens(
    const int64_t* pos, const int16_t* val, int64_t k,
    uint16_t* out, int64_t cap,
    int32_t* big_pos, int16_t* big_val, int64_t big_cap,
    int64_t* nbig_out) {
  const bool count_only = out == nullptr;
  int64_t n = 0, nb = 0;
  int64_t prev = -1;
  for (int64_t i = 0; i < k; i++) {
    int64_t gap = pos[i] - prev;
    if (gap < 1) return -2;  // not strictly increasing
    prev = pos[i];
    int64_t esc = (gap - 1) / 0xFFE;
    if (count_only) {
      n += esc + 1;
    } else {
      if (n + esc + 1 > cap) return -1;
      for (int64_t e = 0; e < esc; e++) out[n++] = 0xFFF;
      gap -= esc * 0xFFE;
      int v = val[i];
      uint16_t v4;
      if (v < -8 || v > 7) {
        if (nb >= big_cap) return -1;
        big_pos[nb] = (int32_t)pos[i];
        big_val[nb] = (int16_t)v;
        v4 = 0;
        nb++;
      } else {
        v4 = (uint16_t)(v & 0xF);
      }
      out[n++] = (uint16_t)((v4 << 12) | (uint16_t)gap);
    }
    if (count_only) {
      int v = val[i];
      if (v < -8 || v > 7) nb++;
    }
  }
  if (nbig_out) *nbig_out = nb;
  return n;
}

// uint16 delta-position encode (escape 0xFFFF advances 0xFFE2... no:
// 0xFFFE), values kept aligned with emitted entries (zeros at escape
// slots).  elem = bytes per value row.  Count mode: out_pos == NULL;
// returns n.  Fill mode returns -1 on overflow.
HW_API int64_t hw_h264_delta_encode(
    const int64_t* pos, int64_t k, const uint8_t* vals, int64_t elem,
    uint16_t* out_pos, uint8_t* out_val, int64_t cap) {
  const bool count_only = out_pos == nullptr;
  int64_t n = 0;
  int64_t prev = -1;
  for (int64_t i = 0; i < k; i++) {
    int64_t gap = pos[i] - prev;
    if (gap < 1) return -2;  // not strictly increasing
    prev = pos[i];
    int64_t esc = (gap - 1) / 0xFFFE;
    if (count_only) {
      n += esc + 1;
      continue;
    }
    if (n + esc + 1 > cap) return -1;
    for (int64_t e = 0; e < esc; e++) out_pos[n++] = 0xFFFF;
    gap -= esc * 0xFFFE;
    if (vals) memcpy(out_val + n * elem, vals + i * elem, (size_t)elem);
    out_pos[n++] = (uint16_t)gap;
  }
  return n;
}

// int8 raster mv-base deltas: base [G, M, 2] int16 (G = B*F groups),
// deltas along M per group, first entry absolute.  |delta| > 127 (either
// component) emits 0 in d8 and an exception (absolute position, true
// int16 delta pair).  Count mode: d8 == NULL; returns the exception
// count.  Fill mode returns -1 on overflow.
HW_API int64_t hw_h264_mv_delta8(
    const int16_t* base, int64_t groups, int64_t m,
    int8_t* d8, int64_t* exc_pos, int16_t* exc_val, int64_t cap) {
  const bool count_only = d8 == nullptr;
  int64_t ne = 0;
  for (int64_t g = 0; g < groups; g++) {
    const int16_t* b = base + g * m * 2;
    int8_t* d = d8 ? d8 + g * m * 2 : nullptr;
    int px = 0, py = 0;
    for (int64_t i = 0; i < m; i++) {
      int dx = b[2 * i] - px;
      int dy = b[2 * i + 1] - py;
      px = b[2 * i];
      py = b[2 * i + 1];
      if (dx > 127 || dx < -127 || dy > 127 || dy < -127) {
        if (!count_only) {
          if (ne >= cap) return -1;
          exc_pos[ne] = g * m + i;
          exc_val[2 * ne] = (int16_t)dx;
          exc_val[2 * ne + 1] = (int16_t)dy;
          d[2 * i] = 0;
          d[2 * i + 1] = 0;
        }
        ne++;
      } else if (!count_only) {
        d[2 * i] = (int8_t)dx;
        d[2 * i + 1] = (int8_t)dy;
      }
    }
  }
  return ne;
}
