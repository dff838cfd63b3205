// H.264 host entropy decoder: NAL/SPS/PPS/slice-header parsing + CAVLC
// macroblock layer, emitting dense per-macroblock SoA tensors for the TPU
// reconstruction kernels.
//
// This replaces the entropy half of what the reference delegated to
// FFmpeg's decoder (software_video_decoder.cpp): the inherently sequential
// bit parsing stays on the host CPU; everything dense (dequant, IDCT,
// intra prediction, motion compensation, deblocking) is emitted as tensors
// and runs on the TPU (hwang_tpu/models/h264/).
//
// Scope: progressive 4:2:0 8-bit, baseline/main/high profile.  CAVLC and
// CABAC entropy coding; I/P/B slices (incl. spatial+temporal direct and
// b-pyramid); all partition shapes; multi-ref with full reference
// management (list reordering, sliding window, MMCO 1-6, long-term refs);
// implicit and explicit weighted (bi-)prediction; all three
// pic_order_cnt_types with frame_num-wrap and POC epochs; non-flat
// scaling matrices; High 8x8 transform; I_PCM in both entropy modes;
// multi-slice frames.  Interlaced (PAFF/MBAFF), FMO and SP/SI slices are
// rejected with clear errors (Decoder falls back to the SOFTWARE backend).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <array>
#include <map>
#include <string>
#include <vector>

#include "h264_bitreader.h"
#include "h264_cabac.h"
#include "h264_cavlc_tables.h"
#include "h264_types.h"

#define HW_API extern "C" __attribute__((visibility("default")))

namespace hwh264 {
namespace {

// ---------------------------------------------------------------------------
// VLC decode helpers
// ---------------------------------------------------------------------------

// Two-level LUT over a prefix-free code (codes up to 16 bits): level 1
// indexes the top 8 peeked bits; longer codes escape to a per-prefix
// 256-entry level-2 block on the next 8 bits.  Entries are
// (len << 11) | symbol (symbol < 2048, len 1..8 per level); 0 = invalid,
// bit 15 = escape.  Built once at startup from the spec tables in
// h264_cavlc_tables.h (which stay the single source of truth — the
// linear-scan decoder matched the peeked prefix against those entries).
struct VlcLut {
  uint16_t l1[256] = {};
  std::vector<std::array<uint16_t, 256>> l2;

  void add(int len, uint32_t bits, int sym) {
    if (len <= 8) {
      uint32_t base = bits << (8 - len);
      for (uint32_t i = 0; i < (1u << (8 - len)); i++)
        l1[base + i] = (uint16_t)((len << 11) | sym);
    } else {
      uint32_t top = bits >> (len - 8);
      int idx;
      if (l1[top] & 0x8000) {
        idx = l1[top] & 0x7FFF;
      } else {
        idx = (int)l2.size();
        l2.emplace_back();
        l2.back().fill(0);
        l1[top] = (uint16_t)(0x8000 | idx);
      }
      int rlen = len - 8;  // <= 8: all CAVLC codes are <= 16 bits
      uint32_t rbits = bits & ((1u << rlen) - 1);
      uint32_t base = rbits << (8 - rlen);
      for (uint32_t i = 0; i < (1u << (8 - rlen)); i++)
        l2[idx][base + i] = (uint16_t)((rlen << 11) | sym);
    }
  }
};

inline int vlc_get(BitReader& br, const VlcLut& t) {
  uint32_t p = br.peek(16);
  uint16_t e = t.l1[p >> 8];
  if (e & 0x8000) {
    uint16_t e2 = t.l2[e & 0x7FFF][p & 0xFF];
    if (e2 == 0) return -1;
    br.skip(8 + (e2 >> 11));
    return e2 & 0x7FF;
  }
  if (e == 0) return -1;
  br.skip(e >> 11);
  return e & 0x7FF;
}

struct CavlcLuts {
  VlcLut token[3];   // coeff_token for nC classes [0,2) [2,4) [4,8)
  VlcLut token_cdc;  // coeff_token, chroma DC (nC == -1)
  VlcLut tz4[15];    // total_zeros, 4x4 (indexed total_coeff - 1)
  VlcLut tzc[3];     // total_zeros, chroma DC
  VlcLut run[7];     // run_before (indexed min(zeros_left,7) - 1)

  CavlcLuts() {
    const Vlc(*toks[3])[17] = {kCoeffToken0, kCoeffToken1, kCoeffToken2};
    for (int k = 0; k < 3; k++)
      for (int t1 = 0; t1 < 4; t1++)
        for (int tc = 0; tc <= 16; tc++) {
          Vlc v = toks[k][t1][tc];
          if (v.len) token[k].add(v.len, v.bits, (tc << 2) | t1);
        }
    for (int t1 = 0; t1 < 4; t1++)
      for (int tc = 0; tc <= 4; tc++) {
        Vlc v = kCoeffTokenChromaDC[t1][tc];
        if (v.len) token_cdc.add(v.len, v.bits, (tc << 2) | t1);
      }
    for (int r = 0; r < 15; r++)
      for (int i = 0; i < 16; i++)
        if (kTotalZeros4x4[r][i].len)
          tz4[r].add(kTotalZeros4x4[r][i].len, kTotalZeros4x4[r][i].bits, i);
    for (int r = 0; r < 3; r++)
      for (int i = 0; i < 4; i++)
        if (kTotalZerosChromaDC[r][i].len)
          tzc[r].add(kTotalZerosChromaDC[r][i].len,
                     kTotalZerosChromaDC[r][i].bits, i);
    for (int r = 0; r < 7; r++)
      for (int i = 0; i < 15; i++)
        if (kRunBefore[r][i].len)
          run[r].add(kRunBefore[r][i].len, kRunBefore[r][i].bits, i);
  }
};

const CavlcLuts& cavlc_luts() {
  static const CavlcLuts luts;  // thread-safe one-time build
  return luts;
}

// Decode coeff_token: returns total_coeff<<2 | trailing_ones, or -1.
int decode_coeff_token(BitReader& br, int nC) {
  if (nC >= 8) {
    uint32_t v = br.u(6);
    if (v == 3) return 0;  // total_coeff 0, trailing_ones 0
    int total = (v >> 2) + 1;
    int t1 = v & 3;
    return (total << 2) | t1;
  }
  const CavlcLuts& L = cavlc_luts();
  const VlcLut& t =
      nC < 0 ? L.token_cdc : L.token[nC < 2 ? 0 : (nC < 4 ? 1 : 2)];
  return vlc_get(br, t);
}

// CAVLC residual block decode (spec 9.2).  Writes coefficients in the
// block's scan order into coeff[0..max_coeff); returns total_coeff or -1.
int decode_residual_block(BitReader& br, int nC, int max_coeff,
                          int16_t* coeff /* scan-order */) {
  memset(coeff, 0, sizeof(int16_t) * max_coeff);
  int token = decode_coeff_token(br, nC);
  if (token < 0 || br.error()) return -1;
  int total_coeff = token >> 2;
  int trailing_ones = token & 3;
  if (total_coeff == 0) return 0;
  if (total_coeff > max_coeff) return -1;

  int level[16];
  if (trailing_ones) {  // all T1 sign bits in one peek
    uint32_t signs = br.peek(trailing_ones);
    br.skip(trailing_ones);
    for (int i = 0; i < trailing_ones; i++)
      level[i] = (signs >> (trailing_ones - 1 - i)) & 1 ? -1 : 1;
  }
  int suffix_length = (total_coeff > 10 && trailing_ones < 3) ? 1 : 0;
  for (int i = trailing_ones; i < total_coeff; i++) {
    // level_prefix: count of zero bits before the marker 1 (clz fast
    // path; the bit-serial loop only for >31-zero / end-of-stream tails)
    int prefix;
    int suffix_size;
    int suffix = 0;
    uint32_t w = br.peek(32);
    if (w != 0) {
      prefix = __builtin_clz(w);
      suffix_size = suffix_length;
      if (prefix == 14 && suffix_length == 0) suffix_size = 4;
      if (prefix >= 15) suffix_size = prefix - 3;
      if (prefix + 1 + suffix_size <= 32) {  // suffix already in w
        if (suffix_size > 0)
          suffix = (w >> (31 - prefix - suffix_size)) &
                   ((1u << suffix_size) - 1);
        br.skip(prefix + 1 + suffix_size);
      } else {
        br.skip(prefix + 1);
        suffix = br.u(suffix_size);
      }
      if (br.error()) return -1;
    } else {
      prefix = 32;
      br.skip(32);
      while (br.u1() == 0) {
        prefix++;
        if (prefix > 32 || br.error()) return -1;
      }
      if (prefix > 32 || br.error()) return -1;
      suffix_size = suffix_length;
      if (prefix >= 15) suffix_size = prefix - 3;
      if (suffix_size > 0) suffix = br.u(suffix_size);
    }
    int level_code = ((prefix < 15 ? prefix : 15) << suffix_length) + suffix;
    if (prefix >= 15 && suffix_length == 0) level_code += 15;
    if (prefix >= 16) level_code += (1 << (prefix - 3)) - 4096;
    if (i == trailing_ones && trailing_ones < 3) level_code += 2;
    level[i] = (level_code & 1) ? -((level_code + 1) >> 1)
                                : ((level_code + 2) >> 1);
    if (suffix_length == 0) suffix_length = 1;
    int abs_level = level[i] < 0 ? -level[i] : level[i];
    if (abs_level > (3 << (suffix_length - 1)) && suffix_length < 6)
      suffix_length++;
  }

  int total_zeros = 0;
  if (total_coeff < max_coeff) {
    const CavlcLuts& L = cavlc_luts();
    total_zeros = vlc_get(br, nC < 0 ? L.tzc[total_coeff - 1]
                                     : L.tz4[total_coeff - 1]);
    if (total_zeros < 0 || br.error()) return -1;
  }

  int pos = total_coeff + total_zeros - 1;  // scan index of first (highest
                                            // frequency) coefficient
  if (pos >= max_coeff) return -1;
  int zeros_left = total_zeros;
  for (int i = 0; i < total_coeff; i++) {
    coeff[pos] = (int16_t)level[i];
    if (i == total_coeff - 1) break;
    int run;
    if (zeros_left > 0) {
      int zl = zeros_left > 7 ? 7 : zeros_left;
      run = vlc_get(br, cavlc_luts().run[zl - 1]);
      if (run < 0 || br.error()) return -1;
    } else {
      run = 0;
    }
    zeros_left -= run;
    pos -= run + 1;
    if (pos < 0) return -1;
  }
  return total_coeff;
}

// ---------------------------------------------------------------------------
// Parameter set parsing
// ---------------------------------------------------------------------------

// Default scaling matrices (spec Table 7-3/7-4), raster order.
static const uint8_t kDef4Intra[16] = {6, 13, 20, 28, 13, 20, 28, 32,
                                       20, 28, 32, 37, 28, 32, 37, 42};
static const uint8_t kDef4Inter[16] = {10, 14, 20, 24, 14, 20, 24, 27,
                                       20, 24, 27, 30, 24, 27, 30, 34};
static const uint8_t kDef8Intra[64] = {
    6, 10, 13, 16, 18, 23, 25, 27, 10, 11, 16, 18, 23, 25, 27, 29,
    13, 16, 18, 23, 25, 27, 29, 31, 16, 18, 23, 25, 27, 29, 31, 33,
    18, 23, 25, 27, 29, 31, 33, 36, 23, 25, 27, 29, 31, 33, 36, 38,
    25, 27, 29, 31, 33, 36, 38, 40, 27, 29, 31, 33, 36, 38, 40, 42};
static const uint8_t kDef8Inter[64] = {
    9, 13, 15, 17, 19, 21, 22, 24, 13, 13, 17, 19, 21, 22, 24, 25,
    15, 17, 19, 21, 22, 24, 25, 27, 17, 19, 21, 22, 24, 25, 27, 28,
    19, 21, 22, 24, 25, 27, 28, 30, 21, 22, 24, 25, 27, 28, 30, 32,
    22, 24, 25, 27, 28, 30, 32, 33, 24, 25, 27, 28, 30, 32, 33, 35};

void parse_scaling_list(BitReader& br, uint8_t* list, int size,
                        const uint8_t* fallback, bool* use_default) {
  int last = 8, next = 8;
  const uint8_t* scan = size == 16 ? kZigzag4x4 : kZigzag8x8;
  *use_default = false;
  for (int i = 0; i < size; i++) {
    if (next != 0) {
      int delta = br.se();
      next = (last + delta + 256) % 256;
      if (i == 0 && next == 0) {
        *use_default = true;
        return;
      }
    }
    last = next == 0 ? last : next;
    list[scan[i]] = (uint8_t)last;
  }
}

bool parse_sps(BitReader& br, SPS& sps, std::string& err) {
  sps.profile_idc = br.u(8);
  br.u(8);  // constraint flags + reserved
  sps.level_idc = br.u(8);
  sps.seq_parameter_set_id = br.ue();
  if (sps.profile_idc == 100 || sps.profile_idc == 110 ||
      sps.profile_idc == 122 || sps.profile_idc == 244 ||
      sps.profile_idc == 44 || sps.profile_idc == 83 ||
      sps.profile_idc == 86 || sps.profile_idc == 118 ||
      sps.profile_idc == 128) {
    sps.chroma_format_idc = br.ue();
    if (sps.chroma_format_idc == 3) br.u1();  // separate_colour_plane
    sps.bit_depth_luma = br.ue() + 8;
    sps.bit_depth_chroma = br.ue() + 8;
    sps.qpprime_y_zero_transform_bypass = br.u1();
    sps.seq_scaling_matrix_present = br.u1();
    if (sps.seq_scaling_matrix_present) {
      // 8 lists for 4:2:0; fall-back rule A (Table 7-2)
      for (int i = 0; i < 8; i++) {
        uint8_t* dst = i < 6 ? sps.scaling4[i] : sps.scaling8[i - 6];
        int size = i < 6 ? 16 : 64;
        const uint8_t* def = i == 0   ? kDef4Intra
                             : i == 3 ? kDef4Inter
                             : i == 6 ? kDef8Intra
                             : i == 7 ? kDef8Inter
                                      : nullptr;  // 1,2,4,5: previous list
        if (br.u1()) {
          bool use_default = false;
          parse_scaling_list(br, dst, size, nullptr, &use_default);
          if (use_default)
            memcpy(dst, i < 3 ? kDef4Intra : (i < 6 ? kDef4Inter
                    : (i == 6 ? kDef8Intra : kDef8Inter)), size);
        } else if (def) {
          memcpy(dst, def, size);
        } else {
          memcpy(dst, sps.scaling4[i - 1], size);
        }
      }
    }
  }
  sps.log2_max_frame_num = br.ue() + 4;
  sps.pic_order_cnt_type = br.ue();
  if (sps.pic_order_cnt_type == 0) {
    sps.log2_max_poc_lsb = br.ue() + 4;
  } else if (sps.pic_order_cnt_type == 1) {
    sps.delta_pic_order_always_zero = br.u1();
    sps.offset_for_non_ref_pic = br.se();
    sps.offset_for_top_to_bottom_field = br.se();
    int n = br.ue();
    for (int i = 0; i < n; i++) sps.offset_for_ref_frame.push_back(br.se());
  }
  sps.max_num_ref_frames = br.ue();
  sps.gaps_in_frame_num_allowed = br.u1();
  sps.pic_width_in_mbs = br.ue() + 1;
  sps.pic_height_in_map_units = br.ue() + 1;
  sps.frame_mbs_only = br.u1();
  if (!sps.frame_mbs_only) {
    err = "interlaced (frame_mbs_only=0) not supported";
    return false;
  }
  sps.direct_8x8_inference = br.u1();
  sps.frame_cropping = br.u1();
  if (sps.frame_cropping) {
    sps.crop_left = br.ue();
    sps.crop_right = br.ue();
    sps.crop_top = br.ue();
    sps.crop_bottom = br.ue();
  }
  // vui ignored
  if (br.error()) {
    err = "SPS parse overrun";
    return false;
  }
  if (sps.chroma_format_idc != 1 || sps.bit_depth_luma != 8 ||
      sps.bit_depth_chroma != 8) {
    err = "only 4:2:0 8-bit supported";
    return false;
  }
  sps.valid = true;
  return true;
}

bool parse_pps(BitReader& br, PPS& pps, const std::map<int, SPS>& sps_map,
               std::string& err) {
  pps.pic_parameter_set_id = br.ue();
  pps.seq_parameter_set_id = br.ue();
  pps.entropy_coding_mode = br.u1();
  pps.bottom_field_pic_order_in_frame_present = br.u1();
  pps.num_slice_groups = br.ue() + 1;
  if (pps.num_slice_groups != 1) {
    err = "slice groups (FMO) not supported";
    return false;
  }
  pps.num_ref_idx_l0_default = br.ue() + 1;
  pps.num_ref_idx_l1_default = br.ue() + 1;
  pps.weighted_pred = br.u1();
  pps.weighted_bipred_idc = br.u(2);
  pps.pic_init_qp = br.se() + 26;
  pps.pic_init_qs = br.se() + 26;
  pps.chroma_qp_index_offset = br.se();
  pps.deblocking_filter_control_present = br.u1();
  pps.constrained_intra_pred = br.u1();
  pps.redundant_pic_cnt_present = br.u1();
  pps.second_chroma_qp_index_offset = pps.chroma_qp_index_offset;
  auto sit = sps_map.find(pps.seq_parameter_set_id);
  const SPS* sps = sit != sps_map.end() ? &sit->second : nullptr;
  bool sps_scal = sps && sps->seq_scaling_matrix_present;
  if (br.more_rbsp_data()) {
    pps.transform_8x8_mode = br.u1();
    pps.pic_scaling_matrix_present = br.u1();
    if (pps.pic_scaling_matrix_present) {
      int n_lists = 6 + (pps.transform_8x8_mode ? 2 : 0);
      for (int i = 0; i < n_lists; i++) {
        uint8_t* dst = i < 6 ? pps.scaling4[i] : pps.scaling8[i - 6];
        int size = i < 6 ? 16 : 64;
        // fall-back rule B: lists 0/3/6/7 take the SPS list when the SPS
        // carries matrices, else the default; others take the previous
        const uint8_t* fb = nullptr;
        if (i == 0) fb = sps_scal ? sps->scaling4[0] : kDef4Intra;
        else if (i == 3) fb = sps_scal ? sps->scaling4[3] : kDef4Inter;
        else if (i == 6) fb = sps_scal ? sps->scaling8[0] : kDef8Intra;
        else if (i == 7) fb = sps_scal ? sps->scaling8[1] : kDef8Inter;
        if (br.u1()) {
          bool use_default = false;
          parse_scaling_list(br, dst, size, nullptr, &use_default);
          if (use_default)
            memcpy(dst, i < 3 ? kDef4Intra : (i < 6 ? kDef4Inter
                    : (i == 6 ? kDef8Intra : kDef8Inter)), size);
        } else if (fb) {
          memcpy(dst, fb, size);
        } else {
          memcpy(dst, pps.scaling4[i - 1], size);
        }
      }
    }
    pps.second_chroma_qp_index_offset = br.se();
  }
  // effective weight tables for this PPS (flat 16 when no matrices)
  if (pps.pic_scaling_matrix_present) {
    // 8x8 lists only present when transform_8x8_mode; else inherit
    if (!pps.transform_8x8_mode) {
      memcpy(pps.scaling8[0], sps_scal ? sps->scaling8[0] : kDef8Intra, 64);
      memcpy(pps.scaling8[1], sps_scal ? sps->scaling8[1] : kDef8Inter, 64);
    }
  } else if (sps_scal) {
    memcpy(pps.scaling4, sps->scaling4, sizeof(pps.scaling4));
    memcpy(pps.scaling8[0], sps->scaling8[0], 64);
    memcpy(pps.scaling8[1], sps->scaling8[1], 64);
  } else {
    memset(pps.scaling4, 16, sizeof(pps.scaling4));
    memset(pps.scaling8, 16, sizeof(pps.scaling8));
  }
  pps.has_scaling = pps.pic_scaling_matrix_present || sps_scal;
  if (br.error()) {
    err = "PPS parse overrun";
    return false;
  }
  pps.valid = true;
  return true;
}

// ---------------------------------------------------------------------------
// Decoder context
// ---------------------------------------------------------------------------

// Sparse-transport accumulators (see GopOut::sparse_counts): every
// residual block adds its TotalCoeff (the exact number of nonzero
// entries written), every emitted MV set adds its per-4x4 deviations
// from block 0 — the same quantities hw_h264_pack_clip's count pass
// re-derives by sweeping the SoA tensors.
static inline void acc_coeff(GopOut* out, int tc) {
  if (out->sparse_counts) out->sparse_counts[0] += tc;
}

static inline void acc_mv_exc(GopOut* out, const int16_t (*mv)[2],
                              int which) {
  if (!out->sparse_counts) return;
  const int16_t bx = mv[0][0], by = mv[0][1];
  int n = 0;
  for (int k = 1; k < 16; k++)
    n += (mv[k][0] != bx) | (mv[k][1] != by);
  out->sparse_counts[which] += n;
}

static inline void acc_i4(GopOut* out, uint8_t kind) {
  if (out->sparse_counts && kind == MB_I4x4) out->sparse_counts[3]++;
}

struct MbState {
  uint8_t kind = MB_P_SKIP;
  uint8_t intra = 0;
  uint8_t is_i4x4 = 0;
  uint8_t nnz[24];       // CAVLC contexts: 16 luma + 4 Cb + 4 Cr
  int8_t i4_modes[16];   // raster order
  int16_t mv[16][2];     // L0, per 4x4 raster
  int8_t refidx[4];      // L0, per 8x8
  int16_t mv1[16][2];    // L1
  int8_t refidx1[4];
  int slice_id = -1;
  int8_t qp = 0;
  uint8_t transform8x8 = 0;
  // CABAC neighbor context state (unused on the CAVLC path):
  uint8_t cbp = 0;        // luma bits 0-3, chroma (0/1/2) bits 4-5
  uint32_t cbf = 0;       // coded_block_flag bits: 0-15 luma 4x4 (raster),
                          // 16-23 chroma AC (comp*4+blk), 24 luma DC,
                          // 25/26 chroma DC per component
  int8_t chroma_mode = 0; // intra chroma pred mode (0 for inter)
  int16_t mvd[16][2];     // L0 mvd per 4x4 (replicated over partitions)
  int16_t mvd1[16][2];    // L1 mvd
  uint8_t direct8[4] = {0, 0, 0, 0};  // 8x8 coded in B direct mode
  uint8_t all_direct = 0;             // B_Skip / B_Direct_16x16
};

struct RefPic {
  int span_index = -1;   // frame index within the current decode span
  int frame_num = 0;
  int pic_num = 0;       // derived each slice
  int poc = 0;
  bool long_term = false;
  int long_term_idx = 0;
};

struct Ctx {
  std::map<int, SPS> sps_map;
  std::map<int, PPS> pps_map;
  SPS sps;  // active
  PPS pps;  // active
  bool have_active = false;
  int nal_length_size = 4;

  // current picture state
  std::vector<MbState> mbs;
  int mb_width = 0, mb_height = 0, n_mbs = 0;
  // mb -> (x, y) lookup: nb_mb/mb_x/mb_y run per-bin-adjacent in the
  // entropy hot loop; a table beats the div/mod pair there
  std::vector<uint16_t> mbx_tab, mby_tab;
  int cur_slice_id = 0;
  int qp_prev = 26;

  // DPB (short-term + long-term refs; short-term most recent first)
  std::vector<RefPic> dpb;
  int prev_frame_num = 0;
  int prev_poc_msb = 0, prev_poc_lsb = 0;
  int frame_num_offset = 0;
  int max_long_term_idx = -1;   // MaxLongTermFrameIdx (-1 = none allowed)
  // POC values restart at reset points (mid-span IDR, MMCO 5); emitted
  // POCs get an epoch offset so display order stays globally sortable
  // while internal deltas (implicit weighting, temporal direct) hold
  int poc_epoch = 0;
  int max_poc_emitted = 0;
  // host model of the device reference ring: slot -> span index (-1 free)
  int ring_slots = 0;           // 0 = default to sps.max_num_ref_frames
  std::vector<int> ring_span;

  std::string err;
  bool trace = false;
};

inline int mb_x(const Ctx& c, int mb) { return c.mbx_tab[mb]; }
inline int mb_y(const Ctx& c, int mb) { return c.mby_tab[mb]; }

// Neighbor MB address or -1 (picture bounds + slice bounds).
__attribute__((always_inline)) inline int nb_mb(const Ctx& c, int mb, int dx,
                                                int dy,
                                                bool same_slice = true) {
  int x = mb_x(c, mb) + dx;
  int y = mb_y(c, mb) + dy;
  if (x < 0 || x >= c.mb_width || y < 0 || y >= c.mb_height) return -1;
  int n = y * c.mb_width + x;
  if (n >= mb) return -1;  // not yet decoded (raster order)
  if (same_slice && c.mbs[n].slice_id != c.mbs[mb].slice_id) return -1;
  return n;
}

// CAVLC nC for luma 4x4 block `blk` (raster 0..15) of MB `mb`.
int luma_nc(const Ctx& c, int mb, int blk) {
  int bx = blk & 3, by = blk >> 2;
  int nA = -1, nB = -1;
  // left
  if (bx > 0) {
    nA = c.mbs[mb].nnz[by * 4 + bx - 1];
  } else {
    int n = nb_mb(c, mb, -1, 0);
    if (n >= 0) nA = c.mbs[n].nnz[by * 4 + 3];
  }
  // top
  if (by > 0) {
    nB = c.mbs[mb].nnz[(by - 1) * 4 + bx];
  } else {
    int n = nb_mb(c, mb, 0, -1);
    if (n >= 0) nB = c.mbs[n].nnz[3 * 4 + bx];
  }
  if (nA >= 0 && nB >= 0) return (nA + nB + 1) >> 1;
  if (nA >= 0) return nA;
  if (nB >= 0) return nB;
  return 0;
}

// CAVLC nC for chroma AC block (comp 0/1, blk 0..3 in 2x2 raster).
int chroma_nc(const Ctx& c, int mb, int comp, int blk) {
  int bx = blk & 1, by = blk >> 1;
  int base = 16 + comp * 4;
  int nA = -1, nB = -1;
  if (bx > 0) {
    nA = c.mbs[mb].nnz[base + by * 2];
  } else {
    int n = nb_mb(c, mb, -1, 0);
    if (n >= 0) nA = c.mbs[n].nnz[base + by * 2 + 1];
  }
  if (by > 0) {
    nB = c.mbs[mb].nnz[base + bx];
  } else {
    int n = nb_mb(c, mb, 0, -1);
    if (n >= 0) nB = c.mbs[n].nnz[base + 2 + bx];
  }
  if (nA >= 0 && nB >= 0) return (nA + nB + 1) >> 1;
  if (nA >= 0) return nA;
  if (nB >= 0) return nB;
  return 0;
}

// Intra 4x4 mode prediction (spec 8.3.1.1).
int predict_intra4x4_mode(const Ctx& c, int mb, int blk) {
  int bx = blk & 3, by = blk >> 2;
  int modeA = -1, modeB = -1;
  // left block
  {
    int n = mb, b = -1;
    if (bx > 0) {
      b = by * 4 + bx - 1;
    } else {
      n = nb_mb(c, mb, -1, 0);
      if (n >= 0) b = by * 4 + 3;
    }
    if (n >= 0 && b >= 0) {
      const MbState& m = c.mbs[n];
      modeA = m.is_i4x4 ? m.i4_modes[b] : 2;  // non-I4x4 neighbor counts DC
      if (c.pps.constrained_intra_pred && !m.intra) modeA = -1;
    }
  }
  // top block
  {
    int n = mb, b = -1;
    if (by > 0) {
      b = (by - 1) * 4 + bx;
    } else {
      n = nb_mb(c, mb, 0, -1);
      if (n >= 0) b = 3 * 4 + bx;
    }
    if (n >= 0 && b >= 0) {
      const MbState& m = c.mbs[n];
      modeB = m.is_i4x4 ? m.i4_modes[b] : 2;
      if (c.pps.constrained_intra_pred && !m.intra) modeB = -1;
    }
  }
  if (modeA < 0 || modeB < 0) return 2;  // DC
  return modeA < modeB ? modeA : modeB;
}


// Neighbor availability bits for the device recon:
// bit0..3: intra-pred availability of left/top/topright/topleft
// (slice-bounded; constrained_intra_pred-aware), bit4/5: left/top MB in
// same slice (for deblock disable_idc==2).
uint8_t avail_bits(const Ctx& c, int mb) {
  uint8_t bits = 0;
  struct { int dx, dy; } nbs[4] = {{-1, 0}, {0, -1}, {1, -1}, {-1, -1}};
  for (int i = 0; i < 4; i++) {
    int n = nb_mb(c, mb, nbs[i].dx, nbs[i].dy);
    if (n >= 0 && (!c.pps.constrained_intra_pred || c.mbs[n].intra))
      bits |= (1 << i);
  }
  if (nb_mb(c, mb, -1, 0) >= 0) bits |= (1 << 4);
  if (nb_mb(c, mb, 0, -1) >= 0) bits |= (1 << 5);
  return bits;
}

// ---------------------------------------------------------------------------
// Motion vector prediction (spec 8.4.1.3)
// ---------------------------------------------------------------------------

struct NbMv {
  bool avail = false;
  int16_t mv[2] = {0, 0};
  int8_t ref = -1;
  int16_t mvd[2] = {0, 0};  // for CABAC mvd ctx (9.3.3.1.1.7)
};

// Fetch the MV/ref of the 4x4 block at (x4,y4) in units of 4x4 blocks from
// MB-grid origin of `mb`; dx4,dy4 may reach into neighbor MBs.  `list`
// selects the L0 (default) or L1 motion field.
__attribute__((always_inline)) inline NbMv fetch_mv(const Ctx& c, int mb,
                                                    int x4, int y4,
                                                    int list = 0) {
  NbMv r;
  // callers stay within one MB of distance: x4/y4 in [-4, 7]
  int dmbx = x4 >> 2, dmby = y4 >> 2;
  x4 &= 3;
  y4 &= 3;
  int n = (dmbx == 0 && dmby == 0) ? mb : nb_mb(c, mb, dmbx, dmby);
  if (n < 0) return r;
  const MbState& m = c.mbs[n];
  if (m.intra) {
    r.avail = true;  // available but intra: ref=-1, mv=0 (spec: not "available
                     // for prediction" — treated as ref -1 mv 0)
    return r;
  }
  r.avail = true;
  if (list == 0) {
    r.mv[0] = m.mv[y4 * 4 + x4][0];
    r.mv[1] = m.mv[y4 * 4 + x4][1];
    r.mvd[0] = m.mvd[y4 * 4 + x4][0];
    r.mvd[1] = m.mvd[y4 * 4 + x4][1];
    r.ref = m.refidx[(y4 >> 1) * 2 + (x4 >> 1)];
  } else {
    r.mv[0] = m.mv1[y4 * 4 + x4][0];
    r.mv[1] = m.mv1[y4 * 4 + x4][1];
    r.mvd[0] = m.mvd1[y4 * 4 + x4][0];
    r.mvd[1] = m.mvd1[y4 * 4 + x4][1];
    r.ref = m.refidx1[(y4 >> 1) * 2 + (x4 >> 1)];
  }
  return r;
}

// 4x4 luma block decode order within a MB (raster index -> decode index;
// the quad-zigzag mapping is an involution).
static const uint8_t kDecOrder4x4[16] = {0, 1, 4, 5, 2,  3,  6,  7,
                                         8, 9, 12, 13, 10, 11, 14, 15};

// Median MV predictor for a partition at 4x4 coords (x4,y4), size
// (w4,h4) in 4x4 units, with target ref index.
void predict_mv(const Ctx& c, int mb, int x4, int y4, int w4, int h4, int ref,
                int16_t out[2], int list = 0) {
  NbMv A = fetch_mv(c, mb, x4 - 1, y4, list);      // left
  NbMv B = fetch_mv(c, mb, x4, y4 - 1, list);      // top
  // top-right: within the current MB it is available only if it precedes
  // this partition in 4x4 decode order (6.4.11.7 "not yet decoded") —
  // e.g. the bottom-right 4x4 of an 8x8 must NOT see the next 8x8's blocks.
  NbMv C;
  int cx4 = x4 + w4, cy4 = y4 - 1;
  if (cx4 <= 3 && cy4 >= 0) {
    if (kDecOrder4x4[cy4 * 4 + cx4] < kDecOrder4x4[y4 * 4 + x4])
      C = fetch_mv(c, mb, cx4, cy4, list);
  } else {
    C = fetch_mv(c, mb, cx4, cy4, list);
  }
  if (!C.avail) C = fetch_mv(c, mb, x4 - 1, y4 - 1, list);  // top-left

  // Special directional rules (8.4.1.3.1)
  if (w4 == 4 && h4 == 2) {  // 16x8
    if (y4 == 0 && B.avail && B.ref == ref) {
      out[0] = B.mv[0]; out[1] = B.mv[1];
      return;
    }
    if (y4 == 2 && A.avail && A.ref == ref) {
      out[0] = A.mv[0]; out[1] = A.mv[1];
      return;
    }
  } else if (w4 == 2 && h4 == 4) {  // 8x16
    if (x4 == 0 && A.avail && A.ref == ref) {
      out[0] = A.mv[0]; out[1] = A.mv[1];
      return;
    }
    if (x4 == 2 && C.avail && C.ref == ref) {
      out[0] = C.mv[0]; out[1] = C.mv[1];
      return;
    }
  }

  int match = 0;
  const NbMv* only = nullptr;
  for (const NbMv* p : {&A, &B, &C}) {
    if (p->avail && p->ref == ref) {
      match++;
      only = p;
    }
  }
  if (match == 1) {
    out[0] = only->mv[0];
    out[1] = only->mv[1];
    return;
  }
  // If B and C are unavailable and A is available -> mvp = mvA
  if (!B.avail && !C.avail && A.avail) {
    out[0] = A.mv[0];
    out[1] = A.mv[1];
    return;
  }
  for (int k = 0; k < 2; k++) {
    int a = A.mv[k], b = B.mv[k], cc = C.mv[k];
    int mx = std::max(a, std::max(b, cc));
    int mn = std::min(a, std::min(b, cc));
    out[k] = (int16_t)(a + b + cc - mx - mn);
  }
}

// ---------------------------------------------------------------------------
// Slice + MB decode
// ---------------------------------------------------------------------------

struct SliceCtx {
  SliceHeader sh;
  std::vector<RefPic> list0;  // resolved reference list for this slice
  std::vector<RefPic> list1;  // B slices
};

struct FrameOutView {
  // pointers into GopOut for the current frame (mb-indexed)
  GopOut* g = nullptr;
  int f = 0;
  int n_mbs = 0;
  uint8_t* mb_kind(int mb) { return g->mb_kind + (size_t)f * n_mbs + mb; }
};

static const uint8_t kChromaQpMap[22] = {29, 30, 31, 32, 32, 33, 34, 34,
                                         35, 35, 36, 36, 37, 37, 37, 38,
                                         38, 38, 39, 39, 39, 39};

// ---------------------------------------------------------------------------
// B-slice machinery: two reference lists, per-list median MV prediction
// (via the list parameter above), and the Direct modes (spec 8.4.1.2).
// Colocated motion is read back from the already-decoded span output in
// GopOut (refs resolved to span frame indices by ref_map).
// ---------------------------------------------------------------------------

inline int min_positive(int a, int b) {
  if (a >= 0 && b >= 0) return a < b ? a : b;
  return a > b ? a : b;
}

// Colocated 4x4 motion for direct prediction (8.4.1.2.1): block `blk`
// (raster 4x4) of MB `mb` in span frame `col`.  Returns raw refIdxCol,
// its resolution to a span frame index, and mvCol; intra -> ref -1, mv 0.
struct ColMotion {
  int ref_raw = -1;   // colocated's own refIdx (its list numbering)
  int ref_span = -1;  // resolved to a span frame index
  int16_t mv[2] = {0, 0};
};

ColMotion col_motion(const Ctx& c, GopOut* out, int col, int mb, int blk) {
  ColMotion r;
  size_t base = (size_t)col * c.n_mbs + mb;
  int kind = out->mb_kind[base];
  if (kind == MB_I4x4 || kind == MB_I16x16 || kind == MB_IPCM) return r;
  int q8 = ((blk >> 2) >> 1) * 2 + ((blk & 3) >> 1);
  int r0 = out->refidx[base * 4 + q8];
  if (r0 >= 0) {
    r.ref_raw = r0;
    r.ref_span = out->ref_map[(size_t)col * 16 + r0];
    r.mv[0] = out->mv[(base * 16 + blk) * 2];
    r.mv[1] = out->mv[(base * 16 + blk) * 2 + 1];
  } else {
    int r1 = out->refidx_l1[base * 4 + q8];
    if (r1 < 0) return r;  // shouldn't happen for inter MBs
    r.ref_raw = r1;
    r.ref_span = out->ref_map_l1[(size_t)col * 16 + r1];
    r.mv[0] = out->mv_l1[(base * 16 + blk) * 2];
    r.mv[1] = out->mv_l1[(base * 16 + blk) * 2 + 1];
  }
  return r;
}

// Corner 4x4 used for each 8x8 under direct_8x8_inference (always set by
// x264; we require it for direct modes).
static const uint8_t kCorner4x4[4] = {0, 3, 12, 15};

// Spatial direct per-MB setup (8.4.1.2.2): MinPositive refs over the
// standard A/B/C neighbors and the 16x16 median MV predictor per list.
struct SpatialDirect {
  int ref[2] = {-1, -1};
  int16_t mv[2][2] = {{0, 0}, {0, 0}};
  bool zero_pred = false;  // both refs < 0
};

SpatialDirect spatial_direct_setup(Ctx& c, const SliceCtx& sc, int mb) {
  SpatialDirect sd;
  for (int l = 0; l < 2; l++) {
    NbMv A = fetch_mv(c, mb, -1, 0, l);
    NbMv B = fetch_mv(c, mb, 0, -1, l);
    NbMv C = fetch_mv(c, mb, 4, -1, l);
    if (!C.avail) C = fetch_mv(c, mb, -1, -1, l);
    sd.ref[l] = min_positive(min_positive(A.avail ? A.ref : -1,
                                          B.avail ? B.ref : -1),
                             C.avail ? C.ref : -1);
  }
  if (sd.ref[0] < 0 && sd.ref[1] < 0) {
    sd.ref[0] = sd.ref[1] = 0;
    sd.zero_pred = true;
    return sd;
  }
  for (int l = 0; l < 2; l++)
    if (sd.ref[l] >= 0) predict_mv(c, mb, 0, 0, 4, 4, sd.ref[l], sd.mv[l], l);
  return sd;
}

// Derive direct motion for 8x8 `b8` of `mb` into MbState (both lists).
// `sd` != null -> spatial mode; null -> temporal (8.4.1.2.3).
bool direct_motion_8x8(Ctx& c, const SliceCtx& sc, GopOut* out, int fidx,
                       int mb, int b8, const SpatialDirect* sd) {
  MbState& M = c.mbs[mb];
  int col = sc.list1[0].span_index;
  ColMotion cm = col_motion(c, out, col, mb, kCorner4x4[b8]);
  int bx = (b8 & 1) * 2, by = (b8 >> 1) * 2;

  int ref[2];
  int16_t mv[2][2];
  if (sd) {
    ref[0] = sd->ref[0];
    ref[1] = sd->ref[1];
    // colZeroFlag (list1[0] is always short-term here: no long-term refs)
    bool col_zero = cm.ref_raw == 0 && cm.mv[0] >= -1 && cm.mv[0] <= 1 &&
                    cm.mv[1] >= -1 && cm.mv[1] <= 1;
    for (int l = 0; l < 2; l++) {
      if (ref[l] < 0) {
        mv[l][0] = mv[l][1] = 0;
      } else if (!sd->zero_pred && col_zero && ref[l] == 0) {
        mv[l][0] = mv[l][1] = 0;
      } else {
        mv[l][0] = sd->mv[l][0];
        mv[l][1] = sd->mv[l][1];
      }
    }
  } else {
    // temporal: scale colocated motion by POC distances
    ref[1] = 0;
    ref[0] = 0;
    if (cm.ref_span >= 0) {
      ref[0] = -1;
      for (size_t i = 0; i < sc.list0.size(); i++) {
        if (sc.list0[i].span_index == cm.ref_span) {
          ref[0] = (int)i;
          break;
        }
      }
      if (ref[0] < 0) {
        c.err = "temporal direct: colocated ref not in list0";
        return false;
      }
    }
    int poc_cur = out->poc[fidx];
    int poc0 = sc.list0[ref[0]].poc;
    int poc1 = sc.list1[0].poc;
    int td = std::max(-128, std::min(127, poc1 - poc0));
    if (td == 0) {
      mv[0][0] = cm.mv[0];
      mv[0][1] = cm.mv[1];
      mv[1][0] = mv[1][1] = 0;
    } else {
      int tb = std::max(-128, std::min(127, poc_cur - poc0));
      int tx = (16384 + std::abs(td / 2)) / td;
      int dsf = std::max(-1024, std::min(1023, (tb * tx + 32) >> 6));
      for (int k = 0; k < 2; k++) {
        int v0 = (dsf * cm.mv[k] + 128) >> 8;
        mv[0][k] = (int16_t)v0;
        mv[1][k] = (int16_t)(v0 - cm.mv[k]);
      }
    }
  }

  M.refidx[b8] = (int8_t)ref[0];
  M.refidx1[b8] = (int8_t)ref[1];
  M.direct8[b8] = 1;
  for (int yy = by; yy < by + 2; yy++)
    for (int xx = bx; xx < bx + 2; xx++) {
      int b = yy * 4 + xx;
      M.mv[b][0] = ref[0] >= 0 ? mv[0][0] : 0;
      M.mv[b][1] = ref[0] >= 0 ? mv[0][1] : 0;
      M.mv1[b][0] = ref[1] >= 0 ? mv[1][0] : 0;
      M.mv1[b][1] = ref[1] >= 0 ? mv[1][1] : 0;
    }
  return true;
}

bool derive_b_direct_mb(Ctx& c, const SliceCtx& sc, GopOut* out, int fidx,
                        int mb) {
  SpatialDirect sd;
  if (sc.sh.direct_spatial) sd = spatial_direct_setup(c, sc, mb);
  for (int b8 = 0; b8 < 4; b8++)
    if (!direct_motion_8x8(c, sc, out, fidx, mb, b8,
                           sc.sh.direct_spatial ? &sd : nullptr))
      return false;
  return true;
}

// B_Skip (slice-data skip run in B slices): direct prediction, no
// residual, QP unchanged.
bool derive_b_skip(Ctx& c, const SliceCtx& sc, int mb, GopOut* out,
                   int fidx) {
  const size_t base = (size_t)fidx * c.n_mbs + mb;
  // AC buffers arrive np.empty from Python; see decode_mb_cavlc
  memset(out->luma_ac + base * 256, 0, 256 * sizeof(int16_t));
  memset(out->chroma_ac + base * 128, 0, 128 * sizeof(int16_t));
  MbState& M = c.mbs[mb];
  M.slice_id = c.cur_slice_id;
  M.kind = MB_B_SKIP;
  M.intra = 0;
  M.is_i4x4 = 0;
  memset(M.nnz, 0, sizeof(M.nnz));
  memset(M.mv, 0, sizeof(M.mv));
  memset(M.mv1, 0, sizeof(M.mv1));
  memset(M.mvd, 0, sizeof(M.mvd));
  memset(M.mvd1, 0, sizeof(M.mvd1));
  memset(M.refidx, -1, sizeof(M.refidx));
  memset(M.refidx1, -1, sizeof(M.refidx1));
  M.all_direct = 1;
  if (!derive_b_direct_mb(c, sc, out, fidx, mb)) return false;
  M.qp = (int8_t)c.qp_prev;
  out->mb_kind[base] = M.kind;
  out->qp[base] = M.qp;
  memcpy(out->mv + base * 32, M.mv, sizeof(M.mv));
  memcpy(out->refidx + base * 4, M.refidx, 4);
  memcpy(out->mv_l1 + base * 32, M.mv1, sizeof(M.mv1));
  memcpy(out->refidx_l1 + base * 4, M.refidx1, 4);
  acc_mv_exc(out, M.mv, 1);
  acc_mv_exc(out, M.mv1, 2);
  memset(out->nnz + base * 24, 0, 24);
  return true;
}

// B mb_type tables (Table 7-14): partition pred modes, 0=L0 1=L1 2=BI.
static const uint8_t kBPartPred[9][2] = {
    {0, 0}, {1, 1}, {0, 1}, {1, 0}, {0, 2}, {1, 2}, {2, 0}, {2, 1}, {2, 2}};
// B sub_mb_type (Table 7-18): pred (3 = direct) and shape
// (0=8x8 1=8x4 2=4x8 3=4x4).
struct BSub {
  int8_t pred;
  int8_t shape;
};
static const BSub kBSubTab[13] = {{3, 0}, {0, 0}, {1, 0}, {2, 0}, {0, 1},
                                  {0, 2}, {1, 1}, {1, 2}, {2, 1}, {2, 2},
                                  {0, 3}, {1, 3}, {2, 3}};

// Decoded B partitioning, shared between the CAVLC and CABAC MB layers.
struct BPartInfo {
  int n_parts = 1;        // 1 (16x16/direct), 2 (16x8/8x16), 4 (8x8)
  int shape = 0;          // for n_parts==2: 0=16x8 1=8x16
  int pred[4] = {2, 2, 2, 2};   // per partition: 0=L0 1=L1 2=BI 3=direct
  int sub_shape[4] = {0, 0, 0, 0};  // for 8x8: BSub.shape
  bool all_direct = false;          // B_Direct_16x16
};

// Decode refs + mvds for a B inter MB given its partitioning and a
// per-syntax-element reader; CAVLC passes plain readers, CABAC passes
// context-coded ones.  Returns false on error (c.err set).
template <typename ReadRef, typename ReadMvd>
bool decode_b_motion(Ctx& c, const SliceCtx& sc, GopOut* out, int fidx,
                     int mb, const BPartInfo& bp, ReadRef read_ref,
                     ReadMvd read_mvd) {
  MbState& M = c.mbs[mb];
  if (bp.all_direct) {
    M.all_direct = 1;
    return derive_b_direct_mb(c, sc, out, fidx, mb);
  }

  // partition geometry in 4x4 units: (x4, y4) origin per partition index
  auto part_org = [&](int p, int& x4, int& y4, int& w4, int& h4) {
    if (bp.n_parts == 1) {
      x4 = y4 = 0;
      w4 = h4 = 4;
    } else if (bp.n_parts == 2) {
      if (bp.shape == 0) {  // 16x8
        x4 = 0; y4 = p * 2; w4 = 4; h4 = 2;
      } else {              // 8x16
        x4 = p * 2; y4 = 0; w4 = 2; h4 = 4;
      }
    } else {
      x4 = (p & 1) * 2;
      y4 = (p >> 1) * 2;
      w4 = h4 = 2;
    }
  };
  int n_active[2] = {sc.sh.num_ref_idx_l0_active, sc.sh.num_ref_idx_l1_active};

  // direct 8x8 sub-partitions derive their motion first: their refs/mvs
  // are neighbor context for the later partitions' ref_idx (CABAC) and
  // MV prediction.  The spatial setup only reads neighbor MBs, so it is
  // safe to run before any in-MB motion is decoded.
  if (bp.n_parts == 4) {
    SpatialDirect sd;
    bool have_sd = false;
    for (int p = 0; p < 4; p++) {
      if (bp.pred[p] != 3) continue;
      const SpatialDirect* sdp = nullptr;
      if (sc.sh.direct_spatial) {
        if (!have_sd) {
          sd = spatial_direct_setup(c, sc, mb);
          have_sd = true;
        }
        sdp = &sd;
      }
      if (!direct_motion_8x8(c, sc, out, fidx, mb, p, sdp)) return false;
    }
  }

  // ref_idx_lX: all L0 refs in partition order, then all L1
  for (int l = 0; l < 2; l++) {
    for (int p = 0; p < bp.n_parts; p++) {
      if (bp.pred[p] == 3) continue;  // direct sub-partition
      bool uses = bp.pred[p] == 2 || bp.pred[p] == l;
      if (!uses) continue;
      int x4, y4, w4, h4;
      part_org(p, x4, y4, w4, h4);
      int ref = 0;
      if (n_active[l] > 1) {
        ref = read_ref(l, x4, y4);
        if (ref < 0 || ref >= n_active[l]) {
          c.err = "B ref_idx out of range";
          return false;
        }
      }
      int8_t* ridx = l == 0 ? M.refidx : M.refidx1;
      for (int yy = y4 >> 1; yy < (y4 + h4) >> 1; yy++)
        for (int xx = x4 >> 1; xx < (x4 + w4) >> 1; xx++)
          ridx[yy * 2 + xx] = (int8_t)ref;
    }
  }

  // mvd_lX: all L0 mvds in partition order, then all L1
  for (int l = 0; l < 2; l++) {
    for (int p = 0; p < bp.n_parts; p++) {
      if (bp.pred[p] == 3) continue;
      bool uses = bp.pred[p] == 2 || bp.pred[p] == l;
      if (!uses) continue;
      int x4, y4, w4, h4;
      part_org(p, x4, y4, w4, h4);
      int ref = (l == 0 ? M.refidx : M.refidx1)[(y4 >> 1) * 2 + (x4 >> 1)];
      // sub-partition shapes for 8x8 partitions
      struct Blk {
        int x4, y4, w4, h4;
      };
      Blk blks[4];
      int nb = 1;
      if (bp.n_parts == 4) {
        switch (bp.sub_shape[p]) {
          case 0: blks[0] = {x4, y4, 2, 2}; nb = 1; break;
          case 1:
            blks[0] = {x4, y4, 2, 1};
            blks[1] = {x4, y4 + 1, 2, 1};
            nb = 2;
            break;
          case 2:
            blks[0] = {x4, y4, 1, 2};
            blks[1] = {x4 + 1, y4, 1, 2};
            nb = 2;
            break;
          default:
            for (int j = 0; j < 4; j++)
              blks[j] = {x4 + (j & 1), y4 + (j >> 1), 1, 1};
            nb = 4;
            break;
        }
      } else {
        blks[0] = {x4, y4, w4, h4};
      }
      for (int j = 0; j < nb; j++) {
        int16_t mvp[2];
        predict_mv(c, mb, blks[j].x4, blks[j].y4, blks[j].w4, blks[j].h4,
                   ref, mvp, l);
        int16_t mvd[2];
        read_mvd(l, blks[j].x4, blks[j].y4, mvd);
        int16_t vx = (int16_t)(mvp[0] + mvd[0]);
        int16_t vy = (int16_t)(mvp[1] + mvd[1]);
        int16_t(*mvs)[2] = l == 0 ? M.mv : M.mv1;
        int16_t(*mvds)[2] = l == 0 ? M.mvd : M.mvd1;
        for (int yy = blks[j].y4; yy < blks[j].y4 + blks[j].h4; yy++)
          for (int xx = blks[j].x4; xx < blks[j].x4 + blks[j].w4; xx++) {
            mvs[yy * 4 + xx][0] = vx;
            mvs[yy * 4 + xx][1] = vy;
            mvds[yy * 4 + xx][0] = mvd[0];
            mvds[yy * 4 + xx][1] = mvd[1];
          }
      }
    }
  }
  if (!c.err.empty()) return false;
  return true;
}

bool decode_mb_cavlc(Ctx& c, BitReader& br, const SliceCtx& sc, int mb,
                     GopOut* out, int fidx) {
  const size_t base = (size_t)fidx * c.n_mbs + mb;
  // The AC coefficient buffers arrive np.empty from Python (a cold
  // 100+ MB calloc memset per 1080p span was 27% of the entropy wall,
  // gprofng-measured); zero this MB's slice cache-warm instead — pad
  // frames and skip-decoded frames are never read (nnz-gated).
  memset(out->luma_ac + base * 256, 0, 256 * sizeof(int16_t));
  memset(out->chroma_ac + base * 128, 0, 128 * sizeof(int16_t));
  MbState& M = c.mbs[mb];
  M.slice_id = c.cur_slice_id;
  memset(M.nnz, 0, sizeof(M.nnz));
  memset(M.mv, 0, sizeof(M.mv));
  memset(M.mv1, 0, sizeof(M.mv1));
  memset(M.refidx, -1, sizeof(M.refidx));
  memset(M.refidx1, -1, sizeof(M.refidx1));
  M.intra = 0;
  M.is_i4x4 = 0;
  M.transform8x8 = 0;
  bool allow_t8_inter = false;  // noSubMbPartSizeLessThan8x8Flag etc.

  bool is_p = sc.sh.slice_type == SLICE_P;
  bool is_b = sc.sh.slice_type == SLICE_B;
  int raw_type = br.ue();
  if (br.error()) {
    c.err = "mb_type overrun at mb " + std::to_string(mb);
    return false;
  }
  int mb_type = raw_type;
  if (is_p) {
    if (mb_type >= 5) {
      mb_type -= 5;  // intra types in P slice
    } else {
      mb_type += 100;  // tag inter types as 100+x
    }
  } else if (is_b) {
    if (mb_type >= 23) {
      mb_type -= 23;   // intra types in B slice
    } else {
      mb_type += 200;  // tag B inter/direct types as 200+x
    }
  }

  int16_t scan_buf[16];
  int num_ref = sc.sh.num_ref_idx_l0_active;

  // ----- inter MBs (B) -----
  if (mb_type >= 200) {
    int bt = mb_type - 200;  // Table 7-14
    M.kind = MB_B_INTER;
    memset(M.mvd1, 0, sizeof(M.mvd1));
    M.all_direct = 0;
    memset(M.direct8, 0, sizeof(M.direct8));
    allow_t8_inter = true;  // direct_8x8_inference enforced at slice level
    BPartInfo bp;
    if (bt == 0) {
      bp.all_direct = true;
    } else if (bt <= 3) {
      bp.n_parts = 1;
      bp.pred[0] = bt - 1;
    } else if (bt <= 21) {
      bp.n_parts = 2;
      bp.shape = (bt - 4) & 1;  // even=16x8 odd=8x16
      bp.pred[0] = kBPartPred[(bt - 4) >> 1][0];
      bp.pred[1] = kBPartPred[(bt - 4) >> 1][1];
    } else {  // 22: B_8x8
      bp.n_parts = 4;
      for (int i = 0; i < 4; i++) {
        uint32_t st = br.ue();
        if (st > 12 || br.error()) {
          c.err = "bad B sub_mb_type";
          return false;
        }
        bp.pred[i] = kBSubTab[st].pred;
        bp.sub_shape[i] = kBSubTab[st].shape;
        if (bp.pred[i] != 3 && bp.sub_shape[i] != 0) allow_t8_inter = false;
      }
    }
    auto read_ref = [&](int l, int, int) -> int {
      return (int)br.te((l == 0 ? sc.sh.num_ref_idx_l0_active
                                : sc.sh.num_ref_idx_l1_active) - 1);
    };
    auto read_mvd = [&](int, int, int, int16_t mvd[2]) {
      mvd[0] = (int16_t)br.se();
      mvd[1] = (int16_t)br.se();
    };
    if (!decode_b_motion(c, sc, out, fidx, mb, bp, read_ref, read_mvd))
      return false;
    if (br.error()) {
      c.err = "B mvd overrun";
      return false;
    }
  } else if (mb_type >= 100) {
    int pt = mb_type - 100;  // 0:16x16 1:16x8 2:8x16 3:8x8 4:8x8ref0
    M.kind = MB_INTER;
    int nparts;
    int pw4, ph4;  // partition size in 4x4 units
    switch (pt) {
      case 0: nparts = 1; pw4 = 4; ph4 = 4; break;
      case 1: nparts = 2; pw4 = 4; ph4 = 2; break;
      case 2: nparts = 2; pw4 = 2; ph4 = 4; break;
      default: nparts = 4; pw4 = 2; ph4 = 2; break;
    }
    int sub_type[4] = {0, 0, 0, 0};  // for 8x8: 0:8x8 1:8x4 2:4x8 3:4x4
    allow_t8_inter = true;
    if (pt == 3 || pt == 4) {
      for (int i = 0; i < 4; i++) {
        sub_type[i] = br.ue();
        if (sub_type[i] > 3 || br.error()) {
          c.err = "bad sub_mb_type";
          return false;
        }
        if (sub_type[i] != 0) allow_t8_inter = false;
      }
    }
    // ref indices
    int refs[4] = {0, 0, 0, 0};
    bool ref0_only = (pt == 4);
    if (!ref0_only && num_ref > 1) {
      for (int i = 0; i < nparts; i++) {
        refs[i] = br.te(num_ref - 1);
        if ((int)refs[i] >= num_ref || br.error()) {
          c.err = "bad ref_idx";
          return false;
        }
      }
    }
    // assign refidx per 8x8 before MV prediction (prediction uses refs)
    if (pt == 0) {
      for (int i = 0; i < 4; i++) M.refidx[i] = (int8_t)refs[0];
    } else if (pt == 1) {  // 16x8: parts (top, bottom)
      M.refidx[0] = M.refidx[1] = (int8_t)refs[0];
      M.refidx[2] = M.refidx[3] = (int8_t)refs[1];
    } else if (pt == 2) {  // 8x16: parts (left, right)
      M.refidx[0] = M.refidx[2] = (int8_t)refs[0];
      M.refidx[1] = M.refidx[3] = (int8_t)refs[1];
    } else {
      for (int i = 0; i < 4; i++) M.refidx[i] = (int8_t)refs[i];
    }
    // mvd + MV reconstruction, partition by partition in decode order
    auto set_mv_block = [&](int x4, int y4, int w4, int h4, int ref) {
      int16_t mvp[2];
      predict_mv(c, mb, x4, y4, w4, h4, ref, mvp);
      int mvd_x = br.se();
      int mvd_y = br.se();
      int16_t vx = (int16_t)(mvp[0] + mvd_x);
      int16_t vy = (int16_t)(mvp[1] + mvd_y);
      for (int yy = y4; yy < y4 + h4; yy++)
        for (int xx = x4; xx < x4 + w4; xx++) {
          M.mv[yy * 4 + xx][0] = vx;
          M.mv[yy * 4 + xx][1] = vy;
        }
    };
    if (pt == 0) {
      set_mv_block(0, 0, 4, 4, refs[0]);
    } else if (pt == 1) {
      set_mv_block(0, 0, 4, 2, refs[0]);
      set_mv_block(0, 2, 4, 2, refs[1]);
    } else if (pt == 2) {
      set_mv_block(0, 0, 2, 4, refs[0]);
      set_mv_block(2, 0, 2, 4, refs[1]);
    } else {
      for (int i = 0; i < 4; i++) {
        int bx = (i & 1) * 2, by = (i >> 1) * 2;
        switch (sub_type[i]) {
          case 0: set_mv_block(bx, by, 2, 2, refs[i]); break;
          case 1:
            set_mv_block(bx, by, 2, 1, refs[i]);
            set_mv_block(bx, by + 1, 2, 1, refs[i]);
            break;
          case 2:
            set_mv_block(bx, by, 1, 2, refs[i]);
            set_mv_block(bx + 1, by, 1, 2, refs[i]);
            break;
          case 3:
            for (int j = 0; j < 4; j++)
              set_mv_block(bx + (j & 1), by + (j >> 1), 1, 1, refs[i]);
            break;
        }
      }
    }
    if (br.error()) {
      c.err = "mvd overrun";
      return false;
    }
  } else if (mb_type == 0) {
    // ----- I_NxN (4x4 or, in High profile, 8x8) -----
    M.kind = MB_I4x4;
    M.intra = 1;
    M.is_i4x4 = 1;
    static const uint8_t dec2raster16[16] = {0, 1, 4, 5, 2,  3,  6,  7,
                                             8, 9, 12, 13, 10, 11, 14, 15};
    if (c.pps.transform_8x8_mode) M.transform8x8 = (uint8_t)br.u1();
    if (M.transform8x8) {
      // 4 intra 8x8 modes; the mode prediction reuses the 4x4 process at
      // each 8x8's top-left corner (modes replicated into all 4 slots)
      for (int q = 0; q < 4; q++) {
        int corner = dec2raster16[q * 4];
        int pred = predict_intra4x4_mode(c, mb, corner);
        int mode;
        if (br.u1()) {
          mode = pred;
        } else {
          int rem = br.u(3);
          mode = rem < pred ? rem : rem + 1;
        }
        for (int k = 0; k < 4; k++)
          M.i4_modes[dec2raster16[q * 4 + k]] = (int8_t)mode;
      }
    } else {
      for (int blk = 0; blk < 16; blk++) {
        int rblk = dec2raster16[blk];
        int pred = predict_intra4x4_mode(c, mb, rblk);
        int mode;
        if (br.u1()) {
          mode = pred;
        } else {
          int rem = br.u(3);
          mode = rem < pred ? rem : rem + 1;
        }
        M.i4_modes[rblk] = (int8_t)mode;
      }
    }
    int cm = br.ue();
    if (cm > 3 || br.error()) {
      c.err = "bad chroma mode at mb " + std::to_string(mb);
      return false;
    }
    out->chroma_mode[base] = (int8_t)cm;
  } else if (mb_type <= 24) {
    // ----- I_16x16 -----
    M.kind = MB_I16x16;
    M.intra = 1;
    int t = mb_type - 1;
    out->i16_mode[base] = (int8_t)(t % 4);
    int cbp_chroma = (t / 4) % 3;
    int cbp_luma = (t / 12) ? 15 : 0;
    out->cbp[base] = (uint8_t)(cbp_luma | (cbp_chroma << 4));
    int cm = br.ue();
    if (cm > 3 || br.error()) {
      c.err = "bad chroma mode (i16) at mb " + std::to_string(mb) + " cm " + std::to_string(cm);
      return false;
    }
    out->chroma_mode[base] = (int8_t)cm;
  } else if (mb_type == 25) {
    // ----- I_PCM -----
    M.kind = MB_IPCM;
    M.intra = 1;
    br.byte_align();
    uint8_t* dst = out->ipcm + base * 384;
    for (int i = 0; i < 384; i++) dst[i] = (uint8_t)br.u(8);
    if (br.error()) {
      c.err = "ipcm overrun";
      return false;
    }
    for (int i = 0; i < 24; i++) M.nnz[i] = 16;
    M.qp = (int8_t)c.qp_prev;
    out->mb_kind[base] = M.kind;
    out->qp[base] = M.qp;
    memcpy(out->nnz + base * 24, M.nnz, 24);
    return true;
  } else {
    c.err = "invalid mb_type " + std::to_string(raw_type);
    return false;
  }

  // ----- coded_block_pattern -----
  int cbp;
  if (M.kind == MB_I16x16) {
    cbp = out->cbp[base];
  } else {
    int code = br.ue();
    if (code > 47 || br.error()) {
      c.err = "bad cbp code at mb " + std::to_string(mb);
      return false;
    }
    cbp = kCbpTable[code][M.intra ? 0 : 1];
    out->cbp[base] = (uint8_t)cbp;
  }
  int cbp_luma = cbp & 15;
  int cbp_chroma = (cbp >> 4) & 3;

  // transform_size_8x8_flag for inter MBs (7.3.5)
  if (!M.intra && cbp_luma != 0 && c.pps.transform_8x8_mode &&
      allow_t8_inter)
    M.transform8x8 = (uint8_t)br.u1();

  // ----- mb_qp_delta -----
  if (cbp != 0 || M.kind == MB_I16x16) {
    int delta = br.se();
    if (delta < -26 || delta > 25 || br.error()) {
      c.err = "bad mb_qp_delta";
      return false;
    }
    c.qp_prev = (c.qp_prev + delta + 52) % 52;
  }
  M.qp = (int8_t)c.qp_prev;

  // ----- residuals (CAVLC) -----
  if (M.kind == MB_I16x16) {
    // luma DC: 16 coeffs, nC from block 0 context
    int nc = luma_nc(c, mb, 0);
    int tc = decode_residual_block(br, nc, 16, scan_buf);
    if (tc < 0) {
      c.err = "luma DC residual error";
      return false;
    }
    acc_coeff(out, tc);
    int16_t* dst = out->luma_dc + base * 16;
    for (int i = 0; i < 16; i++) dst[kZigzag4x4[i]] = scan_buf[i];
  }
  // luma AC / 4x4 blocks, in standard decode order over 8x8 quads
  static const uint8_t dec2raster[16] = {0, 1, 4, 5, 2,  3,  6,  7,
                                         8, 9, 12, 13, 10, 11, 14, 15};
  if (M.transform8x8) {
    // 8x8 transform (CAVLC): each coded 8x8 is 4 interleaved 4x4 CAVLC
    // blocks — coefficient i of sub-block k sits at 8x8 scan index 4i+k
    // (7.4.5.3.3).  Stored raster-order, 16 coeffs per quad 4x4 slot.
    for (int q = 0; q < 4; q++) {
      if (!(cbp_luma & (1 << q))) continue;
      int16_t s8[64] = {0};
      for (int k = 0; k < 4; k++) {
        int rblk = dec2raster[q * 4 + k];
        int nc = luma_nc(c, mb, rblk);
        int tc = decode_residual_block(br, nc, 16, scan_buf);
        if (tc < 0) {
          c.err = "luma 8x8 residual error at mb " + std::to_string(mb);
          return false;
        }
        acc_coeff(out, tc);
        M.nnz[rblk] = (uint8_t)tc;
        for (int i = 0; i < 16; i++) s8[4 * i + k] = scan_buf[i];
      }
      int16_t r8[64] = {0};
      for (int j = 0; j < 64; j++) r8[kZigzag8x8[j]] = s8[j];
      for (int k = 0; k < 4; k++) {
        int slot = dec2raster[q * 4 + k];
        memcpy(out->luma_ac + (base * 16 + slot) * 16, r8 + k * 16,
               16 * sizeof(int16_t));
      }
    }
  } else {
  for (int b8 = 0; b8 < 4; b8++) {
    if (!(cbp_luma & (1 << b8))) continue;
    for (int b4 = 0; b4 < 4; b4++) {
      int rblk = dec2raster[b8 * 4 + b4];
      int nc = luma_nc(c, mb, rblk);
      int max_coeff = 16, start = 0;
      if (M.kind == MB_I16x16) {
        max_coeff = 15;
        start = 1;
      }
      int tc = decode_residual_block(br, nc, max_coeff, scan_buf);
      if (tc < 0) {
        c.err = "luma AC residual error at mb " + std::to_string(mb);
        return false;
      }
      acc_coeff(out, tc);
      M.nnz[rblk] = (uint8_t)tc;
      int16_t* dst = out->luma_ac + (base * 16 + rblk) * 16;
      for (int i = 0; i < max_coeff; i++)
        dst[kZigzag4x4[i + start]] = scan_buf[i];
    }
  }
  }
  // chroma DC (2x2 per component) when any chroma coded
  if (cbp_chroma) {
    for (int comp = 0; comp < 2; comp++) {
      int tc = decode_residual_block(br, -1, 4, scan_buf);
      if (tc < 0) {
        c.err = "chroma DC residual error";
        return false;
      }
      acc_coeff(out, tc);
      int16_t* dst = out->chroma_dc + (base * 2 + comp) * 4;
      for (int i = 0; i < 4; i++) dst[i] = scan_buf[i];  // scan == raster
    }
  }
  // chroma AC
  if (cbp_chroma == 2) {
    for (int comp = 0; comp < 2; comp++) {
      for (int blk = 0; blk < 4; blk++) {
        int nc = chroma_nc(c, mb, comp, blk);
        int tc = decode_residual_block(br, nc, 15, scan_buf);
        if (tc < 0) {
          c.err = "chroma AC residual error";
          return false;
        }
        acc_coeff(out, tc);
        M.nnz[16 + comp * 4 + blk] = (uint8_t)tc;
        int16_t* dst = out->chroma_ac + ((base * 2 + comp) * 4 + blk) * 16;
        for (int i = 0; i < 15; i++) dst[kZigzag4x4[i + 1]] = scan_buf[i];
      }
    }
  }

  out->mb_kind[base] = M.kind;
  acc_i4(out, M.kind);
  out->qp[base] = M.qp;
  memcpy(out->nnz + base * 24, M.nnz, 24);
  out->transform8[base] = M.transform8x8;
  if (M.transform8x8) {
    // deblock semantics: a 4x4 block "has coefficients" iff its covering
    // 8x8 does (M.nnz keeps the interleave counts for CAVLC contexts)
    for (int q = 0; q < 4; q++) {
      int b0 = (q >> 1) * 8 + (q & 1) * 2;
      int any = M.nnz[b0] | M.nnz[b0 + 1] | M.nnz[b0 + 4] | M.nnz[b0 + 5];
      uint8_t v = any ? 1 : 0;
      out->nnz[base * 24 + b0] = v;
      out->nnz[base * 24 + b0 + 1] = v;
      out->nnz[base * 24 + b0 + 4] = v;
      out->nnz[base * 24 + b0 + 5] = v;
    }
  }
  if (M.kind == MB_I4x4)
    memcpy(out->i4_modes + base * 16, M.i4_modes, 16);
  if (!M.intra) {
    memcpy(out->mv + base * 32, M.mv, sizeof(M.mv));
    memcpy(out->refidx + base * 4, M.refidx, 4);
    acc_mv_exc(out, M.mv, 1);
    if (is_b) {
      memcpy(out->mv_l1 + base * 32, M.mv1, sizeof(M.mv1));
      memcpy(out->refidx_l1 + base * 4, M.refidx1, 4);
      acc_mv_exc(out, M.mv1, 2);
    }
  }
  return true;
}

// P_Skip MV derivation (spec 8.4.1.1).
void derive_pskip(Ctx& c, int mb, GopOut* out, int fidx) {
  const size_t base = (size_t)fidx * c.n_mbs + mb;
  // AC buffers arrive np.empty from Python; see decode_mb_cavlc
  memset(out->luma_ac + base * 256, 0, 256 * sizeof(int16_t));
  memset(out->chroma_ac + base * 128, 0, 128 * sizeof(int16_t));
  MbState& M = c.mbs[mb];
  M.slice_id = c.cur_slice_id;
  M.kind = MB_P_SKIP;
  M.intra = 0;
  M.is_i4x4 = 0;
  memset(M.nnz, 0, sizeof(M.nnz));
  for (int i = 0; i < 4; i++) M.refidx[i] = 0;
  NbMv A = fetch_mv(c, mb, -1, 0);
  NbMv B = fetch_mv(c, mb, 0, -1);
  int16_t v[2] = {0, 0};
  bool zero = !A.avail || !B.avail ||
              (A.ref == 0 && A.mv[0] == 0 && A.mv[1] == 0) ||
              (B.ref == 0 && B.mv[0] == 0 && B.mv[1] == 0);
  if (!zero) predict_mv(c, mb, 0, 0, 4, 4, 0, v);
  for (int i = 0; i < 16; i++) {
    M.mv[i][0] = v[0];
    M.mv[i][1] = v[1];
  }
  M.qp = (int8_t)c.qp_prev;
  out->mb_kind[base] = MB_P_SKIP;
  out->qp[base] = M.qp;
  memcpy(out->mv + base * 32, M.mv, sizeof(M.mv));
  memcpy(out->refidx + base * 4, M.refidx, 4);
  memset(out->nnz + base * 24, 0, 24);
}

// ---------------------------------------------------------------------------
// CABAC macroblock layer (spec 9.3).  Same syntax order as the CAVLC path
// (the MB layer is entropy-agnostic); only the binarizations and the
// neighbor-driven context increments differ.  Context index assignments
// follow Tables 9-34/9-39 and the 9.3.3.1.1.x derivations.
// ---------------------------------------------------------------------------

// condTermFlag for a coded_block_flag context neighbor (9.3.3.1.1.9).
// `n` is the neighbor MB (-1 = unavailable); `bit` indexes MbState.cbf.
int cbf_cond(const Ctx& c, int cur_mb, int n, int bit) {
  if (n < 0) return c.mbs[cur_mb].intra ? 1 : 0;
  const MbState& m = c.mbs[n];
  if (m.kind == MB_IPCM) return 1;
  return (int)((m.cbf >> bit) & 1);
}

// ctxIdxInc for coded_block_flag of block (cat, comp, blk).
// cat: 0=I16 luma DC, 1=I16 luma AC, 2=luma 4x4, 3=chroma DC, 4=chroma AC.
int cbf_ctx_inc(const Ctx& c, int mb, int cat, int comp, int blk) {
  int condA, condB;
  if (cat == 0) {
    condA = cbf_cond(c, mb, nb_mb(c, mb, -1, 0), 24);
    condB = cbf_cond(c, mb, nb_mb(c, mb, 0, -1), 24);
  } else if (cat == 3) {
    condA = cbf_cond(c, mb, nb_mb(c, mb, -1, 0), 25 + comp);
    condB = cbf_cond(c, mb, nb_mb(c, mb, 0, -1), 25 + comp);
  } else if (cat == 1 || cat == 2) {
    int bx = blk & 3, by = blk >> 2;
    condA = bx > 0 ? cbf_cond(c, mb, mb, by * 4 + bx - 1)
                   : cbf_cond(c, mb, nb_mb(c, mb, -1, 0), by * 4 + 3);
    condB = by > 0 ? cbf_cond(c, mb, mb, (by - 1) * 4 + bx)
                   : cbf_cond(c, mb, nb_mb(c, mb, 0, -1), 12 + bx);
  } else {  // cat 4: chroma AC, blk in 2x2 raster
    int bx = blk & 1, by = blk >> 1;
    int b = 16 + comp * 4;
    condA = bx > 0 ? cbf_cond(c, mb, mb, b + by * 2)
                   : cbf_cond(c, mb, nb_mb(c, mb, -1, 0), b + by * 2 + 1);
    condB = by > 0 ? cbf_cond(c, mb, mb, b + bx)
                   : cbf_cond(c, mb, nb_mb(c, mb, 0, -1), b + 2 + bx);
  }
  return condA + 2 * condB;
}

// cbf storage bit for block (cat, comp, blk).
int cbf_bit(int cat, int comp, int blk) {
  if (cat == 0) return 24;
  if (cat == 3) return 25 + comp;
  if (cat == 4) return 16 + comp * 4 + blk;
  return blk;  // luma 4x4 raster
}

// Residual block decode (9.3.2.7 + 9.3.3.1.3), specialized per
// ctxBlockCat: coded_block_flag, significance map, then levels in
// reverse scan order.  Levels are written DIRECTLY at dst[map[scan_pos]]
// — no intermediate scan buffer and no full-block copy-out: the output
// blocks arrive zero-initialized from the Python side (np.zeros in
// entropy.py decode_gop), so only the n significant coefficients are
// touched.  ~20% of the 1080p entropy wall was the per-block
// memset + 16-element zigzag scatter this replaces.
// Returns total significant coeffs, or -1 on error.
static const uint8_t kIdent4[4] = {0, 1, 2, 3};

template <int CAT>
__attribute__((always_inline)) inline int cabac_residual_t(
    Ctx& c, Cabac& cb, CabacContexts& cx, int mb, int comp, int blk,
    int16_t* dst, const uint8_t* map) {
  constexpr int kMax =
      CAT == 0 ? 16 : CAT == 1 ? 15 : CAT == 2 ? 16 : CAT == 3 ? 4 : 15;
  constexpr int kSigOff =
      CAT == 0 ? 0 : CAT == 1 ? 15 : CAT == 2 ? 29 : CAT == 3 ? 44 : 47;
  constexpr int kAbsOff =
      CAT == 0 ? 0 : CAT == 1 ? 10 : CAT == 2 ? 20 : CAT == 3 ? 30 : 39;
  int inc = cbf_ctx_inc(c, mb, CAT, comp, blk);
  if (!cb.decode(&cx.s[85 + CAT * 4 + inc])) return 0;
  c.mbs[mb].cbf |= 1u << cbf_bit(CAT, comp, blk);

  uint8_t* sig = &cx.s[105 + kSigOff];
  uint8_t* last = &cx.s[166 + kSigOff];
  int pos[16];
  int n = 0;
  bool got_last = false;
  for (int i = 0; i < kMax - 1; i++) {
    int si = CAT == 3 ? (i < 2 ? i : 2) : i;  // NumC8x8=1 for 4:2:0
    if (cb.decode(&sig[si])) {
      pos[n++] = i;
      if (cb.decode(&last[si])) {
        got_last = true;
        break;
      }
    }
  }
  if (!got_last) pos[n++] = kMax - 1;  // implicit last position

  uint8_t* absc = &cx.s[227 + kAbsOff];
  int num_eq1 = 0, num_gt1 = 0;
  constexpr int gt1_cap = CAT == 3 ? 3 : 4;  // chroma DC has 9 abs ctxs
  for (int j = n - 1; j >= 0; j--) {
    int m1 = 0;
    int neg = -1;
    int inc0 = num_gt1 ? 0 : (num_eq1 + 1 < 4 ? num_eq1 + 1 : 4);
    if (cb.decode(&absc[inc0])) {
      m1 = 1;
      int incn = 5 + (num_gt1 < gt1_cap ? num_gt1 : gt1_cap);
      while (m1 < 14 && cb.decode(&absc[incn])) m1++;
      if (m1 == 14) {  // EG0 suffix + sign, one bypass division
        int add = cb.eg_suffix_sign(0, &neg);
        if (add >= 0) {
          m1 += add;
        } else {  // prefix too long for one peek window
          int k = 0;
          while (cb.bypass()) {
            m1 += 1 << k;
            k++;
            if (k > 24) {
              c.err = "coeff EG0 overflow";
              return -1;
            }
          }
          while (k--) m1 += cb.bypass() << k;
        }
      }
      num_gt1++;
    } else {
      num_eq1++;
    }
    int level = m1 + 1;
    if (neg < 0) neg = cb.bypass();
    if (neg) level = -level;
    dst[map[pos[j]]] = (int16_t)level;
  }
  return n;
}

// 8x8 luma residual decode (ctxBlockCat 5): no coded_block_flag (the cbp
// bit implies it); significance/last contexts run through the Table 9-43
// position maps.  Writes RASTER-order coefficients into r8[64].
int cabac_residual8x8(Ctx& c, Cabac& cb, CabacContexts& cx, int16_t* r8) {
  memset(r8, 0, 64 * sizeof(int16_t));
  int pos[64];
  int n = 0;
  bool got_last = false;
  for (int i = 0; i < 63; i++) {
    if (cb.decode(&cx.s[402 + kSig8x8Map[i]])) {
      pos[n++] = i;
      if (cb.decode(&cx.s[417 + kLast8x8Map[i]])) {
        got_last = true;
        break;
      }
    }
  }
  if (!got_last) pos[n++] = 63;
  uint8_t* absc = &cx.s[426];
  int num_eq1 = 0, num_gt1 = 0;
  for (int j = n - 1; j >= 0; j--) {
    int m1 = 0;
    int neg = -1;
    int inc0 = num_gt1 ? 0 : (num_eq1 + 1 < 4 ? num_eq1 + 1 : 4);
    if (cb.decode(&absc[inc0])) {
      m1 = 1;
      int incn = 5 + (num_gt1 < 4 ? num_gt1 : 4);
      while (m1 < 14 && cb.decode(&absc[incn])) m1++;
      if (m1 == 14) {  // EG0 suffix + sign, one bypass division
        int add = cb.eg_suffix_sign(0, &neg);
        if (add >= 0) {
          m1 += add;
        } else {
          int k = 0;
          while (cb.bypass()) {
            m1 += 1 << k;
            k++;
            if (k > 24) {
              c.err = "coeff EG0 overflow (8x8)";
              return -1;
            }
          }
          while (k--) m1 += cb.bypass() << k;
        }
      }
      num_gt1++;
    } else {
      num_eq1++;
    }
    int level = m1 + 1;
    if (neg < 0) neg = cb.bypass();
    if (neg) level = -level;
    r8[kZigzag8x8[pos[j]]] = (int16_t)level;  // scan -> raster, in place
  }
  return n;
}

// mvd component decode: UEG3 with uCoff=9 + bypass sign (9.3.2.3).
// `ctx_base` is 40 (x) or 47 (y); `amvd` = |mvdA| + |mvdB|.
int cabac_mvd(Ctx& c, Cabac& cb, CabacContexts& cx, int ctx_base, int amvd) {
  int inc = amvd < 3 ? 0 : (amvd > 32 ? 2 : 1);
  if (!cb.decode(&cx.s[ctx_base + inc])) return 0;
  int m = 1, ctx = 3;
  while (m < 9 && cb.decode(&cx.s[ctx_base + ctx])) {
    if (ctx < 6) ctx++;
    m++;
  }
  if (m == 9) {  // EG3 suffix + sign, one bypass division
    int neg;
    int add = cb.eg_suffix_sign(3, &neg);
    if (add >= 0) return neg ? -(m + add) : m + add;
    int k = 3;
    while (cb.bypass()) {
      m += 1 << k;
      k++;
      if (k > 24) {
        c.err = "mvd EG3 overflow";
        return 0;
      }
    }
    while (k--) m += cb.bypass() << k;
  }
  return cb.bypass() ? -m : m;
}

bool decode_mb_cabac(Ctx& c, Cabac& cb, CabacContexts& cx, const SliceCtx& sc,
                     int mb, GopOut* out, int fidx, int& last_qp_delta) {
  const size_t base = (size_t)fidx * c.n_mbs + mb;
  // see decode_mb_cavlc: AC buffers are np.empty; zero per-MB here
  memset(out->luma_ac + base * 256, 0, 256 * sizeof(int16_t));
  memset(out->chroma_ac + base * 128, 0, 128 * sizeof(int16_t));
  MbState& M = c.mbs[mb];
  M.slice_id = c.cur_slice_id;
  memset(M.nnz, 0, sizeof(M.nnz));
  memset(M.mv, 0, sizeof(M.mv));
  memset(M.mvd, 0, sizeof(M.mvd));
  memset(M.refidx, -1, sizeof(M.refidx));
  M.intra = 0;
  M.is_i4x4 = 0;
  M.cbp = 0;
  M.cbf = 0;
  M.chroma_mode = 0;
  M.transform8x8 = 0;
  bool allow_t8_inter = false;

  bool is_p = sc.sh.slice_type == SLICE_P;
  int num_ref = sc.sh.num_ref_idx_l0_active;

  // ----- mb_type (Tables 9-36/9-37; ctx per Table 9-39) -----
  // Intra mb_type tree: returns 0 (I_4x4), 1..24 (I_16x16), 25 (I_PCM).
  auto intra_mb_type = [&](int ctx_base, bool intra_slice) -> int {
    uint8_t* st = &cx.s[ctx_base];
    if (intra_slice) {
      int inc = 0;  // 9.3.3.1.1.3: neighbors coded other than I_NxN
      int a = nb_mb(c, mb, -1, 0), b = nb_mb(c, mb, 0, -1);
      if (a >= 0 && c.mbs[a].kind != MB_I4x4) inc++;
      if (b >= 0 && c.mbs[b].kind != MB_I4x4) inc++;
      if (!cb.decode(&st[inc])) return 0;
      st += 2;
    } else {
      if (!cb.decode(&st[0])) return 0;
    }
    if (cb.terminate()) return 25;
    int iz = intra_slice ? 1 : 0;
    int t = 1;
    t += 12 * cb.decode(&st[1]);  // CodedBlockPatternLuma != 0
    if (cb.decode(&st[2])) t += 4 + 4 * cb.decode(&st[2 + iz]);
    t += 2 * cb.decode(&st[3 + iz]);
    t += cb.decode(&st[3 + 2 * iz]);
    return t;
  };

  bool is_b = sc.sh.slice_type == SLICE_B;
  int mb_type;  // 0=I4x4, 1..24=I16, 25=IPCM, 100+pt=P, 200+bt=B
  if (is_p) {
    if (!cb.decode(&cx.s[14])) {
      int pt;
      if (!cb.decode(&cx.s[15]))
        pt = cb.decode(&cx.s[16]) ? 3 : 0;  // P_8x8 : P_16x16
      else
        pt = cb.decode(&cx.s[17]) ? 1 : 2;  // P_16x8 : P_8x16
      mb_type = 100 + pt;
    } else {
      mb_type = intra_mb_type(17, false);
    }
  } else if (is_b) {
    // B mb_type tree (ctx 27-34; Table 9-37 + 9.3.3.1.1.3: the first
    // bin's neighbors count unless B_Skip/B_Direct_16x16)
    auto nd = [&](int n) {
      return n >= 0 && c.mbs[n].kind != MB_B_SKIP &&
             !(c.mbs[n].kind == MB_B_INTER && c.mbs[n].all_direct);
    };
    int a = nb_mb(c, mb, -1, 0), b = nb_mb(c, mb, 0, -1);
    int inc = (nd(a) ? 1 : 0) + (nd(b) ? 1 : 0);
    int bt = -1;
    if (!cb.decode(&cx.s[27 + inc])) {
      bt = 0;  // B_Direct_16x16
    } else if (!cb.decode(&cx.s[30])) {
      bt = 1 + cb.decode(&cx.s[32]);  // B_L0_16x16 / B_L1_16x16
    } else {
      int bits = cb.decode(&cx.s[31]) << 3;
      bits |= cb.decode(&cx.s[32]) << 2;
      bits |= cb.decode(&cx.s[32]) << 1;
      bits |= cb.decode(&cx.s[32]);
      if (bits < 8) {
        bt = bits + 3;
      } else if (bits == 13) {
        bt = -1;  // intra suffix
      } else if (bits == 14) {
        bt = 11;
      } else if (bits == 15) {
        bt = 22;
      } else {
        bits = (bits << 1) | cb.decode(&cx.s[32]);
        bt = bits - 4;
      }
    }
    mb_type = bt < 0 ? intra_mb_type(32, false) : 200 + bt;
  } else {
    mb_type = intra_mb_type(3, true);
  }

  int16_t scan_buf[16];

  if (mb_type >= 200) {
    // ----- inter (B) -----
    int bt = mb_type - 200;
    M.kind = MB_B_INTER;
    memset(M.mv1, 0, sizeof(M.mv1));
    memset(M.mvd1, 0, sizeof(M.mvd1));
    memset(M.refidx1, -1, sizeof(M.refidx1));
    M.all_direct = 0;
    memset(M.direct8, 0, sizeof(M.direct8));
    allow_t8_inter = true;  // direct_8x8_inference enforced at slice level
    BPartInfo bp;
    if (bt == 0) {
      bp.all_direct = true;
    } else if (bt <= 3) {
      bp.n_parts = 1;
      bp.pred[0] = bt - 1;
    } else if (bt <= 21) {
      bp.n_parts = 2;
      bp.shape = (bt - 4) & 1;
      bp.pred[0] = kBPartPred[(bt - 4) >> 1][0];
      bp.pred[1] = kBPartPred[(bt - 4) >> 1][1];
    } else {
      bp.n_parts = 4;
      for (int i = 0; i < 4; i++) {
        // B sub_mb_type tree (ctx 36-39)
        int st;
        if (!cb.decode(&cx.s[36])) {
          st = 0;  // B_Direct_8x8
        } else if (!cb.decode(&cx.s[37])) {
          st = 1 + cb.decode(&cx.s[39]);
        } else {
          st = 3;
          if (cb.decode(&cx.s[38])) {
            if (cb.decode(&cx.s[39])) {
              st = 11 + cb.decode(&cx.s[39]);
            } else {
              st += 4;
              st += 2 * cb.decode(&cx.s[39]);
              st += cb.decode(&cx.s[39]);
            }
          } else {
            st += 2 * cb.decode(&cx.s[39]);
            st += cb.decode(&cx.s[39]);
          }
        }
        bp.pred[i] = kBSubTab[st].pred;
        bp.sub_shape[i] = kBSubTab[st].shape;
        if (bp.pred[i] != 3 && bp.sub_shape[i] != 0) allow_t8_inter = false;
      }
    }
    // 9.3.3.1.1.6: a neighbor partition coded in direct mode does not
    // count toward the ref_idx context
    auto direct_part = [&](int x4, int y4) -> bool {
      int dmbx = 0, dmby = 0;
      while (x4 < 0) { x4 += 4; dmbx--; }
      while (x4 > 3) { x4 -= 4; dmbx++; }
      while (y4 < 0) { y4 += 4; dmby--; }
      while (y4 > 3) { y4 -= 4; dmby++; }
      int n = (dmbx == 0 && dmby == 0) ? mb : nb_mb(c, mb, dmbx, dmby);
      if (n < 0) return false;
      const MbState& m = c.mbs[n];
      return m.all_direct || m.direct8[(y4 >> 1) * 2 + (x4 >> 1)] != 0;
    };
    auto read_ref = [&](int l, int x4, int y4) -> int {
      NbMv A = fetch_mv(c, mb, x4 - 1, y4, l);
      NbMv B = fetch_mv(c, mb, x4, y4 - 1, l);
      int ctx = (A.avail && A.ref > 0 && !direct_part(x4 - 1, y4) ? 1 : 0) +
                (B.avail && B.ref > 0 && !direct_part(x4, y4 - 1) ? 2 : 0);
      int ref = 0;
      int n_act = l == 0 ? sc.sh.num_ref_idx_l0_active
                         : sc.sh.num_ref_idx_l1_active;
      while (cb.decode(&cx.s[54 + ctx])) {
        ref++;
        ctx = ref == 1 ? 4 : 5;
        if (ref >= n_act) return -1;
      }
      return ref;
    };
    auto read_mvd = [&](int l, int x4, int y4, int16_t mvd[2]) {
      NbMv A = fetch_mv(c, mb, x4 - 1, y4, l);
      NbMv B = fetch_mv(c, mb, x4, y4 - 1, l);
      for (int comp = 0; comp < 2; comp++) {
        int amvd = (A.avail ? std::abs(A.mvd[comp]) : 0) +
                   (B.avail ? std::abs(B.mvd[comp]) : 0);
        mvd[comp] = (int16_t)cabac_mvd(c, cb, cx, comp == 0 ? 40 : 47, amvd);
      }
    };
    if (!decode_b_motion(c, sc, out, fidx, mb, bp, read_ref, read_mvd))
      return false;
  } else if (mb_type >= 100) {
    // ----- inter (P) -----
    int pt = mb_type - 100;  // 0:16x16 1:16x8 2:8x16 3:8x8
    M.kind = MB_INTER;
    int sub_type[4] = {0, 0, 0, 0};
    allow_t8_inter = true;
    if (pt == 3) {
      for (int i = 0; i < 4; i++) {
        // sub_mb_type tree (Table 9-38, ctx 21-23)
        if (cb.decode(&cx.s[21])) {
          sub_type[i] = 0;  // 8x8
        } else if (!cb.decode(&cx.s[22])) {
          sub_type[i] = 1;  // 8x4
        } else {
          sub_type[i] = cb.decode(&cx.s[23]) ? 2 : 3;  // 4x8 : 4x4
        }
        if (sub_type[i] != 0) allow_t8_inter = false;
      }
    }
    // ref_idx per partition (unary, ctx 54-59; 9.3.3.1.1.6), assigned
    // immediately: later partitions' ctx reads earlier ones' refidx.
    auto read_ref = [&](int x4, int y4) -> int {
      if (num_ref <= 1) return 0;
      NbMv A = fetch_mv(c, mb, x4 - 1, y4);
      NbMv B = fetch_mv(c, mb, x4, y4 - 1);
      int ctx = (A.avail && A.ref > 0 ? 1 : 0) + (B.avail && B.ref > 0 ? 2 : 0);
      int ref = 0;
      while (cb.decode(&cx.s[54 + ctx])) {
        ref++;
        ctx = ref == 1 ? 4 : 5;
        if (ref >= num_ref) {
          c.err = "ref_idx out of range (cabac)";
          return -1;
        }
      }
      return ref;
    };
    int refs[4] = {0, 0, 0, 0};
    if (pt == 0) {
      refs[0] = read_ref(0, 0);
      for (int i = 0; i < 4; i++) M.refidx[i] = (int8_t)refs[0];
    } else if (pt == 1) {
      refs[0] = read_ref(0, 0);
      M.refidx[0] = M.refidx[1] = (int8_t)refs[0];
      refs[1] = read_ref(0, 2);
      M.refidx[2] = M.refidx[3] = (int8_t)refs[1];
    } else if (pt == 2) {
      refs[0] = read_ref(0, 0);
      M.refidx[0] = M.refidx[2] = (int8_t)refs[0];
      refs[1] = read_ref(2, 0);
      M.refidx[1] = M.refidx[3] = (int8_t)refs[1];
    } else {
      for (int i = 0; i < 4; i++) {
        refs[i] = read_ref((i & 1) * 2, (i >> 1) * 2);
        M.refidx[i] = (int8_t)refs[i];
      }
    }
    if (refs[0] < 0 || refs[1] < 0 || refs[2] < 0 || refs[3] < 0) return false;

    auto set_mv_block = [&](int x4, int y4, int w4, int h4, int ref) {
      int16_t mvp[2];
      predict_mv(c, mb, x4, y4, w4, h4, ref, mvp);
      NbMv A = fetch_mv(c, mb, x4 - 1, y4);
      NbMv B = fetch_mv(c, mb, x4, y4 - 1);
      int16_t mvd[2];
      for (int comp = 0; comp < 2; comp++) {
        int amvd = (A.avail ? std::abs(A.mvd[comp]) : 0) +
                   (B.avail ? std::abs(B.mvd[comp]) : 0);
        mvd[comp] = (int16_t)cabac_mvd(c, cb, cx, comp == 0 ? 40 : 47, amvd);
      }
      int16_t vx = (int16_t)(mvp[0] + mvd[0]);
      int16_t vy = (int16_t)(mvp[1] + mvd[1]);
      for (int yy = y4; yy < y4 + h4; yy++)
        for (int xx = x4; xx < x4 + w4; xx++) {
          M.mv[yy * 4 + xx][0] = vx;
          M.mv[yy * 4 + xx][1] = vy;
          M.mvd[yy * 4 + xx][0] = mvd[0];
          M.mvd[yy * 4 + xx][1] = mvd[1];
        }
    };
    if (pt == 0) {
      set_mv_block(0, 0, 4, 4, refs[0]);
    } else if (pt == 1) {
      set_mv_block(0, 0, 4, 2, refs[0]);
      set_mv_block(0, 2, 4, 2, refs[1]);
    } else if (pt == 2) {
      set_mv_block(0, 0, 2, 4, refs[0]);
      set_mv_block(2, 0, 2, 4, refs[1]);
    } else {
      for (int i = 0; i < 4; i++) {
        int bx = (i & 1) * 2, by = (i >> 1) * 2;
        switch (sub_type[i]) {
          case 0: set_mv_block(bx, by, 2, 2, refs[i]); break;
          case 1:
            set_mv_block(bx, by, 2, 1, refs[i]);
            set_mv_block(bx, by + 1, 2, 1, refs[i]);
            break;
          case 2:
            set_mv_block(bx, by, 1, 2, refs[i]);
            set_mv_block(bx + 1, by, 1, 2, refs[i]);
            break;
          case 3:
            for (int j = 0; j < 4; j++)
              set_mv_block(bx + (j & 1), by + (j >> 1), 1, 1, refs[i]);
            break;
        }
      }
    }
    if (!c.err.empty()) return false;
  } else if (mb_type == 0) {
    // ----- I_NxN (4x4 or 8x8) -----
    M.kind = MB_I4x4;
    M.intra = 1;
    M.is_i4x4 = 1;
    static const uint8_t dec2raster[16] = {0, 1, 4, 5, 2,  3,  6,  7,
                                           8, 9, 12, 13, 10, 11, 14, 15};
    if (c.pps.transform_8x8_mode) {
      // transform_size_8x8_flag (ctx 399-401; 9.3.3.1.1.10)
      int a = nb_mb(c, mb, -1, 0), b = nb_mb(c, mb, 0, -1);
      int inc = (a >= 0 && c.mbs[a].transform8x8 ? 1 : 0) +
                (b >= 0 && c.mbs[b].transform8x8 ? 1 : 0);
      M.transform8x8 = (uint8_t)cb.decode(&cx.s[399 + inc]);
    }
    auto read_mode = [&](int pred) {
      if (cb.decode(&cx.s[68])) return pred;
      int rem = cb.decode(&cx.s[69]);  // FL3, LSB first
      rem += 2 * cb.decode(&cx.s[69]);
      rem += 4 * cb.decode(&cx.s[69]);
      return rem < pred ? rem : rem + 1;
    };
    if (M.transform8x8) {
      for (int q = 0; q < 4; q++) {
        int corner = dec2raster[q * 4];
        int mode = read_mode(predict_intra4x4_mode(c, mb, corner));
        for (int k = 0; k < 4; k++)
          M.i4_modes[dec2raster[q * 4 + k]] = (int8_t)mode;
      }
    } else {
      for (int blk = 0; blk < 16; blk++) {
        int rblk = dec2raster[blk];
        M.i4_modes[rblk] = (int8_t)read_mode(
            predict_intra4x4_mode(c, mb, rblk));
      }
    }
  } else if (mb_type <= 24) {
    M.kind = MB_I16x16;
    M.intra = 1;
    int t = mb_type - 1;
    out->i16_mode[base] = (int8_t)(t % 4);
    int cbp_chroma = (t / 4) % 3;
    int cbp_luma = (t / 12) ? 15 : 0;
    M.cbp = (uint8_t)(cbp_luma | (cbp_chroma << 4));
    out->cbp[base] = M.cbp;
  } else {
    // ----- I_PCM (7.3.5 + 9.3.1.2): flush the engine, read the raw
    // samples byte-aligned, then restart arithmetic decoding -----
    M.kind = MB_IPCM;
    M.intra = 1;
    // after terminate()==1 the engine's bit cursor sits exactly at the
    // encoder's post-flush position (the 9-bit preload cancels the
    // encoder's flush emission) — just byte-align and read raw samples
    cb.byte_align();
    uint8_t* dst = out->ipcm + base * 384;
    for (int i = 0; i < 384; i++) dst[i] = (uint8_t)cb.raw_u8();
    if (cb.error()) {
      c.err = "ipcm overrun (cabac)";
      return false;
    }
    cb.reinit();
    for (int i = 0; i < 24; i++) M.nnz[i] = 16;
    M.qp = (int8_t)c.qp_prev;
    out->mb_kind[base] = M.kind;
    out->qp[base] = M.qp;
    memcpy(out->nnz + base * 24, M.nnz, 24);
    return true;
  }

  // intra_chroma_pred_mode (TU3, ctx 64-67; 9.3.3.1.1.8)
  if (M.intra) {
    int a = nb_mb(c, mb, -1, 0), b = nb_mb(c, mb, 0, -1);
    int inc = 0;
    if (a >= 0 && c.mbs[a].intra && c.mbs[a].kind != MB_IPCM &&
        c.mbs[a].chroma_mode != 0)
      inc++;
    if (b >= 0 && c.mbs[b].intra && c.mbs[b].kind != MB_IPCM &&
        c.mbs[b].chroma_mode != 0)
      inc++;
    int cm = 0;
    if (cb.decode(&cx.s[64 + inc])) {
      cm = 1;
      if (cb.decode(&cx.s[67])) cm = 2 + cb.decode(&cx.s[67]);
    }
    M.chroma_mode = (int8_t)cm;
    out->chroma_mode[base] = (int8_t)cm;
  }

  // ----- coded_block_pattern (9.3.3.1.1.4) -----
  int cbp;
  if (M.kind == MB_I16x16) {
    cbp = M.cbp;
  } else {
    int la = nb_mb(c, mb, -1, 0), ta = nb_mb(c, mb, 0, -1);
    // condTermFlag for a neighbor MB's luma 8x8 `b8` (1 when NOT coded)
    auto lcond = [&](int n, int b8) -> int {
      if (n < 0) return 0;  // unavailable counts as coded
      const MbState& m = c.mbs[n];
      if (m.kind == MB_IPCM) return 0;
      return ((m.cbp >> b8) & 1) ? 0 : 1;
    };
    int l = 0, inc;
    inc = lcond(la, 1) + 2 * lcond(ta, 2);
    l |= cb.decode(&cx.s[73 + inc]);
    inc = ((l & 1) ? 0 : 1) + 2 * lcond(ta, 3);
    l |= cb.decode(&cx.s[73 + inc]) << 1;
    inc = lcond(la, 3) + 2 * ((l & 1) ? 0 : 1);
    l |= cb.decode(&cx.s[73 + inc]) << 2;
    inc = ((l & 4) ? 0 : 1) + 2 * ((l & 2) ? 0 : 1);
    l |= cb.decode(&cx.s[73 + inc]) << 3;
    // chroma: 0 / 1 / 2 (TU2, ctx 77-84); IPCM neighbor counts as 2
    auto ccbp = [&](int n) -> int {
      if (n < 0) return 0;
      if (c.mbs[n].kind == MB_IPCM) return 2;
      return (c.mbs[n].cbp >> 4) & 3;
    };
    int ca = ccbp(la), cb2 = ccbp(ta);
    int ch = 0;
    inc = (ca > 0 ? 1 : 0) + 2 * (cb2 > 0 ? 1 : 0);
    if (cb.decode(&cx.s[77 + inc])) {
      inc = 4 + (ca == 2 ? 1 : 0) + 2 * (cb2 == 2 ? 1 : 0);
      ch = 1 + cb.decode(&cx.s[77 + inc]);
    }
    cbp = l | (ch << 4);
    M.cbp = (uint8_t)cbp;
    out->cbp[base] = M.cbp;
  }
  int cbp_luma = cbp & 15;
  int cbp_chroma = (cbp >> 4) & 3;

  // transform_size_8x8_flag for inter MBs (ctx 399-401)
  if (!M.intra && cbp_luma != 0 && c.pps.transform_8x8_mode &&
      allow_t8_inter) {
    int a = nb_mb(c, mb, -1, 0), b = nb_mb(c, mb, 0, -1);
    int inc = (a >= 0 && c.mbs[a].transform8x8 ? 1 : 0) +
              (b >= 0 && c.mbs[b].transform8x8 ? 1 : 0);
    M.transform8x8 = (uint8_t)cb.decode(&cx.s[399 + inc]);
  }

  // ----- mb_qp_delta (ctx 60-63; 9.3.3.1.1.5) -----
  if (cbp != 0 || M.kind == MB_I16x16) {
    int ctx = last_qp_delta != 0 ? 1 : 0;
    int val = 0;
    while (cb.decode(&cx.s[60 + ctx])) {
      ctx = 2 + (ctx >> 1);
      val++;
      if (val > 52) {
        c.err = "mb_qp_delta runaway";
        return false;
      }
    }
    int delta = (val & 1) ? (val + 1) >> 1 : -((val + 1) >> 1);
    last_qp_delta = delta;
    c.qp_prev = (c.qp_prev + delta + 52) % 52;
  } else {
    last_qp_delta = 0;
  }
  M.qp = (int8_t)c.qp_prev;

  // ----- residuals -----
  if (M.kind == MB_I16x16) {
    int tc = cabac_residual_t<0>(c, cb, cx, mb, 0, 0,
                                 out->luma_dc + base * 16, kZigzag4x4);
    if (tc < 0) return false;
    acc_coeff(out, tc);
  }
  static const uint8_t dec2raster[16] = {0, 1, 4, 5, 2,  3,  6,  7,
                                         8, 9, 12, 13, 10, 11, 14, 15};
  if (M.transform8x8) {
    for (int q = 0; q < 4; q++) {
      if (!(cbp_luma & (1 << q))) continue;
      int16_t r8[64];
      int tc = cabac_residual8x8(c, cb, cx, r8);
      if (tc < 0) return false;
      acc_coeff(out, tc);
      int b0 = (q >> 1) * 8 + (q & 1) * 2;
      // cbf/nnz of all four covered 4x4s (neighbor contexts + deblock)
      for (int d : {0, 1, 4, 5}) {
        M.nnz[b0 + d] = tc ? 1 : 0;
        if (tc) M.cbf |= 1u << (b0 + d);
      }
      for (int k = 0; k < 4; k++) {
        int slot = dec2raster[q * 4 + k];
        memcpy(out->luma_ac + (base * 16 + slot) * 16, r8 + k * 16,
               16 * sizeof(int16_t));
      }
    }
  } else {
  for (int b8 = 0; b8 < 4; b8++) {
    if (!(cbp_luma & (1 << b8))) continue;
    for (int b4 = 0; b4 < 4; b4++) {
      int rblk = dec2raster[b8 * 4 + b4];
      int16_t* dst = out->luma_ac + (base * 16 + rblk) * 16;
      int tc = M.kind == MB_I16x16
                   ? cabac_residual_t<1>(c, cb, cx, mb, 0, rblk, dst,
                                         kZigzag4x4 + 1)
                   : cabac_residual_t<2>(c, cb, cx, mb, 0, rblk, dst,
                                         kZigzag4x4);
      if (tc < 0) return false;
      acc_coeff(out, tc);
      M.nnz[rblk] = (uint8_t)tc;
    }
  }
  }
  if (cbp_chroma) {
    for (int comp = 0; comp < 2; comp++) {
      int tc = cabac_residual_t<3>(c, cb, cx, mb, comp, 0,
                                   out->chroma_dc + (base * 2 + comp) * 4,
                                   kIdent4);
      if (tc < 0) return false;
      acc_coeff(out, tc);
    }
  }
  if (cbp_chroma == 2) {
    for (int comp = 0; comp < 2; comp++) {
      for (int blk = 0; blk < 4; blk++) {
        int16_t* dst = out->chroma_ac + ((base * 2 + comp) * 4 + blk) * 16;
        int tc = cabac_residual_t<4>(c, cb, cx, mb, comp, blk, dst,
                                     kZigzag4x4 + 1);
        if (tc < 0) return false;
        acc_coeff(out, tc);
        M.nnz[16 + comp * 4 + blk] = (uint8_t)tc;
      }
    }
  }

  out->mb_kind[base] = M.kind;
  acc_i4(out, M.kind);
  out->qp[base] = M.qp;
  memcpy(out->nnz + base * 24, M.nnz, 24);
  out->transform8[base] = M.transform8x8;
  if (M.kind == MB_I4x4) memcpy(out->i4_modes + base * 16, M.i4_modes, 16);
  if (!M.intra) {
    memcpy(out->mv + base * 32, M.mv, sizeof(M.mv));
    memcpy(out->refidx + base * 4, M.refidx, 4);
    acc_mv_exc(out, M.mv, 1);
    if (is_b) {
      memcpy(out->mv_l1 + base * 32, M.mv1, sizeof(M.mv1));
      memcpy(out->refidx_l1 + base * 4, M.refidx1, 4);
      acc_mv_exc(out, M.mv1, 2);
    }
  }
  return true;
}

bool decode_slice_data_cabac(Ctx& c, BitReader& br, SliceCtx& sc, GopOut* out,
                             int fidx) {
  c.qp_prev = sc.sh.slice_qp;
  int mb = sc.sh.first_mb_in_slice;
  bool is_p = sc.sh.slice_type == SLICE_P;
  bool is_b = sc.sh.slice_type == SLICE_B;
  const size_t fbase = (size_t)fidx * c.n_mbs;

  br.byte_align();  // cabac_alignment_one_bit
  CabacContexts cx;
  int init_idc = sc.sh.cabac_init_idc;
  if (const char* ov = getenv("HWANG_CABAC_IDC_OVERRIDE")) init_idc = atoi(ov);
  if (c.trace)
    fprintf(stderr, "slice f%d type%d qp%d idc%d first_mb%d\n", fidx,
            sc.sh.slice_type, sc.sh.slice_qp, init_idc,
            sc.sh.first_mb_in_slice);
  cx.init(sc.sh.slice_qp, sc.sh.slice_type == SLICE_I, init_idc);
  Cabac cb(br.data(), br.nbits(), br.pos());
  int last_qp_delta = 0;

  while (mb < c.n_mbs) {
    // nb_mb availability is slice-bounded via slice_id; the current MB's
    // id must be set BEFORE any context derivation, not just in the MB
    // layer (the mb_skip_flag ctx below already needs neighbors).
    c.mbs[mb].slice_id = c.cur_slice_id;
    bool skip = false;
    if (is_p || is_b) {
      // mb_skip_flag (ctx 11-13 for P, 24-26 for B; 9.3.3.1.1.1/2):
      // both neighbors weight 1; condition is the neighbor not skipped
      int a = nb_mb(c, mb, -1, 0), b = nb_mb(c, mb, 0, -1);
      int skip_kind = is_b ? MB_B_SKIP : MB_P_SKIP;
      int inc = (a >= 0 && c.mbs[a].kind != skip_kind ? 1 : 0) +
                (b >= 0 && c.mbs[b].kind != skip_kind ? 1 : 0);
      skip = cb.decode(&cx.s[(is_b ? 24 : 11) + inc]) != 0;
    }
    if (skip) {
      if (is_b) {
        if (!derive_b_skip(c, sc, mb, out, fidx)) return false;
      } else {
        derive_pskip(c, mb, out, fidx);
      }
      last_qp_delta = 0;
    } else {
      if (!decode_mb_cabac(c, cb, cx, sc, mb, out, fidx, last_qp_delta))
        return false;
    }
    out->deblock_idc[fbase + mb] =
        (uint8_t)sc.sh.disable_deblocking_filter_idc;
    out->alpha_off[fbase + mb] = (int8_t)sc.sh.slice_alpha_c0_offset;
    out->beta_off[fbase + mb] = (int8_t)sc.sh.slice_beta_offset;
    out->intra_pred_avail[fbase + mb] = avail_bits(c, mb);
    if (c.trace) {
      const MbState& M = c.mbs[mb];
      fprintf(stderr,
              "f%d mb%3d kind%d cbp%02x qp%2d ref %d %d %d %d mv0 %d,%d\n",
              fidx, mb, M.kind, M.cbp, M.qp, M.refidx[0], M.refidx[1],
              M.refidx[2], M.refidx[3], M.mv[0][0], M.mv[0][1]);
    }
    mb++;
    if (cb.error()) {
      c.err = "cabac bitstream overrun at mb " + std::to_string(mb);
      return false;
    }
    if (cb.terminate()) break;  // end_of_slice_flag
  }
  return true;
}

// ---------------------------------------------------------------------------
// Slice header + reference list machinery
// ---------------------------------------------------------------------------

bool parse_slice_header(Ctx& c, BitReader& br, int nal_ref_idc, bool idr,
                        SliceHeader& sh) {
  sh.is_idr = idr;
  sh.nal_ref_idc = nal_ref_idc;
  sh.first_mb_in_slice = br.ue();
  int st = br.ue();
  if (st > 9) {
    c.err = "bad slice_type";
    return false;
  }
  sh.slice_type = st % 5;
  sh.pic_parameter_set_id = br.ue();
  auto pit = c.pps_map.find(sh.pic_parameter_set_id);
  if (pit == c.pps_map.end()) {
    c.err = "unknown PPS id";
    return false;
  }
  c.pps = pit->second;
  auto sit = c.sps_map.find(c.pps.seq_parameter_set_id);
  if (sit == c.sps_map.end()) {
    c.err = "unknown SPS id";
    return false;
  }
  c.sps = sit->second;
  c.have_active = true;

  if (sh.slice_type == SLICE_B && c.pps.entropy_coding_mode == false) {
    // fallthrough; B handled by caller capability checks
  }
  sh.frame_num = br.u(c.sps.log2_max_frame_num);
  if (idr) sh.idr_pic_id = br.ue();
  if (c.sps.pic_order_cnt_type == 0) {
    sh.pic_order_cnt_lsb = br.u(c.sps.log2_max_poc_lsb);
    if (c.pps.bottom_field_pic_order_in_frame_present)
      sh.delta_pic_order_cnt_bottom = br.se();
  } else if (c.sps.pic_order_cnt_type == 1 &&
             !c.sps.delta_pic_order_always_zero) {
    sh.delta_pic_order_cnt[0] = br.se();
    if (c.pps.bottom_field_pic_order_in_frame_present)
      sh.delta_pic_order_cnt[1] = br.se();
  }
  if (c.pps.redundant_pic_cnt_present) br.ue();
  if (sh.slice_type == SLICE_B) sh.direct_spatial = br.u1() != 0;
  sh.num_ref_idx_l0_active = c.pps.num_ref_idx_l0_default;
  sh.num_ref_idx_l1_active = c.pps.num_ref_idx_l1_default;
  if (sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP ||
      sh.slice_type == SLICE_B) {
    if (br.u1()) {  // num_ref_idx_active_override
      sh.num_ref_idx_l0_active = br.ue() + 1;
      if (sh.slice_type == SLICE_B) sh.num_ref_idx_l1_active = br.ue() + 1;
    }
    // ref_pic_list_modification (l0)
    if (br.u1()) {
      while (true) {
        int idc = br.ue();
        if (idc == 3) break;
        if (idc > 3 || br.error()) {
          c.err = "bad ref list modification";
          return false;
        }
        sh.ref_list_mod_l0.push_back({idc, br.ue()});
      }
    }
    if (sh.slice_type == SLICE_B && br.u1()) {
      while (true) {
        int idc = br.ue();
        if (idc == 3) break;
        if (idc > 3 || br.error()) {
          c.err = "bad ref list modification l1";
          return false;
        }
        sh.ref_list_mod_l1.push_back({idc, br.ue()});
      }
    }
  }
  if ((c.pps.weighted_pred &&
       (sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP)) ||
      (c.pps.weighted_bipred_idc == 1 && sh.slice_type == SLICE_B)) {
    // pred_weight_table (7.3.3.2); B rejected separately
    sh.has_pred_weights = true;
    sh.luma_log2_denom = br.ue();
    sh.chroma_log2_denom = br.ue();
    if (sh.luma_log2_denom > 7 || sh.chroma_log2_denom > 7) {
      c.err = "bad pred weight denom";
      return false;
    }
    auto read_list = [&](int16_t wt[16][6], int n_active) {
      for (int i = 0; i < n_active && i < 16; i++) {
        int16_t* w = wt[i];
        w[0] = (int16_t)(1 << sh.luma_log2_denom);
        w[1] = 0;
        w[2] = w[4] = (int16_t)(1 << sh.chroma_log2_denom);
        w[3] = w[5] = 0;
        if (br.u1()) {
          w[0] = (int16_t)br.se();
          w[1] = (int16_t)br.se();
        }
        if (br.u1()) {
          for (int j = 0; j < 2; j++) {
            w[2 + 2 * j] = (int16_t)br.se();
            w[3 + 2 * j] = (int16_t)br.se();
          }
        }
      }
    };
    read_list(sh.wt, sh.num_ref_idx_l0_active);
    if (sh.slice_type == SLICE_B) read_list(sh.wt1, sh.num_ref_idx_l1_active);
    if (br.error()) {
      c.err = "pred weight table overrun";
      return false;
    }
  }
  if (nal_ref_idc != 0) {
    if (idr) {
      sh.no_output_of_prior_pics = br.u1();
      sh.long_term_reference_flag = br.u1();
    } else {
      sh.adaptive_ref_pic_marking = br.u1();
      if (sh.adaptive_ref_pic_marking) {
        while (true) {
          int op = br.ue();
          if (op == 0) break;
          uint32_t v1 = 0, v2 = 0;
          if (op == 1 || op == 3) v1 = br.ue();
          if (op == 2) v1 = br.ue();
          if (op == 3 || op == 6) v2 = br.ue();
          if (op == 4) v1 = br.ue();
          if (op > 6 || br.error()) {
            c.err = "bad MMCO op";
            return false;
          }
          sh.mmco_ops.push_back({op, {v1, v2}});
        }
      }
    }
  }
  if (c.pps.entropy_coding_mode && sh.slice_type != SLICE_I)
    sh.cabac_init_idc = br.ue();
  sh.slice_qp = c.pps.pic_init_qp + br.se();
  if (sh.slice_type == SLICE_SP || sh.slice_type == SLICE_SI) {
    c.err = "SP/SI slices not supported";
    return false;
  }
  if (c.pps.deblocking_filter_control_present) {
    sh.disable_deblocking_filter_idc = br.ue();
    if (sh.disable_deblocking_filter_idc != 1) {
      sh.slice_alpha_c0_offset = br.se() * 2;
      sh.slice_beta_offset = br.se() * 2;
    }
  }
  if (br.error()) {
    c.err = "slice header overrun";
    return false;
  }
  return true;
}

// Apply ref_pic_list_modification (spec 8.2.4.3) to an initial list.
bool apply_list_mod(Ctx& c, const SliceHeader& sh,
                    const std::vector<std::pair<int, uint32_t>>& mods,
                    int n_active, std::vector<RefPic>& list) {
  if (mods.empty()) return true;
  int max_frame_num = 1 << c.sps.log2_max_frame_num;
  int pic_num_pred = sh.frame_num;
  size_t refIdx = 0;
  std::vector<RefPic> l = list;
  if ((int)l.size() < n_active) l.resize(n_active);
  for (auto& [idc, val] : mods) {
    if (idc == 0 || idc == 1) {
      int abs_diff = (int)val + 1;
      int pred = pic_num_pred;
      int pic_num = idc == 0 ? pred - abs_diff : pred + abs_diff;
      if (pic_num < 0) pic_num += max_frame_num;
      if (pic_num >= max_frame_num) pic_num -= max_frame_num;
      if (pic_num > sh.frame_num) pic_num -= max_frame_num;
      pic_num_pred = pic_num;
      // find the ref with this pic_num
      RefPic target;
      bool found = false;
      for (auto& r : c.dpb)
        if (r.pic_num == pic_num) {
          target = r;
          found = true;
        }
      if (!found) {
        c.err = "ref list modification: pic_num not in DPB";
        return false;
      }
      // shift and insert (8.2.4.3.1)
      for (size_t i = l.size() - 1; i > refIdx; i--) l[i] = l[i - 1];
      l[refIdx++] = target;
      // remove duplicates beyond
      size_t nIdx = refIdx;
      for (size_t i = refIdx; i < l.size(); i++) {
        if (l[i].pic_num != pic_num || l[i].long_term) l[nIdx++] = l[i];
      }
      l.resize(std::max(nIdx, (size_t)n_active));
    } else {
      // idc == 2: long_term_pic_num (frames: == long_term_frame_idx)
      int lt_num = (int)val;
      RefPic target;
      bool found = false;
      for (auto& r : c.dpb)
        if (r.long_term && r.long_term_idx == lt_num) {
          target = r;
          found = true;
        }
      if (!found) {
        c.err = "ref list modification: long_term_pic_num not in DPB";
        return false;
      }
      for (size_t i = l.size() - 1; i > refIdx; i--) l[i] = l[i - 1];
      l[refIdx++] = target;
      size_t nIdx = refIdx;
      for (size_t i = refIdx; i < l.size(); i++) {
        if (!(l[i].long_term && l[i].long_term_idx == lt_num))
          l[nIdx++] = l[i];
      }
      l.resize(std::max(nIdx, (size_t)n_active));
    }
  }
  list = l;
  return true;
}

// Build reference list L0 for a P slice (spec 8.2.4.2.1 + 8.2.4.3).
bool build_ref_list_p(Ctx& c, SliceHeader& sh, std::vector<RefPic>& list0) {
  // derive pic_num for each short-term ref
  int max_frame_num = 1 << c.sps.log2_max_frame_num;
  for (auto& r : c.dpb) {
    r.pic_num = r.frame_num > sh.frame_num ? r.frame_num - max_frame_num
                                           : r.frame_num;
  }
  // initial list: short-term descending pic_num, then long-term
  // ascending LongTermPicNum (spec 8.2.4.2.1)
  std::vector<RefPic> st, lt;
  for (auto& r : c.dpb) (r.long_term ? lt : st).push_back(r);
  std::sort(st.begin(), st.end(),
            [](const RefPic& a, const RefPic& b) { return a.pic_num > b.pic_num; });
  std::sort(lt.begin(), lt.end(), [](const RefPic& a, const RefPic& b) {
    return a.long_term_idx < b.long_term_idx;
  });
  list0 = st;
  list0.insert(list0.end(), lt.begin(), lt.end());
  if (!apply_list_mod(c, sh, sh.ref_list_mod_l0, sh.num_ref_idx_l0_active,
                      list0))
    return false;
  if ((int)list0.size() < sh.num_ref_idx_l0_active) {
    c.err = "DPB underflow: fewer refs than num_ref_idx_l0_active";
    return false;
  }
  list0.resize(sh.num_ref_idx_l0_active);
  return true;
}

// Build reference lists for a B slice (spec 8.2.4.2.3, frames): list0 =
// {POC < cur, desc} + {POC > cur, asc}; list1 the reverse; if the lists
// come out identical with >1 entries, swap list1's first two.
bool build_ref_list_b(Ctx& c, SliceHeader& sh, int poc_cur,
                      std::vector<RefPic>& list0, std::vector<RefPic>& list1) {
  int max_frame_num = 1 << c.sps.log2_max_frame_num;
  for (auto& r : c.dpb) {
    r.pic_num = r.frame_num > sh.frame_num ? r.frame_num - max_frame_num
                                           : r.frame_num;
  }
  std::vector<RefPic> before, after, lt;
  for (auto& r : c.dpb) {
    if (r.long_term)
      lt.push_back(r);
    else
      (r.poc < poc_cur ? before : after).push_back(r);
  }
  std::sort(before.begin(), before.end(),
            [](const RefPic& a, const RefPic& b) { return a.poc > b.poc; });
  std::sort(after.begin(), after.end(),
            [](const RefPic& a, const RefPic& b) { return a.poc < b.poc; });
  std::sort(lt.begin(), lt.end(), [](const RefPic& a, const RefPic& b) {
    return a.long_term_idx < b.long_term_idx;
  });
  list0 = before;
  list0.insert(list0.end(), after.begin(), after.end());
  list0.insert(list0.end(), lt.begin(), lt.end());
  list1 = after;
  list1.insert(list1.end(), before.begin(), before.end());
  list1.insert(list1.end(), lt.begin(), lt.end());
  if (list1.size() > 1) {
    bool same = list0.size() == list1.size();
    for (size_t i = 0; same && i < list0.size(); i++)
      same = list0[i].span_index == list1[i].span_index;
    if (same) std::swap(list1[0], list1[1]);
  }
  if (!apply_list_mod(c, sh, sh.ref_list_mod_l0, sh.num_ref_idx_l0_active,
                      list0) ||
      !apply_list_mod(c, sh, sh.ref_list_mod_l1, sh.num_ref_idx_l1_active,
                      list1))
    return false;
  if ((int)list0.size() < sh.num_ref_idx_l0_active ||
      (int)list1.size() < sh.num_ref_idx_l1_active) {
    c.err = "DPB underflow: fewer refs than num_ref_idx_active (B)";
    return false;
  }
  list0.resize(sh.num_ref_idx_l0_active);
  list1.resize(sh.num_ref_idx_l1_active);
  return true;
}

// ---------------------------------------------------------------------------
// Top-level context + GOP decode
// ---------------------------------------------------------------------------

bool parse_avcc(Ctx& c, const uint8_t* data, int len) {
  if (len < 7 || data[0] != 1) {
    c.err = "bad avcC record";
    return false;
  }
  c.nal_length_size = (data[4] & 3) + 1;
  int pos = 5;
  int n_sps = data[pos++] & 0x1F;
  for (int i = 0; i < n_sps; i++) {
    if (pos + 2 > len) return false;
    int l = (data[pos] << 8) | data[pos + 1];
    pos += 2;
    if (pos + l > len) return false;
    auto rbsp = strip_ep(data + pos + 1, l - 1);  // skip NAL header byte
    BitReader br(rbsp.data(), rbsp.size());
    SPS sps;
    if (!parse_sps(br, sps, c.err)) return false;
    c.sps_map[sps.seq_parameter_set_id] = sps;
    pos += l;
  }
  if (pos >= len) return n_sps > 0;
  int n_pps = data[pos++];
  for (int i = 0; i < n_pps; i++) {
    if (pos + 2 > len) return false;
    int l = (data[pos] << 8) | data[pos + 1];
    pos += 2;
    if (pos + l > len) return false;
    auto rbsp = strip_ep(data + pos + 1, l - 1);
    BitReader br(rbsp.data(), rbsp.size());
    PPS pps;
    if (!parse_pps(br, pps, c.sps_map, c.err)) return false;
    c.pps_map[pps.pic_parameter_set_id] = pps;
    pos += l;
  }
  if (!c.sps_map.empty()) {
    c.sps = c.sps_map.begin()->second;
    c.have_active = true;
    c.mb_width = c.sps.width_mbs();
    c.mb_height = c.sps.height_mbs();
    c.n_mbs = c.mb_width * c.mb_height;
    c.mbx_tab.resize(c.n_mbs);
    c.mby_tab.resize(c.n_mbs);
    for (int i = 0; i < c.n_mbs; i++) {
      c.mbx_tab[i] = (uint16_t)(i % c.mb_width);
      c.mby_tab[i] = (uint16_t)(i / c.mb_width);
    }
  }
  return !c.sps_map.empty();
}

int poc_of_frame(Ctx& c, const SliceHeader& sh) {
  if (c.sps.pic_order_cnt_type != 0) {
    // Types 1/2 derive POC from frame_num, which WRAPS at MaxFrameNum:
    // maintain FrameNumOffset per spec 8.2.1.3.
    int max_fn = 1 << c.sps.log2_max_frame_num;
    if (sh.is_idr) {
      c.frame_num_offset = 0;
    } else if (c.prev_frame_num >= 0 && c.prev_frame_num > sh.frame_num) {
      c.frame_num_offset += max_fn;
    }
    c.prev_frame_num = sh.frame_num;
    if (c.sps.pic_order_cnt_type == 2) {
      int poc = 2 * (c.frame_num_offset + sh.frame_num);
      if (sh.nal_ref_idc == 0) poc -= 1;
      return poc;
    }
    // type 1 (spec 8.2.1.2), frames only
    int64_t abs_fn = (int64_t)c.frame_num_offset + sh.frame_num;
    if (sh.nal_ref_idc == 0 && abs_fn > 0) abs_fn -= 1;
    const auto& offs = c.sps.offset_for_ref_frame;
    int n_cycle = (int)offs.size();
    int64_t expected = 0;
    if (abs_fn > 0 && n_cycle > 0) {
      int64_t cycle_cnt = (abs_fn - 1) / n_cycle;
      int fn_in_cycle = (int)((abs_fn - 1) % n_cycle);
      int64_t delta_per_cycle = 0;
      for (int v : offs) delta_per_cycle += v;
      expected = cycle_cnt * delta_per_cycle;
      for (int i = 0; i <= fn_in_cycle; i++) expected += offs[i];
    }
    if (sh.nal_ref_idc == 0) expected += c.sps.offset_for_non_ref_pic;
    int64_t top = expected + sh.delta_pic_order_cnt[0];
    int64_t bottom = top + c.sps.offset_for_top_to_bottom_field +
                     sh.delta_pic_order_cnt[1];
    return (int)(top < bottom ? top : bottom);
  }
  // pic_order_cnt_type 0 (spec 8.2.1.1), frames only
  int max_lsb = 1 << c.sps.log2_max_poc_lsb;
  if (sh.is_idr) {
    c.prev_poc_msb = 0;
    c.prev_poc_lsb = 0;
  }
  int poc_msb;
  if (sh.pic_order_cnt_lsb < c.prev_poc_lsb &&
      (c.prev_poc_lsb - sh.pic_order_cnt_lsb) >= max_lsb / 2) {
    poc_msb = c.prev_poc_msb + max_lsb;
  } else if (sh.pic_order_cnt_lsb > c.prev_poc_lsb &&
             (sh.pic_order_cnt_lsb - c.prev_poc_lsb) > max_lsb / 2) {
    poc_msb = c.prev_poc_msb - max_lsb;
  } else {
    poc_msb = c.prev_poc_msb;
  }
  if (sh.nal_ref_idc != 0) {
    c.prev_poc_msb = poc_msb;
    c.prev_poc_lsb = sh.pic_order_cnt_lsb;
  }
  return poc_msb + sh.pic_order_cnt_lsb;
}

bool decode_slice_data(Ctx& c, BitReader& br, SliceCtx& sc, GopOut* out,
                       int fidx) {
  c.qp_prev = sc.sh.slice_qp;
  int mb = sc.sh.first_mb_in_slice;
  bool is_p = sc.sh.slice_type == SLICE_P;
  bool is_b = sc.sh.slice_type == SLICE_B;
  const size_t fbase = (size_t)fidx * c.n_mbs;

  while (mb < c.n_mbs) {
    if (is_p || is_b) {
      int skip_run = br.ue();
      if (br.error()) {
        c.err = "skip_run overrun";
        return false;
      }
      for (int s = 0; s < skip_run; s++) {
        if (mb >= c.n_mbs) {
          c.err = "skip_run past end of picture";
          return false;
        }
        c.mbs[mb].slice_id = c.cur_slice_id;
        if (is_b) {
          if (!derive_b_skip(c, sc, mb, out, fidx)) return false;
        } else {
          derive_pskip(c, mb, out, fidx);
        }
        out->intra_pred_avail[fbase + mb] = avail_bits(c, mb);
        // deblock metadata for skipped MBs too
        out->deblock_idc[fbase + mb] = (uint8_t)sc.sh.disable_deblocking_filter_idc;
        out->alpha_off[fbase + mb] = (int8_t)sc.sh.slice_alpha_c0_offset;
        out->beta_off[fbase + mb] = (int8_t)sc.sh.slice_beta_offset;
        mb++;
      }
      if (!br.more_rbsp_data()) break;
      if (mb >= c.n_mbs) break;
    }
    if (!decode_mb_cavlc(c, br, sc, mb, out, fidx)) return false;
    out->deblock_idc[fbase + mb] = (uint8_t)sc.sh.disable_deblocking_filter_idc;
    out->alpha_off[fbase + mb] = (int8_t)sc.sh.slice_alpha_c0_offset;
    out->beta_off[fbase + mb] = (int8_t)sc.sh.slice_beta_offset;
    out->intra_pred_avail[fbase + mb] = avail_bits(c, mb);
    mb++;
    if (!is_p && !is_b && !br.more_rbsp_data()) break;
  }
  return true;
}

}  // namespace

struct PublicCtx {
  Ctx c;
  char errbuf[512] = {0};
};

}  // namespace hwh264

using namespace hwh264;

HW_API void* hw_h264_open(const uint8_t* avcc, int len, char* err,
                          int err_cap) {
  auto* p = new PublicCtx();
  p->c.trace = getenv("HWANG_H264_TRACE") != nullptr;
  if (!parse_avcc(p->c, avcc, len)) {
    snprintf(err, err_cap, "avcC parse failed: %s", p->c.err.c_str());
    delete p;
    return nullptr;
  }
  return p;
}

HW_API void hw_h264_close(void* h) { delete static_cast<PublicCtx*>(h); }

HW_API const char* hw_h264_error(void* h) {
  return static_cast<PublicCtx*>(h)->errbuf;
}

HW_API int hw_h264_dims(void* h, int* mbw, int* mbh, int* crop) {
  auto* p = static_cast<PublicCtx*>(h);
  if (!p->c.have_active) return -1;
  *mbw = p->c.mb_width;
  *mbh = p->c.mb_height;
  crop[0] = p->c.sps.crop_left * 2;
  crop[1] = p->c.sps.crop_top * 2;
  crop[2] = p->c.sps.crop_right * 2;
  crop[3] = p->c.sps.crop_bottom * 2;
  return 0;
}

HW_API int hw_h264_profile(void* h) {
  auto* p = static_cast<PublicCtx*>(h);
  return p->c.have_active ? p->c.sps.profile_idc : -1;
}

HW_API int hw_h264_chroma_qp_offset(void* h) {
  auto* p = static_cast<PublicCtx*>(h);
  if (p->c.pps_map.empty()) return 0;
  return p->c.pps_map.begin()->second.chroma_qp_index_offset;
}

// Copy the effective scaling weight tables of the first PPS into
// w4 [6*16] and w8 [2*64] (raster order).  Returns 1 when any entry is
// non-flat (!= 16), else 0.
HW_API int hw_h264_scaling(void* h, uint8_t* w4, uint8_t* w8) {
  auto* p = static_cast<PublicCtx*>(h);
  if (p->c.pps_map.empty()) return 0;
  const PPS& pps = p->c.pps_map.begin()->second;
  memcpy(w4, pps.scaling4, 6 * 16);
  memcpy(w8, pps.scaling8[0], 64);
  memcpy(w8 + 64, pps.scaling8[1], 64);
  if (!pps.has_scaling) return 0;
  for (int i = 0; i < 96; i++)
    if (w4[i] != 16) return 1;
  for (int i = 0; i < 128; i++)
    if (w8[i] != 16) return 1;
  return 0;
}

HW_API int hw_h264_bipred_idc(void* h) {
  auto* p = static_cast<PublicCtx*>(h);
  if (p->c.pps_map.empty()) return 0;
  return p->c.pps_map.begin()->second.weighted_bipred_idc;
}

// Size of the device reference ring the host should mirror when
// allocating slots (0 = default to SPS max_num_ref_frames).
HW_API void hw_h264_set_ring_slots(void* h, int n) {
  static_cast<PublicCtx*>(h)->c.ring_slots = n;
}

HW_API int hw_h264_max_refs(void* h) {
  auto* p = static_cast<PublicCtx*>(h);
  return p->c.have_active ? p->c.sps.max_num_ref_frames : 1;
}

HW_API int hw_h264_is_cabac(void* h) {
  auto* p = static_cast<PublicCtx*>(h);
  if (p->c.pps_map.empty()) return -1;
  return p->c.pps_map.begin()->second.entropy_coding_mode ? 1 : 0;
}

namespace {

void reset_gop_state(Ctx& c) {
  c.dpb.clear();
  c.prev_frame_num = -1;
  c.frame_num_offset = 0;
  c.prev_poc_msb = c.prev_poc_lsb = 0;
  c.max_long_term_idx = -1;
  c.ring_span.clear();
  c.poc_epoch = 0;
  c.max_poc_emitted = 0;
}

// Header-only pre-pass: per-sample POC + is-reference flags, mirroring
// the main loop's POC state sequence (IDR epochs, MMCO5 resets) exactly.
// Used to map requested DISPLAY positions to decode indices so
// non-referenced, unrequested frames can skip slice-data decode
// entirely (the CABAC/CAVLC work is ~all of the entropy wall).
int scan_span_headers(Ctx& c, const uint8_t* data, const uint64_t* offsets,
                      const uint64_t* sizes, int n_samples, int32_t* poc,
                      uint8_t* is_ref) {
  int fidx = 0;
  for (int s = 0; s < n_samples; s++) {
    const uint8_t* sample = data + offsets[s];
    size_t size = sizes[s];
    size_t pos = 0;
    while (pos + c.nal_length_size <= size) {
      uint64_t nal_len = 0;
      for (int i = 0; i < c.nal_length_size; i++)
        nal_len = (nal_len << 8) | sample[pos + i];
      pos += c.nal_length_size;
      if (nal_len == 0 || pos + nal_len > size) return -1;
      int nal_ref_idc = (sample[pos] >> 5) & 3;
      int nal_type = sample[pos] & 0x1F;
      if (nal_type == 7 || nal_type == 8) {
        auto rbsp = strip_ep(sample + pos + 1, nal_len - 1);
        BitReader br(rbsp.data(), rbsp.size());
        if (nal_type == 7) {
          SPS sps;
          if (!parse_sps(br, sps, c.err)) return -1;
          c.sps_map[sps.seq_parameter_set_id] = sps;
        } else {
          PPS pps;
          if (!parse_pps(br, pps, c.sps_map, c.err)) return -1;
          c.pps_map[pps.pic_parameter_set_id] = pps;
        }
      } else if (nal_type == 1 || nal_type == 5) {
        auto rbsp = strip_ep(sample + pos + 1, nal_len - 1);
        BitReader br(rbsp.data(), rbsp.size());
        SliceHeader sh;
        if (!parse_slice_header(c, br, nal_ref_idc, nal_type == 5, sh))
          return -1;
        if (sh.is_idr && fidx > 0) c.poc_epoch = c.max_poc_emitted + 2;
        poc[fidx] = poc_of_frame(c, sh) + c.poc_epoch;
        is_ref[fidx] = nal_ref_idc != 0;
        if (nal_ref_idc != 0 && sh.adaptive_ref_pic_marking) {
          for (auto& [op, vals] : sh.mmco_ops) {
            if (op == 5) {  // mirror the main loop's MMCO5 POC reset
              c.frame_num_offset = 0;
              c.prev_frame_num = 0;
              c.prev_poc_msb = c.prev_poc_lsb = 0;
              c.poc_epoch = c.max_poc_emitted + 2;
              poc[fidx] = c.poc_epoch;
            }
          }
        }
        if (poc[fidx] > c.max_poc_emitted) c.max_poc_emitted = poc[fidx];
        fidx++;
        break;  // only the first slice of an access unit matters here
      }
      pos += nal_len;
    }
  }
  return fidx;
}

}  // namespace

// Decode `n_samples` AVCC-framed access units into the SoA output.
// `offsets`/`sizes` locate each sample inside `data`.  The first sample must
// be an IDR.  `wanted_disp` (optional, [n_samples]): nonzero marks the
// span-relative DISPLAY positions the caller needs — frames that are
// neither referenced (nal_ref_idc == 0) nor wanted skip slice-data
// decode and stay all-zero in the SoA (their output slots are never
// read).  NULL decodes everything.  Returns number of frames decoded,
// or -1 on error.
HW_API int hw_h264_decode_gop(void* h, const uint8_t* data,
                              const uint64_t* offsets, const uint64_t* sizes,
                              int n_samples, const uint8_t* wanted_disp,
                              GopOut* out) {
  auto* p = static_cast<PublicCtx*>(h);
  Ctx& c = p->c;
  c.err.clear();
  if (!c.have_active) {
    snprintf(p->errbuf, sizeof(p->errbuf), "no SPS");
    return -1;
  }
  reset_gop_state(c);
  c.mbs.assign(c.n_mbs, MbState());

  // Resolve the display-position mask to per-decode-index skip flags via
  // the header-only POC pre-pass (display rank r = position in the
  // POC-sorted order, matching the consumer's stable argsort).
  std::vector<uint8_t> wanted_decode;
  if (wanted_disp && n_samples > 0) {
    std::vector<int32_t> poc(n_samples);
    std::vector<uint8_t> is_ref(n_samples);
    int n = scan_span_headers(c, data, offsets, sizes, n_samples,
                              poc.data(), is_ref.data());
    if (n < 0) {
      snprintf(p->errbuf, sizeof(p->errbuf), "header scan: %s",
               c.err.c_str());
      return -1;
    }
    std::vector<int> order(n);
    for (int i = 0; i < n; i++) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int a, int b) { return poc[a] < poc[b]; });
    wanted_decode.assign(n_samples, 1);
    for (int r = 0; r < n; r++)
      wanted_decode[order[r]] = is_ref[order[r]] || wanted_disp[r];
    reset_gop_state(c);
  }

  int fidx = 0;
  for (int s = 0; s < n_samples; s++) {
    const uint8_t* sample = data + offsets[s];
    size_t size = sizes[s];
    size_t pos = 0;
    bool got_slice = false;
    c.cur_slice_id = 0;
    SliceHeader first_sh;

    while (pos + c.nal_length_size <= size) {
      uint64_t nal_len = 0;
      for (int i = 0; i < c.nal_length_size; i++)
        nal_len = (nal_len << 8) | sample[pos + i];
      pos += c.nal_length_size;
      if (nal_len == 0 || pos + nal_len > size) {
        snprintf(p->errbuf, sizeof(p->errbuf),
                 "bad NAL length %llu at sample %d",
                 (unsigned long long)nal_len, s);
        return -1;
      }
      int nal_ref_idc = (sample[pos] >> 5) & 3;
      int nal_type = sample[pos] & 0x1F;
      if (nal_type == 7 || nal_type == 8) {
        auto rbsp = strip_ep(sample + pos + 1, nal_len - 1);
        BitReader br(rbsp.data(), rbsp.size());
        if (nal_type == 7) {
          SPS sps;
          if (!parse_sps(br, sps, c.err)) {
            snprintf(p->errbuf, sizeof(p->errbuf), "SPS: %s", c.err.c_str());
            return -1;
          }
          c.sps_map[sps.seq_parameter_set_id] = sps;
        } else {
          PPS pps;
          if (!parse_pps(br, pps, c.sps_map, c.err)) {
            snprintf(p->errbuf, sizeof(p->errbuf), "PPS: %s", c.err.c_str());
            return -1;
          }
          c.pps_map[pps.pic_parameter_set_id] = pps;
        }
      } else if (nal_type == 1 || nal_type == 5) {
        auto rbsp = strip_ep(sample + pos + 1, nal_len - 1);
        BitReader br(rbsp.data(), rbsp.size());
        SliceCtx sc;
        if (!parse_slice_header(c, br, nal_ref_idc, nal_type == 5, sc.sh)) {
          snprintf(p->errbuf, sizeof(p->errbuf), "slice header (frame %d): %s",
                   fidx, c.err.c_str());
          return -1;
        }
        if (sc.sh.slice_type == SLICE_B && c.pps.weighted_bipred_idc == 1 &&
            sc.sh.has_pred_weights && !out->pred_weights_l1) {
          snprintf(p->errbuf, sizeof(p->errbuf),
                   "explicit B weighting present but caller has no "
                   "L1 weight buffer");
          return -1;
        }
        if (sc.sh.slice_type == SLICE_B && !c.sps.direct_8x8_inference) {
          snprintf(p->errbuf, sizeof(p->errbuf),
                   "direct_8x8_inference=0 not supported");
          return -1;
        }
        if (fidx == 0 && !sc.sh.is_idr) {
          snprintf(p->errbuf, sizeof(p->errbuf),
                   "decode span must start at an IDR frame");
          return -1;
        }
        if (!got_slice) {
          // first slice of this access unit: frame-level bookkeeping
          if (sc.sh.is_idr) {
            c.dpb.clear();
            if (fidx > 0) c.poc_epoch = c.max_poc_emitted + 2;
          }
          out->frame_type[fidx] = (uint8_t)sc.sh.slice_type;
          out->poc[fidx] = poc_of_frame(c, sc.sh) + c.poc_epoch;
          if (out->poc[fidx] > c.max_poc_emitted)
            c.max_poc_emitted = out->poc[fidx];
          if (out->frame_is_ref) out->frame_is_ref[fidx] = nal_ref_idc != 0;
          if (out->weight_flag) {
            out->weight_flag[fidx] = sc.sh.has_pred_weights ? 1 : 0;
            if (sc.sh.has_pred_weights) {
              for (int i = 0; i < 16; i++) {
                int16_t* dst = out->pred_weights + ((size_t)fidx * 16 + i) * 8;
                memcpy(dst, sc.sh.wt[i], 6 * sizeof(int16_t));
                dst[6] = (int16_t)sc.sh.luma_log2_denom;
                dst[7] = (int16_t)sc.sh.chroma_log2_denom;
              }
              if (sc.sh.slice_type == SLICE_B && out->pred_weights_l1) {
                for (int i = 0; i < 16; i++) {
                  int16_t* dst =
                      out->pred_weights_l1 + ((size_t)fidx * 16 + i) * 8;
                  memcpy(dst, sc.sh.wt1[i], 6 * sizeof(int16_t));
                  dst[6] = (int16_t)sc.sh.luma_log2_denom;
                  dst[7] = (int16_t)sc.sh.chroma_log2_denom;
                }
              }
            }
          } else if (sc.sh.has_pred_weights) {
            snprintf(p->errbuf, sizeof(p->errbuf),
                     "weighted prediction present but caller has no "
                     "weight buffers");
            return -1;
          }
          first_sh = sc.sh;
          got_slice = true;
        } else if (sc.sh.has_pred_weights != first_sh.has_pred_weights ||
                   (sc.sh.has_pred_weights &&
                    (memcmp(sc.sh.wt, first_sh.wt, sizeof(sc.sh.wt)) != 0 ||
                     (sc.sh.slice_type == SLICE_B &&
                      memcmp(sc.sh.wt1, first_sh.wt1,
                             sizeof(sc.sh.wt1)) != 0) ||
                     sc.sh.luma_log2_denom != first_sh.luma_log2_denom ||
                     sc.sh.chroma_log2_denom != first_sh.chroma_log2_denom))) {
          // weights are shipped per frame; per-slice divergence (never
          // produced by x264) would need per-MB weight indirection
          snprintf(p->errbuf, sizeof(p->errbuf),
                   "slices of frame %d disagree on pred weights", fidx);
          return -1;
        }
        c.cur_slice_id++;
        for (int i = 0; i < 16; i++) {
          out->ref_map[fidx * 16 + i] = -1;
          out->ref_map_l1[fidx * 16 + i] = -1;
        }
        if (!wanted_decode.empty() && !wanted_decode[fidx]) {
          // non-referenced frame nobody asked for: its SoA slot stays
          // all-zero and its output is never read — skip the slice data
          pos += nal_len;
          continue;
        }
        if (sc.sh.slice_type == SLICE_P) {
          if (!build_ref_list_p(c, sc.sh, sc.list0)) {
            snprintf(p->errbuf, sizeof(p->errbuf), "ref list: %s",
                     c.err.c_str());
            return -1;
          }
          for (size_t i = 0; i < sc.list0.size() && i < 16; i++)
            out->ref_map[fidx * 16 + i] = sc.list0[i].span_index;
        } else if (sc.sh.slice_type == SLICE_B) {
          if (!build_ref_list_b(c, sc.sh, out->poc[fidx], sc.list0,
                                sc.list1)) {
            snprintf(p->errbuf, sizeof(p->errbuf), "B ref lists: %s",
                     c.err.c_str());
            return -1;
          }
          for (size_t i = 0; i < sc.list0.size() && i < 16; i++)
            out->ref_map[fidx * 16 + i] = sc.list0[i].span_index;
          for (size_t i = 0; i < sc.list1.size() && i < 16; i++)
            out->ref_map_l1[fidx * 16 + i] = sc.list1[i].span_index;
        }
        bool ok = c.pps.entropy_coding_mode
                      ? decode_slice_data_cabac(c, br, sc, out, fidx)
                      : decode_slice_data(c, br, sc, out, fidx);
        if (!ok) {
          snprintf(p->errbuf, sizeof(p->errbuf), "slice data (frame %d): %s",
                   fidx, c.err.c_str());
          return -1;
        }
      }
      pos += nal_len;
    }

    if (got_slice) {
      // reference marking (spec 8.2.5): IDR flags, full MMCO (1-6 with
      // long-term references), else sliding window
      if (first_sh.nal_ref_idc != 0) {
        int max_frame_num = 1 << c.sps.log2_max_frame_num;
        RefPic cur;
        cur.span_index = fidx;
        cur.frame_num = first_sh.frame_num;
        cur.poc = out->poc[fidx];
        if (first_sh.is_idr) {
          c.dpb.clear();
          if (first_sh.long_term_reference_flag) {
            cur.long_term = true;
            cur.long_term_idx = 0;
            c.max_long_term_idx = 0;
          } else {
            c.max_long_term_idx = -1;
          }
          c.dpb.insert(c.dpb.begin(), cur);
        } else if (first_sh.adaptive_ref_pic_marking) {
          auto pic_num_of = [&](const RefPic& r) {
            return r.frame_num > first_sh.frame_num
                       ? r.frame_num - max_frame_num
                       : r.frame_num;
          };
          for (auto& [op, vals] : first_sh.mmco_ops) {
            if (op == 1 || op == 3) {
              int pic_num_x = first_sh.frame_num - (int)(vals.first + 1);
              for (size_t i = 0; i < c.dpb.size(); i++) {
                if (!c.dpb[i].long_term &&
                    pic_num_of(c.dpb[i]) == pic_num_x) {
                  if (op == 1) {
                    c.dpb.erase(c.dpb.begin() + i);
                  } else {
                    // op 3: assign long_term_frame_idx (unmark any LT
                    // already holding it, 8.2.5.4.3)
                    int idx = (int)vals.second;
                    for (size_t j = 0; j < c.dpb.size(); j++)
                      if (c.dpb[j].long_term &&
                          c.dpb[j].long_term_idx == idx) {
                        c.dpb.erase(c.dpb.begin() + j);
                        if (j < i) i--;
                        break;
                      }
                    c.dpb[i].long_term = true;
                    c.dpb[i].long_term_idx = idx;
                  }
                  break;
                }
              }
            } else if (op == 2) {
              int lt_num = (int)vals.first;
              for (size_t i = 0; i < c.dpb.size(); i++)
                if (c.dpb[i].long_term &&
                    c.dpb[i].long_term_idx == lt_num) {
                  c.dpb.erase(c.dpb.begin() + i);
                  break;
                }
            } else if (op == 4) {
              c.max_long_term_idx = (int)vals.first - 1;
              for (size_t i = c.dpb.size(); i-- > 0;)
                if (c.dpb[i].long_term &&
                    c.dpb[i].long_term_idx > c.max_long_term_idx)
                  c.dpb.erase(c.dpb.begin() + i);
            } else if (op == 5) {
              c.dpb.clear();
              c.max_long_term_idx = -1;
              c.frame_num_offset = 0;
              c.prev_frame_num = 0;
              c.prev_poc_msb = c.prev_poc_lsb = 0;
              // the MMCO5 picture is treated as having PicOrderCnt 0
              // (8.2.1); emitted with the new epoch so ordering holds
              c.poc_epoch = c.max_poc_emitted + 2;
              out->poc[fidx] = c.poc_epoch;
              if (out->poc[fidx] > c.max_poc_emitted)
                c.max_poc_emitted = out->poc[fidx];
              cur.poc = out->poc[fidx];
              cur.frame_num = 0;
            } else if (op == 6) {
              // op 6's long_term_frame_idx is the second ue(v) (same
              // slot as op 3's) — the parser stores it in vals.second
              int idx = (int)vals.second;
              for (size_t i = c.dpb.size(); i-- > 0;)
                if (c.dpb[i].long_term && c.dpb[i].long_term_idx == idx)
                  c.dpb.erase(c.dpb.begin() + i);
              cur.long_term = true;
              cur.long_term_idx = idx;
            }
          }
          c.dpb.insert(c.dpb.begin(), cur);
          if ((int)c.dpb.size() > 16) c.dpb.resize(16);
        } else {
          // sliding window (8.2.5.3): evict the short-term ref with the
          // smallest FrameNumWrap when full (long-term refs persist)
          int max_refs =
              c.sps.max_num_ref_frames > 0 ? c.sps.max_num_ref_frames : 1;
          if ((int)c.dpb.size() >= max_refs) {
            int victim = -1, victim_fnw = 0;
            for (size_t i = 0; i < c.dpb.size(); i++) {
              if (c.dpb[i].long_term) continue;
              int fnw = c.dpb[i].frame_num > first_sh.frame_num
                            ? c.dpb[i].frame_num - max_frame_num
                            : c.dpb[i].frame_num;
              if (victim < 0 || fnw < victim_fnw) {
                victim = (int)i;
                victim_fnw = fnw;
              }
            }
            if (victim < 0) {
              snprintf(p->errbuf, sizeof(p->errbuf),
                       "DPB full of long-term references");
              return -1;
            }
            c.dpb.erase(c.dpb.begin() + victim);
          }
          c.dpb.insert(c.dpb.begin(), cur);
        }
        // device reference-ring placement: pick a slot whose occupant is
        // no longer in the DPB (the host mirrors the on-device ring)
        int n_slots = c.ring_slots > 0
                          ? c.ring_slots
                          : (c.sps.max_num_ref_frames > 0
                                 ? c.sps.max_num_ref_frames
                                 : 1);
        if ((int)c.ring_span.size() != n_slots)
          c.ring_span.assign(n_slots, -1);
        int slot = -1;
        for (int si = 0; si < n_slots; si++) {
          int occ = c.ring_span[si];
          bool live = false;
          for (auto& r : c.dpb)
            if (r.span_index == occ && r.span_index != fidx) live = true;
          if (occ < 0 || !live) {
            slot = si;
            break;
          }
        }
        if (slot < 0) {
          snprintf(p->errbuf, sizeof(p->errbuf),
                   "reference ring too small for this stream (need > %d)",
                   n_slots);
          return -1;
        }
        c.ring_span[slot] = fidx;
        if (out->ring_slot) out->ring_slot[fidx] = (int16_t)slot;
      } else if (out->ring_slot) {
        out->ring_slot[fidx] = -1;
      }
      fidx++;
      // reset per-picture MB state
      c.mbs.assign(c.n_mbs, MbState());
    }
  }
  return fidx;
}

// Table self-check hook (used by tests).
HW_API int hw_h264_check_tables(void) {
  // prefix-freeness of coeff_token tables
  for (int t = 0; t < 3; t++) {
    const Vlc(*tab)[17] =
        t == 0 ? kCoeffToken0 : t == 1 ? kCoeffToken1 : kCoeffToken2;
    std::vector<Vlc> v;
    for (int to = 0; to < 4; to++)
      for (int tc = 0; tc <= 16; tc++)
        if (tab[to][tc].len) v.push_back(tab[to][tc]);
    for (size_t i = 0; i < v.size(); i++)
      for (size_t j = i + 1; j < v.size(); j++) {
        int l = v[i].len < v[j].len ? v[i].len : v[j].len;
        if ((v[i].bits >> (v[i].len - l)) == (v[j].bits >> (v[j].len - l)))
          return -1;
      }
  }

  // Every decode-time LUT must reproduce the spec tables' linear-scan
  // match on every possible 16-bit prefix (symbol AND consumed length).
  struct Code {
    int len, sym;
    uint32_t bits;
  };
  auto lut_equals_scan = [](const VlcLut& t, const std::vector<Code>& v) {
    for (uint32_t p = 0; p < (1u << 16); p++) {
      int scan_sym = -1, scan_len = 0;
      for (const Code& cd : v)
        if ((p >> (16 - cd.len)) == cd.bits) {
          scan_sym = cd.sym;
          scan_len = cd.len;
          break;
        }
      int lut_sym = -1, lut_len = 0;
      uint16_t e = t.l1[p >> 8];
      if (e & 0x8000) {
        uint16_t e2 = t.l2[e & 0x7FFF][p & 0xFF];
        if (e2) {
          lut_sym = e2 & 0x7FF;
          lut_len = 8 + (e2 >> 11);
        }
      } else if (e) {
        lut_sym = e & 0x7FF;
        lut_len = e >> 11;
      }
      if (scan_sym != lut_sym || scan_len != lut_len) return false;
    }
    return true;
  };
  const CavlcLuts& L = cavlc_luts();
  const Vlc(*toks[3])[17] = {kCoeffToken0, kCoeffToken1, kCoeffToken2};
  for (int k = 0; k < 3; k++) {
    std::vector<Code> v;
    for (int to = 0; to < 4; to++)
      for (int tc = 0; tc <= 16; tc++)
        if (toks[k][to][tc].len)
          v.push_back({toks[k][to][tc].len, (tc << 2) | to,
                       toks[k][to][tc].bits});
    if (!lut_equals_scan(L.token[k], v)) return -2;
  }
  {
    std::vector<Code> v;
    for (int to = 0; to < 4; to++)
      for (int tc = 0; tc <= 4; tc++)
        if (kCoeffTokenChromaDC[to][tc].len)
          v.push_back({kCoeffTokenChromaDC[to][tc].len, (tc << 2) | to,
                       kCoeffTokenChromaDC[to][tc].bits});
    if (!lut_equals_scan(L.token_cdc, v)) return -3;
  }
  for (int r = 0; r < 15; r++) {
    std::vector<Code> v;
    for (int i = 0; i < 16; i++)
      if (kTotalZeros4x4[r][i].len)
        v.push_back({kTotalZeros4x4[r][i].len, i, kTotalZeros4x4[r][i].bits});
    if (!lut_equals_scan(L.tz4[r], v)) return -4;
  }
  for (int r = 0; r < 3; r++) {
    std::vector<Code> v;
    for (int i = 0; i < 4; i++)
      if (kTotalZerosChromaDC[r][i].len)
        v.push_back({kTotalZerosChromaDC[r][i].len, i,
                     kTotalZerosChromaDC[r][i].bits});
    if (!lut_equals_scan(L.tzc[r], v)) return -5;
  }
  for (int r = 0; r < 7; r++) {
    std::vector<Code> v;
    for (int i = 0; i < 15; i++)
      if (kRunBefore[r][i].len)
        v.push_back({kRunBefore[r][i].len, i, kRunBefore[r][i].bits});
    if (!lut_equals_scan(L.run[r], v)) return -6;
  }
  return 0;
}
