// HEVC syntax structures for the host entropy decoder (I-slice scope).
//
// Mirrors the H.264 front-end design (h264_types.h): the host parses
// NAL units, parameter sets, slice segment headers and the CTU CABAC
// layer, emitting transform-unit entries (spatial position, size,
// intra mode, QP, coefficients in raster order) that a reconstruction
// path consumes.  Reference parity: the upstream reference decodes
// HEVC only by delegating to FFmpeg/NVDEC
// (software_video_decoder.cpp:122-136); this front-end is the part it
// never built.
//
// Scope: 4:2:0, 8-bit, I/P/B slices (merge/AMVP/TMVP, weighted pred),
// no tiles, no scaling lists, no PCM.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace hwhevc {

// Resolved short-term reference picture set (7.4.8 derivation): delta
// POCs relative to the current picture, negatives first in decreasing
// order (-1, -2, ...), then positives in increasing order.
struct StRps {
  int n_neg = 0, n_pos = 0;
  int32_t delta_poc[17] = {0};
  uint8_t used[17] = {0};
};

struct HevcSPS {
  bool valid = false;
  int sps_id = 0;
  int chroma_format_idc = 1;
  int width = 0, height = 0;          // pic_{width,height}_in_luma_samples
  int conf_win[4] = {0, 0, 0, 0};     // left right top bottom (chroma units)
  int bit_depth_luma = 8, bit_depth_chroma = 8;
  int log2_max_poc_lsb = 8;           // +4
  int log2_min_cb = 3;                // log2_min_luma_coding_block_size
  int log2_ctb = 6;                   // min_cb + log2_diff_max_min
  int log2_min_tb = 2;
  int log2_max_tb = 5;
  int max_trafo_depth_inter = 0;
  int max_trafo_depth_intra = 0;
  bool scaling_list_enabled = false;
  bool amp_enabled = false;
  bool sao_enabled = false;
  bool pcm_enabled = false;
  int num_st_rps = 0;
  std::vector<StRps> st_rps;          // resolved SPS candidate sets
  bool long_term_ref_pics = false;
  bool temporal_mvp = false;
  bool strong_intra_smoothing = false;

  int ctb_w() const { return (width + (1 << log2_ctb) - 1) >> log2_ctb; }
  int ctb_h() const { return (height + (1 << log2_ctb) - 1) >> log2_ctb; }
};

struct HevcPPS {
  bool valid = false;
  int pps_id = 0;
  int sps_id = 0;
  bool dependent_slice_segments = false;
  bool output_flag_present = false;
  int num_extra_slice_header_bits = 0;
  bool sign_data_hiding = false;
  bool cabac_init_present = false;
  int num_ref_l0 = 1, num_ref_l1 = 1;
  int init_qp = 26;                   // 26 + init_qp_minus26
  bool constrained_intra_pred = false;
  bool transform_skip = false;
  bool cu_qp_delta_enabled = false;
  int diff_cu_qp_delta_depth = 0;
  int cb_qp_offset = 0, cr_qp_offset = 0;
  bool slice_chroma_qp_offsets_present = false;
  bool weighted_pred = false, weighted_bipred = false;
  bool transquant_bypass = false;
  bool tiles_enabled = false;
  bool entropy_coding_sync = false;
  bool loop_filter_across_slices = true;
  bool deblocking_filter_control_present = false;
  bool deblocking_filter_override_enabled = false;
  bool deblocking_disabled = false;
  int beta_offset = 0, tc_offset = 0;  // /2 values as parsed, *2 applied
  bool lists_modification = false;
  int log2_parallel_merge_level = 2;
  bool slice_header_extension = false;
};

// Per-(list, refIdx) explicit weighted-prediction parameters
// (7.3.6.3).  Offsets are at 8-bit range; weights carry the
// luma/chroma log2 denominators from the slice header.
struct WpEntry {
  uint8_t has_luma = 0, has_chroma = 0;
  int16_t lw = 1, lo = 0;             // luma weight (at denom), offset
  int16_t cw[2] = {1, 1}, co[2] = {0, 0};
};

struct HevcSliceHeader {
  bool first_slice = true;
  int nal_type = 0;
  int pps_id = 0;
  int slice_type = 2;                 // 0=B 1=P 2=I
  int poc_lsb = 0;
  int slice_qp = 26;
  int cb_qp_offset = 0, cr_qp_offset = 0;
  bool sao_luma = false, sao_chroma = false;
  bool deblocking_disabled = false;
  int beta_offset = 0, tc_offset = 0;
  // --- inter state ---
  StRps rps;                          // resolved RPS for this picture
  int num_ref[2] = {0, 0};            // num_ref_idx_lX_active
  bool mvd_l1_zero = false;
  bool cabac_init = false;
  bool tmvp = false;                  // slice_temporal_mvp_enabled
  bool col_from_l0 = true;
  int col_ref_idx = 0;
  int max_merge = 5;
  bool has_wp = false;                // pred_weight_table present
  int luma_log2_denom = 0, chroma_log2_denom = 0;
  WpEntry wp[2][16];
  // WPP substream byte sizes (entry_point_offset_minus1 + 1, one per
  // CTB row after the first), counted in ESCAPED slice-data bytes
  std::vector<uint32_t> entry_offsets;
};

// Flat transform-unit entry output (SoA, caller-allocated; see
// hwang_tpu/models/hevc/entropy.py for the Python-side layout).
// Entries appear in DECODE (z-)order — the reconstruction order.
struct HevcOut {
  int32_t* n_tu = nullptr;        // [F] TU-entry count per frame
  int32_t* tu_off = nullptr;      // [F] first entry index per frame
  uint16_t* tu_x = nullptr;       // component-plane x (chroma on chroma grid)
  uint16_t* tu_y = nullptr;
  uint8_t* tu_log2 = nullptr;     // component-plane transform size log2
  uint8_t* tu_cidx = nullptr;     // 0=Y 1=Cb 2=Cr
  uint8_t* tu_mode = nullptr;     // intra pred mode 0..34
  int8_t* tu_qp = nullptr;        // component QP (chroma already mapped)
  uint8_t* tu_cbf = nullptr;      // 1 = coefficients present
  int64_t* tu_coef_off = nullptr; // start into coeff[] (valid when cbf)
  int16_t* coeff = nullptr;       // raster-order coeffs, concatenated
  uint8_t* deblock_disabled = nullptr;  // [F]
  int8_t* qp_map = nullptr;   // [F * h4 * w4] luma QpY per 4x4 (deblock)
  int8_t* dbf = nullptr;      // [F * 4]: slice beta/tc offsets (as-parsed
                              // /2 values), PPS cb/cr QP offsets (8.7.2.5.5)
  int8_t* sao = nullptr;      // [F * ctbs * 3 * 6]: per-CTB SAO params
                              // (type, 4 resolved offsets, band_pos/eo_class)
  int64_t cap_tu = 0, cap_coeff = 0;    // capacities (in)
  int64_t used_tu = 0, used_coeff = 0;  // totals (out)

  // --- inter outputs (optional; null = I-only contract) ---
  // Prediction units in decode order with FINAL derived motion
  // (merge/AMVP/TMVP resolved on host).  References are identified by
  // their decode index within the span (spans start at IRAP, so every
  // reference is span-local).
  int32_t* n_pu = nullptr;      // [F]
  int32_t* pu_off = nullptr;    // [F]
  uint16_t* pu_x = nullptr;     // luma coords
  uint16_t* pu_y = nullptr;
  uint8_t* pu_w = nullptr;      // luma sizes 4..64
  uint8_t* pu_h = nullptr;
  uint8_t* pu_flags = nullptr;  // bit0 = L0 used, bit1 = L1 used
  uint8_t* pu_ref0 = nullptr;   // span decode index of the L0 ref
  uint8_t* pu_ref1 = nullptr;
  int16_t* pu_mv = nullptr;     // [cap_pu * 4]: mv0x mv0y mv1x mv1y (q-pel)
  uint8_t* pu_wp0 = nullptr;    // weight-table row index (list 0) or 255
  uint8_t* pu_wp1 = nullptr;
  uint8_t* frame_type = nullptr;  // [F]: 0=B 1=P 2=I
  int32_t* poc = nullptr;         // [F] PicOrderCntVal
  // Weighted-prediction rows, [F * 32 * 8] int16: row r = list*16+ref:
  // (lw, lo, cw0, co0, cw1, co1, luma_log2, chroma_log2)
  int16_t* wp_rows = nullptr;
  // Deblocking boundary strengths on the 8x8 edge grid,
  // [F * h8 * w8 * 2] (vertical edge of each 8x8, then horizontal)
  uint8_t* bs_map = nullptr;
  int64_t cap_pu = 0;
  int64_t used_pu = 0;
};

}  // namespace hwhevc
