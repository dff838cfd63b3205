// H.264 syntax structures for the host entropy decoder.
//
// This is the front-end the reference never built: it delegated entropy
// decode to FFmpeg/NVDEC (SURVEY.md §7).  Here the host parses NAL units,
// parameter sets, slice headers and the CAVLC macroblock layer, emitting
// dense per-macroblock SoA tensors that the TPU reconstruction kernels
// consume (dequant/IDCT/intra/MC/deblock run on-device).
//
// Scope: progressive (frame_mbs_only), 4:2:0, 8-bit.  CAVLC I/P slices
// first; CABAC and B-slices are staged next.

#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace hwh264 {

struct SPS {
  bool valid = false;
  int profile_idc = 0;
  int level_idc = 0;
  int seq_parameter_set_id = 0;
  int chroma_format_idc = 1;
  int bit_depth_luma = 8;
  int bit_depth_chroma = 8;
  bool qpprime_y_zero_transform_bypass = false;
  bool seq_scaling_matrix_present = false;
  uint8_t scaling4[6][16];   // in raster order after inverse zigzag
  uint8_t scaling8[6][64];
  int log2_max_frame_num = 4;            // log2_max_frame_num_minus4 + 4
  int pic_order_cnt_type = 0;
  int log2_max_poc_lsb = 4;              // +4
  bool delta_pic_order_always_zero = false;
  int offset_for_non_ref_pic = 0;
  int offset_for_top_to_bottom_field = 0;
  std::vector<int> offset_for_ref_frame;
  int max_num_ref_frames = 1;
  bool gaps_in_frame_num_allowed = false;
  int pic_width_in_mbs = 0;              // +1
  int pic_height_in_map_units = 0;       // +1
  bool frame_mbs_only = true;
  bool mb_adaptive_frame_field = false;
  bool direct_8x8_inference = true;
  bool frame_cropping = false;
  int crop_left = 0, crop_right = 0, crop_top = 0, crop_bottom = 0;

  int width_mbs() const { return pic_width_in_mbs; }
  int height_mbs() const { return pic_height_in_map_units; }
  int coded_width() const { return pic_width_in_mbs * 16; }
  int coded_height() const { return pic_height_in_map_units * 16; }
  int display_width() const { return coded_width() - 2 * (crop_left + crop_right); }
  int display_height() const { return coded_height() - 2 * (crop_top + crop_bottom); }
};

struct PPS {
  bool valid = false;
  int pic_parameter_set_id = 0;
  int seq_parameter_set_id = 0;
  bool entropy_coding_mode = false;      // false=CAVLC true=CABAC
  bool bottom_field_pic_order_in_frame_present = false;
  int num_slice_groups = 1;
  int num_ref_idx_l0_default = 1;        // +1
  int num_ref_idx_l1_default = 1;
  bool weighted_pred = false;
  int weighted_bipred_idc = 0;
  int pic_init_qp = 26;                  // +26
  int pic_init_qs = 26;
  int chroma_qp_index_offset = 0;
  bool deblocking_filter_control_present = false;
  bool constrained_intra_pred = false;
  bool redundant_pic_cnt_present = false;
  // More-data extensions (High profile)
  bool transform_8x8_mode = false;
  bool pic_scaling_matrix_present = false;
  bool has_scaling = false;   // effective tables below are non-flat-capable
  uint8_t scaling4[6][16];    // effective per-list 4x4 weights (raster)
  uint8_t scaling8[6][64];    // [0]=8x8 intra, [1]=8x8 inter
  int second_chroma_qp_index_offset = 0;  // defaults to chroma_qp_index_offset
};

enum SliceType {
  SLICE_P = 0,
  SLICE_B = 1,
  SLICE_I = 2,
  SLICE_SP = 3,
  SLICE_SI = 4,
};

struct SliceHeader {
  int first_mb_in_slice = 0;
  int slice_type = SLICE_I;   // reduced mod 5
  int pic_parameter_set_id = 0;
  int frame_num = 0;
  int idr_pic_id = 0;
  bool is_idr = false;
  int nal_ref_idc = 0;
  int pic_order_cnt_lsb = 0;
  int delta_pic_order_cnt_bottom = 0;
  int delta_pic_order_cnt[2] = {0, 0};
  int num_ref_idx_l0_active = 1;
  int num_ref_idx_l1_active = 1;
  // ref pic list modification (l0): ops as (modification_idc, value)
  std::vector<std::pair<int, uint32_t>> ref_list_mod_l0;
  std::vector<std::pair<int, uint32_t>> ref_list_mod_l1;
  // dec_ref_pic_marking
  bool no_output_of_prior_pics = false;
  bool long_term_reference_flag = false;
  bool adaptive_ref_pic_marking = false;
  std::vector<std::pair<int, std::pair<uint32_t, uint32_t>>> mmco_ops;
  // explicit weighted prediction (pred_weight_table, 7.3.3.2); per
  // refIdxL0: wy oy wu ou wv ov (defaults 1<<denom / 0 when flags unset)
  bool has_pred_weights = false;
  int luma_log2_denom = 0;
  int chroma_log2_denom = 0;
  int16_t wt[16][6] = {};
  int16_t wt1[16][6] = {};   // list-1 tables (explicit B weighting)
  bool direct_spatial = true;  // direct_spatial_mv_pred_flag (B slices)
  int cabac_init_idc = 0;
  int slice_qp = 26;
  int disable_deblocking_filter_idc = 0;
  int slice_alpha_c0_offset = 0;         // *2 applied already
  int slice_beta_offset = 0;
};

// Macroblock kinds emitted to the device.
enum MbKind : uint8_t {
  MB_P_SKIP = 0,
  MB_INTER = 1,      // P (any partitioning); MVs at 4x4 granularity
  MB_I4x4 = 2,
  MB_I16x16 = 3,
  MB_IPCM = 4,
  MB_B_SKIP = 5,
  MB_B_INTER = 6,    // B (bi/uni); MVs for both lists
};

// Per-GOP (span) SoA output views; pointers are caller-allocated numpy
// buffers sized [n_frames * n_mbs * ...].  Layout documented in
// hwang_tpu/models/h264/entropy.py.
struct GopOut {
  uint8_t* frame_type = nullptr;     // [F] SliceType of first slice
  int32_t* poc = nullptr;            // [F] picture order count (display order)
  int32_t* ref_map = nullptr;        // [F * 16] refIdxL0 -> frame index in span (-1 none)
  int32_t* ref_map_l1 = nullptr;     // [F * 16]
  uint8_t* mb_kind = nullptr;        // [F*M]
  int8_t* qp = nullptr;              // [F*M] luma QP
  uint8_t* cbp = nullptr;            // [F*M] bits0-3 luma 8x8s, bits4-5 chroma
  int8_t* i4_modes = nullptr;        // [F*M*16] per 4x4 block (raster in MB)
  int8_t* i16_mode = nullptr;        // [F*M]
  int8_t* chroma_mode = nullptr;     // [F*M]
  int16_t* mv = nullptr;             // [F*M*16*2] L0 per 4x4 block (x,y qpel)
  int16_t* mv_l1 = nullptr;          // [F*M*16*2]
  int8_t* refidx = nullptr;          // [F*M*4] L0 per 8x8 (-1 = intra/none)
  int8_t* refidx_l1 = nullptr;       // [F*M*4]
  int16_t* luma_dc = nullptr;        // [F*M*16] I16x16 DC (raster)
  int16_t* luma_ac = nullptr;        // [F*M*16*16] per 4x4 block coeffs (raster)
  int16_t* chroma_dc = nullptr;      // [F*M*2*4]
  int16_t* chroma_ac = nullptr;      // [F*M*2*4*16]
  uint8_t* nnz = nullptr;            // [F*M*24] total_coeff (16 luma + 8 chroma)
  uint8_t* deblock_idc = nullptr;    // [F*M] disable_deblocking_filter_idc
  int8_t* alpha_off = nullptr;       // [F*M]
  int8_t* beta_off = nullptr;        // [F*M]
  uint8_t* ipcm = nullptr;           // [F*M*384] raw samples for MB_IPCM
  uint8_t* intra_pred_avail = nullptr; // [F*M] neighbor availability bits
                                       // bit0=left bit1=top bit2=topright bit3=topleft
                                       // (constrained_intra aware)
  uint8_t* transform8 = nullptr;     // [F*M] 1 = 8x8 luma transform
  uint8_t* frame_is_ref = nullptr;   // [F] nal_ref_idc != 0 (DPB entry)
  int16_t* pred_weights = nullptr;   // [F*16*8] per (frame, refIdxL0):
                                     // wy oy wu ou wv ov log2y log2c
                                     // (explicit weighted prediction 8.4.2.3)
  uint8_t* weight_flag = nullptr;    // [F] 1 = apply weighted prediction
  int16_t* pred_weights_l1 = nullptr;  // [F*16*8] per (frame, refIdxL1);
                                       // only filled on explicit-B frames
                                       // (weighted_bipred_idc == 1)
  int16_t* ring_slot = nullptr;        // [F] device reference-ring slot the
                                       // frame writes (-1 = not a reference)
  int64_t* sparse_counts = nullptr;    // [4] optional accumulators, filled
                                       // during decode: [0] nonzero coeffs,
                                       // [1] L0 per-4x4 MV exceptions,
                                       // [2] L1, [3] I4x4 macroblocks —
                                       // lets the packed transport skip
                                       // its separate count pass
};

}  // namespace hwh264
