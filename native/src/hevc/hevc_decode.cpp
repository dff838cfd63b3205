// HEVC host entropy decoder: NAL/VPS/SPS/PPS/slice-segment parsing and
// the I-slice CTU CABAC layer (ITU-T H.265 sections 7.3, 8.4, 9.3).
//
// Reference parity: the upstream reference never owned an HEVC decoder
// — it selected AV_CODEC_ID_HEVC into FFmpeg/NVDEC
// (software_video_decoder.cpp:122-136, videos.h:26-36 fixtures).  This
// front-end is the TPU-path analog of native/src/h264: the host does
// serial entropy decode, emitting transform-unit entries (position,
// size, intra mode, QP, raster coefficients) for a vectorized
// reconstruction path.
//
// The arithmetic decoding engine is shared with H.264: HEVC uses the
// identical M-coder (Tables 9-46/9-47 equal H.264's rangeTabLPS /
// transIdxLPS), so hwh264::Cabac is reused verbatim.  Only context
// initialization (9.3.2.2: m/n derived from packed initValue) and the
// binarizations/context derivations differ; context layout follows
// libavcodec's element order because the init table is extracted from
// its rodata (native/tools/extract_hevc_tables.py).
//
// Scope (round 3): 4:2:0 8-bit I slices, single slice segment per
// picture, no tiles/WPP/PCM/scaling-lists/transform-skip.  Inter
// slices are staged next.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

#include "../h264/h264_bitreader.h"
#include "../h264/h264_cabac.h"
#include "hevc_cabac_tables.h"
#include "hevc_types.h"

#define HW_API extern "C" __attribute__((visibility("default")))

namespace hwhevc {
namespace {

using hwh264::BitReader;
using hwh264::Cabac;

// HWANG_HEVC_TRACE=1: per-CU syntax trace on stderr (debug channel,
// mirrors HWANG_H264_TRACE on the H.264 front-end)
bool trace_on() {
  static int v = -1;
  if (v < 0) {
    const char* e = getenv("HWANG_HEVC_TRACE");
    v = e && e[0] == '1';
  }
  return v;
}
#define HTRACE(...) \
  do {              \
    if (trace_on()) fprintf(stderr, __VA_ARGS__); \
  } while (0)

// ---- context offsets (libavcodec element order; see extractor) ----------
enum {
  CTX_SAO_MERGE = 0,
  CTX_SAO_TYPE = 1,
  CTX_SPLIT_CU = 2,
  CTX_TQ_BYPASS = 5,
  CTX_CU_SKIP = 6,
  CTX_CU_QP_DELTA = 9,
  CTX_PRED_MODE = 12,
  CTX_PART_MODE = 13,
  CTX_PREV_INTRA = 17,
  CTX_INTRA_CHROMA = 18,
  CTX_MERGE_FLAG = 20,
  CTX_MERGE_IDX = 21,
  CTX_INTER_PRED_IDC = 22,
  CTX_REF_IDX = 27,        // shared by both lists (lavc keeps an unused
                           // L1 copy at 29 with identical init values)
  CTX_MVD_GREATER0 = 31,
  CTX_MVD_GREATER1 = 32,  // 33-34 hold the unused per-list copy pair
  CTX_MVP_FLAG = 35,
  CTX_NO_RESIDUAL = 36,
  CTX_SPLIT_TRANSFORM = 37,
  CTX_CBF_LUMA = 40,
  CTX_CBF_CB_CR = 42,
  CTX_TRANSFORM_SKIP = 47,
  CTX_LAST_X = 53,
  CTX_LAST_Y = 71,
  CTX_SIG_GROUP = 89,
  CTX_SIG_FLAG = 93,
  CTX_GT1 = 137,
  CTX_GT2 = 161,
  N_CTX = 199,
};

// Context init (9.3.2.2): initValue -> (m, n) -> preCtxState at SliceQpY;
// packed (pStateIdx << 1) | valMPS like the H.264 engine expects.
struct HevcContexts {
  uint8_t s[N_CTX];
  void init(int qp, int init_type) {
    qp = qp < 0 ? 0 : (qp > 51 ? 51 : qp);
    for (int i = 0; i < N_CTX; i++) {
      int iv = kInitValues[init_type][i];
      int m = (iv >> 4) * 5 - 45;
      int n = ((iv & 15) << 3) - 16;
      int pre = ((m * qp) >> 4) + n;
      pre = pre < 1 ? 1 : (pre > 126 ? 126 : pre);
      s[i] = pre <= 63 ? (uint8_t)((63 - pre) << 1)
                       : (uint8_t)(((pre - 64) << 1) | 1);
    }
  }
};


// Dump-aware bin decode wrappers: with HWANG_CABAC_DUMP set, every bin
// goes through the engine's logging variants (and multi-bin bypass
// batching degrades to single bins so the log is complete).
inline bool dump_on() {
  static int v = -1;
  if (v < 0) {
    const char* e = getenv("HWANG_CABAC_DUMP");
    v = e && e[0] ? 1 : 0;
  }
  return v;
}
inline int DEC(Cabac& cb, HevcContexts& cx, int idx) {
  return dump_on() ? cb.decode_dump(&cx.s[idx], idx) : cb.decode(&cx.s[idx]);
}
inline int BYP(Cabac& cb) {
  return dump_on() ? cb.bypass_dump() : cb.bypass();
}
inline int TERM(Cabac& cb) {
  return dump_on() ? cb.terminate_dump() : cb.terminate();
}

// ---- scan order tables (6.5.3-6.5.5), generated at static init ----------
struct Scans {
  // [scanIdx][pos] -> (x | y<<4) within a 4x4 block
  uint8_t coef[3][16];
  // subblock scans for 8x8/16x16/32x32 TUs: [scanIdx][log2-3][pos]
  uint8_t sb[3][3][64];
  Scans() {
    auto gen = [](int idx, int n, uint8_t* out) {
      int i = 0;
      if (idx == 0) {  // up-right diagonal
        int x = 0, y = 0;
        while (i < n * n) {
          while (y >= 0) {
            if (x < n && y < n) out[i++] = (uint8_t)(x | (y << 4));
            y--;
            x++;
          }
          y = x;
          x = 0;
        }
      } else if (idx == 1) {  // horizontal
        for (int y = 0; y < n; y++)
          for (int x = 0; x < n; x++) out[i++] = (uint8_t)(x | (y << 4));
      } else {  // vertical
        for (int x = 0; x < n; x++)
          for (int y = 0; y < n; y++) out[i++] = (uint8_t)(x | (y << 4));
      }
    };
    for (int s = 0; s < 3; s++) {
      gen(s, 4, coef[s]);
      for (int lg = 3; lg <= 5; lg++) gen(s, 1 << (lg - 2), sb[s][lg - 3]);
    }
  }
};
const Scans kScans{};

// sig_coeff_flag ctxIdxMap for 4x4 TUs (9.3.4.2.5)
const uint8_t kSigCtx4x4[15] = {0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8};

// ---- parameter-set / slice-header parsing --------------------------------

std::vector<uint8_t> strip_ep(const uint8_t* p, size_t n,
                              std::vector<uint32_t>* ep_pos = nullptr) {
  // ep_pos (optional): RBSP offsets at which an emulation byte was
  // removed — WPP entry-point offsets count ESCAPED bytes, so the
  // decoder converts through this list (7.4.7.1)
  std::vector<uint8_t> out;
  out.reserve(n);
  int zeros = 0;
  for (size_t i = 0; i < n; i++) {
    if (zeros >= 2 && p[i] == 3) {
      zeros = 0;
      if (ep_pos) ep_pos->push_back((uint32_t)out.size());
      continue;  // emulation_prevention_three_byte
    }
    zeros = p[i] == 0 ? zeros + 1 : 0;
    out.push_back(p[i]);
  }
  return out;
}

bool parse_ptl(BitReader& br, int max_sub) {
  br.skip(88);  // general profile space/tier/idc/compat/constraint flags
  br.skip(8);   // general_level_idc
  std::vector<int> prof(max_sub), lev(max_sub);
  for (int i = 0; i < max_sub; i++) {
    prof[i] = br.u1();
    lev[i] = br.u1();
  }
  if (max_sub > 0)
    for (int i = max_sub; i < 8; i++) br.skip(2);
  for (int i = 0; i < max_sub; i++) {
    if (prof[i]) br.skip(88);
    if (lev[i]) br.skip(8);
  }
  return !br.error();
}

// st_ref_pic_set (7.3.7): parse AND resolve to delta POCs (7.4.8),
// including sets inter-predicted from an earlier set in `sets`.
// Appends the resolved set.
bool parse_st_rps(BitReader& br, int idx, int num_sets,
                  std::vector<StRps>& sets, std::string& err) {
  StRps o;
  int inter_pred = idx != 0 ? (int)br.u1() : 0;
  if (inter_pred) {
    int delta_idx = idx == num_sets ? (int)br.ue() + 1 : 1;
    int ref_i = idx - delta_idx;
    if (ref_i < 0 || ref_i >= (int)sets.size()) {
      err = "st_rps bad ref idx";
      return false;
    }
    const StRps r = sets[ref_i];  // copy: push_back may reallocate
    int sign = (int)br.u1();
    int abs_delta = (int)br.ue() + 1;
    int delta_rps = sign ? -abs_delta : abs_delta;
    int nref = r.n_neg + r.n_pos;
    if (nref > 16) {
      err = "st_rps ref too large";
      return false;
    }
    uint8_t used_curr[17], use_flag[17];
    for (int j = 0; j <= nref; j++) {
      used_curr[j] = (uint8_t)br.u1();
      use_flag[j] = used_curr[j] ? 1 : (uint8_t)br.u1();
    }
    // negative half (DeltaPocS0, decreasing order from closest)
    int i = 0;
    int32_t dp[17];
    uint8_t du[17];
    for (int j = r.n_pos - 1; j >= 0; j--) {
      int d = r.delta_poc[r.n_neg + j] + delta_rps;
      if (d < 0 && use_flag[r.n_neg + j]) {
        dp[i] = d;
        du[i++] = used_curr[r.n_neg + j];
      }
    }
    if (delta_rps < 0 && use_flag[nref]) {
      dp[i] = delta_rps;
      du[i++] = used_curr[nref];
    }
    for (int j = 0; j < r.n_neg; j++) {
      int d = r.delta_poc[j] + delta_rps;
      if (d < 0 && use_flag[j]) {
        dp[i] = d;
        du[i++] = used_curr[j];
      }
    }
    o.n_neg = i;
    // positive half (DeltaPocS1, increasing order from closest)
    for (int j = r.n_neg - 1; j >= 0; j--) {
      int d = r.delta_poc[j] + delta_rps;
      if (d > 0 && use_flag[j]) {
        dp[i] = d;
        du[i++] = used_curr[j];
      }
    }
    if (delta_rps > 0 && use_flag[nref]) {
      dp[i] = delta_rps;
      du[i++] = used_curr[nref];
    }
    for (int j = 0; j < r.n_pos; j++) {
      int d = r.delta_poc[r.n_neg + j] + delta_rps;
      if (d > 0 && use_flag[r.n_neg + j]) {
        dp[i] = d;
        du[i++] = used_curr[r.n_neg + j];
      }
    }
    o.n_pos = i - o.n_neg;
    if (i > 16) {
      err = "st_rps too many pics";
      return false;
    }
    for (int j = 0; j < i; j++) {
      o.delta_poc[j] = dp[j];
      o.used[j] = du[j];
    }
  } else {
    int neg = (int)br.ue(), pos = (int)br.ue();
    if (neg + pos > 16) {
      err = "st_rps too many pics";
      return false;
    }
    o.n_neg = neg;
    o.n_pos = pos;
    int prev = 0;
    for (int j = 0; j < neg; j++) {
      prev -= (int)br.ue() + 1;
      o.delta_poc[j] = prev;
      o.used[j] = (uint8_t)br.u1();
    }
    prev = 0;
    for (int j = 0; j < pos; j++) {
      prev += (int)br.ue() + 1;
      o.delta_poc[neg + j] = prev;
      o.used[neg + j] = (uint8_t)br.u1();
    }
  }
  sets.push_back(o);
  return !br.error();
}

bool parse_sps(BitReader& br, HevcSPS& sps, std::string& err) {
  br.u(4);  // sps_video_parameter_set_id
  int max_sub = (int)br.u(3);
  br.u1();  // temporal_id_nesting
  if (!parse_ptl(br, max_sub)) {
    err = "SPS ptl";
    return false;
  }
  sps.sps_id = (int)br.ue();
  sps.chroma_format_idc = (int)br.ue();
  if (sps.chroma_format_idc == 3) br.u1();
  sps.width = (int)br.ue();
  sps.height = (int)br.ue();
  if (br.u1())
    for (int i = 0; i < 4; i++) sps.conf_win[i] = (int)br.ue();
  sps.bit_depth_luma = (int)br.ue() + 8;
  sps.bit_depth_chroma = (int)br.ue() + 8;
  sps.log2_max_poc_lsb = (int)br.ue() + 4;
  int sub_ordering = br.u1();
  for (int i = sub_ordering ? 0 : max_sub; i <= max_sub; i++) {
    br.ue();
    br.ue();
    br.ue();
  }
  sps.log2_min_cb = (int)br.ue() + 3;
  sps.log2_ctb = sps.log2_min_cb + (int)br.ue();
  sps.log2_min_tb = (int)br.ue() + 2;
  sps.log2_max_tb = sps.log2_min_tb + (int)br.ue();
  sps.max_trafo_depth_inter = (int)br.ue();
  sps.max_trafo_depth_intra = (int)br.ue();
  sps.scaling_list_enabled = br.u1();
  if (sps.scaling_list_enabled) {
    err = "scaling lists not supported";
    return false;
  }
  sps.amp_enabled = br.u1();
  sps.sao_enabled = br.u1();
  sps.pcm_enabled = br.u1();
  if (sps.pcm_enabled) {
    err = "PCM not supported";
    return false;
  }
  sps.num_st_rps = (int)br.ue();
  sps.st_rps.clear();
  for (int i = 0; i < sps.num_st_rps; i++)
    if (!parse_st_rps(br, i, sps.num_st_rps, sps.st_rps, err)) return false;
  sps.long_term_ref_pics = br.u1();
  if (sps.long_term_ref_pics) {
    int n = (int)br.ue();
    for (int i = 0; i < n; i++) {
      br.u(sps.log2_max_poc_lsb);
      br.u1();
    }
  }
  sps.temporal_mvp = br.u1();
  sps.strong_intra_smoothing = br.u1();
  // vui / extensions ignored
  if (br.error()) {
    err = "SPS overrun";
    return false;
  }
  if (sps.chroma_format_idc != 1 || sps.bit_depth_luma != 8 ||
      sps.bit_depth_chroma != 8) {
    err = "only 4:2:0 8-bit supported";
    return false;
  }
  sps.valid = true;
  HTRACE("SPS: %dx%d ctb=%d min_cb=%d tb=[%d,%d] trafo_depth i=%d/inter=%d"
         " sao=%d amp=%d strong=%d rps=%d\n",
         sps.width, sps.height, sps.log2_ctb, sps.log2_min_cb,
         sps.log2_min_tb, sps.log2_max_tb, sps.max_trafo_depth_intra,
         sps.max_trafo_depth_inter, (int)sps.sao_enabled,
         (int)sps.amp_enabled, (int)sps.strong_intra_smoothing,
         sps.num_st_rps);
  return true;
}

bool parse_pps(BitReader& br, HevcPPS& pps, std::string& err) {
  pps.pps_id = (int)br.ue();
  pps.sps_id = (int)br.ue();
  pps.dependent_slice_segments = br.u1();
  pps.output_flag_present = br.u1();
  pps.num_extra_slice_header_bits = (int)br.u(3);
  pps.sign_data_hiding = br.u1();
  pps.cabac_init_present = br.u1();
  pps.num_ref_l0 = (int)br.ue() + 1;
  pps.num_ref_l1 = (int)br.ue() + 1;
  pps.init_qp = 26 + (int)br.se();
  pps.constrained_intra_pred = br.u1();
  pps.transform_skip = br.u1();
  pps.cu_qp_delta_enabled = br.u1();
  if (pps.cu_qp_delta_enabled) pps.diff_cu_qp_delta_depth = (int)br.ue();
  pps.cb_qp_offset = (int)br.se();
  pps.cr_qp_offset = (int)br.se();
  pps.slice_chroma_qp_offsets_present = br.u1();
  pps.weighted_pred = br.u1();
  pps.weighted_bipred = br.u1();
  pps.transquant_bypass = br.u1();
  pps.tiles_enabled = br.u1();
  pps.entropy_coding_sync = br.u1();  // WPP: per-CTB-row substreams
  if (pps.tiles_enabled) {
    err = "tiles not supported";
    return false;
  }
  pps.loop_filter_across_slices = br.u1();
  pps.deblocking_filter_control_present = br.u1();
  if (pps.deblocking_filter_control_present) {
    pps.deblocking_filter_override_enabled = br.u1();
    pps.deblocking_disabled = br.u1();
    if (!pps.deblocking_disabled) {
      pps.beta_offset = (int)br.se();
      pps.tc_offset = (int)br.se();
    }
  }
  if (br.u1()) {  // pps_scaling_list_data_present
    err = "PPS scaling lists not supported";
    return false;
  }
  pps.lists_modification = br.u1();
  pps.log2_parallel_merge_level = (int)br.ue() + 2;
  pps.slice_header_extension = br.u1();
  if (br.error()) {
    err = "PPS overrun";
    return false;
  }
  if (pps.transform_skip) {
    err = "transform_skip not supported";
    return false;
  }
  pps.valid = true;
  HTRACE("PPS: init_qp=%d sdh=%d cuqp=%d/%d cb/cr=%d/%d tqb=%d db_ctl=%d"
         " db_dis=%d wpp=%d\n",
         pps.init_qp, (int)pps.sign_data_hiding,
         (int)pps.cu_qp_delta_enabled, pps.diff_cu_qp_delta_depth,
         pps.cb_qp_offset, pps.cr_qp_offset, (int)pps.transquant_bypass,
         (int)pps.deblocking_filter_control_present,
         (int)pps.deblocking_disabled, (int)pps.entropy_coding_sync);
  return true;
}

// ---- decoder context ------------------------------------------------------

struct Ctx {
  std::map<int, HevcSPS> sps_map;
  std::map<int, HevcPPS> pps_map;
  HevcSPS sps;
  HevcPPS pps;
  bool have_active = false;
  int nal_length_size = 4;
  std::string err;

  // per-picture state (4x4 min-block grids)
  int w4 = 0, h4 = 0;  // luma 4x4 grid dims
  std::vector<uint8_t> ct_depth;  // coding-tree depth per 4x4
  std::vector<int8_t> ipm;        // intra pred mode per 4x4
  std::vector<int8_t> qpy;        // luma QP per 4x4

  // ---- inter / DPB state ----------------------------------------------
  // Motion info per 4x4 block of the CURRENT picture.  pf: bit0 = L0,
  // bit1 = L1; 0 = intra or not-yet-decoded (see dec4).
  struct MvInfo {
    int16_t mv[2][2] = {{0, 0}, {0, 0}};  // [list][x, y] quarter-pel
    int8_t refidx[2] = {-1, -1};
    uint8_t pf = 0;
  };
  std::vector<MvInfo> mvf;
  std::vector<uint8_t> dec4;   // 1 = 4x4 block decoded (z-scan avail.)
  std::vector<uint8_t> skip4;  // cu_skip_flag per 4x4 (context derivation)
  std::vector<uint8_t> cbfy4;  // luma-TB-has-coeffs per 4x4 (deblock BS)
  std::vector<uint8_t> tub4;   // TU left/top boundary bits per 4x4
  std::vector<uint8_t> pub4;   // PU left/top boundary bits per 4x4

  // Compressed (16x16) motion field of a decoded picture — TMVP source.
  struct ColMv {
    int16_t mv[2][2];
    int32_t refpoc[2];  // POC of the picture each list references
    uint8_t pf;
  };
  struct Pic {
    int32_t poc = 0;
    int span_idx = -1;   // decode index within the span
    int w16 = 0, h16 = 0;
    std::vector<ColMv> col;
  };
  std::vector<Pic> dpb;
  int32_t poc_val = 0;
  int32_t prev_tid0_poc = 0;
  int cur_span_idx = 0;
  // active reference lists (built per picture from the slice RPS)
  int n_ref[2] = {0, 0};
  int ref_dpb[2][16];        // DPB index
  int32_t ref_pocs[2][16];   // POC per (list, refIdx)
  bool no_backward = true;   // NoBackwardPredFlag

  // slice/CU decode state
  HevcSliceHeader sh;
  int qpy_pred = 26;      // qPY_PRED of the current quant group
  int qpy_prev = 26;      // qPY_PREV (last CU of previous QG)
  int qpy_cur = 26;       // current CU QpY
  bool is_qp_coded = false;
  int qp_delta = 0;
  int qg_x = 0, qg_y = 0;
  int ctb_x = 0, ctb_y = 0;  // current CTB origin (luma samples)

  // residual-coding scratch
  uint8_t csbf[64];  // coded_sub_block_flag map (8x8 subblock grid max)

  // per-picture SAO parameters, [ctbs * 3 comps * 6] (see parse_sao)
  std::vector<int8_t> sao;

  // output cursors
  HevcOut* out = nullptr;
  int64_t tu_used = 0, coef_used = 0;
  int frame_tu0 = 0;
};

struct PublicCtx {
  Ctx c;
  char errbuf[512];
};

int clip3(int lo, int hi, int v) { return v < lo ? lo : (v > hi ? hi : v); }

// chroma QP mapping (Table 8-10, 4:2:0)
int chroma_qp(int qpy, int off) {
  static const int tab[14] = {29, 30, 31, 32, 33, 33, 34,
                              34, 35, 35, 36, 36, 37, 37};
  int qpi = clip3(0, 57, qpy + off);
  if (qpi < 30) return qpi;
  if (qpi > 43) return qpi - 6;
  return tab[qpi - 30];
}

// ---- bypass helpers on the shared engine ----------------------------------

uint32_t bypass_bits(Cabac& cb, int n) {
  uint32_t v = 0;
  if (dump_on()) {
    for (int i = 0; i < n; i++) v = (v << 1) | (uint32_t)cb.bypass_dump();
    return v;
  }
  while (n > 24) {
    cb.ensure(24);
    uint32_t q = cb.peek_bypass(24);
    cb.consume_bypass(24, 24, q);
    v = (v << 24) | q;
    n -= 24;
  }
  if (n > 0) {
    cb.ensure(n);
    uint32_t q = cb.peek_bypass(n);
    cb.consume_bypass(n, n, q);
    v = (v << n) | q;
  }
  return v;
}

// coeff_abs_level_remaining (9.3.3.13): Rice/EG(k) hybrid, all bypass.
int decode_remaining(Cabac& cb, int rice, std::string& err) {
  int prefix = 0;
  while (prefix < 32 && BYP(cb)) prefix++;
  if (prefix >= 32) {
    err = "remaining prefix overflow";
    return -1;
  }
  if (prefix <= 3) return (prefix << rice) + (int)bypass_bits(cb, rice);
  int nbits = rice + prefix - 3;
  if (nbits > 30) {
    err = "remaining suffix overflow";
    return -1;
  }
  return (((1 << (prefix - 3)) + 3 - 1) << rice) + (int)bypass_bits(cb, nbits);
}

// ---- TU entry emission -----------------------------------------------------

bool emit_tu(Ctx& c, int x, int y, int log2, int cidx, int mode, int qp,
             int cbf, const int16_t* coeffs) {
  HevcOut* o = c.out;
  if (c.tu_used >= o->cap_tu) {
    c.err = "TU capacity exceeded";
    return false;
  }
  int64_t i = c.tu_used++;
  o->tu_x[i] = (uint16_t)x;
  o->tu_y[i] = (uint16_t)y;
  o->tu_log2[i] = (uint8_t)log2;
  o->tu_cidx[i] = (uint8_t)cidx;
  o->tu_mode[i] = (uint8_t)mode;
  o->tu_qp[i] = (int8_t)qp;
  o->tu_cbf[i] = (uint8_t)(cbf != 0);
  o->tu_coef_off[i] = c.coef_used;
  if (cbf) {
    int n = 1 << (2 * log2);
    if (c.coef_used + n > o->cap_coeff) {
      c.err = "coeff capacity exceeded";
      return false;
    }
    memcpy(o->coeff + c.coef_used, coeffs, n * sizeof(int16_t));
    c.coef_used += n;
  }
  return true;
}

// ---- residual coding (7.3.8.11 / 9.3.4.2) ---------------------------------

// sig_coeff_flag context increment (9.3.4.2.5)
inline int sig_ctx_inc(int log2, int cidx, int xC, int yC, int scan_idx,
                       int csbf_right, int csbf_below) {
  int sig;
  if (log2 == 2) {
    sig = kSigCtx4x4[(yC << 2) + xC];
  } else if ((xC | yC) == 0) {
    sig = 0;
  } else {
    int prev = csbf_right + 2 * csbf_below;
    int xP = xC & 3, yP = yC & 3;
    if (prev == 0)
      sig = (xP + yP == 0) ? 2 : (xP + yP < 3) ? 1 : 0;
    else if (prev == 1)
      sig = (yP == 0) ? 2 : (yP == 1) ? 1 : 0;
    else if (prev == 2)
      sig = (xP == 0) ? 2 : (xP == 1) ? 1 : 0;
    else
      sig = 2;
    if (cidx == 0) {
      if ((xC >> 2) | (yC >> 2)) sig += 3;
      sig += (log2 == 3) ? (scan_idx == 0 ? 9 : 15) : 21;
    } else {
      sig += (log2 == 3) ? 9 : 12;
    }
  }
  return sig + (cidx ? 27 : 0);
}

// Decodes one residual block into coeffs[size*size] (raster, zeroed by
// caller).  `mode` is the intra pred mode (scan selection).
bool residual_coding(Ctx& c, Cabac& cb, HevcContexts& cx, int log2, int cidx,
                     int mode, int16_t* coeffs) {
  // scan selection (7.4.9.11)
  int scan_idx = 0;
  if (log2 == 2 || (log2 == 3 && cidx == 0)) {
    if (mode >= 6 && mode <= 14)
      scan_idx = 2;
    else if (mode >= 22 && mode <= 30)
      scan_idx = 1;
  }

  // last significant coefficient position (9.3.4.2.3)
  int cmax = (log2 << 1) - 1;
  int off, shift;
  if (cidx == 0) {
    off = 3 * (log2 - 2) + ((log2 - 1) >> 2);
    shift = (log2 + 1) >> 2;
  } else {
    off = 15;
    shift = log2 - 2;
  }
  int px = 0, py = 0;
  while (px < cmax && DEC(cb, cx, CTX_LAST_X + off + (px >> shift))) px++;
  while (py < cmax && DEC(cb, cx, CTX_LAST_Y + off + (py >> shift))) py++;
  int last_x = px, last_y = py;
  if (px > 3) {
    int nb = (px >> 1) - 1;
    last_x = ((2 + (px & 1)) << nb) + (int)bypass_bits(cb, nb);
  }
  if (py > 3) {
    int nb = (py >> 1) - 1;
    last_y = ((2 + (py & 1)) << nb) + (int)bypass_bits(cb, nb);
  }
  if (scan_idx == 2) {
    int t = last_x;
    last_x = last_y;
    last_y = t;
  }
  HTRACE("    RC log2=%d c%d scan=%d last=(%d,%d)\n", log2, cidx, scan_idx,
         last_x, last_y);
  int size = 1 << log2;
  if (last_x >= size || last_y >= size) {
    c.err = "last coeff out of block";
    return false;
  }

  const uint8_t* csc = kScans.coef[scan_idx];
  const uint8_t* sbs = log2 > 2 ? kScans.sb[scan_idx][log2 - 3] : nullptr;
  int n_sb = 1 << (2 * (log2 - 2));
  int sb_w = 1 << (log2 - 2);

  // locate (lastSubBlock, lastScanPos)
  int last_sb = 0, last_pos = 0;
  {
    int sx = last_x >> 2, sy = last_y >> 2;
    if (log2 > 2) {
      for (int i = 0; i < n_sb; i++)
        if ((sbs[i] & 15) == sx && (sbs[i] >> 4) == sy) {
          last_sb = i;
          break;
        }
    }
    int ix = last_x & 3, iy = last_y & 3;
    for (int i = 0; i < 16; i++)
      if ((csc[i] & 15) == ix && (csc[i] >> 4) == iy) {
        last_pos = i;
        break;
      }
  }

  memset(c.csbf, 0, sizeof(c.csbf));
  int prev_gt1_ctx = -1;  // -1 = first processed subset

  for (int i = last_sb; i >= 0; i--) {
    int xS = log2 > 2 ? (sbs[i] & 15) : 0;
    int yS = log2 > 2 ? (sbs[i] >> 4) : 0;
    int csbf_right = (xS + 1 < sb_w) ? c.csbf[yS * sb_w + xS + 1] : 0;
    int csbf_below = (yS + 1 < sb_w) ? c.csbf[(yS + 1) * sb_w + xS] : 0;
    int infer_dc = 0;
    int csbf = 1;
    if (i < last_sb && i > 0) {
      int inc = ((csbf_right | csbf_below) ? 1 : 0) + (cidx ? 2 : 0);
      csbf = DEC(cb, cx, CTX_SIG_GROUP + inc);
      infer_dc = 1;
    }
    c.csbf[yS * sb_w + xS] = (uint8_t)csbf;
    HTRACE("      sb %d (%d,%d) csbf=%d (r%d b%d)\n", i, xS, yS, csbf,
           csbf_right, csbf_below);
    if (!csbf) continue;

    // significance map (reverse scan within the subblock)
    int pos[16], n_sig = 0;
    int start = (i == last_sb) ? last_pos - 1 : 15;
    if (i == last_sb) pos[n_sig++] = last_pos;
    for (int n = start; n >= 0; n--) {
      if (n > 0 || !infer_dc) {
        int xC = (xS << 2) | (csc[n] & 15);
        int yC = (yS << 2) | (csc[n] >> 4);
        int inc = sig_ctx_inc(log2, cidx, xC, yC, scan_idx, csbf_right,
                              csbf_below);
        if (DEC(cb, cx, CTX_SIG_FLAG + inc)) {
          pos[n_sig++] = n;
          infer_dc = 0;
        }
      } else {
        // inferred DC significance (n == 0, no sig decoded in subblock)
        pos[n_sig++] = n;
      }
    }
    if (trace_on()) {
      fprintf(stderr, "        sig n=%d pos:", n_sig);
      for (int k = 0; k < n_sig; k++) fprintf(stderr, " %d", pos[k]);
      fprintf(stderr, "\n");
    }
    if (n_sig == 0) continue;

    // greater1 / greater2 (9.3.4.2.6)
    int ctx_set = (i > 0 && cidx == 0) ? 2 : 0;
    if (prev_gt1_ctx == 0) ctx_set++;
    int gt1_ctx = 1;
    uint8_t gt1[16] = {0};
    int first_gt1 = -1;
    int n_flags = n_sig < 8 ? n_sig : 8;
    for (int k = 0; k < n_flags; k++) {
      int inc = ctx_set * 4 + (gt1_ctx < 3 ? gt1_ctx : 3) + (cidx ? 16 : 0);
      gt1[k] = (uint8_t)DEC(cb, cx, CTX_GT1 + inc);
      if (gt1[k]) {
        gt1_ctx = 0;
        if (first_gt1 < 0) first_gt1 = k;
      } else if (gt1_ctx > 0) {
        gt1_ctx++;
      }
    }
    prev_gt1_ctx = gt1_ctx;
    int gt2 = 0;
    if (first_gt1 >= 0)
      gt2 = DEC(cb, cx, CTX_GT2 + ctx_set + (cidx ? 4 : 0));

    // signs, then remaining levels.  Sign data hiding (9.3.3.1.3): when
    // enabled and the subblock's sig span is wide enough, the sign of the
    // FIRST coefficient in scan order (= last processed here, pos[n_sig-1])
    // is not coded; it is inferred from the parity of the subblock's
    // absolute-level sum.  x265 enables SDH by default, so this path is hot.
    bool sign_hidden = c.pps.sign_data_hiding && n_sig > 1 &&
                       (pos[0] - pos[n_sig - 1] > 3);
    int n_coded = n_sig - (sign_hidden ? 1 : 0);
    uint32_t signs = bypass_bits(cb, n_coded);
    int rice = 0, last_abs = 0;
    bool rice_used = false;
    int levels[16];
    int sum_abs = 0;
    for (int k = 0; k < n_sig; k++) {
      int base = 1 + (k < 8 ? gt1[k] : 0) + (k == first_gt1 ? gt2 : 0);
      int thresh = k < 8 ? ((k == first_gt1) ? 3 : 2) : 1;
      int level = base;
      if (base == thresh) {
        if (rice_used)
          rice = (rice < 4 && last_abs > (3 << rice)) ? rice + 1 : rice;
        int rem = decode_remaining(cb, rice, c.err);
        if (rem < 0) return false;
        level = base + rem;
        last_abs = level;
        rice_used = true;
      }
      levels[k] = level;
      sum_abs += level;
    }
    for (int k = 0; k < n_sig; k++) {
      int neg = (sign_hidden && k == n_sig - 1)
                    ? (sum_abs & 1)
                    : (int)((signs >> (n_coded - 1 - k)) & 1);
      int n = pos[k];
      int xC = (xS << 2) | (csc[n] & 15);
      int yC = (yS << 2) | (csc[n] >> 4);
      int16_t v = (int16_t)(neg ? -levels[k] : levels[k]);
      HTRACE("        lvl[%d] pos=%d (%d,%d) = %d\n", k, n, xC, yC, v);
      coeffs[yC * size + xC] = v;
    }
  }
  if (cb.error()) c.err = "CABAC overrun (residual)";
  return !cb.error();
}

// ---- inter prediction parameter derivation (8.5.3) ------------------------

// pred_weight_table (7.3.6.3)
bool parse_pred_weight_table(Ctx& c, BitReader& br, HevcSliceHeader& sh) {
  sh.has_wp = true;
  sh.luma_log2_denom = (int)br.ue();
  if (sh.luma_log2_denom > 7) {
    c.err = "bad luma weight denom";
    return false;
  }
  sh.chroma_log2_denom = sh.luma_log2_denom + (int)br.se();
  if (sh.chroma_log2_denom < 0 || sh.chroma_log2_denom > 7) {
    c.err = "bad chroma weight denom";
    return false;
  }
  int n_lists = sh.slice_type == 0 ? 2 : 1;
  for (int l = 0; l < n_lists; l++) {
    int n = sh.num_ref[l];
    uint8_t lf[16] = {0}, cf[16] = {0};
    for (int i = 0; i < n; i++) lf[i] = (uint8_t)br.u1();
    for (int i = 0; i < n; i++) cf[i] = (uint8_t)br.u1();
    for (int i = 0; i < n; i++) {
      WpEntry& w = sh.wp[l][i];
      w.has_luma = lf[i];
      w.has_chroma = cf[i];
      w.lw = (int16_t)(1 << sh.luma_log2_denom);
      w.lo = 0;
      w.cw[0] = w.cw[1] = (int16_t)(1 << sh.chroma_log2_denom);
      w.co[0] = w.co[1] = 0;
      if (lf[i]) {
        w.lw = (int16_t)((1 << sh.luma_log2_denom) + (int)br.se());
        w.lo = (int16_t)br.se();
      }
      if (cf[i]) {
        for (int j = 0; j < 2; j++) {
          int dw = (int)br.se();
          int doff = (int)br.se();
          int cw = (1 << sh.chroma_log2_denom) + dw;
          w.cw[j] = (int16_t)cw;
          w.co[j] = (int16_t)clip3(
              -128, 127, 128 + doff - ((128 * cw) >> sh.chroma_log2_denom));
        }
      }
    }
  }
  return !br.error();
}

// PicOrderCntVal (8.3.1).  tid = nuh_temporal_id (0 in x265 defaults).
void derive_poc(Ctx& c, int nal_type, int tid, int poc_lsb) {
  const int max_lsb = 1 << c.sps.log2_max_poc_lsb;
  if (nal_type >= 16 && nal_type <= 23) {
    // IRAP with NoRaslOutputFlag (span start / IDR): msb = 0.  IDR has
    // no poc_lsb (0); CRA keeps its lsb.
    if (nal_type == 19 || nal_type == 20) {
      c.poc_val = 0;
    } else {
      // CRA/BLA mid-span: normal derivation (x265 open-GOP CRAs are
      // NoRaslOutputFlag=0 when decoded in sequence)
      int prev_lsb = c.prev_tid0_poc & (max_lsb - 1);
      int prev_msb = c.prev_tid0_poc - prev_lsb;
      int msb = prev_msb;
      if (poc_lsb < prev_lsb && prev_lsb - poc_lsb >= max_lsb / 2)
        msb = prev_msb + max_lsb;
      else if (poc_lsb > prev_lsb && poc_lsb - prev_lsb > max_lsb / 2)
        msb = prev_msb - max_lsb;
      c.poc_val = msb + poc_lsb;
    }
  } else {
    int prev_lsb = c.prev_tid0_poc & (max_lsb - 1);
    int prev_msb = c.prev_tid0_poc - prev_lsb;
    int msb = prev_msb;
    if (poc_lsb < prev_lsb && prev_lsb - poc_lsb >= max_lsb / 2)
      msb = prev_msb + max_lsb;
    else if (poc_lsb > prev_lsb && poc_lsb - prev_lsb > max_lsb / 2)
      msb = prev_msb - max_lsb;
    c.poc_val = msb + poc_lsb;
  }
  // prevTid0Pic: TemporalId == 0, not RASL/RADL (6..9), not a
  // sub-layer non-reference picture (even nal types 0..14)
  bool slnr = nal_type <= 14 && (nal_type % 2 == 0);
  bool rasl_radl = nal_type >= 6 && nal_type <= 9;
  if (tid == 0 && !slnr && !rasl_radl) c.prev_tid0_poc = c.poc_val;
}

// Apply the slice RPS: evict stale DPB entries, build RefPicList0/1
// (8.3.2 + 8.3.4).  Returns false when a USED reference is missing
// (caller decides: error, or RASL skip).
bool build_ref_lists(Ctx& c, bool* missing_ref) {
  const HevcSliceHeader& sh = c.sh;
  *missing_ref = false;
  // retention: any picture named by the RPS (used or follow) stays
  std::vector<Ctx::Pic> kept;
  for (auto& p : c.dpb) {
    bool keep = false;
    for (int i = 0; i < sh.rps.n_neg + sh.rps.n_pos; i++)
      if (p.poc == c.poc_val + sh.rps.delta_poc[i]) keep = true;
    if (keep) kept.push_back(std::move(p));
  }
  c.dpb.swap(kept);
  auto find_poc = [&](int32_t poc) {
    for (int i = 0; i < (int)c.dpb.size(); i++)
      if (c.dpb[i].poc == poc) return i;
    return -1;
  };
  // PocStCurrBefore (negatives, closest first) / After
  int before[16], after[16];
  int nb = 0, na = 0;
  for (int i = 0; i < sh.rps.n_neg; i++) {
    if (!sh.rps.used[i]) continue;
    int d = find_poc(c.poc_val + sh.rps.delta_poc[i]);
    if (d < 0) {
      *missing_ref = true;
      return false;
    }
    before[nb++] = d;
  }
  for (int i = 0; i < sh.rps.n_pos; i++) {
    if (!sh.rps.used[sh.rps.n_neg + i]) continue;
    int d = find_poc(c.poc_val + sh.rps.delta_poc[sh.rps.n_neg + i]);
    if (d < 0) {
      *missing_ref = true;
      return false;
    }
    after[na++] = d;
  }
  c.n_ref[0] = c.n_ref[1] = 0;
  if (sh.slice_type == 2) return true;
  int total = nb + na;
  if (total == 0) {
    c.err = "P/B slice with empty RPS";
    return false;
  }
  // RefPicListTemp cycling (8.3.4)
  for (int r = 0; r < sh.num_ref[0]; r++) {
    int i = r % total;
    int d = i < nb ? before[i] : after[i - nb];
    c.ref_dpb[0][r] = d;
    c.ref_pocs[0][r] = c.dpb[d].poc;
    c.n_ref[0] = r + 1;
  }
  for (int r = 0; r < sh.num_ref[1]; r++) {
    int i = r % total;
    int d = i < na ? after[i] : before[i - na];
    c.ref_dpb[1][r] = d;
    c.ref_pocs[1][r] = c.dpb[d].poc;
    c.n_ref[1] = r + 1;
  }
  c.no_backward = true;
  for (int l = 0; l < 2; l++)
    for (int r = 0; r < c.n_ref[l]; r++)
      if (c.ref_pocs[l][r] > c.poc_val) c.no_backward = false;
  return true;
}

struct PuMotion {
  int16_t mv[2][2] = {{0, 0}, {0, 0}};
  int8_t refidx[2] = {-1, -1};
  uint8_t pf = 0;
};

bool same_motion(const PuMotion& a, const PuMotion& b) {
  if (a.pf != b.pf) return false;
  for (int l = 0; l < 2; l++) {
    if (!((a.pf >> l) & 1)) continue;
    if (a.refidx[l] != b.refidx[l] || a.mv[l][0] != b.mv[l][0] ||
        a.mv[l][1] != b.mv[l][1])
      return false;
  }
  return true;
}

// Motion of the decoded 4x4 block at luma position (xN, yN); pf == 0
// means unavailable (outside, not yet decoded, or intra).
//
// Availability (6.4.2) falls out of the dec4 marking discipline: PU
// areas are marked as each PU's parameters are derived, CU areas at CU
// parse end — so dec4 is exactly "z-scan decoded" for neighbors outside
// the current CU and "earlier PU of this CU" (the sameCb branch, which
// BYPASSES the z-scan order: PU0 of an Nx2N CU is available to PU1
// even though its lower blocks follow in z-order) for neighbors inside.
Ctx::MvInfo nb_motion(const Ctx& c, int xN, int yN) {
  Ctx::MvInfo none;
  if (xN < 0 || yN < 0 || xN >= c.sps.width || yN >= c.sps.height)
    return none;
  int i = (yN >> 2) * c.w4 + (xN >> 2);
  if (!c.dec4[i]) return none;
  return c.mvf[i];
}

void scale_mv(int16_t* mv, int tb, int td) {
  td = clip3(-128, 127, td);
  tb = clip3(-128, 127, tb);
  int tx = (16384 + (abs(td) >> 1)) / td;
  int dsf = clip3(-4096, 4095, (tb * tx + 32) >> 6);
  for (int k = 0; k < 2; k++) {
    int v = dsf * mv[k];
    mv[k] = (int16_t)clip3(-32768, 32767,
                           (v >= 0 ? 1 : -1) * ((abs(v) + 127) >> 8));
  }
}

// Temporal MV prediction (8.5.3.2.8/9) for target (list X, refIdx).
bool tmvp_mv(const Ctx& c, int xPb, int yPb, int nW, int nH, int X,
             int refidx, int16_t* out) {
  if (!c.sh.tmvp) return false;
  int cl = c.sh.col_from_l0 ? 0 : 1;
  if (c.sh.col_ref_idx >= c.n_ref[cl]) return false;
  const Ctx::Pic& col = c.dpb[c.ref_dpb[cl][c.sh.col_ref_idx]];
  if (col.col.empty()) return false;
  auto fetch = [&](int xC, int yC) -> bool {
    if (xC < 0 || yC < 0 || xC >= c.sps.width || yC >= c.sps.height)
      return false;
    const Ctx::ColMv& cm = col.col[(yC >> 4) * col.w16 + (xC >> 4)];
    if (!cm.pf) return false;
    int src;
    if (cm.pf == 1)
      src = 0;
    else if (cm.pf == 2)
      src = 1;
    else
      src = c.no_backward ? X : (c.sh.col_from_l0 ? 1 : 0);
    int td = col.poc - cm.refpoc[src];
    int tb = c.poc_val - c.ref_pocs[X][refidx];
    out[0] = cm.mv[src][0];
    out[1] = cm.mv[src][1];
    if (td != tb) scale_mv(out, tb, td);
    return true;
  };
  int xBr = xPb + nW, yBr = yPb + nH;
  if ((yPb >> c.sps.log2_ctb) == (yBr >> c.sps.log2_ctb)) {
    if (fetch(xBr, yBr)) return true;
  }
  return fetch(xPb + (nW >> 1), yPb + (nH >> 1));
}

// Merge candidate list (8.5.3.2.3).  part_mode: 0=2Nx2N 1=2NxN 2=Nx2N
// 3=NxN 4=2NxnU 5=2NxnD 6=nLx2N 7=nRx2N.  Fills exactly max_merge
// candidates.
void merge_candidates(const Ctx& c, int xCb, int yCb, int cbSize, int xPb,
                      int yPb, int nW, int nH, int part_mode, int part_idx,
                      PuMotion* cands) {
  if (c.pps.log2_parallel_merge_level > 2 && cbSize == 8) {
    // singleMCLFlag: all PUs of an 8x8 CU share the 2Nx2N candidates
    xPb = xCb;
    yPb = yCb;
    nW = nH = 8;
    part_idx = 0;
    part_mode = 0;
  }
  int pl = c.pps.log2_parallel_merge_level;
  auto same_region = [&](int xN, int yN) {
    return (xPb >> pl) == (xN >> pl) && (yPb >> pl) == (yN >> pl);
  };
  auto to_pu = [](const Ctx::MvInfo& m) {
    PuMotion p;
    p.pf = m.pf;
    for (int l = 0; l < 2; l++) {
      p.refidx[l] = m.refidx[l];
      p.mv[l][0] = m.mv[l][0];
      p.mv[l][1] = m.mv[l][1];
    }
    return p;
  };
  int n = 0;
  // Block-level availability of A1/B1 (exclusions + MER + intra)
  // gates the pruning comparisons of later candidates even when the
  // block itself was NOT added to the list (8.5.3.2.3).
  PuMotion a1, b1;
  bool a1_avail = false, b1_avail = false;
  if (!(part_idx == 1 &&
        (part_mode == 2 || part_mode == 6 || part_mode == 7))) {
    auto m = nb_motion(c, xPb - 1, yPb + nH - 1);
    if (m.pf && !same_region(xPb - 1, yPb + nH - 1)) {
      a1_avail = true;
      a1 = to_pu(m);
      cands[n++] = a1;
    }
  }
  if (!(part_idx == 1 &&
        (part_mode == 1 || part_mode == 4 || part_mode == 5))) {
    auto m = nb_motion(c, xPb + nW - 1, yPb - 1);
    if (m.pf && !same_region(xPb + nW - 1, yPb - 1)) {
      b1_avail = true;
      b1 = to_pu(m);
      if (!a1_avail || !same_motion(a1, b1)) cands[n++] = b1;
    }
  }
  // B0 (pruned against the B1 BLOCK when it is available)
  {
    auto m = nb_motion(c, xPb + nW, yPb - 1);
    if (m.pf && !same_region(xPb + nW, yPb - 1)) {
      PuMotion b0 = to_pu(m);
      if (!b1_avail || !same_motion(b1, b0)) cands[n++] = b0;
    }
  }
  // A0 (pruned against the A1 block)
  {
    auto m = nb_motion(c, xPb - 1, yPb + nH);
    if (m.pf && !same_region(xPb - 1, yPb + nH)) {
      PuMotion a0 = to_pu(m);
      if (!a1_avail || !same_motion(a1, a0)) cands[n++] = a0;
    }
  }
  // B2 (only when fewer than 4 so far; pruned against A1 and B1 blocks)
  if (n < 4) {
    auto m = nb_motion(c, xPb - 1, yPb - 1);
    if (m.pf && !same_region(xPb - 1, yPb - 1)) {
      PuMotion b2 = to_pu(m);
      if ((!a1_avail || !same_motion(a1, b2)) &&
          (!b1_avail || !same_motion(b1, b2)))
        cands[n++] = b2;
    }
  }
  bool is_b = c.sh.slice_type == 0;
  // temporal candidate (refIdx 0)
  if (n < c.sh.max_merge && c.sh.tmvp) {
    PuMotion t;
    int16_t mv[2];
    if (tmvp_mv(c, xPb, yPb, nW, nH, 0, 0, mv)) {
      t.pf |= 1;
      t.refidx[0] = 0;
      t.mv[0][0] = mv[0];
      t.mv[0][1] = mv[1];
    }
    if (is_b && tmvp_mv(c, xPb, yPb, nW, nH, 1, 0, mv)) {
      t.pf |= 2;
      t.refidx[1] = 0;
      t.mv[1][0] = mv[0];
      t.mv[1][1] = mv[1];
    }
    if (t.pf) cands[n++] = t;
  }
  // combined bi-predictive candidates (B slices)
  if (is_b && n > 1 && n < c.sh.max_merge) {
    static const int l0i[12] = {0, 1, 0, 2, 1, 2, 0, 3, 1, 3, 2, 3};
    static const int l1i[12] = {1, 0, 2, 0, 2, 1, 3, 0, 3, 1, 3, 2};
    int orig = n;
    int total = orig * (orig - 1);
    for (int k = 0; k < total && k < 12 && n < c.sh.max_merge; k++) {
      const PuMotion& c0 = cands[l0i[k]];
      const PuMotion& c1 = cands[l1i[k]];
      if ((c0.pf & 1) && (c1.pf & 2)) {
        int32_t p0 = c.ref_pocs[0][c0.refidx[0]];
        int32_t p1 = c.ref_pocs[1][c1.refidx[1]];
        if (p0 != p1 || c0.mv[0][0] != c1.mv[1][0] ||
            c0.mv[0][1] != c1.mv[1][1]) {
          PuMotion m;
          m.pf = 3;
          m.refidx[0] = c0.refidx[0];
          m.mv[0][0] = c0.mv[0][0];
          m.mv[0][1] = c0.mv[0][1];
          m.refidx[1] = c1.refidx[1];
          m.mv[1][0] = c1.mv[1][0];
          m.mv[1][1] = c1.mv[1][1];
          cands[n++] = m;
        }
      }
    }
  }
  // zero candidates
  int nri = is_b ? (c.n_ref[0] < c.n_ref[1] ? c.n_ref[0] : c.n_ref[1])
                 : c.n_ref[0];
  int zi = 0;
  while (n < c.sh.max_merge) {
    PuMotion m;
    m.pf = is_b ? 3 : 1;
    m.refidx[0] = (int8_t)(zi < nri ? zi : 0);
    if (is_b) m.refidx[1] = m.refidx[0];
    cands[n++] = m;
    zi++;
  }
  if (trace_on()) {
    fprintf(stderr, "  mrg a1=%d b1=%d n_spatial(+t)=%d\n", (int)a1_avail,
            (int)b1_avail, n);
    for (int k = 0; k < n; k++)
      fprintf(stderr, "  mrg[%d] pf=%d r=%d/%d mv0=(%d,%d) mv1=(%d,%d)\n",
              k, cands[k].pf, cands[k].refidx[0], cands[k].refidx[1],
              cands[k].mv[0][0], cands[k].mv[0][1], cands[k].mv[1][0],
              cands[k].mv[1][1]);
  }
}

// AMVP predictor (8.5.3.2.6/7) for (list X, refIdx); returns the
// predictor selected by mvp_flag.
void amvp_mv(const Ctx& c, int xPb, int yPb, int nW, int nH, int X,
             int refidx, int mvp_flag, int16_t* out) {
  int32_t target_poc = c.ref_pocs[X][refidx];
  Ctx::MvInfo nbs[5];
  nbs[0] = nb_motion(c, xPb - 1, yPb + nH);      // A0
  nbs[1] = nb_motion(c, xPb - 1, yPb + nH - 1);  // A1
  nbs[2] = nb_motion(c, xPb + nW, yPb - 1);      // B0
  nbs[3] = nb_motion(c, xPb + nW - 1, yPb - 1);  // B1
  nbs[4] = nb_motion(c, xPb - 1, yPb - 1);       // B2
  auto try_same = [&](const Ctx::MvInfo& m, int16_t* mv) -> bool {
    if (!m.pf) return false;
    for (int t = 0; t < 2; t++) {
      int l = t == 0 ? X : 1 - X;
      if (((m.pf >> l) & 1) && c.ref_pocs[l][m.refidx[l]] == target_poc) {
        mv[0] = m.mv[l][0];
        mv[1] = m.mv[l][1];
        return true;
      }
    }
    return false;
  };
  auto try_scaled = [&](const Ctx::MvInfo& m, int16_t* mv) -> bool {
    if (!m.pf) return false;
    for (int t = 0; t < 2; t++) {
      int l = t == 0 ? X : 1 - X;
      if ((m.pf >> l) & 1) {
        mv[0] = m.mv[l][0];
        mv[1] = m.mv[l][1];
        int td = c.poc_val - c.ref_pocs[l][m.refidx[l]];
        int tb = c.poc_val - target_poc;
        if (td != tb) scale_mv(mv, tb, td);
        return true;
      }
    }
    return false;
  };
  int16_t mvA[2] = {0, 0}, mvB[2] = {0, 0};
  bool availA = false, availB = false;
  bool is_scaled = nbs[0].pf != 0 || nbs[1].pf != 0;
  for (int i = 0; i < 2 && !availA; i++) availA = try_same(nbs[i], mvA);
  for (int i = 0; i < 2 && !availA; i++) availA = try_scaled(nbs[i], mvA);
  for (int i = 2; i < 5 && !availB; i++) availB = try_same(nbs[i], mvB);
  if (!is_scaled) {
    // no left neighbors: B's unscaled value becomes A, and B re-derives
    // with scaling allowed
    availA = availB;
    mvA[0] = mvB[0];
    mvA[1] = mvB[1];
    availB = false;
    for (int i = 2; i < 5 && !availB; i++) availB = try_scaled(nbs[i], mvB);
  }
  int16_t list[3][2];
  int n = 0;
  if (availA) {
    list[n][0] = mvA[0];
    list[n][1] = mvA[1];
    n++;
  }
  if (availB && (!availA || mvA[0] != mvB[0] || mvA[1] != mvB[1])) {
    list[n][0] = mvB[0];
    list[n][1] = mvB[1];
    n++;
  }
  if (n < 2) {
    int16_t mv[2];
    if (tmvp_mv(c, xPb, yPb, nW, nH, X, refidx, mv)) {
      list[n][0] = mv[0];
      list[n][1] = mv[1];
      n++;
    }
  }
  while (n < 2) {
    list[n][0] = 0;
    list[n][1] = 0;
    n++;
  }
  out[0] = list[mvp_flag][0];
  out[1] = list[mvp_flag][1];
}

// mvd_coding (7.3.8.9): greater0/1 flags, EG1 remainder, sign.
bool mvd_coding(Ctx& c, Cabac& cb, HevcContexts& cx, int16_t* out) {
  int g0[2], g1[2] = {0, 0};
  g0[0] = DEC(cb, cx, CTX_MVD_GREATER0);
  g0[1] = DEC(cb, cx, CTX_MVD_GREATER0);
  if (g0[0]) g1[0] = DEC(cb, cx, CTX_MVD_GREATER1);
  if (g0[1]) g1[1] = DEC(cb, cx, CTX_MVD_GREATER1);
  for (int i = 0; i < 2; i++) {
    int v = g0[i];
    if (g0[i]) {
      if (g1[i]) {
        int val = 2, k = 1;
        while (k < 24 && BYP(cb)) {
          val += 1 << k;
          k++;
        }
        val += (int)bypass_bits(cb, k);
        v = val;
      }
      if (BYP(cb)) v = -v;
    }
    out[i] = (int16_t)v;
    if (v < -32768 || v > 32767) {
      c.err = "mvd overflow";
      return false;
    }
  }
  return !cb.error();
}

// Store a PU's motion over its area and emit the PU record.
bool emit_pu(Ctx& c, int xPb, int yPb, int nW, int nH, const PuMotion& pu) {
  Ctx::MvInfo m;
  m.pf = pu.pf;
  for (int l = 0; l < 2; l++) {
    m.refidx[l] = pu.refidx[l];
    m.mv[l][0] = pu.mv[l][0];
    m.mv[l][1] = pu.mv[l][1];
  }
  int bx0 = xPb >> 2, by0 = yPb >> 2;
  int bw = nW >> 2, bh = nH >> 2;
  for (int by = 0; by < bh; by++)
    for (int bx = 0; bx < bw; bx++) {
      int i = (by0 + by) * c.w4 + bx0 + bx;
      c.mvf[i] = m;
      c.dec4[i] = 1;
      // PU left/top boundary bits (deblock)
      uint8_t b = 0;
      if (bx == 0) b |= 1;
      if (by == 0) b |= 2;
      c.pub4[i] |= b;
    }
  HevcOut* o = c.out;
  if (!o->n_pu) {
    c.err = "inter output buffers missing";
    return false;
  }
  if (o->used_pu >= o->cap_pu) {
    c.err = "PU capacity exceeded";
    return false;
  }
  int64_t i = o->used_pu++;
  o->pu_x[i] = (uint16_t)xPb;
  o->pu_y[i] = (uint16_t)yPb;
  o->pu_w[i] = (uint8_t)nW;
  o->pu_h[i] = (uint8_t)nH;
  o->pu_flags[i] = pu.pf;
  const HevcSliceHeader& sh = c.sh;
  bool wp_on = sh.has_wp;
  o->pu_ref0[i] = 0;
  o->pu_ref1[i] = 0;
  o->pu_wp0[i] = 255;
  o->pu_wp1[i] = 255;
  // pu_ref* are uint8 span decode indices: a reference past sample 255
  // would silently wrap and feed the wrong frame's pixels into MC.
  // Spans that long (keyint > 256) must take the SOFTWARE fallback.
  if (pu.pf & 1) {
    int span_idx = c.dpb[c.ref_dpb[0][pu.refidx[0]]].span_idx;
    if (span_idx > 255) {
      c.err = "inter reference span index exceeds 255 (span too long)";
      return false;
    }
    o->pu_ref0[i] = (uint8_t)span_idx;
    if (wp_on) o->pu_wp0[i] = (uint8_t)(0 * 16 + pu.refidx[0]);
  }
  if (pu.pf & 2) {
    int span_idx = c.dpb[c.ref_dpb[1][pu.refidx[1]]].span_idx;
    if (span_idx > 255) {
      c.err = "inter reference span index exceeds 255 (span too long)";
      return false;
    }
    o->pu_ref1[i] = (uint8_t)span_idx;
    if (wp_on) o->pu_wp1[i] = (uint8_t)(16 + pu.refidx[1]);
  }
  o->pu_mv[i * 4 + 0] = pu.mv[0][0];
  o->pu_mv[i * 4 + 1] = pu.mv[0][1];
  o->pu_mv[i * 4 + 2] = pu.mv[1][0];
  o->pu_mv[i * 4 + 3] = pu.mv[1][1];
  HTRACE("  PU (%d,%d) %dx%d pf=%d ref=%d/%d mv0=(%d,%d) mv1=(%d,%d)\n",
         xPb, yPb, nW, nH, pu.pf, pu.refidx[0], pu.refidx[1], pu.mv[0][0],
         pu.mv[0][1], pu.mv[1][0], pu.mv[1][1]);
  return true;
}

// ---- intra mode prediction (8.4.2) ----------------------------------------

int ipm_at(const Ctx& c, int x, int y) {
  return c.ipm[(y >> 2) * c.w4 + (x >> 2)];
}

int derive_luma_mode(Ctx& c, int xPb, int yPb, int prev_flag, int idx_or_rem) {
  // candA: left; candB: above (unavailable / other CTB row -> DC)
  int candA = 1, candB = 1;  // INTRA_DC
  if (xPb > 0) {
    int m = ipm_at(c, xPb - 1, yPb);
    if (m >= 0) candA = m;
  }
  if (yPb > 0 && (yPb & ((1 << c.sps.log2_ctb) - 1)) != 0) {
    int m = ipm_at(c, xPb, yPb - 1);
    if (m >= 0) candB = m;
  }
  int cand[3];
  if (candA == candB) {
    if (candA < 2) {
      cand[0] = 0;
      cand[1] = 1;
      cand[2] = 26;
    } else {
      cand[0] = candA;
      cand[1] = 2 + ((candA + 29) % 32);
      cand[2] = 2 + ((candA - 2 + 1) % 32);
    }
  } else {
    cand[0] = candA;
    cand[1] = candB;
    cand[2] = (candA != 0 && candB != 0) ? 0
              : ((candA != 1 && candB != 1) ? 1 : 26);
  }
  if (prev_flag) return cand[idx_or_rem];
  // rem_intra_luma_pred_mode: skip over sorted candidates
  int a = cand[0], b = cand[1], d = cand[2];
  if (a > b) std::swap(a, b);
  if (a > d) std::swap(a, d);
  if (b > d) std::swap(b, d);
  int mode = idx_or_rem;
  if (mode >= a) mode++;
  if (mode >= b) mode++;
  if (mode >= d) mode++;
  return mode;
}

// ---- coding unit / transform tree -----------------------------------------

struct CuState {
  int part_nxn = 0;
  int luma_mode[4] = {1, 1, 1, 1};
  int chroma_mode = 1;
  int x0 = 0, y0 = 0, log2 = 0;
  bool inter = false;
  int part_mode = 0;  // 0=2Nx2N 1=2NxN 2=Nx2N 3=NxN 4..7=AMP
};

bool transform_tree(Ctx& c, Cabac& cb, HevcContexts& cx, CuState& cu, int x0,
                    int y0, int xBase, int yBase, int log2, int depth,
                    int blk_idx, int cbf_cb, int cbf_cr);

bool transform_unit(Ctx& c, Cabac& cb, HevcContexts& cx, CuState& cu, int x0,
                    int y0, int xBase, int yBase, int log2, int blk_idx,
                    int cbf_luma, int cbf_cb, int cbf_cr) {
  const HevcPPS& pps = c.pps;
  if ((cbf_luma || cbf_cb || cbf_cr) && pps.cu_qp_delta_enabled &&
      !c.is_qp_coded) {
    // cu_qp_delta_abs (9.3.3.10): TR prefix cMax 5 + EG0 suffix
    int v = 0;
    if (DEC(cb, cx, CTX_CU_QP_DELTA + 0)) {
      v = 1;
      while (v < 5 && DEC(cb, cx, CTX_CU_QP_DELTA + 1)) v++;
      if (v == 5) {
        int k = 0;
        while (k < 24 && BYP(cb)) k++;
        v = 5 + (int)bypass_bits(cb, k) + (1 << k) - 1;
      }
    }
    int sign = v ? (int)BYP(cb) : 0;
    c.qp_delta = sign ? -v : v;
    c.is_qp_coded = true;
  }
  c.qpy_cur = ((c.qpy_pred + c.qp_delta + 52) % 52);

  // mode covering this TU (for scan selection + recon); inter TUs get
  // the 255 marker (no intra prediction, diagonal scan)
  int lmode, cmode;
  if (cu.inter) {
    lmode = cmode = 255;
  } else {
    int pu = 0;
    if (cu.part_nxn) {
      int half = 1 << (cu.log2 - 1);
      pu = ((y0 - cu.y0) >= half ? 2 : 0) + ((x0 - cu.x0) >= half ? 1 : 0);
    }
    lmode = cu.luma_mode[pu];
    cmode = cu.chroma_mode;
  }
  // deblock bookkeeping: TU left/top boundary bits + luma cbf per 4x4
  {
    int bx0 = x0 >> 2, by0 = y0 >> 2, nb = 1 << (log2 - 2);
    for (int dy = 0; dy < nb; dy++)
      for (int dx = 0; dx < nb; dx++) {
        int i = (by0 + dy) * c.w4 + bx0 + dx;
        uint8_t b = 0;
        if (dx == 0) b |= 1;
        if (dy == 0) b |= 2;
        c.tub4[i] |= b;
        c.cbfy4[i] = (uint8_t)(cbf_luma != 0);
      }
  }

  int size = 1 << log2;
  static thread_local std::vector<int16_t> buf;
  buf.assign((size_t)size * size, 0);
  if (cbf_luma &&
      !residual_coding(c, cb, cx, log2, 0, lmode, buf.data()))
    return false;
  if (!emit_tu(c, x0, y0, log2, 0, lmode, c.qpy_cur, cbf_luma, buf.data()))
    return false;

  int qp_cb = chroma_qp(c.qpy_cur, pps.cb_qp_offset + c.sh.cb_qp_offset);
  int qp_cr = chroma_qp(c.qpy_cur, pps.cr_qp_offset + c.sh.cr_qp_offset);
  if (log2 > 2) {
    int cl = log2 - 1, cs = 1 << cl;
    buf.assign((size_t)cs * cs, 0);
    if (cbf_cb && !residual_coding(c, cb, cx, cl, 1, cmode, buf.data()))
      return false;
    if (!emit_tu(c, x0 >> 1, y0 >> 1, cl, 1, cmode, qp_cb, cbf_cb,
                 buf.data()))
      return false;
    buf.assign((size_t)cs * cs, 0);
    if (cbf_cr && !residual_coding(c, cb, cx, cl, 2, cmode, buf.data()))
      return false;
    if (!emit_tu(c, x0 >> 1, y0 >> 1, cl, 2, cmode, qp_cr, cbf_cr,
                 buf.data()))
      return false;
  } else if (blk_idx == 3) {
    // 4x4 chroma TU covering the four 4x4 luma TUs at (xBase, yBase)
    buf.assign(16, 0);
    if (cbf_cb && !residual_coding(c, cb, cx, 2, 1, cmode, buf.data()))
      return false;
    if (!emit_tu(c, xBase >> 1, yBase >> 1, 2, 1, cmode, qp_cb, cbf_cb,
                 buf.data()))
      return false;
    buf.assign(16, 0);
    if (cbf_cr && !residual_coding(c, cb, cx, 2, 2, cmode, buf.data()))
      return false;
    if (!emit_tu(c, xBase >> 1, yBase >> 1, 2, 2, cmode, qp_cr, cbf_cr,
                 buf.data()))
      return false;
  }
  return true;
}

bool transform_tree(Ctx& c, Cabac& cb, HevcContexts& cx, CuState& cu, int x0,
                    int y0, int xBase, int yBase, int log2, int depth,
                    int blk_idx, int cbf_cb, int cbf_cr) {
  const HevcSPS& sps = c.sps;
  int max_depth = cu.inter
                      ? sps.max_trafo_depth_inter
                      : sps.max_trafo_depth_intra + (cu.part_nxn ? 1 : 0);
  int intra_split_force = !cu.inter && cu.part_nxn && depth == 0;
  int inter_split_force = cu.inter && sps.max_trafo_depth_inter == 0 &&
                          cu.part_mode != 0 && depth == 0;
  int split;
  if (log2 <= sps.log2_max_tb && log2 > sps.log2_min_tb &&
      depth < max_depth && !intra_split_force) {
    split = DEC(cb, cx, CTX_SPLIT_TRANSFORM + (5 - log2));
  } else {
    split = (log2 > sps.log2_max_tb) || intra_split_force ||
            inter_split_force;
  }
  if (log2 > 2) {
    if (depth == 0 || cbf_cb)
      cbf_cb = DEC(cb, cx, CTX_CBF_CB_CR + depth);
    else
      cbf_cb = 0;
    if (depth == 0 || cbf_cr)
      cbf_cr = DEC(cb, cx, CTX_CBF_CB_CR + depth);
    else
      cbf_cr = 0;
  }
  if (split) {
    int h = 1 << (log2 - 1);
    if (!transform_tree(c, cb, cx, cu, x0, y0, x0, y0, log2 - 1, depth + 1, 0,
                        cbf_cb, cbf_cr))
      return false;
    if (!transform_tree(c, cb, cx, cu, x0 + h, y0, x0, y0, log2 - 1,
                        depth + 1, 1, cbf_cb, cbf_cr))
      return false;
    if (!transform_tree(c, cb, cx, cu, x0, y0 + h, x0, y0, log2 - 1,
                        depth + 1, 2, cbf_cb, cbf_cr))
      return false;
    if (!transform_tree(c, cb, cx, cu, x0 + h, y0 + h, x0, y0, log2 - 1,
                        depth + 1, 3, cbf_cb, cbf_cr))
      return false;
    return true;
  }
  // leaf: cbf_luma always coded for intra; for inter it is inferred 1
  // at depth 0 with no chroma cbf (7.3.8.8)
  int cbf_luma = 1;
  if (!cu.inter || depth > 0 || cbf_cb || cbf_cr)
    cbf_luma = DEC(cb, cx, CTX_CBF_LUMA + (depth == 0 ? 1 : 0));
  HTRACE("  TU (%d,%d) log2=%d d=%d cbf=%d/%d/%d\n", x0, y0, log2, depth,
         cbf_luma, cbf_cb, cbf_cr);
  return transform_unit(c, cb, cx, cu, x0, y0, xBase, yBase, log2, blk_idx,
                        cbf_luma, cbf_cb, cbf_cr);
}

// PU rectangles (x, y, w, h relative to the CU) for an inter part mode.
int pu_rects(int pm, int s, int r[4][4]) {
  int h = s >> 1, q = s >> 2;
  switch (pm) {
    case 1:  // 2NxN
      r[0][0] = 0; r[0][1] = 0; r[0][2] = s; r[0][3] = h;
      r[1][0] = 0; r[1][1] = h; r[1][2] = s; r[1][3] = h;
      return 2;
    case 2:  // Nx2N
      r[0][0] = 0; r[0][1] = 0; r[0][2] = h; r[0][3] = s;
      r[1][0] = h; r[1][1] = 0; r[1][2] = h; r[1][3] = s;
      return 2;
    case 3:  // NxN
      for (int i = 0; i < 4; i++) {
        r[i][0] = (i & 1) ? h : 0;
        r[i][1] = (i & 2) ? h : 0;
        r[i][2] = h;
        r[i][3] = h;
      }
      return 4;
    case 4:  // 2NxnU
      r[0][0] = 0; r[0][1] = 0; r[0][2] = s; r[0][3] = q;
      r[1][0] = 0; r[1][1] = q; r[1][2] = s; r[1][3] = s - q;
      return 2;
    case 5:  // 2NxnD
      r[0][0] = 0; r[0][1] = 0; r[0][2] = s; r[0][3] = s - q;
      r[1][0] = 0; r[1][1] = s - q; r[1][2] = s; r[1][3] = q;
      return 2;
    case 6:  // nLx2N
      r[0][0] = 0; r[0][1] = 0; r[0][2] = q; r[0][3] = s;
      r[1][0] = q; r[1][1] = 0; r[1][2] = s - q; r[1][3] = s;
      return 2;
    case 7:  // nRx2N
      r[0][0] = 0; r[0][1] = 0; r[0][2] = s - q; r[0][3] = s;
      r[1][0] = s - q; r[1][1] = 0; r[1][2] = q; r[1][3] = s;
      return 2;
    default:  // 2Nx2N
      r[0][0] = 0; r[0][1] = 0; r[0][2] = s; r[0][3] = s;
      return 1;
  }
}

// part_mode for inter CUs (9.3.3.7, Table 9-43 binarization)
int decode_part_mode_inter(Ctx& c, Cabac& cb, HevcContexts& cx, int log2) {
  const HevcSPS& sps = c.sps;
  if (DEC(cb, cx, CTX_PART_MODE + 0)) return 0;  // 2Nx2N
  if (log2 == sps.log2_min_cb) {
    if (DEC(cb, cx, CTX_PART_MODE + 1)) return 1;  // 2NxN
    if (log2 == 3) return 2;                       // Nx2N (no inter 4x4)
    if (DEC(cb, cx, CTX_PART_MODE + 2)) return 2;  // Nx2N
    return 3;                                      // NxN
  }
  if (!sps.amp_enabled)
    return DEC(cb, cx, CTX_PART_MODE + 1) ? 1 : 2;
  if (DEC(cb, cx, CTX_PART_MODE + 1)) {  // horizontal family
    if (DEC(cb, cx, CTX_PART_MODE + 3)) return 1;  // 2NxN
    return BYP(cb) ? 5 : 4;                        // 2NxnD : 2NxnU
  }
  if (DEC(cb, cx, CTX_PART_MODE + 3)) return 2;  // Nx2N
  return BYP(cb) ? 7 : 6;                        // nRx2N : nLx2N
}

int decode_merge_idx(Ctx& c, Cabac& cb, HevcContexts& cx) {
  int midx = 0;
  if (c.sh.max_merge > 1 && DEC(cb, cx, CTX_MERGE_IDX)) {
    midx = 1;
    while (midx < c.sh.max_merge - 1 && BYP(cb)) midx++;
  }
  return midx;
}

// Emit cbf=0 inter TUs covering a residual-free CU (skip or
// rqt_root_cbf == 0) so reconstruction marks the area decoded in exact
// z-order.  Tiles are bounded by the 32x32 transform ceiling.
bool emit_cover_tus(Ctx& c, int x0, int y0, int log2) {
  c.qpy_cur = ((c.qpy_pred + c.qp_delta + 52) % 52);
  int qp_cb = chroma_qp(c.qpy_cur, c.pps.cb_qp_offset + c.sh.cb_qp_offset);
  int qp_cr = chroma_qp(c.qpy_cur, c.pps.cr_qp_offset + c.sh.cr_qp_offset);
  int L = log2 > 5 ? 5 : log2;
  int s = 1 << log2;
  for (int dy = 0; dy < s; dy += 1 << L)
    for (int dx = 0; dx < s; dx += 1 << L) {
      if (!emit_tu(c, x0 + dx, y0 + dy, L, 0, 255, c.qpy_cur, 0, nullptr))
        return false;
      // residual-free CUs still have (implicit) transform-block
      // boundaries for deblocking (8.7.2.2 infers the split at the
      // 32x32 transform ceiling); mark them like transform_unit does
      int bx0 = (x0 + dx) >> 2, by0 = (y0 + dy) >> 2, nb = 1 << (L - 2);
      for (int ty = 0; ty < nb; ty++)
        for (int tx = 0; tx < nb; tx++) {
          int i = (by0 + ty) * c.w4 + bx0 + tx;
          uint8_t b = 0;
          if (tx == 0) b |= 1;
          if (ty == 0) b |= 2;
          c.tub4[i] |= b;
          c.cbfy4[i] = 0;
        }
    }
  int Cl = (log2 - 1) > 4 ? 4 : log2 - 1;
  int cs = s >> 1;
  for (int dy = 0; dy < cs; dy += 1 << Cl)
    for (int dx = 0; dx < cs; dx += 1 << Cl) {
      if (!emit_tu(c, (x0 >> 1) + dx, (y0 >> 1) + dy, Cl, 1, 255, qp_cb, 0,
                   nullptr))
        return false;
      if (!emit_tu(c, (x0 >> 1) + dx, (y0 >> 1) + dy, Cl, 2, 255, qp_cr, 0,
                   nullptr))
        return false;
    }
  return true;
}

// prediction_unit (7.3.8.6): merge or AMVP with explicit mvd/refidx.
bool prediction_unit(Ctx& c, Cabac& cb, HevcContexts& cx, int xCb, int yCb,
                     int cbSize, int pm, int pi, int xPb, int yPb, int nW,
                     int nH, bool skip, bool* merge_out) {
  HTRACE("  pu_enter (%d,%d) %dx%d pm=%d pi=%d skip=%d\n", xPb, yPb, nW,
         nH, pm, pi, (int)skip);
  PuMotion pu;
  int merge_flag = skip ? 1 : DEC(cb, cx, CTX_MERGE_FLAG);
  if (merge_out) *merge_out = merge_flag != 0;
  if (merge_flag) {
    int midx = decode_merge_idx(c, cb, cx);
    PuMotion cands[5];
    merge_candidates(c, xCb, yCb, cbSize, xPb, yPb, nW, nH, pm, pi, cands);
    if (midx >= c.sh.max_merge) {
      c.err = "merge_idx out of range";
      return false;
    }
    pu = cands[midx];
    if (nW + nH == 12 && pu.pf == 3) {  // 8x4/4x8: no bi-prediction
      pu.pf = 1;
      pu.refidx[1] = -1;
    }
    HTRACE("  PU merge idx=%d\n", midx);
  } else {
    int idc = 0;  // 0=L0 1=L1 2=BI
    if (c.sh.slice_type == 0) {
      if (nW + nH != 12) {
        int depth = c.ct_depth[(yCb >> 2) * c.w4 + (xCb >> 2)];
        if (DEC(cb, cx, CTX_INTER_PRED_IDC + depth))
          idc = 2;
        else
          idc = DEC(cb, cx, CTX_INTER_PRED_IDC + 4);
      } else {
        idc = DEC(cb, cx, CTX_INTER_PRED_IDC + 4);
      }
    }
    HTRACE("  PU amvp idc=%d\n", idc);
    for (int X = 0; X < 2; X++) {
      if (idc != 2 && idc != X) continue;
      int num = c.sh.num_ref[X];
      int ri = 0;
      if (num > 1) {
        if (DEC(cb, cx, CTX_REF_IDX + 0)) {
          ri = 1;
          if (num > 2 && DEC(cb, cx, CTX_REF_IDX + 1)) {
            ri = 2;
            while (ri < num - 1 && BYP(cb)) ri++;
          }
        }
      }
      int16_t mvd[2] = {0, 0};
      if (!(X == 1 && c.sh.mvd_l1_zero && idc == 2)) {
        if (!mvd_coding(c, cb, cx, mvd)) return false;
      }
      int mvp_flag = DEC(cb, cx, CTX_MVP_FLAG);
      int16_t mvp[2];
      amvp_mv(c, xPb, yPb, nW, nH, X, ri, mvp_flag, mvp);
      pu.pf |= 1 << X;
      pu.refidx[X] = (int8_t)ri;
      pu.mv[X][0] = (int16_t)(mvp[0] + mvd[0]);
      pu.mv[X][1] = (int16_t)(mvp[1] + mvd[1]);
    }
  }
  return emit_pu(c, xPb, yPb, nW, nH, pu);
}

bool coding_unit(Ctx& c, Cabac& cb, HevcContexts& cx, int x0, int y0,
                 int log2) {
  const HevcSPS& sps = c.sps;
  CuState cu;
  cu.x0 = x0;
  cu.y0 = y0;
  cu.log2 = log2;
  int size = 1 << log2;
  bool is_pb = c.sh.slice_type != 2;
  HTRACE("CU (%d,%d) log2=%d\n", x0, y0, log2);

  auto qp_tail = [&]() {
    c.qpy_cur = ((c.qpy_pred + c.qp_delta + 52) % 52);
    int nb = 1 << (log2 - 2);
    for (int dy = 0; dy < nb; dy++)
      for (int dx = 0; dx < nb; dx++)
        c.qpy[((y0 >> 2) + dy) * c.w4 + (x0 >> 2) + dx] = (int8_t)c.qpy_cur;
    c.qpy_prev = c.qpy_cur;
  };
  auto mark_intra = [&]() {
    int nb = 1 << (log2 - 2);
    for (int dy = 0; dy < nb; dy++)
      for (int dx = 0; dx < nb; dx++) {
        int i = ((y0 >> 2) + dy) * c.w4 + (x0 >> 2) + dx;
        c.mvf[i] = Ctx::MvInfo();
        c.dec4[i] = 1;
      }
  };

  if (c.pps.transquant_bypass) {
    if (DEC(cb, cx, CTX_TQ_BYPASS)) {
      c.err = "transquant bypass CU unsupported";
      return false;
    }
  }
  if (is_pb) {
    int inc = 0;
    if (x0 > 0) inc += c.skip4[(y0 >> 2) * c.w4 + ((x0 - 1) >> 2)];
    if (y0 > 0) inc += c.skip4[((y0 - 1) >> 2) * c.w4 + (x0 >> 2)];
    HTRACE("  pre-skip inc=%d\n", inc);
    int skipf = DEC(cb, cx, CTX_CU_SKIP + inc);
    HTRACE("  post-skip %d\n", skipf);
    if (skipf) {
      // skip: one 2Nx2N merge PU, no residual
      if (!prediction_unit(c, cb, cx, x0, y0, size, 0, 0, x0, y0, size,
                           size, true, nullptr))
        return false;
      int nb = 1 << (log2 - 2);
      for (int dy = 0; dy < nb; dy++)
        for (int dx = 0; dx < nb; dx++)
          c.skip4[((y0 >> 2) + dy) * c.w4 + (x0 >> 2) + dx] = 1;
      if (!emit_cover_tus(c, x0, y0, log2)) return false;
      qp_tail();
      return true;
    }
  }

  int pred_intra = 1;
  if (is_pb) pred_intra = !!DEC(cb, cx, CTX_PRED_MODE);
  HTRACE("  pred_intra=%d\n", pred_intra);
  if (!pred_intra) {
    cu.inter = true;
    cu.part_mode = decode_part_mode_inter(c, cb, cx, log2);
    HTRACE("CU inter part=%d\n", cu.part_mode);
    int rects[4][4];
    int npu = pu_rects(cu.part_mode, size, rects);
    bool merge_2nx2n = false;
    for (int pi = 0; pi < npu; pi++) {
      bool m = false;
      if (!prediction_unit(c, cb, cx, x0, y0, size, cu.part_mode, pi,
                           x0 + rects[pi][0], y0 + rects[pi][1],
                           rects[pi][2], rects[pi][3], false, &m))
        return false;
      if (pi == 0 && cu.part_mode == 0) merge_2nx2n = m;
    }
    int rqt_root = 1;
    if (!merge_2nx2n) rqt_root = DEC(cb, cx, CTX_NO_RESIDUAL);
    if (rqt_root) {
      if (!transform_tree(c, cb, cx, cu, x0, y0, x0, y0, log2, 0, 0, 0, 0))
        return false;
    } else {
      if (!emit_cover_tus(c, x0, y0, log2)) return false;
    }
    qp_tail();
    return true;
  }

  // ---- intra CU ----
  // part_mode only at min CB size (1-bin intra binarization)
  if (log2 == sps.log2_min_cb)
    cu.part_nxn = !DEC(cb, cx, CTX_PART_MODE + 0);

  int n_pu = cu.part_nxn ? 4 : 1;
  int half = 1 << (log2 - 1);
  int prev[4], val[4];
  for (int i = 0; i < n_pu; i++)
    prev[i] = DEC(cb, cx, CTX_PREV_INTRA + 0);
  for (int i = 0; i < n_pu; i++) {
    if (prev[i]) {
      int idx = 0;
      if (BYP(cb)) idx = BYP(cb) ? 2 : 1;
      val[i] = idx;
    } else {
      val[i] = (int)bypass_bits(cb, 5);
    }
  }
  for (int i = 0; i < n_pu; i++) {
    int xP = x0 + (cu.part_nxn && (i & 1) ? half : 0);
    int yP = y0 + (cu.part_nxn && (i & 2) ? half : 0);
    cu.luma_mode[i] = derive_luma_mode(c, xP, yP, prev[i], val[i]);
    // store modes on the 4x4 grid as they are derived (later PUs of this
    // CU may reference earlier ones)
    int nb = 1 << ((cu.part_nxn ? log2 - 1 : log2) - 2);
    for (int dy = 0; dy < nb; dy++)
      for (int dx = 0; dx < nb; dx++)
        c.ipm[((yP >> 2) + dy) * c.w4 + (xP >> 2) + dx] =
            (int8_t)cu.luma_mode[i];
  }
  // intra_chroma_pred_mode (one for the CU at 4:2:0)
  if (DEC(cb, cx, CTX_INTRA_CHROMA + 0)) {
    static const int kList[4] = {0, 26, 10, 1};
    int v = (int)bypass_bits(cb, 2);
    cu.chroma_mode = kList[v] == cu.luma_mode[0] ? 34 : kList[v];
  } else {
    cu.chroma_mode = cu.luma_mode[0];  // DM
  }

  if (!transform_tree(c, cb, cx, cu, x0, y0, x0, y0, log2, 0, 0, 0, 0))
    return false;

  mark_intra();  // pf=0 motion + decoded flags (inter availability)
  qp_tail();     // finalize CU QP (covering area map + qPY_PREV chain)
  return true;
}

bool coding_quadtree(Ctx& c, Cabac& cb, HevcContexts& cx, int x0, int y0,
                     int log2, int depth) {
  const HevcSPS& sps = c.sps;
  const HevcPPS& pps = c.pps;
  int size = 1 << log2;
  int split;
  if (x0 + size <= sps.width && y0 + size <= sps.height &&
      log2 > sps.log2_min_cb) {
    int inc = 0;
    if (x0 > 0) {
      int d = c.ct_depth[(y0 >> 2) * c.w4 + ((x0 - 1) >> 2)];
      inc += d > depth;
    }
    if (y0 > 0) {
      int d = c.ct_depth[((y0 - 1) >> 2) * c.w4 + (x0 >> 2)];
      inc += d > depth;
    }
    split = DEC(cb, cx, CTX_SPLIT_CU + inc);
    HTRACE("QT (%d,%d) log2=%d d=%d split=%d\n", x0, y0, log2, depth, split);
  } else {
    split = log2 > sps.log2_min_cb;
    HTRACE("QT (%d,%d) log2=%d d=%d split=%d (forced)\n", x0, y0, log2,
           depth, split);
  }
  if (pps.cu_qp_delta_enabled &&
      log2 >= sps.log2_ctb - pps.diff_cu_qp_delta_depth) {
    // new quantization group: derive qPY_PRED (8.6.1)
    c.is_qp_coded = false;
    c.qp_delta = 0;
    c.qg_x = x0;
    c.qg_y = y0;
    c.qpy_prev = c.qpy_prev;  // qPY_PREV carried from the last CU
    int ctb_mask = (1 << sps.log2_ctb) - 1;
    int qa = c.qpy_prev, qb = c.qpy_prev;
    // left neighbor available and in the same CTB
    if ((x0 & ctb_mask) != 0 && x0 > 0)
      qa = c.qpy[(y0 >> 2) * c.w4 + ((x0 - 1) >> 2)];
    if ((y0 & ctb_mask) != 0 && y0 > 0)
      qb = c.qpy[((y0 - 1) >> 2) * c.w4 + (x0 >> 2)];
    c.qpy_pred = (qa + qb + 1) >> 1;
  }
  if (split) {
    int h = size >> 1;
    for (int i = 0; i < 4; i++) {
      int x1 = x0 + (i & 1 ? h : 0), y1 = y0 + (i & 2 ? h : 0);
      if (x1 >= sps.width || y1 >= sps.height) continue;
      if (!coding_quadtree(c, cb, cx, x1, y1, log2 - 1, depth + 1))
        return false;
    }
    return true;
  }
  // record coding-tree depth for split_cu_flag contexts
  int nb = 1 << (log2 - 2);
  for (int dy = 0; dy < nb; dy++)
    for (int dx = 0; dx < nb; dx++)
      c.ct_depth[((y0 >> 2) + dy) * c.w4 + (x0 >> 2) + dx] = (uint8_t)depth;
  return coding_unit(c, cb, cx, x0, y0, log2);
}

// ---- slice ----------------------------------------------------------------

bool parse_slice_header(Ctx& c, BitReader& br, int nal_type,
                        HevcSliceHeader& sh) {
  const bool irap = nal_type >= 16 && nal_type <= 23;
  sh.first_slice = br.u1();
  if (!sh.first_slice) {
    c.err = "multi-slice pictures not supported";
    return false;
  }
  if (irap) br.u1();  // no_output_of_prior_pics
  sh.pps_id = (int)br.ue();
  auto itp = c.pps_map.find(sh.pps_id);
  if (itp == c.pps_map.end()) {
    c.err = "missing PPS";
    return false;
  }
  c.pps = itp->second;
  auto its = c.sps_map.find(c.pps.sps_id);
  if (its == c.sps_map.end()) {
    c.err = "missing SPS";
    return false;
  }
  c.sps = its->second;
  const HevcSPS& sps = c.sps;
  const HevcPPS& pps = c.pps;
  for (int i = 0; i < pps.num_extra_slice_header_bits; i++) br.u1();
  sh.slice_type = (int)br.ue();
  if (sh.slice_type < 0 || sh.slice_type > 2) {
    c.err = "bad slice_type";
    return false;
  }
  sh.nal_type = nal_type;
  if (pps.output_flag_present) br.u1();
  if (nal_type != 19 && nal_type != 20) {  // not IDR: POC + RPS
    sh.poc_lsb = (int)br.u(sps.log2_max_poc_lsb);
    if (!br.u1()) {  // short_term_ref_pic_set_sps_flag == 0
      // explicit set coded in the slice header; it may inter-predict
      // from the SPS candidate sets (idx == num_st_rps)
      std::vector<StRps> sets = sps.st_rps;
      if (!parse_st_rps(br, sps.num_st_rps, sps.num_st_rps, sets, c.err))
        return false;
      sh.rps = sets.back();
    } else {
      int idx = 0;
      if (sps.num_st_rps > 1) {
        int bits = 0;
        while ((1 << bits) < sps.num_st_rps) bits++;
        idx = (int)br.u(bits);
      }
      if (idx >= (int)sps.st_rps.size()) {
        c.err = "st_rps idx out of range";
        return false;
      }
      sh.rps = sps.st_rps[idx];
    }
    if (sps.long_term_ref_pics) {
      c.err = "long-term refs unsupported";
      return false;
    }
    if (sps.temporal_mvp) sh.tmvp = br.u1();
  }
  if (sps.sao_enabled) {
    sh.sao_luma = br.u1();
    sh.sao_chroma = br.u1();
  }
  if (sh.slice_type != 2) {  // P or B
    sh.num_ref[0] = pps.num_ref_l0;
    sh.num_ref[1] = sh.slice_type == 0 ? pps.num_ref_l1 : 0;
    if (br.u1()) {  // num_ref_idx_active_override
      sh.num_ref[0] = (int)br.ue() + 1;
      if (sh.slice_type == 0) sh.num_ref[1] = (int)br.ue() + 1;
    }
    if (sh.num_ref[0] > 16 || sh.num_ref[1] > 16) {
      c.err = "num_ref_idx too large";
      return false;
    }
    // NumPicTotalCurr (no long-term): used entries of the slice RPS
    int npt = 0;
    for (int i = 0; i < sh.rps.n_neg + sh.rps.n_pos; i++)
      npt += sh.rps.used[i];
    if (pps.lists_modification && npt > 1) {
      c.err = "ref_pic_lists_modification unsupported";
      return false;
    }
    if (sh.slice_type == 0) sh.mvd_l1_zero = br.u1();
    if (pps.cabac_init_present) sh.cabac_init = br.u1();
    if (sh.tmvp) {
      sh.col_from_l0 = sh.slice_type == 0 ? (bool)br.u1() : true;
      if ((sh.col_from_l0 && sh.num_ref[0] > 1) ||
          (!sh.col_from_l0 && sh.num_ref[1] > 1))
        sh.col_ref_idx = (int)br.ue();
    }
    if ((pps.weighted_pred && sh.slice_type == 1) ||
        (pps.weighted_bipred && sh.slice_type == 0)) {
      if (!parse_pred_weight_table(c, br, sh)) return false;
    }
    sh.max_merge = 5 - (int)br.ue();
    if (sh.max_merge < 1 || sh.max_merge > 5) {
      c.err = "bad max_num_merge_cand";
      return false;
    }
    HTRACE("SH P/B type=%d nref=%d/%d tmvp=%d col=%d/%d wp=%d mm=%d "
           "rps(n=%d/%d dp0=%d)\n",
           sh.slice_type, sh.num_ref[0], sh.num_ref[1], (int)sh.tmvp,
           (int)sh.col_from_l0, sh.col_ref_idx, (int)sh.has_wp,
           sh.max_merge, sh.rps.n_neg, sh.rps.n_pos, sh.rps.delta_poc[0]);
  }
  sh.slice_qp = pps.init_qp + (int)br.se();
  if (pps.slice_chroma_qp_offsets_present) {
    sh.cb_qp_offset = (int)br.se();
    sh.cr_qp_offset = (int)br.se();
  }
  sh.deblocking_disabled = pps.deblocking_disabled;
  sh.beta_offset = pps.beta_offset;
  sh.tc_offset = pps.tc_offset;
  if (pps.deblocking_filter_control_present) {
    int override_flag =
        pps.deblocking_filter_override_enabled ? (int)br.u1() : 0;
    if (override_flag) {
      sh.deblocking_disabled = br.u1();
      if (!sh.deblocking_disabled) {
        sh.beta_offset = (int)br.se();
        sh.tc_offset = (int)br.se();
      }
    }
  }
  if (pps.loop_filter_across_slices &&
      (sh.sao_luma || sh.sao_chroma || !sh.deblocking_disabled))
    br.u1();  // slice_loop_filter_across_slices_enabled_flag
  if (pps.tiles_enabled || pps.entropy_coding_sync) {
    int n_entry = (int)br.ue();
    if (n_entry > 0) {
      int olen = (int)br.ue() + 1;
      if (olen > 32 || n_entry > 4096) {
        c.err = "bad entry point offsets";
        return false;
      }
      sh.entry_offsets.resize(n_entry);
      for (int i = 0; i < n_entry; i++)
        sh.entry_offsets[i] = br.u(olen) + 1;
    }
  }
  if (pps.slice_header_extension) {
    int len = (int)br.ue();
    for (int i = 0; i < len; i++) br.u(8);
  }
  // byte_alignment()
  if (br.u1() != 1) {
    c.err = "slice header alignment";
    return false;
  }
  while (br.pos() & 7) br.u1();
  return !br.error();
}

// sao() syntax (7.3.8.3): per-CTB SAO parameters, stored as 6 int8 per
// component: [type(0 off/1 band/2 edge), off0..off3 (RESOLVED signed
// SaoOffsetVal for bands / edge categories 1..4), band_pos_or_eo_class].
bool parse_sao(Ctx& c, Cabac& cb, HevcContexts& cx, int rx, int ry) {
  int8_t* p = &c.sao[((size_t)ry * c.sps.ctb_w() + rx) * 18];
  memset(p, 0, 18);
  int merge_left = rx > 0 ? DEC(cb, cx, CTX_SAO_MERGE) : 0;
  int merge_up = (!merge_left && ry > 0) ? DEC(cb, cx, CTX_SAO_MERGE) : 0;
  if (merge_left) {
    memcpy(p, p - 18, 18);
    return !cb.error();
  }
  if (merge_up) {
    memcpy(p, p - (size_t)18 * c.sps.ctb_w(), 18);
    return !cb.error();
  }
  for (int ci = 0; ci < 3; ci++) {
    int8_t* q = p + ci * 6;
    if (!(ci == 0 ? c.sh.sao_luma : c.sh.sao_chroma)) continue;
    int t;
    if (ci == 2) {
      t = p[6 + 0];  // Cr shares sao_type_idx_chroma with Cb
    } else {
      t = DEC(cb, cx, CTX_SAO_TYPE) ? (BYP(cb) ? 2 : 1) : 0;
    }
    q[0] = (int8_t)t;
    if (!t) continue;
    int abs[4];
    for (int i = 0; i < 4; i++) {  // TR cMax=7 (8-bit), all bypass
      int v = 0;
      while (v < 7 && BYP(cb)) v++;
      abs[i] = v;
    }
    if (t == 1) {  // band offset
      for (int i = 0; i < 4; i++) {
        int s = abs[i] ? BYP(cb) : 0;
        q[1 + i] = (int8_t)(s ? -abs[i] : abs[i]);
      }
      q[5] = (int8_t)bypass_bits(cb, 5);  // sao_band_position
    } else {  // edge offset: categories 1,2 add, 3,4 subtract
      q[1] = (int8_t)abs[0];
      q[2] = (int8_t)abs[1];
      q[3] = (int8_t)-abs[2];
      q[4] = (int8_t)-abs[3];
      q[5] = (int8_t)(ci == 2 ? p[6 + 5] : (int)bypass_bits(cb, 2));
    }
  }
  return !cb.error();
}

bool decode_slice(Ctx& c, const std::vector<uint8_t>& rbsp, size_t bitpos,
                  const std::vector<uint32_t>& ep_pos = {}) {
  const HevcSPS& sps = c.sps;
  c.w4 = (sps.width + 3) >> 2;
  int h4 = (sps.height + 3) >> 2;
  c.h4 = h4;
  c.ct_depth.assign((size_t)c.w4 * h4, 0);
  c.ipm.assign((size_t)c.w4 * h4, -1);
  c.qpy.assign((size_t)c.w4 * h4, (int8_t)c.sh.slice_qp);
  c.mvf.assign((size_t)c.w4 * h4, Ctx::MvInfo());
  c.dec4.assign((size_t)c.w4 * h4, 0);
  c.skip4.assign((size_t)c.w4 * h4, 0);
  c.cbfy4.assign((size_t)c.w4 * h4, 0);
  c.tub4.assign((size_t)c.w4 * h4, 0);
  c.pub4.assign((size_t)c.w4 * h4, 0);
  c.qpy_prev = c.sh.slice_qp;
  c.qpy_pred = c.sh.slice_qp;
  c.qp_delta = 0;
  c.is_qp_coded = false;

  // initType (9.3.2.2): I=0; P=1 (2 with cabac_init); B=2 (1 with it)
  int init_type;
  if (c.sh.slice_type == 2)
    init_type = 0;
  else if (c.sh.slice_type == 1)
    init_type = c.sh.cabac_init ? 2 : 1;
  else
    init_type = c.sh.cabac_init ? 1 : 2;
  HevcContexts cx;
  cx.init(c.sh.slice_qp, init_type);
  HTRACE("SLICE qp=%d cabac_start_bit=%zu rbsp_bytes=%zu\n", c.sh.slice_qp,
         bitpos, rbsp.size());
  Cabac cb(rbsp.data(), rbsp.size() * 8, bitpos);

  int ctbs = sps.ctb_w() * sps.ctb_h();
  int ctbw = sps.ctb_w();
  int lg = sps.log2_ctb;
  c.sao.assign((size_t)ctbs * 18, 0);

  // WPP (entropy_coding_sync): one CABAC substream per CTB row, located
  // by the slice header's entry-point offsets (counted in ESCAPED bytes
  // from the byte-aligned slice-data start — convert via ep_pos); row
  // contexts sync from the snapshot taken after CTB x==1 of the row
  // above (9.3.1); qPY_PREV resets to SliceQpY at each row start.
  bool wpp = c.pps.entropy_coding_sync && sps.ctb_h() > 1;
  std::vector<size_t> row_start_bits;  // substream starts, RBSP bits
  if (wpp) {
    if ((int)c.sh.entry_offsets.size() != sps.ctb_h() - 1) {
      c.err = "WPP entry point count mismatch";
      return false;
    }
    auto esc_of = [&](size_t u) {  // RBSP byte pos -> escaped byte pos
      size_t k = 0;
      while (k < ep_pos.size() && ep_pos[k] <= u) k++;
      return u + k;
    };
    auto unesc_of = [&](size_t e) {  // escaped byte pos -> RBSP byte pos
      size_t k = 0;
      while (k < ep_pos.size() && ep_pos[k] + k < e) k++;
      return e - k;
    };
    size_t data0_esc = esc_of(bitpos >> 3);
    size_t acc = data0_esc;
    for (uint32_t off : c.sh.entry_offsets) {
      acc += off;
      row_start_bits.push_back(unesc_of(acc) * 8);
    }
  }

  HevcContexts sync_cx;
  bool have_sync = false;
  for (int ctb = 0; ctb < ctbs; ctb++) {
    int rx = ctb % ctbw;
    int ry = ctb / ctbw;
    if (wpp && rx == 0 && ry > 0) {
      size_t sb = row_start_bits[ry - 1];
      if ((sb >> 3) >= rbsp.size()) {
        c.err = "WPP entry point out of range";
        return false;
      }
      cb = Cabac(rbsp.data(), rbsp.size() * 8, sb);
      if (ctbw > 1 && have_sync) {
        cx = sync_cx;
      } else {
        cx.init(c.sh.slice_qp, init_type);
      }
      c.qpy_pred = c.sh.slice_qp;
      c.qpy_prev = c.sh.slice_qp;
    }
    int x0 = rx << lg;
    int y0 = ry << lg;
    c.ctb_x = x0;
    c.ctb_y = y0;
    if (c.sh.sao_luma || c.sh.sao_chroma) {
      if (!parse_sao(c, cb, cx, rx, ry)) {
        c.err = "CABAC overrun (sao)";
        return false;
      }
    }
    if (!coding_quadtree(c, cb, cx, x0, y0, lg, 0)) return false;
    if (wpp && rx == 1) {  // context storage (9.3.1), used by row ry+1
      sync_cx = cx;
      have_sync = true;
    }
    int eos = TERM(cb);
    HTRACE("CTB %d/%d done eos=%d err=%d\n", ctb, ctbs, eos, (int)cb.error());
    if (cb.error()) {
      c.err = "CABAC overrun";
      return false;
    }
    if (eos != (ctb == ctbs - 1)) {
      c.err = eos ? "early end_of_slice" : "missing end_of_slice";
      return false;
    }
    if (wpp && rx == ctbw - 1 && ctb != ctbs - 1) {
      if (TERM(cb) != 1) {  // end_of_subset_one_bit
        c.err = "missing end_of_subset";
        return false;
      }
    }
  }
  return true;
}

// Deblocking boundary strengths (8.7.2.4) on the 4x4 segment grid.
// out[(y4 * w4 + x4) * 2 + 0] = bS of the vertical edge at x = 4*x4
// (nonzero only on 8-aligned columns), [.. + 1] = horizontal edge at
// y = 4*y4.  Edges exist where a TU or PU boundary lies on the 8-grid.
void compute_bs(Ctx& c, uint8_t* out) {
  const int w4 = c.w4, h4 = c.h4;
  auto mv_close = [](const int16_t* a, const int16_t* b) {
    return abs(a[0] - b[0]) < 4 && abs(a[1] - b[1]) < 4;
  };
  auto bs_pair = [&](int ip, int iq, bool tu_edge) -> int {
    const Ctx::MvInfo& p = c.mvf[ip];
    const Ctx::MvInfo& q = c.mvf[iq];
    if (!p.pf || !q.pf) return 2;  // intra on either side
    if (tu_edge && (c.cbfy4[ip] || c.cbfy4[iq])) return 1;
    int32_t pp[2], qq[2];
    int np = 0, nq = 0;
    const int16_t* pmv[2];
    const int16_t* qmv[2];
    for (int l = 0; l < 2; l++) {
      if ((p.pf >> l) & 1) {
        pp[np] = c.ref_pocs[l][p.refidx[l]];
        pmv[np++] = p.mv[l];
      }
      if ((q.pf >> l) & 1) {
        qq[nq] = c.ref_pocs[l][q.refidx[l]];
        qmv[nq++] = q.mv[l];
      }
    }
    if (np != nq) return 1;
    if (np == 1) {
      if (pp[0] != qq[0]) return 1;
      return mv_close(pmv[0], qmv[0]) ? 0 : 1;
    }
    // both bi-predicted: reference SETS must match
    bool same_set = (pp[0] == qq[0] && pp[1] == qq[1]) ||
                    (pp[0] == qq[1] && pp[1] == qq[0]);
    if (!same_set) return 1;
    if (pp[0] == pp[1]) {  // same picture in both lists
      bool straight = mv_close(pmv[0], qmv[0]) && mv_close(pmv[1], qmv[1]);
      bool crossed = mv_close(pmv[0], qmv[1]) && mv_close(pmv[1], qmv[0]);
      return (straight || crossed) ? 0 : 1;
    }
    if (pp[0] == qq[0])
      return (mv_close(pmv[0], qmv[0]) && mv_close(pmv[1], qmv[1])) ? 0 : 1;
    return (mv_close(pmv[0], qmv[1]) && mv_close(pmv[1], qmv[0])) ? 0 : 1;
  };
  memset(out, 0, (size_t)h4 * w4 * 2);
  for (int y4 = 0; y4 < h4; y4++)
    for (int x4 = 0; x4 < w4; x4++) {
      int iq = y4 * w4 + x4;
      if (x4 > 0 && (x4 & 1) == 0) {  // 8-aligned vertical edge
        bool tu = (c.tub4[iq] & 1) != 0;
        bool pu = (c.pub4[iq] & 1) != 0;
        if (tu || pu) out[iq * 2] = (uint8_t)bs_pair(iq - 1, iq, tu);
      }
      if (y4 > 0 && (y4 & 1) == 0) {  // 8-aligned horizontal edge
        bool tu = (c.tub4[iq] & 2) != 0;
        bool pu = (c.pub4[iq] & 2) != 0;
        if (tu || pu) out[iq * 2 + 1] = (uint8_t)bs_pair(iq - w4, iq, tu);
      }
    }
}

// Per-picture outputs + DPB insert (compressed motion field for TMVP).
void finalize_picture(Ctx& c, int span_idx) {
  HevcOut* o = c.out;
  if (o->poc) o->poc[span_idx] = c.poc_val;
  if (o->frame_type) o->frame_type[span_idx] = (uint8_t)c.sh.slice_type;
  if (o->wp_rows) {
    int16_t* w = o->wp_rows + (int64_t)span_idx * 32 * 8;
    memset(w, 0, 32 * 8 * sizeof(int16_t));
    if (c.sh.has_wp) {
      for (int l = 0; l < 2; l++)
        for (int i = 0; i < c.sh.num_ref[l]; i++) {
          const WpEntry& e = c.sh.wp[l][i];
          int16_t* r = w + (l * 16 + i) * 8;
          r[0] = e.lw;
          r[1] = e.lo;
          r[2] = e.cw[0];
          r[3] = e.co[0];
          r[4] = e.cw[1];
          r[5] = e.co[1];
          r[6] = (int16_t)c.sh.luma_log2_denom;
          r[7] = (int16_t)c.sh.chroma_log2_denom;
        }
    }
  }
  if (o->bs_map && !c.mvf.empty())
    compute_bs(c, o->bs_map + (int64_t)span_idx * c.h4 * c.w4 * 2);
  Ctx::Pic pic;
  pic.poc = c.poc_val;
  pic.span_idx = span_idx;
  pic.w16 = (c.sps.width + 15) >> 4;
  pic.h16 = (c.sps.height + 15) >> 4;
  pic.col.assign((size_t)pic.w16 * pic.h16, Ctx::ColMv{});
  if (!c.mvf.empty()) {
    for (int y16 = 0; y16 < pic.h16; y16++)
      for (int x16 = 0; x16 < pic.w16; x16++) {
        const Ctx::MvInfo& m = c.mvf[(size_t)(y16 << 2) * c.w4 + (x16 << 2)];
        Ctx::ColMv& cm = pic.col[(size_t)y16 * pic.w16 + x16];
        cm.pf = m.pf;
        for (int l = 0; l < 2; l++) {
          cm.mv[l][0] = m.mv[l][0];
          cm.mv[l][1] = m.mv[l][1];
          cm.refpoc[l] = ((m.pf >> l) & 1) ? c.ref_pocs[l][m.refidx[l]] : 0;
        }
      }
  }
  c.dpb.push_back(std::move(pic));
}

// hvcC box (ISO 14496-15 8.3.3.1): arrays of parameter-set NALs.
bool parse_hvcc(Ctx& c, const uint8_t* p, int n) {
  if (n < 23) {
    c.err = "hvcC too short";
    return false;
  }
  c.nal_length_size = (p[21] & 3) + 1;
  int num_arrays = p[22];
  int pos = 23;
  for (int a = 0; a < num_arrays; a++) {
    if (pos + 3 > n) {
      c.err = "hvcC truncated";
      return false;
    }
    int nalus = (p[pos + 1] << 8) | p[pos + 2];
    pos += 3;
    for (int u = 0; u < nalus; u++) {
      if (pos + 2 > n) {
        c.err = "hvcC truncated";
        return false;
      }
      int len = (p[pos] << 8) | p[pos + 1];
      pos += 2;
      if (pos + len > n || len < 2) {
        c.err = "hvcC truncated";
        return false;
      }
      int nal_type = (p[pos] >> 1) & 63;
      auto rbsp = strip_ep(p + pos + 2, len - 2);
      BitReader br(rbsp.data(), rbsp.size());
      if (nal_type == 33) {
        HevcSPS sps;
        if (!parse_sps(br, sps, c.err)) return false;
        c.sps_map[sps.sps_id] = sps;
        c.sps = sps;
        c.have_active = true;
      } else if (nal_type == 34) {
        HevcPPS pps;
        if (!parse_pps(br, pps, c.err)) return false;
        c.pps_map[pps.pps_id] = pps;
        c.pps = pps;
      }  // VPS (32) / SEI: ignored
      pos += len;
    }
  }
  if (!c.have_active) {
    c.err = "no SPS in hvcC";
    return false;
  }
  return true;
}

}  // namespace
}  // namespace hwhevc

// ---- C ABI -----------------------------------------------------------------

using hwhevc::Ctx;
using hwhevc::PublicCtx;

HW_API void* hw_hevc_open(const uint8_t* hvcc, int len, char* err,
                          int errlen) {
  auto* p = new PublicCtx();
  if (!hwhevc::parse_hvcc(p->c, hvcc, len)) {
    snprintf(err, errlen, "%s", p->c.err.c_str());
    delete p;
    return nullptr;
  }
  return p;
}

HW_API void hw_hevc_close(void* h) { delete static_cast<PublicCtx*>(h); }

HW_API const char* hw_hevc_error(void* h) {
  auto* p = static_cast<PublicCtx*>(h);
  snprintf(p->errbuf, sizeof(p->errbuf), "%s", p->c.err.c_str());
  return p->errbuf;
}

// Luma dims + conformance crop (left, right, top, bottom in luma samples).
HW_API int hw_hevc_dims(void* h, int* w, int* h_out, int* crop) {
  auto& sps = static_cast<PublicCtx*>(h)->c.sps;
  if (!sps.valid) return -1;
  *w = sps.width;
  *h_out = sps.height;
  // 4:2:0: conformance window offsets are in chroma units (SubWidthC=2)
  crop[0] = sps.conf_win[0] * 2;
  crop[1] = sps.conf_win[1] * 2;
  crop[2] = sps.conf_win[2] * 2;
  crop[3] = sps.conf_win[3] * 2;
  return 0;
}

HW_API int hw_hevc_strong_smoothing(void* h) {
  auto* p = static_cast<PublicCtx*>(h);
  return p->c.sps.strong_intra_smoothing ? 1 : 0;
}

HW_API int hw_hevc_ctb_log2(void* h) {
  return static_cast<PublicCtx*>(h)->c.sps.log2_ctb;
}

// Decode the samples of one span into flat TU-entry SoA output.
// Returns the number of frames decoded, or -1 on error.
HW_API int hw_hevc_decode_gop(void* h, const uint8_t* data,
                              const uint64_t* offsets, const uint64_t* sizes,
                              int n_samples, hwhevc::HevcOut* out) {
  auto* p = static_cast<PublicCtx*>(h);
  Ctx& c = p->c;
  c.err.clear();
  c.out = out;
  c.tu_used = 0;
  c.coef_used = 0;
  // spans are independent decode units (they start at an IRAP): fresh
  // DPB and POC bookkeeping per call
  c.dpb.clear();
  c.prev_tid0_poc = 0;
  out->used_pu = 0;

  for (int s = 0; s < n_samples; s++) {
    const uint8_t* sample = data + offsets[s];
    size_t size = sizes[s];
    size_t pos = 0;
    out->tu_off[s] = (int32_t)c.tu_used;
    if (out->pu_off) out->pu_off[s] = (int32_t)out->used_pu;
    bool got_slice = false;
    bool skipped_rasl = false;
    while (pos + c.nal_length_size <= size) {
      uint64_t nal_len = 0;
      for (int i = 0; i < c.nal_length_size; i++)
        nal_len = (nal_len << 8) | sample[pos + i];
      pos += c.nal_length_size;
      if (nal_len < 2 || pos + nal_len > size) {
        c.err = "bad NAL length";
        return -1;
      }
      int nal_type = (sample[pos] >> 1) & 63;
      if (nal_type == 33 || nal_type == 34) {
        auto rbsp = hwhevc::strip_ep(sample + pos + 2, nal_len - 2);
        hwh264::BitReader br(rbsp.data(), rbsp.size());
        if (nal_type == 33) {
          hwhevc::HevcSPS sps;
          if (!hwhevc::parse_sps(br, sps, c.err)) return -1;
          c.sps_map[sps.sps_id] = sps;
        } else {
          hwhevc::HevcPPS pps;
          if (!hwhevc::parse_pps(br, pps, c.err)) return -1;
          c.pps_map[pps.pps_id] = pps;
        }
      } else if (nal_type <= 31) {  // VCL
        if (got_slice || skipped_rasl) {
          c.err = "multiple slices per picture not supported";
          return -1;
        }
        int tid = (sample[pos + 1] & 7) - 1;
        std::vector<uint32_t> ep_pos;
        auto rbsp = hwhevc::strip_ep(sample + pos + 2, nal_len - 2, &ep_pos);
        hwh264::BitReader br(rbsp.data(), rbsp.size());
        c.sh = hwhevc::HevcSliceHeader();
        if (!hwhevc::parse_slice_header(c, br, nal_type, c.sh)) return -1;
        if (nal_type == 19 || nal_type == 20) {  // IDR resets POC + DPB
          c.dpb.clear();
          c.prev_tid0_poc = 0;
        }
        hwhevc::derive_poc(c, nal_type, tid, c.sh.poc_lsb);
        c.cur_span_idx = s;
        bool missing_ref = false;
        if (!hwhevc::build_ref_lists(c, &missing_ref)) {
          if (missing_ref && (nal_type == 8 || nal_type == 9)) {
            // RASL after a span-start CRA: its references precede the
            // span.  Skip — RASL pictures display before the CRA, so a
            // gather from this span never requests them.
            skipped_rasl = true;
            pos += nal_len;
            continue;
          }
          if (missing_ref) c.err = "missing reference picture";
          return -1;
        }
        if (!hwhevc::decode_slice(c, rbsp, br.pos(), ep_pos)) {
          // HWANG_HEVC_PARTIAL=1: keep everything decoded so far (debug
          // aid — recon of the partial TU stream localizes a desync)
          const char* pe = getenv("HWANG_HEVC_PARTIAL");
          if (pe && pe[0] == '1') {
            fprintf(stderr, "hevc partial: frame %d err: %s\n", s,
                    c.err.c_str());
            out->n_tu[s] = (int32_t)(c.tu_used - out->tu_off[s]);
            for (int r = s + 1; r < n_samples; r++) {
              out->tu_off[r] = (int32_t)c.tu_used;
              out->n_tu[r] = 0;
            }
            if (out->n_pu) {
              out->n_pu[s] = (int32_t)(out->used_pu - out->pu_off[s]);
              for (int r = s + 1; r < n_samples; r++) {
                out->pu_off[r] = (int32_t)out->used_pu;
                out->n_pu[r] = 0;
              }
            }
            out->used_tu = c.tu_used;
            out->used_coeff = c.coef_used;
            return n_samples;
          }
          return -1;
        }
        got_slice = true;
        hwhevc::finalize_picture(c, s);
      }
      pos += nal_len;
    }
    if (!got_slice && !skipped_rasl) {
      c.err = "sample without a slice";
      return -1;
    }
    if (skipped_rasl) {
      if (out->frame_type) out->frame_type[s] = 3;  // skipped (RASL)
      if (out->poc) out->poc[s] = INT32_MIN;
    }
    out->n_tu[s] = (int32_t)(c.tu_used - out->tu_off[s]);
    if (out->n_pu) out->n_pu[s] = (int32_t)(out->used_pu - out->pu_off[s]);
    if (out->deblock_disabled) out->deblock_disabled[s] = c.sh.deblocking_disabled;
    if (out->qp_map)
      memcpy(out->qp_map + (int64_t)s * c.w4 * c.h4, c.qpy.data(),
             c.w4 * c.h4);
    if (out->sao && !c.sao.empty())
      memcpy(out->sao + (int64_t)s * c.sao.size(), c.sao.data(),
             c.sao.size());
    if (out->dbf) {
      out->dbf[s * 4 + 0] = (int8_t)c.sh.beta_offset;
      out->dbf[s * 4 + 1] = (int8_t)c.sh.tc_offset;
      // deblock uses the PPS-only chroma offsets (8.7.2.5.5
      // cQpPicOffset), NOT the slice-resolved decode offsets
      out->dbf[s * 4 + 2] = (int8_t)c.pps.cb_qp_offset;
      out->dbf[s * 4 + 3] = (int8_t)c.pps.cr_qp_offset;
    }
  }
  out->used_tu = c.tu_used;
  out->used_coeff = c.coef_used;
  return n_samples;
}
