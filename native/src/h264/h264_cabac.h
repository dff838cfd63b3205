// CABAC arithmetic decoding engine (H.264 spec 9.3.3.2) and context
// model storage (9.3.1.1).
//
// Straight spec implementation: codIRange/codIOffset with bit-serial
// renormalisation.  Throughput is irrelevant here next to table-driven
// tricks' risk: the host entropy decode is already overlapped across
// clips by the pipeline's thread pool, and correctness (bit-exactness
// with libavcodec) is the contract.  Constants live in
// h264_cabac_tables.h (generated; see native/tools/extract_cabac_tables.py).
#pragma once

#include <cstdint>
#include <cstring>

#include "h264_cabac_tables.h"

namespace hwh264 {

class Cabac {
 public:
  // `data`/`nbits` is the slice RBSP; `bitpos` must be byte-aligned
  // (cabac_alignment_one_bit already consumed by the caller).
  Cabac(const uint8_t* data, size_t nbits, size_t bitpos)
      : buf_(data), nbits_(nbits), pos_(bitpos) {
    range_ = 510;
    offset_ = 0;
    for (int i = 0; i < 9; i++) offset_ = (offset_ << 1) | bit();
  }

  bool error() const { return over_ > 64; }
  size_t bitpos() const { return pos_; }

  // Context-coded bin (9.3.3.2.1 + 9.3.3.2.2).  `s` is the packed
  // context state: (pStateIdx << 1) | valMPS.
  int decode(uint8_t* s) {
    int state = *s >> 1;
    int mps = *s & 1;
    uint32_t rlps = kRangeTabLPS[state][(range_ >> 6) & 3];
    range_ -= rlps;
    int bin;
    if (offset_ >= range_) {
      bin = mps ^ 1;
      offset_ -= range_;
      range_ = rlps;
      if (state == 0) mps ^= 1;
      state = kTransIdxLPS[state];
    } else {
      bin = mps;
      if (state < 62) state++;
    }
    *s = (uint8_t)((state << 1) | mps);
    renorm();
    return bin;
  }

  int bypass() {
    offset_ = (offset_ << 1) | bit();
    if (offset_ >= range_) {
      offset_ -= range_;
      return 1;
    }
    return 0;
  }

  // end_of_slice_flag / I_PCM escape (9.3.3.2.4).
  int terminate() {
    range_ -= 2;
    if (offset_ >= range_) return 1;
    renorm();
    return 0;
  }

  // I_PCM support: after terminate() == 1 for an I_PCM escape, the bit
  // cursor (incl. the 9-bit preload) sits exactly at the encoder's
  // post-flush position; the caller byte-aligns, reads the raw sample
  // bytes, and restarts decoding with a fresh engine init (9.3.1.2).
  void byte_align() { pos_ = (pos_ + 7) & ~(size_t)7; }

  int raw_u8() {
    int v = 0;
    for (int i = 0; i < 8; i++) v = (v << 1) | (int)bit();
    return v;
  }

  void reinit() {
    range_ = 510;
    offset_ = 0;
    for (int i = 0; i < 9; i++) offset_ = (offset_ << 1) | bit();
  }

 private:
  uint32_t bit() {
    if (pos_ >= nbits_) {
      over_++;
      pos_++;
      return 0;
    }
    uint32_t b = (buf_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1;
    pos_++;
    return b;
  }

  void renorm() {
    while (range_ < 256) {
      range_ <<= 1;
      offset_ = (offset_ << 1) | bit();
    }
  }

  const uint8_t* buf_;
  size_t nbits_;
  size_t pos_;
  uint32_t range_ = 510;
  uint32_t offset_ = 0;
  int over_ = 0;
};

// Context variable initialisation (9.3.1.1): state from (m,n) at SliceQPY.
struct CabacContexts {
  uint8_t s[1024];  // (pStateIdx << 1) | valMPS

  void init(int slice_qp, bool intra_slice, int cabac_init_idc) {
    const int8_t(*tab)[2] =
        intra_slice ? kCtxInitI : kCtxInitPB[cabac_init_idc];
    int qp = slice_qp < 0 ? 0 : (slice_qp > 51 ? 51 : slice_qp);
    for (int i = 0; i < 1024; i++) {
      int pre = ((tab[i][0] * qp) >> 4) + tab[i][1];
      pre = pre < 1 ? 1 : (pre > 126 ? 126 : pre);
      s[i] = pre <= 63 ? (uint8_t)(((63 - pre) << 1) | 0)
                       : (uint8_t)(((pre - 64) << 1) | 1);
    }
  }
};

}  // namespace hwh264
