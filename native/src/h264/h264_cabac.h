// CABAC arithmetic decoding engine (H.264 spec 9.3.3.2) and context
// model storage (9.3.1.1).
//
// Spec-faithful codIRange/codIOffset state machine; the stream feed is
// window-based (one unaligned 64-bit big-endian load serves up to 32
// bits) and renormalisation is a single clz-derived shift instead of the
// spec's bit-serial loop — bit-for-bit the same consumption, verified by
// the randomized codec soak against libavcodec.  Constants live in
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
      : buf_(data), nbits_(nbits), nbytes_((nbits + 7) / 8), pos_(bitpos) {
    range_ = 510;
    offset_ = next_bits(9);
  }

  // Reads past the end feed zeros; >64 overrun bits = corrupt stream.
  bool error() const { return pos_ > nbits_ + 64; }
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
    offset_ = (offset_ << 1) | next_bits(1);
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

  int raw_u8() { return (int)next_bits(8); }

  void reinit() {
    range_ = 510;
    offset_ = next_bits(9);
  }

 private:
  // Next n (1..32) stream bits, zero-padded past the end.
  uint32_t next_bits(int n) {
    size_t byte = pos_ >> 3;
    uint64_t w;
    if (byte + 8 <= nbytes_) {
      memcpy(&w, buf_ + byte, 8);
      w = __builtin_bswap64(w);
    } else {
      w = 0;
      for (int i = 0; i < 8; i++) {
        uint64_t b = (byte + i < nbytes_) ? buf_[byte + i] : 0;
        w = (w << 8) | b;
      }
    }
    w <<= (pos_ & 7);
    pos_ += n;
    return (uint32_t)(w >> (64 - n));
  }

  void renorm() {
    if (range_ >= 256) return;
    int sh = __builtin_clz(range_) - 23;  // doublings until range >= 256
    offset_ = (offset_ << sh) | next_bits(sh);
    range_ <<= sh;
  }

  const uint8_t* buf_;
  size_t nbits_;
  size_t nbytes_;
  size_t pos_;
  uint32_t range_ = 510;
  uint32_t offset_ = 0;
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
