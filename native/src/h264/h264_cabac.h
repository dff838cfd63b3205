// CABAC arithmetic decoding engine (H.264 spec 9.3.3.2) and context
// model storage (9.3.1.1).
//
// Scaled-state design: instead of the spec's 9-bit codIRange/codIOffset
// pair renormalised bit-by-bit, the engine keeps both values pre-shifted
// left by `k_` buffered lookahead bits:
//
//   range_sc_ = codIRange  << k_
//   off_      = codIOffset << k_  |  (next k_ stream bits)
//
// Renormalisation then never moves data at all: consuming `sh` stream
// bits into codIOffset is the identity on `off_` (the bits are already
// in place) and only re-declares the split point, so renorm collapses to
// `k_ = bitlen(range_sc_) - 9` — branchless, since codIRange is always
// exactly 9 bits after renorm.  A bypass bin is ~4 ops (shift, compare,
// conditional subtract).  The stream is touched only when the buffer
// runs low: one unaligned 64-bit big-endian load appends 32 bits per
// ~32 decoded bins, vs one load per bin for a windowed feed.
// Bit-for-bit the same consumption as the spec loop, verified by the
// randomized codec soak against libavcodec.  Constants live in
// h264_cabac_tables.h (generated; see native/tools/extract_cabac_tables.py).
#pragma once

#include <cstdint>
#include <cstring>

#include "h264_cabac_tables.h"

namespace hwh264 {

// Fused context-transition table over the packed state sv =
// (pStateIdx << 1) | valMPS: entry (sv << 1 | is_lps) is the next packed
// state (9.3.3.2.1.1 — MPS: pStateIdx += (pStateIdx < 62); LPS:
// pStateIdx = TransIdxLPS, valMPS flips at pStateIdx 0).
struct NextStateTab {
  uint8_t t[256];
  NextStateTab() {
    for (int sv = 0; sv < 128; sv++) {
      int st = sv >> 1, mp = sv & 1;
      t[(sv << 1) | 0] = (uint8_t)(((st + (st < 62)) << 1) | mp);
      int mpl = (st == 0) ? (mp ^ 1) : mp;
      t[(sv << 1) | 1] = (uint8_t)((kTransIdxLPS[st] << 1) | mpl);
    }
  }
};
inline const NextStateTab kNextStateTab{};

class Cabac {
 public:
  // `data`/`nbits` is the slice RBSP; `bitpos` must be byte-aligned
  // (cabac_alignment_one_bit already consumed by the caller).
  Cabac(const uint8_t* data, size_t nbits, size_t bitpos)
      : buf_(data), nbits_(nbits), nbytes_((nbits + 7) / 8), pos_(bitpos) {
    reinit();
  }

  // Reads past the end feed zeros; >64 overrun bits = corrupt stream.
  // (pos_ - k_ is the logical consumed-bit cursor; pos_ runs ahead by
  // the k_ buffered lookahead bits.)
  bool error() const { return pos_ - k_ > nbits_ + 64; }
  size_t bitpos() const { return pos_ - k_; }

  // Context-coded bin (9.3.3.2.1 + 9.3.3.2.2).  `s` is the packed
  // context state: (pStateIdx << 1) | valMPS.  always_inline: the call
  // overhead is comparable to the bin decode itself in the residual
  // loops, and -O3 alone leaves several hot sites out-of-line.
  // Branchless MPS/LPS select (cmov): residual-loop contexts run
  // 60/40-ish, where a data-dependent branch mispredicts enough to cost
  // more than three selects; next-state is one fused table (kNextState).
  // HWANG_CABAC_DUMP: per-bin (kind, ctx, value) log for engine
  // cross-verification (tests/tools only; requires dump_file set)
  static inline FILE* dumpf() {
    static FILE* f = [] {
      const char* e = getenv("HWANG_CABAC_DUMP");
      FILE* fh = e && e[0] ? fopen(e, "w") : (FILE*)nullptr;
      if (fh) setvbuf(fh, nullptr, _IONBF, 0);
      return fh;
    }();
    return f;
  }

  __attribute__((noinline)) int decode_dump(uint8_t* s, int idx) {
    int v = decode(s);
    if (dumpf()) fprintf(dumpf(), "c %d %d\n", idx, v);
    return v;
  }
  int bypass_dump() {
    int v = bypass();
    if (dumpf()) fprintf(dumpf(), "b -1 %d\n", v);
    return v;
  }
  int terminate_dump() {
    int v = terminate();
    if (dumpf()) fprintf(dumpf(), "t -1 %d\n", v);
    return v;
  }

  __attribute__((always_inline)) inline int decode(uint8_t* s) {
    if (k_ < 8) refill();
    uint32_t sv = *s;
    uint32_t rlps =
        kRangeTabLPS[sv >> 1][(uint32_t)(range_sc_ >> (k_ + 6)) & 3];
    uint64_t rlps_sc = (uint64_t)rlps << k_;
    uint64_t mps_sc = range_sc_ - rlps_sc;
    int is_lps = off_ >= mps_sc;
    off_ -= is_lps ? mps_sc : 0;
    range_sc_ = is_lps ? rlps_sc : mps_sc;
    *s = kNextStateTab.t[(sv << 1) | is_lps];
    // renorm: codIRange is 9 bits ⇒ k_ = bitlen(range_sc_) - 9 (no-op
    // when no renorm is due).
    k_ = 55 - __builtin_clzll(range_sc_);
    return (int)((sv ^ is_lps) & 1);
  }

  // Branchless: bypass bins are fair coins (signs, EG suffix bits), so a
  // data-dependent branch here mispredicts ~50% of the time.
  __attribute__((always_inline)) inline int bypass() {
    if (k_ < 8) refill();
    k_ -= 1;
    range_sc_ >>= 1;
    uint64_t ge = -(uint64_t)(off_ >= range_sc_);
    off_ -= range_sc_ & ge;
    return (int)(ge & 1);
  }

  // ---- multi-bin bypass (peek / consume) ----------------------------------
  //
  // Bypass bins never touch the context state and halve codIRange each,
  // so with the scaled-state representation the next n bypass bins are
  // exactly the base-2 digits of  off_ / (range_sc_ >> n)  whenever the
  // low n bits of range_sc_ are zero (k_ >= n guarantees it: range_sc_ =
  // codIRange << k_).  One 64-bit division therefore decodes a whole
  // Exp-Golomb suffix + sign in place of a branchy bin-by-bin loop.
  // Consumption is deferred: peek, inspect, then consume exactly t bins.
  // Bit-exact vs the sequential loop by construction (same splits).

  // Raise the buffered lookahead to >= n bits (n <= 45; off_ then holds
  // 9 + 45 = 54 significant bits, within uint64).
  __attribute__((always_inline)) inline void ensure(int n) {
    while (k_ < n) {
      int add = 45 - k_;
      if (add > 32) add = 32;
      off_ = (off_ << add) | next_bits(add);
      range_sc_ <<= add;
      k_ += add;
    }
  }

  // Next n bypass bins as an integer, consuming nothing.  Requires
  // k_ >= n (call ensure(n) first).  q < 2^n since off_ < range_sc_.
  __attribute__((always_inline)) inline uint32_t peek_bypass(int n) {
    return (uint32_t)(off_ / (range_sc_ >> n));
  }

  // Consume the first t of the n bins previously peeked as q.
  __attribute__((always_inline)) inline void consume_bypass(int n, int t,
                                                            uint32_t q) {
    range_sc_ >>= t;
    k_ -= t;
    off_ -= (uint64_t)(q >> (n - t)) * range_sc_;
  }

  // Exp-Golomb order-k suffix + sign in one division: prefix of l ones, a
  // zero, k + l suffix bits, then the sign bin — 2*l + k + 2 bins total.
  // Returns the non-negative magnitude contribution ((2^l - 1) << k) +
  // suffix and sets *neg; returns -1 when the prefix is too long for one
  // peek window (caller falls back to the bin loop — nothing consumed).
  __attribute__((always_inline)) inline int eg_suffix_sign(int k, int* neg) {
    ensure(30);
    uint32_t q = peek_bypass(30);
    // leading-ones count of the 30-bin window
    int l = __builtin_clz(~(q << 2) | 3u);
    if (2 * l + k + 2 > 30) return -1;
    int t = 2 * l + k + 2;
    uint32_t bits = q >> (30 - t);
    consume_bypass(30, t, q);
    uint32_t suffix = (bits >> 1) & ((1u << (k + l)) - 1);
    *neg = (int)(bits & 1);
    return (int)((((1u << l) - 1) << k) + suffix);
  }

  // end_of_slice_flag / I_PCM escape (9.3.3.2.4).
  int terminate() {
    if (k_ < 8) refill();
    range_sc_ -= (uint64_t)2 << k_;
    if (off_ >= range_sc_) return 1;
    k_ = 55 - __builtin_clzll(range_sc_);
    return 0;
  }

  // I_PCM support: after terminate() == 1 for an I_PCM escape, the
  // logical bit cursor sits exactly at the encoder's post-flush
  // position; the caller byte-aligns (dropping the lookahead), reads
  // the raw sample bytes, and restarts decoding with a fresh engine
  // init (9.3.1.2).
  void byte_align() {
    pos_ -= k_;
    k_ = 0;
    pos_ = (pos_ + 7) & ~(size_t)7;
  }

  int raw_u8() { return (int)next_bits(8); }

  void reinit() {
    pos_ -= k_;
    k_ = 0;
    range_sc_ = 510;
    off_ = next_bits(9);
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

  void refill() {
    off_ = (off_ << 32) | next_bits(32);
    range_sc_ <<= 32;
    k_ += 32;
  }

  const uint8_t* buf_;
  size_t nbits_;
  size_t nbytes_;
  size_t pos_;
  uint64_t range_sc_ = 510;  // codIRange << k_
  uint64_t off_ = 0;         // codIOffset << k_ | buffered stream bits
  int k_ = 0;                // buffered lookahead bits
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
