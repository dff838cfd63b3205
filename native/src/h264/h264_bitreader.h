// MSB-first bit reader over an RBSP (emulation-prevention already stripped),
// plus Exp-Golomb codes.  Overruns set a sticky error flag instead of
// throwing; callers check error() at slice granularity.
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

namespace hwh264 {

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size)
      : buf_(data), nbits_(size * 8), nbytes_(size), pos_(0), error_(false) {}

  bool error() const { return error_; }
  size_t bits_left() const { return pos_ < nbits_ ? nbits_ - pos_ : 0; }
  size_t pos() const { return pos_; }
  const uint8_t* data() const { return buf_; }
  size_t nbits() const { return nbits_; }

  uint32_t u1() {
    if (pos_ >= nbits_) {
      error_ = true;
      return 0;
    }
    uint32_t b = (buf_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1;
    pos_++;
    return b;
  }

  uint32_t u(int n) {
    if (n == 0) return 0;
    if (pos_ + (size_t)n > nbits_) {
      error_ = true;
      pos_ = nbits_;
      return 0;
    }
    uint32_t v = peek(n);
    pos_ += n;
    return v;
  }

  // Peek up to 32 bits without consuming (zero-padded past the end).
  uint32_t peek(int n) {
    if (n == 0) return 0;
    return (uint32_t)(window() >> (64 - n));
  }

  void skip(int n) {
    pos_ += n;
    if (pos_ > nbits_) {
      error_ = true;
      pos_ = nbits_;
    }
  }

  uint32_t ue() {
    if (pos_ >= nbits_) return 0;
    uint32_t w = peek(32);
    if (w == 0) {
      // >= 32 leading zeros (or all-zero tail running past the end):
      // the bit-serial reference errored in both cases
      error_ = true;
      pos_ = nbits_;
      return 0;
    }
    int zeros = __builtin_clz(w);
    if (zeros == 0) {
      pos_++;
      return 0;
    }
    if (pos_ + 2 * (size_t)zeros + 1 > nbits_) {
      error_ = true;
      pos_ = nbits_;
      return 0;
    }
    if (zeros <= 15) {  // whole code is inside the peeked 32 bits
      uint32_t suffix = (w >> (31 - 2 * zeros)) & ((1u << zeros) - 1);
      pos_ += 2 * (size_t)zeros + 1;
      return (1u << zeros) - 1 + suffix;
    }
    pos_ += zeros + 1;
    return (1u << zeros) - 1 + u(zeros);
  }

  int32_t se() {
    uint32_t k = ue();
    int32_t mag = (k + 1) >> 1;
    return (k & 1) ? mag : -mag;
  }

  // truncated Exp-Golomb (spec 9.1): for range [0, 1] it's a single
  // inverted bit; otherwise ue().
  uint32_t te(int range) {
    if (range == 1) return 1 - u1();
    return ue();
  }

  bool byte_aligned() const { return (pos_ & 7) == 0; }
  void byte_align() { pos_ = (pos_ + 7) & ~size_t(7); }

  bool more_rbsp_data() const {
    if (pos_ >= nbits_) return false;
    // find last set bit (rbsp_stop_one_bit)
    size_t nbytes = (nbits_ + 7) / 8;
    size_t i = nbytes;
    while (i > 0 && buf_[i - 1] == 0) i--;
    if (i == 0) return false;
    uint8_t b = buf_[i - 1];
    int low = 0;
    while (!((b >> low) & 1)) low++;
    size_t stop_pos = (i - 1) * 8 + (7 - low);
    return pos_ < stop_pos;
  }

 private:
  // 64-bit big-endian window at the current bit position, MSB-aligned;
  // >= 57 valid (zero-padded past the end) bits — enough for peek(32).
  uint64_t window() const {
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
    return w << (pos_ & 7);
  }

  const uint8_t* buf_;
  size_t nbits_;
  size_t nbytes_;
  size_t pos_;
  bool error_;
};

// Strip 00 00 03 emulation-prevention bytes (spec 7.4.1.1).
inline std::vector<uint8_t> strip_ep(const uint8_t* data, size_t size) {
  std::vector<uint8_t> out;
  out.reserve(size);
  size_t i = 0;
  while (i < size) {
    if (i + 2 < size && data[i] == 0 && data[i + 1] == 0 && data[i + 2] == 3) {
      out.push_back(0);
      out.push_back(0);
      i += 3;
    } else {
      out.push_back(data[i]);
      i++;
    }
  }
  return out;
}

}  // namespace hwh264
