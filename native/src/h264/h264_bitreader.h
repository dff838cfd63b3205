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
      : buf_(data), nbits_(size * 8), pos_(0), error_(false) {}

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
    if (pos_ + n > nbits_) {
      error_ = true;
      pos_ = nbits_;
      return 0;
    }
    uint32_t v = 0;
    size_t p = pos_;
    pos_ += n;
    // byte-wise gather
    while (n > 0) {
      int byte = p >> 3;
      int bit = p & 7;
      int take = 8 - bit;
      if (take > n) take = n;
      uint32_t chunk = (buf_[byte] >> (8 - bit - take)) & ((1u << take) - 1);
      v = (v << take) | chunk;
      p += take;
      n -= take;
    }
    return v;
  }

  // Peek up to 24 bits without consuming (zero-padded past the end).
  uint32_t peek(int n) {
    uint32_t v = 0;
    size_t p = pos_;
    int got = 0;
    while (got < n) {
      uint32_t bit = 0;
      if (p < nbits_) bit = (buf_[p >> 3] >> (7 - (p & 7))) & 1;
      v = (v << 1) | bit;
      p++;
      got++;
    }
    return v;
  }

  void skip(int n) {
    pos_ += n;
    if (pos_ > nbits_) {
      error_ = true;
      pos_ = nbits_;
    }
  }

  uint32_t ue() {
    int zeros = 0;
    while (pos_ < nbits_ && u1() == 0) {
      zeros++;
      if (zeros > 31) {
        error_ = true;
        return 0;
      }
    }
    if (zeros == 0) return 0;
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
  const uint8_t* buf_;
  size_t nbits_;
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
