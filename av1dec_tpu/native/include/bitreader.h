// Plain bit reader for uncompressed headers.
// Implements the fixed-probability descriptors of [SPEC §4.10]:
//   f(n), uvlc(), le(n), leb128(), su(n), ns(n).
#pragma once

#include <cstddef>
#include <cstdint>

namespace av1 {

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size)
      : data_(data), size_(size), bit_pos_(0) {}

  bool overrun() const { return bit_pos_ > 8 * size_; }
  size_t bit_pos() const { return bit_pos_; }
  size_t bytes_read() const { return (bit_pos_ + 7) >> 3; }

  // f(n): n-bit big-endian unsigned [SPEC §4.10.2]
  uint32_t f(int n) {
    uint32_t x = 0;
    for (int i = 0; i < n; i++) {
      x = (x << 1) | read_bit();
    }
    return x;
  }

  uint64_t f64(int n) {
    uint64_t x = 0;
    for (int i = 0; i < n; i++) x = (x << 1) | read_bit();
    return x;
  }

  // uvlc(): variable-length unsigned [SPEC §4.10.3]
  uint32_t uvlc() {
    int leading_zeros = 0;
    while (leading_zeros < 32) {
      if (read_bit()) break;
      leading_zeros++;
    }
    if (leading_zeros >= 32) return UINT32_MAX;
    uint32_t value = f(leading_zeros);
    return value + (1u << leading_zeros) - 1;
  }

  // le(n): n-byte little-endian (byte-aligned) [SPEC §4.10.4]
  uint32_t le(int n) {
    uint32_t t = 0;
    for (int i = 0; i < n; i++) {
      t |= f(8) << (8 * i);
    }
    return t;
  }

  // leb128(): variable-length little-endian [SPEC §4.10.5]
  uint64_t leb128() {
    uint64_t value = 0;
    for (int i = 0; i < 8; i++) {
      uint32_t b = f(8);
      value |= (uint64_t)(b & 0x7F) << (i * 7);
      if (!(b & 0x80)) break;
    }
    return value;
  }

  // su(1+n): sign + magnitude [SPEC §4.10.6]
  int32_t su(int n) {
    int32_t value = (int32_t)f(n);
    if (read_bit()) value = value - (1 << n);
    return value;
  }

  // ns(n): non-symmetric unsigned [SPEC §4.10.7]
  uint32_t ns(uint32_t n) {
    int w = 0;
    uint32_t x = n;
    while (x) {
      x >>= 1;
      w++;
    }
    uint32_t m = (1u << w) - n;
    uint32_t v = f(w - 1);
    if (v < m) return v;
    uint32_t extra = read_bit();
    return (v << 1) - m + extra;
  }

  // delta_q(): 1-bit flag + su(6) [SPEC §5.9.13 read_delta_q]
  int32_t delta_q() { return read_bit() ? su(6) : 0; }

  void byte_align() { bit_pos_ = (bit_pos_ + 7) & ~(size_t)7; }

  uint32_t read_bit() {
    if (bit_pos_ >= 8 * size_) {
      bit_pos_++;  // track overrun
      return 0;
    }
    uint32_t bit = (data_[bit_pos_ >> 3] >> (7 - (bit_pos_ & 7))) & 1;
    bit_pos_++;
    return bit;
  }

 private:
  const uint8_t* data_;
  size_t size_;
  size_t bit_pos_;
};

// Standalone leb128 for OBU framing [SPEC §4.10.5]
inline uint64_t read_leb128(const uint8_t* data, size_t size, size_t* pos,
                            bool* ok) {
  uint64_t value = 0;
  *ok = false;
  for (int i = 0; i < 8; i++) {
    if (*pos >= size) return 0;
    uint8_t b = data[(*pos)++];
    value |= (uint64_t)(b & 0x7F) << (i * 7);
    if (!(b & 0x80)) {
      *ok = true;
      return value;
    }
  }
  *ok = true;
  return value;
}

}  // namespace av1
