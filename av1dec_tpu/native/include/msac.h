// Multi-symbol adaptive arithmetic (range) decoder  [SPEC §8.2].
//
// CDF convention (matches SPEC §8.2.6 / the stored form in §9 defaults):
// an N-symbol CDF is an array of N uint16 "inverse cumulative" values
//   cdf[i] = 32768 - P(symbol <= i) * 32768,  strictly decreasing, cdf[N-1]=0,
// followed by one counter slot used by the adaptation rate [SPEC §8.2.4].
//
// Implementation uses a 64-bit window with the complement trick
// (SymbolValue = ~stream bits, padded with ones past the end), which is
// bit-equivalent to the spec's bit-at-a-time process.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>

namespace av1 {

// Debug symbol tracing (AV1N_TRACE=1): every decoded symbol is printed as
// "T <n> <nsyms> <ret> <rng> <icdf0>" for differential debugging against
// the Python spec-model msac.
inline bool msac_trace_enabled() {
  // init-once (C++11 static init is thread-safe; no later writes)
  static const bool v = [] {
    const char* e = std::getenv("AV1N_TRACE");
    return e && *e == '1';
  }();
  return v;
}

constexpr int EC_PROB_SHIFT = 6;
constexpr int EC_MIN_PROB = 4;
constexpr int EC_WIN_SIZE = 64;

class Msac {
 public:
  void init(const uint8_t* data, size_t size, bool allow_update_cdf) {
    bptr_ = data;
    start_ = data;
    end_ = data + size;
    dif_ = (~(uint64_t)0) >> 1;  // (1 << 63) - 1
    rng_ = 0x8000;
    cnt_ = -15;
    allow_update_cdf_ = allow_update_cdf;
    refill();
  }

  bool allow_update_cdf() const { return allow_update_cdf_; }
  long trace_pos() const { return bptr_ - start_; }

  // decode_symbol [SPEC §8.2.6] + update_cdf [SPEC §8.2.4]
  int decode_symbol(uint16_t* cdf, int nsyms) {
    int ret = decode_symbol_noadapt(cdf, nsyms);
    if (allow_update_cdf_) update_cdf(cdf, ret, nsyms);
    return ret;
  }

  int decode_symbol_noadapt(const uint16_t* cdf, int nsyms) {
    int ret = decode_symbol_noadapt_impl(cdf, nsyms);
    if (msac_trace_enabled()) {
      std::fprintf(stderr, "T %d %d %d %u %u\n", trace_n_++, nsyms, ret,
                   rng_, (unsigned)cdf[0]);
    }
    return ret;
  }

  int decode_symbol_noadapt_impl(const uint16_t* cdf, int nsyms) {
    const int N = nsyms - 1;
    unsigned c = (unsigned)(dif_ >> (EC_WIN_SIZE - 16));
    unsigned u, v = rng_;
    int ret = -1;
    do {
      ret++;
      u = v;
      v = ((rng_ >> 8) * ((unsigned)cdf[ret] >> EC_PROB_SHIFT)) >>
          (7 - EC_PROB_SHIFT);
      v += EC_MIN_PROB * (N - ret);
    } while (c < v);
    rng_ = u - v;
    dif_ -= (uint64_t)v << (EC_WIN_SIZE - 16);
    normalize();
    return ret;
  }

  // adaptive bool = 2-symbol CDF
  int decode_bool(uint16_t* cdf) { return decode_symbol(cdf, 2); }

  // non-adaptive bool with fixed probability f (icdf scale: f = 32768-p0)
  int decode_bool_prob(unsigned f) {
    int ret = decode_bool_prob_impl(f);
    if (msac_trace_enabled()) {
      std::fprintf(stderr, "T %d B %d %u %u\n", trace_n_++, ret, rng_, f);
    }
    return ret;
  }

  int decode_bool_prob_impl(unsigned f) {
    unsigned v = (((rng_ >> 8) * (f >> EC_PROB_SHIFT)) >>
                  (7 - EC_PROB_SHIFT)) +
                 EC_MIN_PROB;
    uint64_t vw = (uint64_t)v << (EC_WIN_SIZE - 16);
    int ret;
    if (dif_ >= vw) {  // symbol 0
      ret = 0;
      dif_ -= vw;
      rng_ -= v;
    } else {  // symbol 1
      ret = 1;
      rng_ = v;
    }
    normalize();
    return ret;
  }

  // equiprobable literal, MSB first [SPEC §8.2.5 read_literal]
  unsigned decode_literal(int n) {
    unsigned x = 0;
    for (int i = 0; i < n; i++) x = (x << 1) | decode_bool_prob(16384);
    return x;
  }

  // Golomb-coded suffix used by MV components and high coeff levels
  // [SPEC §5.11.x read_golomb]
  unsigned decode_golomb() {
    int numBits = 0;
    while (!decode_bool_prob(16384)) {
      numBits++;
      if (numBits >= 32) break;
    }
    // first bit of value is the implicit 1
    unsigned x = 1;
    for (int i = 0; i < numBits; i++) x = (x << 1) | decode_bool_prob(16384);
    return x - 1;
  }

  // update_cdf [SPEC §8.2.4]
  static void update_cdf(uint16_t* cdf, int val, int nsyms) {
    static const int nsymbs2speed[17] = {0, 0, 1, 1, 2, 2, 2, 2, 2,
                                         2, 2, 2, 2, 2, 2, 2, 2};
    const int count = cdf[nsyms];
    const int rate = 3 + (count > 15) + (count > 31) + nsymbs2speed[nsyms];
    int tmp = 32768;
    for (int i = 0; i < nsyms - 1; i++) {
      tmp = (i == val) ? 0 : tmp;
      if (tmp < cdf[i]) {
        cdf[i] -= (uint16_t)((cdf[i] - tmp) >> rate);
      } else {
        cdf[i] += (uint16_t)((tmp - cdf[i]) >> rate);
      }
    }
    cdf[nsyms] += (count < 32);
  }

 private:
  void normalize() {
    // bring rng back to [2^15, 2^16)
    int d = 0;
    unsigned r = rng_;
    while (r < 0x8000u) {
      r <<= 1;
      d++;
    }
    if (d) {
      cnt_ -= d;
      dif_ = ((dif_ + 1) << d) - 1;  // keep the all-ones padding
      rng_ = r;
      if (cnt_ < 0) refill();
    } else if (cnt_ < 0) {
      refill();
    }
  }

  void refill() {
    int s = EC_WIN_SIZE - 9 - (cnt_ + 15);
    uint64_t dif = dif_;
    const uint8_t* b = bptr_;
    for (; s >= 0 && b < end_; s -= 8, b++) {
      dif ^= (uint64_t)(*b) << s;
      cnt_ += 8;
    }
    if (b >= end_) cnt_ = 0x4000;  // "lots of bits": pad with ones
    dif_ = dif;
    bptr_ = b;
  }

  const uint8_t* bptr_ = nullptr;
  const uint8_t* start_ = nullptr;
  const uint8_t* end_ = nullptr;
  uint64_t dif_ = 0;
  unsigned rng_ = 0x8000;
  int cnt_ = 0;
  bool allow_update_cdf_ = true;
  int trace_n_ = 0;
};

}  // namespace av1
