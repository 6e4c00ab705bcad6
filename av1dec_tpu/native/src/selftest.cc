// In-library unit selftests, driven from pytest via av1n_selftest().
// Hand-built byte strings vs expected descriptor values [SPEC §4.10].
#include <cstdint>
#include <cstdio>

#include "bitreader.h"

using namespace av1;

#define CHECK(cond)                                            \
  do {                                                         \
    if (!(cond)) {                                             \
      std::fprintf(stderr, "selftest failed: %s (%s:%d)\n",    \
                   #cond, __FILE__, __LINE__);                 \
      return __LINE__;                                         \
    }                                                          \
  } while (0)

static int test_bitreader() {
  {  // f(n) big-endian
    const uint8_t d[] = {0xA0, 0xFF};  // 1010 0000 1111 1111
    BitReader b(d, 2);
    CHECK(b.f(3) == 5);
    CHECK(b.f(5) == 0);
    CHECK(b.f(8) == 0xFF);
    CHECK(!b.overrun());
  }
  {  // uvlc: "1"=0, "010"=1, "011"=2, "00100"=3
    const uint8_t d[] = {0b10100110, 0b01000000};
    BitReader b(d, 2);
    CHECK(b.uvlc() == 0);
    CHECK(b.uvlc() == 1);
    CHECK(b.uvlc() == 2);
    CHECK(b.uvlc() == 3);
  }
  {  // le(n) little-endian bytes
    const uint8_t d[] = {0x34, 0x12};
    BitReader b(d, 2);
    CHECK(b.le(2) == 0x1234);
  }
  {  // leb128: 0x85 0x02 -> 5 | (2<<7) = 261
    const uint8_t d[] = {0x85, 0x02};
    BitReader b(d, 2);
    CHECK(b.leb128() == 261);
  }
  {  // su(4): value bits "0011" then sign "1" -> 3 - 16 = -13
    const uint8_t d[] = {0b00111000};
    BitReader b(d, 1);
    CHECK(b.su(4) == -13);
  }
  {  // ns(5): w=3, m=3. "11"+"0" -> 3 ; "11"+"1" -> 4 ; "01" -> 1
    const uint8_t d[] = {0b11011101};
    BitReader b(d, 1);
    CHECK(b.ns(5) == 3);
    CHECK(b.ns(5) == 4);
    BitReader b2(d, 1);
    b2.f(6);
    CHECK(b2.ns(5) == 1);
  }
  {  // overrun detection
    const uint8_t d[] = {0x00};
    BitReader b(d, 1);
    b.f(8);
    CHECK(!b.overrun());
    b.f(1);
    CHECK(b.overrun());
  }
  return 0;
}

extern "C" int av1n_selftest() {
  int rc = test_bitreader();
  if (rc) return rc;
  return 0;
}
