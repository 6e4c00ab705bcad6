"""Inverse transforms [SPEC §7.13.3] — NumPy spec model.

Integer butterflies with *computed* trigonometric constants:
  cospi[i] = round(2^12 * cos(i*pi/128)),  i in [0, 64)
  sinpi[i] = round(2^12 * (2*sqrt(2)/3) * sin(i*pi/9))   (iadst4 only)
1-D kernels: DCT 4/8/16/32/64, ADST 4/8/16, IDENTITY 4/8/16/32, and the
lossless 4x4 WHT.  FLIPADST = ADST + output reversal.  All math int64.

2-D flow [SPEC §7.13.3 / libaom inv_txfm2d]:
  rect blocks (|log2w - log2h| odd): inputs scaled by 2896/2^12 (1/sqrt2)
  row transforms -> round_shift(shift0) -> col transforms ->
  round_shift(4) -> residual (caller adds to prediction and clamps).

All 1-D kernels operate on arrays of shape (N, ...) vectorized over
trailing axes.
"""

import math

import numpy as np

COS_BIT = 12
COSPI = np.array(
    [round((1 << COS_BIT) * math.cos(i * math.pi / 128)) for i in range(64)],
    dtype=np.int64)
SINPI = np.array(
    [0] + [round((1 << COS_BIT) * (2 * math.sqrt(2) / 3) *
                 math.sin(i * math.pi / 9)) for i in range(1, 5)],
    dtype=np.int64)
NEW_SQRT2 = 5793       # round(2^12 * sqrt(2))
NEW_INV_SQRT2 = 2896   # round(2^12 / sqrt(2))


def round_shift(x, bit):
    if bit == 0:
        return x
    return (x + (1 << (bit - 1))) >> bit


def half_btf(w0, in0, w1, in1):
    return round_shift(w0 * in0 + w1 * in1, COS_BIT)


# ---------------------------------------------------------------------------
# 1-D inverse DCT (structures mirror libaom av1_idct*_new == SPEC §7.13.3)
# ---------------------------------------------------------------------------

def idct4(i):
    c = COSPI
    b0 = half_btf(c[32], i[0], c[32], i[2])
    b1 = half_btf(c[32], i[0], -c[32], i[2])
    b2 = half_btf(c[48], i[1], -c[16], i[3])
    b3 = half_btf(c[16], i[1], c[48], i[3])
    return [b0 + b3, b1 + b2, b1 - b2, b0 - b3]


def idct8(i):
    c = COSPI
    ev = idct4([i[0], i[2], i[4], i[6]])
    b4 = half_btf(c[56], i[1], -c[8], i[7])
    b7 = half_btf(c[8], i[1], c[56], i[7])
    b5 = half_btf(c[24], i[5], -c[40], i[3])
    b6 = half_btf(c[40], i[5], c[24], i[3])
    s4 = b4 + b5
    s5 = b4 - b5
    s6 = -b6 + b7
    s7 = b6 + b7
    t5 = half_btf(-c[32], s5, c[32], s6)
    t6 = half_btf(c[32], s5, c[32], s6)
    odd = [s4, t5, t6, s7]
    return [ev[k] + odd[3 - k] for k in range(4)] + \
           [ev[3 - k] - odd[k] for k in range(4)]


def idct16(i):
    c = COSPI
    ev = idct8([i[0], i[2], i[4], i[6], i[8], i[10], i[12], i[14]])
    b8 = half_btf(c[60], i[1], -c[4], i[15])
    b15 = half_btf(c[4], i[1], c[60], i[15])
    b9 = half_btf(c[28], i[9], -c[36], i[7])
    b14 = half_btf(c[36], i[9], c[28], i[7])
    b10 = half_btf(c[44], i[5], -c[20], i[11])
    b13 = half_btf(c[20], i[5], c[44], i[11])
    b11 = half_btf(c[12], i[13], -c[52], i[3])
    b12 = half_btf(c[52], i[13], c[12], i[3])
    # stage 3
    s8 = b8 + b9
    s9 = b8 - b9
    s10 = -b10 + b11
    s11 = b10 + b11
    s12 = b12 + b13
    s13 = b12 - b13
    s14 = -b14 + b15
    s15 = b14 + b15
    # stage 4
    t9 = half_btf(-c[16], s9, c[48], s14)
    t14 = half_btf(c[48], s9, c[16], s14)
    t10 = half_btf(-c[48], s10, -c[16], s13)
    t13 = half_btf(-c[16], s10, c[48], s13)
    # stage 5
    u8 = s8 + s11
    u11 = s8 - s11
    u9 = t9 + t10
    u10 = t9 - t10
    u12 = -s12 + s15
    u15 = s12 + s15
    u13 = -t13 + t14
    u14 = t13 + t14
    # stage 6
    v10 = half_btf(-c[32], u10, c[32], u13)
    v13 = half_btf(c[32], u10, c[32], u13)
    v11 = half_btf(-c[32], u11, c[32], u12)
    v12 = half_btf(c[32], u11, c[32], u12)
    odd = [u8, u9, v10, v11, v12, v13, u14, u15]
    return [ev[k] + odd[7 - k] for k in range(8)] + \
           [ev[7 - k] - odd[k] for k in range(8)]


def idct32(i):
    c = COSPI
    ev = idct16([i[2 * k] for k in range(16)])
    # stage 1 permutation of odd inputs
    oi = [i[1], i[17], i[9], i[25], i[5], i[21], i[13], i[29],
          i[3], i[19], i[11], i[27], i[7], i[23], i[15], i[31]]
    # stage 2
    A = [62, 30, 46, 14, 54, 22, 38, 6]
    b = [None] * 16  # odd lane values at positions 16..31 -> b[0..15]
    for k in range(8):
        a = A[k]
        b[k] = half_btf(c[a], oi[k], -c[64 - a], oi[15 - k])
        b[15 - k] = half_btf(c[64 - a], oi[k], c[a], oi[15 - k])
    # stage 3: groups of 4 pattern {+,-},{-+,++}
    s = [None] * 16
    for g in range(0, 16, 4):
        s[g + 0] = b[g + 0] + b[g + 1]
        s[g + 1] = b[g + 0] - b[g + 1]
        s[g + 2] = -b[g + 2] + b[g + 3]
        s[g + 3] = b[g + 2] + b[g + 3]
    # stage 4 rotations (8/56, 40/24)
    t = list(s)
    t[1] = half_btf(-c[8], s[1], c[56], s[14])
    t[14] = half_btf(c[56], s[1], c[8], s[14])
    t[2] = half_btf(-c[56], s[2], -c[8], s[13])
    t[13] = half_btf(-c[8], s[2], c[56], s[13])
    t[5] = half_btf(-c[40], s[5], c[24], s[10])
    t[10] = half_btf(c[24], s[5], c[40], s[10])
    t[6] = half_btf(-c[24], s[6], -c[40], s[9])
    t[9] = half_btf(-c[40], s[6], c[24], s[9])
    # stage 5: merge groups of 4
    u = [None] * 16
    for g, neg in ((0, False), (4, True), (8, False), (12, True)):
        if not neg:
            u[g + 0] = t[g + 0] + t[g + 3]
            u[g + 1] = t[g + 1] + t[g + 2]
            u[g + 2] = t[g + 1] - t[g + 2]
            u[g + 3] = t[g + 0] - t[g + 3]
        else:
            u[g + 0] = -t[g + 0] + t[g + 3]
            u[g + 1] = -t[g + 1] + t[g + 2]
            u[g + 2] = t[g + 1] + t[g + 2]
            u[g + 3] = t[g + 0] + t[g + 3]
    # stage 6 rotations (16/48)
    v = list(u)
    v[2] = half_btf(-c[16], u[2], c[48], u[13])
    v[13] = half_btf(c[48], u[2], c[16], u[13])
    v[3] = half_btf(-c[16], u[3], c[48], u[12])
    v[12] = half_btf(c[48], u[3], c[16], u[12])
    v[4] = half_btf(-c[48], u[4], -c[16], u[11])
    v[11] = half_btf(-c[16], u[4], c[48], u[11])
    v[5] = half_btf(-c[48], u[5], -c[16], u[10])
    v[10] = half_btf(-c[16], u[5], c[48], u[10])
    # stage 7: merge groups of 8
    w = [None] * 16
    for k in range(4):
        w[k] = v[k] + v[7 - k]
        w[7 - k] = v[k] - v[7 - k]
        w[8 + k] = -v[8 + k] + v[15 - k]
        w[15 - k] = v[8 + k] + v[15 - k]
    # stage 8 rotations (32/32)
    x = list(w)
    for m in range(4):
        x[4 + m] = half_btf(-c[32], w[4 + m], c[32], w[11 - m])
        x[11 - m] = half_btf(c[32], w[4 + m], c[32], w[11 - m])
    return [ev[k] + x[15 - k] for k in range(16)] + \
           [ev[15 - k] - x[k] for k in range(16)]


def idct64(i):
    c = COSPI
    ev = idct32([i[2 * k] for k in range(32)])
    oi = [i[k] for k in
          [1, 33, 17, 49, 9, 41, 25, 57, 5, 37, 21, 53, 13, 45, 29, 61,
           3, 35, 19, 51, 11, 43, 27, 59, 7, 39, 23, 55, 15, 47, 31, 63]]
    # stage 2
    A = [63, 31, 47, 15, 55, 23, 39, 7, 59, 27, 43, 11, 51, 19, 35, 3]
    b = [None] * 32  # odd lanes 32..63 -> b[0..31]
    for k in range(16):
        a = A[k]
        b[k] = half_btf(c[a], oi[k], -c[64 - a], oi[31 - k])
        b[31 - k] = half_btf(c[64 - a], oi[k], c[a], oi[31 - k])
    # stage 3: groups of 4
    s = [None] * 32
    for g in range(0, 32, 4):
        s[g + 0] = b[g + 0] + b[g + 1]
        s[g + 1] = b[g + 0] - b[g + 1]
        s[g + 2] = -b[g + 2] + b[g + 3]
        s[g + 3] = b[g + 2] + b[g + 3]
    # stage 4 rotations (4/60, 36/28, 20/44, 52/12)
    t = list(s)
    quads = [(0, 4), (4, 36), (8, 20), (12, 52)]
    for g, a in quads:
        t[g + 1] = half_btf(-c[a], s[g + 1], c[64 - a], s[30 - g])
        t[30 - g] = half_btf(c[64 - a], s[g + 1], c[a], s[30 - g])
        t[g + 2] = half_btf(-c[64 - a], s[g + 2], -c[a], s[29 - g])
        t[29 - g] = half_btf(-c[a], s[g + 2], c[64 - a], s[29 - g])
    # stage 5: merge groups of 4
    u = [None] * 32
    for gi, g in enumerate(range(0, 32, 4)):
        if gi % 2 == 0:
            u[g + 0] = t[g + 0] + t[g + 3]
            u[g + 1] = t[g + 1] + t[g + 2]
            u[g + 2] = t[g + 1] - t[g + 2]
            u[g + 3] = t[g + 0] - t[g + 3]
        else:
            u[g + 0] = -t[g + 0] + t[g + 3]
            u[g + 1] = -t[g + 1] + t[g + 2]
            u[g + 2] = t[g + 1] + t[g + 2]
            u[g + 3] = t[g + 0] + t[g + 3]
    # stage 6 rotations (8/56 on lanes 2-5/26-29; 40/24 on 10-13/18-21)
    v = list(u)
    for base, a in ((0, 8), (8, 40)):
        v[base + 2] = half_btf(-c[a], u[base + 2], c[64 - a], u[29 - base])
        v[29 - base] = half_btf(c[64 - a], u[base + 2], c[a], u[29 - base])
        v[base + 3] = half_btf(-c[a], u[base + 3], c[64 - a], u[28 - base])
        v[28 - base] = half_btf(c[64 - a], u[base + 3], c[a], u[28 - base])
        v[base + 4] = half_btf(-c[64 - a], u[base + 4], -c[a], u[27 - base])
        v[27 - base] = half_btf(-c[a], u[base + 4], c[64 - a], u[27 - base])
        v[base + 5] = half_btf(-c[64 - a], u[base + 5], -c[a], u[26 - base])
        v[26 - base] = half_btf(-c[a], u[base + 5], c[64 - a], u[26 - base])
    # stage 7: merge groups of 8
    w = [None] * 32
    for gi, g in enumerate(range(0, 32, 8)):
        for m in range(4):
            if gi % 2 == 0:
                w[g + m] = v[g + m] + v[g + 7 - m]
                w[g + 7 - m] = v[g + m] - v[g + 7 - m]
            else:
                w[g + m] = -v[g + m] + v[g + 7 - m]
                w[g + 7 - m] = v[g + m] + v[g + 7 - m]
    # stage 8: rotations 16/48
    x = list(w)
    for m in range(4):
        x[4 + m] = half_btf(-c[16], w[4 + m], c[48], w[27 - m])
        x[27 - m] = half_btf(c[48], w[4 + m], c[16], w[27 - m])
        x[8 + m] = half_btf(-c[48], w[8 + m], -c[16], w[23 - m])
        x[23 - m] = half_btf(-c[16], w[8 + m], c[48], w[23 - m])
    # stage 9: merge groups of 16
    y = [None] * 32
    for m in range(8):
        y[m] = x[m] + x[15 - m]
        y[15 - m] = x[m] - x[15 - m]
        y[16 + m] = -x[16 + m] + x[31 - m]
        y[31 - m] = x[16 + m] + x[31 - m]
    # stage 10: rotations 32/32
    z = list(y)
    for m in range(8):
        z[8 + m] = half_btf(-c[32], y[8 + m], c[32], y[23 - m])
        z[23 - m] = half_btf(c[32], y[8 + m], c[32], y[23 - m])
    return [ev[k] + z[31 - k] for k in range(32)] + \
           [ev[31 - k] - z[k] for k in range(32)]


# ---------------------------------------------------------------------------
# 1-D inverse ADST
# ---------------------------------------------------------------------------

def iadst4(i):
    s = SINPI
    x0, x1, x2, x3 = i[0], i[1], i[2], i[3]
    s0 = s[1] * x0
    s1 = s[2] * x0
    s2 = s[3] * x1
    s3 = s[4] * x2
    s4 = s[1] * x2
    s5 = s[2] * x3
    s6 = s[4] * x3
    s7 = (x0 - x2) + x3
    s0 = s0 + s3
    s1 = s1 - s4
    s3 = s2
    s2 = s[3] * s7
    s0 = s0 + s5
    s1 = s1 - s6
    o0 = s0 + s3
    o1 = s1 + s3
    o2 = s2
    o3 = (s0 + s1) - s3
    return [round_shift(o0, COS_BIT), round_shift(o1, COS_BIT),
            round_shift(o2, COS_BIT), round_shift(o3, COS_BIT)]


def iadst8(i):
    c = COSPI
    s = [i[7], i[0], i[5], i[2], i[3], i[4], i[1], i[6]]
    b = [half_btf(c[4], s[0], c[60], s[1]),
         half_btf(c[60], s[0], -c[4], s[1]),
         half_btf(c[20], s[2], c[44], s[3]),
         half_btf(c[44], s[2], -c[20], s[3]),
         half_btf(c[36], s[4], c[28], s[5]),
         half_btf(c[28], s[4], -c[36], s[5]),
         half_btf(c[52], s[6], c[12], s[7]),
         half_btf(c[12], s[6], -c[52], s[7])]
    s = [b[0] + b[4], b[1] + b[5], b[2] + b[6], b[3] + b[7],
         b[0] - b[4], b[1] - b[5], b[2] - b[6], b[3] - b[7]]
    b = [s[0], s[1], s[2], s[3],
         half_btf(c[16], s[4], c[48], s[5]),
         half_btf(c[48], s[4], -c[16], s[5]),
         half_btf(-c[48], s[6], c[16], s[7]),
         half_btf(c[16], s[6], c[48], s[7])]
    s = [b[0] + b[2], b[1] + b[3], b[0] - b[2], b[1] - b[3],
         b[4] + b[6], b[5] + b[7], b[4] - b[6], b[5] - b[7]]
    b = [s[0], s[1],
         half_btf(c[32], s[2], c[32], s[3]),
         half_btf(c[32], s[2], -c[32], s[3]),
         s[4], s[5],
         half_btf(c[32], s[6], c[32], s[7]),
         half_btf(c[32], s[6], -c[32], s[7])]
    return [b[0], -b[4], b[6], -b[2], b[3], -b[7], b[5], -b[1]]


def iadst16(i):
    c = COSPI
    s = [i[15], i[0], i[13], i[2], i[11], i[4], i[9], i[6],
         i[7], i[8], i[5], i[10], i[3], i[12], i[1], i[14]]
    b = []
    for k, a in enumerate([2, 10, 18, 26, 34, 42, 50, 58]):
        b.append(half_btf(c[a], s[2 * k], c[64 - a], s[2 * k + 1]))
        b.append(half_btf(c[64 - a], s[2 * k], -c[a], s[2 * k + 1]))
    s = [b[k] + b[k + 8] for k in range(8)] + \
        [b[k] - b[k + 8] for k in range(8)]
    b = s[:8] + [
        half_btf(c[8], s[8], c[56], s[9]),
        half_btf(c[56], s[8], -c[8], s[9]),
        half_btf(c[40], s[10], c[24], s[11]),
        half_btf(c[24], s[10], -c[40], s[11]),
        half_btf(-c[56], s[12], c[8], s[13]),
        half_btf(c[8], s[12], c[56], s[13]),
        half_btf(-c[24], s[14], c[40], s[15]),
        half_btf(c[40], s[14], c[24], s[15])]
    s = [b[k] + b[k + 4] for k in range(4)] + \
        [b[k] - b[k + 4] for k in range(4)] + \
        [b[k] + b[k + 4] for k in range(8, 12)] + \
        [b[k] - b[k + 4] for k in range(8, 12)]
    b = s[:4] + [
        half_btf(c[16], s[4], c[48], s[5]),
        half_btf(c[48], s[4], -c[16], s[5]),
        half_btf(-c[48], s[6], c[16], s[7]),
        half_btf(c[16], s[6], c[48], s[7])] + s[8:12] + [
        half_btf(c[16], s[12], c[48], s[13]),
        half_btf(c[48], s[12], -c[16], s[13]),
        half_btf(-c[48], s[14], c[16], s[15]),
        half_btf(c[16], s[14], c[48], s[15])]
    s = [b[0] + b[2], b[1] + b[3], b[0] - b[2], b[1] - b[3],
         b[4] + b[6], b[5] + b[7], b[4] - b[6], b[5] - b[7],
         b[8] + b[10], b[9] + b[11], b[8] - b[10], b[9] - b[11],
         b[12] + b[14], b[13] + b[15], b[12] - b[14], b[13] - b[15]]
    b = [s[0], s[1],
         half_btf(c[32], s[2], c[32], s[3]),
         half_btf(c[32], s[2], -c[32], s[3]),
         s[4], s[5],
         half_btf(c[32], s[6], c[32], s[7]),
         half_btf(c[32], s[6], -c[32], s[7]),
         s[8], s[9],
         half_btf(c[32], s[10], c[32], s[11]),
         half_btf(c[32], s[10], -c[32], s[11]),
         s[12], s[13],
         half_btf(c[32], s[14], c[32], s[15]),
         half_btf(c[32], s[14], -c[32], s[15])]
    return [b[0], -b[8], b[12], -b[4], b[6], -b[14], b[10], -b[2],
            b[3], -b[11], b[15], -b[7], b[5], -b[13], b[9], -b[1]]


# ---------------------------------------------------------------------------
# Identity / WHT
# ---------------------------------------------------------------------------

def iidentity(vec, n):
    if n == 4:
        return [round_shift(v * NEW_SQRT2, COS_BIT) for v in vec]
    if n == 8:
        return [v * 2 for v in vec]
    if n == 16:
        return [round_shift(v * 2 * NEW_SQRT2, COS_BIT) for v in vec]
    if n == 32:
        return [v * 4 for v in vec]
    raise ValueError(n)


def iwht4x4(coeffs):
    """Lossless 4x4 WHT [SPEC §7.13.3]; input already dequant-free."""
    x = np.asarray(coeffs, dtype=np.int64).reshape(4, 4) >> 2
    tmp = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        a1, c1, d1, b1 = x[r, 0], x[r, 1], x[r, 2], x[r, 3]
        a1 += c1
        d1 -= b1
        e1 = (a1 - d1) >> 1
        b1 = e1 - b1
        c1 = e1 - c1
        a1 -= b1
        d1 += c1
        tmp[r] = [a1, b1, c1, d1]
    res = np.zeros((4, 4), dtype=np.int64)
    for cc in range(4):
        a1, c1, d1, b1 = tmp[0, cc], tmp[1, cc], tmp[2, cc], tmp[3, cc]
        a1 += c1
        d1 -= b1
        e1 = (a1 - d1) >> 1
        b1 = e1 - b1
        c1 = e1 - c1
        a1 -= b1
        d1 += c1
        res[:, cc] = [a1, b1, c1, d1]
    return res


# ---------------------------------------------------------------------------
# 2-D driver
# ---------------------------------------------------------------------------

_DCT = {4: idct4, 8: idct8, 16: idct16, 32: idct32, 64: idct64}
_ADST = {4: iadst4, 8: iadst8, 16: iadst16}

# (w, h) per TxSize enum (native tables.h order); 19 = WHT marker
TX_DIMS = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64), (4, 8), (8, 4),
           (8, 16), (16, 8), (16, 32), (32, 16), (32, 64), (64, 32),
           (4, 16), (16, 4), (8, 32), (32, 8), (16, 64), (64, 16)]

# row shift (shift0) per (w, h) [libaom av1_inv_txfm_shift_ls]
_ROW_SHIFT = {
    (4, 4): 0, (8, 8): 1, (16, 16): 2, (32, 32): 2, (64, 64): 2,
    (4, 8): 0, (8, 4): 0, (8, 16): 1, (16, 8): 1, (16, 32): 1,
    (32, 16): 1, (32, 64): 1, (64, 32): 1, (4, 16): 1, (16, 4): 1,
    (8, 32): 2, (32, 8): 2, (16, 64): 2, (64, 16): 2,
}

# tx_type -> (col_kind, row_kind, ud_flip, lr_flip); kind 0=DCT 1=ADST 2=ID
TX_1D = {
    0: (0, 0, 0, 0), 1: (1, 0, 0, 0), 2: (0, 1, 0, 0), 3: (1, 1, 0, 0),
    4: (1, 0, 1, 0), 5: (0, 1, 0, 1), 6: (1, 1, 1, 1), 7: (1, 1, 0, 1),
    8: (1, 1, 1, 0), 9: (2, 2, 0, 0), 10: (0, 2, 0, 0), 11: (2, 0, 0, 0),
    12: (1, 2, 0, 0), 13: (2, 1, 0, 0), 14: (1, 2, 1, 0), 15: (2, 1, 0, 1),
}


def _apply_1d(kind, vecs, n):
    """vecs: list of n arrays (each the lanes across the other axis)."""
    if kind == 0:
        return _DCT[n](vecs)
    if kind == 1:
        return _ADST[n](vecs)
    return iidentity(vecs, n)


def inverse_transform_lanes(coeffs, tx_size, tx_type, bd=8):
    """Batched inverse transform: coeffs [B, adj_h*adj_w] (coded layout),
    returns [B, h, w].  Same math as inverse_transform — the 1-D kernels
    are lane-vectorized, so the batch rides along as an extra axis."""
    w, h = TX_DIMS[tx_size]
    adj_w, adj_h = min(w, 32), min(h, 32)
    ck, rk, ud, lr = TX_1D[tx_type]
    row_hi = (1 << (bd + 7)) - 1           # rowClampRange [SPEC §7.13.3]
    col_hi = (1 << (max(bd + 6, 16) - 1)) - 1
    B = coeffs.shape[0]
    buf = np.zeros((B, h, w), dtype=np.int64)
    buf[:, :adj_h, :adj_w] = np.asarray(coeffs, np.int64).reshape(
        B, adj_h, adj_w)
    if (int(math.log2(w)) - int(math.log2(h))) % 2 != 0:
        buf = round_shift(buf * NEW_INV_SQRT2, COS_BIT)
    buf = np.clip(buf, -row_hi - 1, row_hi)
    cols_in = [buf[:, :, j] for j in range(w)]          # lanes [B, h]
    rows_out = _apply_1d(rk, cols_in, w)
    buf = np.stack(rows_out, axis=2)
    buf = np.clip(round_shift(buf, _ROW_SHIFT[(w, h)]), -col_hi - 1, col_hi)
    rows_in = [buf[:, r, :] for r in range(h)]          # lanes [B, w]
    cols_out = _apply_1d(ck, rows_in, h)
    res = np.stack(cols_out, axis=1)
    res = round_shift(res, 4)
    if ud:
        res = res[:, ::-1, :]
    if lr:
        res = res[:, :, ::-1]
    return res


def inverse_transform(coeffs, tx_size, tx_type, bd=8):
    """coeffs: flat int array in coded (adjusted, <=32x32) row-major
    layout; returns residual (h, w) int64."""
    if tx_size == 19:  # lossless WHT
        return iwht4x4(coeffs)
    w, h = TX_DIMS[tx_size]
    adj_w, adj_h = min(w, 32), min(h, 32)
    ck, rk, ud, lr = TX_1D[tx_type]
    row_hi = (1 << (bd + 7)) - 1           # rowClampRange [SPEC §7.13.3]
    col_hi = (1 << (max(bd + 6, 16) - 1)) - 1
    buf = np.zeros((h, w), dtype=np.int64)
    buf[:adj_h, :adj_w] = np.asarray(coeffs, dtype=np.int64).reshape(
        adj_h, adj_w)

    if (int(math.log2(w)) - int(math.log2(h))) % 2 != 0:
        buf = round_shift(buf * NEW_INV_SQRT2, COS_BIT)
    buf = np.clip(buf, -row_hi - 1, row_hi)

    # row transforms: transform along width; lanes = rows
    cols_in = [buf[:, j] for j in range(w)]
    rows_out = _apply_1d(rk, cols_in, w)          # list of w arrays (h,)
    buf = np.stack(rows_out, axis=1)              # (h, w)
    buf = np.clip(round_shift(buf, _ROW_SHIFT[(w, h)]), -col_hi - 1, col_hi)
    # column transforms: transform along height; lanes = columns
    rows_in = [buf[r, :] for r in range(h)]
    cols_out = _apply_1d(ck, rows_in, h)          # list of h arrays (w,)
    res = np.stack(cols_out, axis=0)              # (h, w)
    res = round_shift(res, 4)
    if ud:
        res = res[::-1, :]
    if lr:
        res = res[:, ::-1]
    return res
