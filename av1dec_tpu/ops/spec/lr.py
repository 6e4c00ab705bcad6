"""Loop restoration — Wiener + self-guided (SGR) filters. [SPEC §7.17]

Operates after CDEF (and superres upscale).  Reads are confined to
64-luma-row stripes: up to 2 rows above/below a stripe come from the
deblocked pre-CDEF frame (the saved "stripe boundary"), and reads beyond
that clamp.  Unit parameters come from the per-unit bitstream records.
"""
import numpy as np

RESTORE_NONE, RESTORE_WIENER, RESTORE_SGRPROJ = 0, 1, 2

# Sgr_Params[set] = (r0, s0, r1, s1)  [SPEC §7.17.3]
SGR_PARAMS = [
    (2, 140, 1, 3236), (2, 112, 1, 2158), (2, 93, 1, 1618),
    (2, 80, 1, 1438), (2, 70, 1, 1295), (2, 58, 1, 1177),
    (2, 47, 1, 1079), (2, 37, 1, 996), (2, 30, 1, 925),
    (2, 25, 1, 863), (0, 0, 1, 2589), (0, 0, 1, 1618),
    (0, 0, 1, 1177), (0, 0, 1, 925), (2, 56, 0, 0), (2, 22, 0, 0)]

SGR_BITS = 8        # SGRPROJ_SGR_BITS
RST_BITS = 4        # SGRPROJ_RST_BITS
MTABLE_BITS = 20
RECIP_BITS = 12
PRJ_BITS = 7


def _count_units(unit_size, frame_size):
    return max((frame_size + (unit_size >> 1)) // unit_size, 1)


def _round2(x, b):
    return (x + (1 << (b - 1))) >> b if b > 0 else x


def _stripe_source(cdef_p, pre_p, y0, y1, x0, x1, stripe_lo, stripe_hi):
    """Build a source window rows [y0,y1) cols [x0,x1) with LR read
    semantics: y clamped to [stripe_lo-2, stripe_hi+2] and to the plane;
    the 2 boundary rows come from the pre-CDEF plane; x clamps to the
    plane. [SPEC get_source_sample]"""
    ph, pw = cdef_p.shape
    ys = np.clip(np.arange(y0, y1), stripe_lo - 2, stripe_hi + 2)
    ys = np.clip(ys, 0, ph - 1)
    xs = np.clip(np.arange(x0, x1), 0, pw - 1)
    inside = (np.arange(y0, y1) >= stripe_lo) & \
        (np.arange(y0, y1) <= stripe_hi)
    # rows clamped into the stripe remain "inside" reads
    inside = inside | ((ys >= stripe_lo) & (ys <= stripe_hi))
    out = np.where(inside[:, None],
                   cdef_p[np.ix_(ys, xs)], pre_p[np.ix_(ys, xs)])
    return out.astype(np.int64)


def _wiener(src, taps_v, taps_h, bd):
    """Wiener filter over a window; src has a 3px border on every side
    around the (h, w) output region. [SPEC §7.17.4]"""
    h = src.shape[0] - 6
    w = src.shape[1] - 6
    r0 = 5 if bd == 12 else 3
    r1 = 9 if bd == 12 else 11
    off0 = 1 << (bd + 6)
    lim = (1 << (bd + 1 + 7 - r0)) - 1
    # horizontal pass -> intermediate rows [0, h+6) x [0, w)
    inter = np.zeros((h + 6, w), np.int64)
    acc = np.full((h + 6, w), off0, np.int64)
    for t in range(7):
        acc += taps_h[t] * src[:, t:t + w]
    inter = np.clip(_round2(acc, r0), 0, lim)
    # vertical
    acc = np.full((h, w), -(1 << (bd + r1 - 1)), np.int64)
    for t in range(7):
        acc += taps_v[t] * inter[t:t + h, :]
    return np.clip(_round2(acc, r1), 0, (1 << bd) - 1)


def _sgr_box(src, r, s, bd):
    """One self-guided box filter pass.  src has a 3px border around the
    (h, w) region; returns flt at RST precision. [SPEC §7.17.3]"""
    h = src.shape[0] - 6
    w = src.shape[1] - 6
    n = (2 * r + 1) ** 2
    one_over_n = ((1 << RECIP_BITS) + (n >> 1)) // n
    # A (a3) and B (b3) over grid i,j in [-1, h] x [-1, w]
    # integral sums over the (2r+1) box
    x = src
    x2 = x * x
    # cumulative sums for box extraction; A/B at (i,j) -> box centered at
    # src coord (i+3, j+3)
    cs = x.cumsum(0).cumsum(1)
    cs2 = x2.cumsum(0).cumsum(1)

    def box(c, i0, j0, rad):
        # sum over rows [i0-rad, i0+rad], cols [j0-rad, j0+rad] grids
        def at(a, b):
            out = np.zeros((len(a), len(b)), np.int64)
            am = a >= 0
            bm = b >= 0
            out[np.ix_(am, bm)] = c[np.ix_(a[am], b[bm])]
            return out
        ii = np.asarray(i0)
        jj = np.asarray(j0)
        return (at(ii + rad, jj + rad) - at(ii - rad - 1, jj + rad)
                - at(ii + rad, jj - rad - 1) + at(ii - rad - 1,
                                                  jj - rad - 1))

    iis = np.arange(-1, h + 1)
    jjs = np.arange(-1, w + 1)
    if r == 2:
        iis_c = iis[(iis & 1) == 1]  # computed rows: odd (incl -1)
    else:
        iis_c = iis
    ci = iis_c + 3
    cj = jjs + 3
    a_sum = box(cs2, ci, cj, r)
    b_sum = box(cs, ci, cj, r)
    d = _round2(a_sum, 2 * (bd - 8)) if bd > 8 else a_sum
    b_r = _round2(b_sum, bd - 8) if bd > 8 else b_sum
    p = np.maximum(0, d * n - b_r * b_r)
    z = _round2(p * s, MTABLE_BITS)
    a3 = np.where(z >= 255, 256,
                  np.where(z == 0, 1,
                           ((z << SGR_BITS) + (z >> 1)) //
                           np.maximum(z + 1, 1)))
    b3 = _round2((256 - a3) * b_sum * one_over_n, RECIP_BITS)
    # expand to full map indexed by (i+1, j+1) over [-1..h] x [-1..w]
    A = np.zeros((h + 2, w + 2), np.int64)
    B = np.zeros((h + 2, w + 2), np.int64)
    A[iis_c + 1, :] = a3
    B[iis_c + 1, :] = b3
    # filtered output
    out = np.zeros((h, w), np.int64)
    xi = src[3:3 + h, 3:3 + w]
    for i in range(h):
        use_single = (r == 2) and (i & 1) == 1
        if r == 2 and not use_single:
            # even row: cross from computed rows i-1, i+1
            a = (5 * (A[i, 0:w] + A[i, 2:w + 2] + A[i + 2, 0:w] +
                      A[i + 2, 2:w + 2]) +
                 6 * (A[i, 1:w + 1] + A[i + 2, 1:w + 1]))
            b = (5 * (B[i, 0:w] + B[i, 2:w + 2] + B[i + 2, 0:w] +
                      B[i + 2, 2:w + 2]) +
                 6 * (B[i, 1:w + 1] + B[i + 2, 1:w + 1]))
            shift = 5
        elif r == 2:
            # odd row: own row only
            a = 5 * (A[i + 1, 0:w] + A[i + 1, 2:w + 2]) + \
                6 * A[i + 1, 1:w + 1]
            b = 5 * (B[i + 1, 0:w] + B[i + 1, 2:w + 2]) + \
                6 * B[i + 1, 1:w + 1]
            shift = 4
        else:
            # r == 1: full 3x3 with weights 3/4
            a = (3 * (A[i, 0:w] + A[i, 2:w + 2] + A[i + 2, 0:w] +
                      A[i + 2, 2:w + 2]) +
                 4 * (A[i, 1:w + 1] + A[i + 2, 1:w + 1] +
                      A[i + 1, 0:w] + A[i + 1, 2:w + 2] +
                      A[i + 1, 1:w + 1]))
            b = (3 * (B[i, 0:w] + B[i, 2:w + 2] + B[i + 2, 0:w] +
                      B[i + 2, 2:w + 2]) +
                 4 * (B[i + 1, 0:w] + B[i + 1, 2:w + 2] +
                      B[i + 1, 1:w + 1] + B[i, 1:w + 1] +
                      B[i + 2, 1:w + 1]))
            shift = 5
        v = a * xi[i] + b
        out[i] = _round2(v, SGR_BITS + shift - RST_BITS)
    return out


def _sgr(src, set_idx, xqd, bd):
    """Apply self-guided restoration over a bordered window."""
    h = src.shape[0] - 6
    w = src.shape[1] - 6
    r0, s0, r1, s1 = SGR_PARAMS[set_idx]
    x = src[3:3 + h, 3:3 + w]
    u = x << RST_BITS
    v = u.astype(np.int64) << PRJ_BITS
    # xq derivation mirrors libaom av1_decode_xq: with both radii active
    # the second weight is 128 - xq0 - xqd[1]
    if r0 == 0:
        xq0, xq1 = 0, (1 << PRJ_BITS) - xqd[1]
    elif r1 == 0:
        xq0, xq1 = xqd[0], 0
    else:
        xq0, xq1 = xqd[0], (1 << PRJ_BITS) - xqd[0] - xqd[1]
    if r0:
        flt0 = _sgr_box(src, r0, s0, bd)
        v = v + xq0 * (flt0 - u)
    if r1:
        flt1 = _sgr_box(src, r1, s1, bd)
        v = v + xq1 * (flt1 - u)
    s = _round2(v, PRJ_BITS + RST_BITS)
    return np.clip(s, 0, (1 << bd) - 1)


def lr_frame(planes, pre_cdef, seq, hdr, plans, bd):
    """Apply loop restoration in place.  `pre_cdef` are the deblocked
    (pre-CDEF) planes used for stripe boundaries."""
    lr = hdr["lr"]
    frt = lr["frame_restoration_type"]
    if all(t == RESTORE_NONE for t in frt):
        return planes
    units = {}
    for rec in plans.lr:
        units[(int(rec[0]), int(rec[1]), int(rec[2]))] = rec
    fw = hdr.get("upscaled_width", hdr["frame_width"])
    fh = hdr["frame_height"]
    for plane in range(len(planes)):
        if frt[plane] == RESTORE_NONE:
            continue
        subx = seq.get("subsampling_x", 1) if plane else 0
        suby = seq.get("subsampling_y", 1) if plane else 0
        pw = (fw + subx) >> subx
        ph = (fh + suby) >> suby
        unit_size = lr["loop_restoration_size"][plane]
        ucols = _count_units(unit_size, pw)
        urows = _count_units(unit_size, ph)
        cdef_p = planes[plane].astype(np.int64)
        pre_p = pre_cdef[plane].astype(np.int64)
        out = planes[plane]
        voff = 8 >> suby  # RESTORATION_UNIT_OFFSET: unit rows shifted up
        for ur in range(urows):
            y0u = max(0, ur * unit_size - voff)
            y1u = (ur + 1) * unit_size - voff if ur + 1 < urows else ph
            for uc in range(ucols):
                x0 = uc * unit_size
                x1 = (uc + 1) * unit_size if uc + 1 < ucols else pw
                rec = units.get((plane, ur, uc))
                if rec is None or int(rec[3]) == RESTORE_NONE:
                    continue
                rtype = int(rec[3])
                # process per stripe (64 luma rows, first stripe 56)
                y = y0u
                while y < y1u:
                    yl = y << suby
                    stripe_idx = (yl + 8) // 64
                    slo = (stripe_idx * 64 - 8) >> suby
                    shi = ((stripe_idx + 1) * 64 - 8 >> suby) - 1
                    ys = max(y, slo, 0)
                    ye = min(y1u - 1, shi, ph - 1)
                    h = ye - ys + 1
                    w = x1 - x0
                    src = _stripe_source(cdef_p, pre_p, ys - 3, ye + 4,
                                         x0 - 3, x1 + 3, slo, shi)
                    if rtype == RESTORE_WIENER:
                        tv = list(rec[4:7])
                        th = list(rec[7:10])
                        if plane:
                            tv[0] = 0
                            th[0] = 0
                        taps_v = [tv[0], tv[1], tv[2],
                                  128 - 2 * (tv[0] + tv[1] + tv[2]),
                                  tv[2], tv[1], tv[0]]
                        taps_h = [th[0], th[1], th[2],
                                  128 - 2 * (th[0] + th[1] + th[2]),
                                  th[2], th[1], th[0]]
                        res = _wiener(src, taps_v, taps_h, bd)
                    else:
                        res = _sgr(src, int(rec[10]),
                                   (int(rec[11]), int(rec[12])), bd)
                    out[ys:ye + 1, x0:x1] = res.astype(out.dtype)
                    y = ye + 1
    return planes
