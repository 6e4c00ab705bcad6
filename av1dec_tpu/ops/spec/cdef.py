"""CDEF — constrained directional enhancement filter. [SPEC §7.15]

Reads the deblocked frame, writes a filtered copy; applied per 8x8 luma
unit (and the co-located chroma unit) unless all covering 4x4 blocks are
skip.  Direction is estimated from luma; strengths come from the frame
header lists indexed by the per-64x64 cdef_idx.
"""
import numpy as np

CDEF_VERY_LARGE = 30000

# Cdef_Directions[dir][k] as (dy, dx) [SPEC §7.15.3]
DIRECTIONS = [
    [(-1, 1), (-2, 2)],
    [(0, 1), (-1, 2)],
    [(0, 1), (0, 2)],
    [(0, 1), (1, 2)],
    [(1, 1), (2, 2)],
    [(1, 0), (2, 1)],
    [(1, 0), (2, 0)],
    [(1, 0), (2, -1)],
]
DIV_TABLE = [840, 420, 280, 210, 168, 140, 120, 105]


def _direction(block, bd):
    """Direction search over one 8x8 luma block. [SPEC §7.15.2]
    Returns (dir, var)."""
    x = (block.astype(np.int64) >> (bd - 8)) - 128
    partial = [np.zeros(15, np.int64) for _ in range(8)]
    for i in range(8):
        for j in range(8):
            v = x[i, j]
            partial[0][i + j] += v
            partial[1][i + (j >> 1)] += v
            partial[2][i] += v
            partial[3][3 + i - (j >> 1)] += v
            partial[4][7 + i - j] += v
            partial[5][3 - (i >> 1) + j] += v
            partial[6][j] += v
            partial[7][(i >> 1) + j] += v
    cost = [0] * 8
    for i in range(8):
        cost[2] += partial[2][i] ** 2
        cost[6] += partial[6][i] ** 2
    cost[2] *= 105
    cost[6] *= 105
    for i in range(7):
        cost[0] += (partial[0][i] ** 2 + partial[0][14 - i] ** 2) * \
            DIV_TABLE[i]
        cost[4] += (partial[4][i] ** 2 + partial[4][14 - i] ** 2) * \
            DIV_TABLE[i]
    cost[0] += partial[0][7] ** 2 * 105
    cost[4] += partial[4][7] ** 2 * 105
    for d in (1, 3, 5, 7):
        for i in range(5):
            cost[d] += partial[d][3 + i] ** 2
        cost[d] *= 105
        for i in range(3):
            cost[d] += (partial[d][i] ** 2 + partial[d][10 - i] ** 2) * \
                DIV_TABLE[2 * i + 1]
    best = int(np.argmax(cost))
    var = int((cost[best] - cost[(best + 4) & 7]) >> 10)
    return best, var


def _constrain(diff, strength, damping):
    if strength == 0:
        return np.zeros_like(diff)
    shift = max(0, damping - int(strength).bit_length() + 1)
    return np.sign(diff) * np.minimum(
        np.abs(diff), np.maximum(0, strength - (np.abs(diff) >> shift)))


def _filter_unit(src, dst, y0, x0, h, w, pri, sec, damping, dirn, bd,
                 coeff_shift):
    """Filter one unit (h x w) at (y0, x0) of plane `src` into `dst`."""
    ph, pw = src.shape
    pri_taps = (4, 2) if (pri >> coeff_shift) & 1 == 0 else (3, 3)
    sec_taps = (2, 1)

    def grab(dy, dx):
        """Pixel array at offset, CDEF_VERY_LARGE outside the frame."""
        ys = y0 + dy + np.arange(h)
        xs = x0 + dx + np.arange(w)
        out = np.full((h, w), CDEF_VERY_LARGE, np.int64)
        yv = (ys >= 0) & (ys < ph)
        xv = (xs >= 0) & (xs < pw)
        if yv.any() and xv.any():
            out[np.ix_(yv, xv)] = src[np.ix_(ys[yv], xs[xv])]
        return out

    x = src[y0:y0 + h, x0:x0 + w].astype(np.int64)
    total = np.zeros((h, w), np.int64)
    mx = x.copy()
    mn = x.copy()
    for k in range(2):
        if pri:
            dy, dx = DIRECTIONS[dirn][k]
            for sgn in (1, -1):
                p = grab(sgn * dy, sgn * dx)
                valid = p != CDEF_VERY_LARGE
                total += pri_taps[k] * np.where(
                    valid, _constrain(p - x, pri, damping), 0)
                mx = np.maximum(mx, np.where(valid, p, mx))
                mn = np.minimum(mn, np.where(valid, p, mn))
        if sec:
            for dd in ((dirn + 2) & 7, (dirn + 6) & 7):
                dy, dx = DIRECTIONS[dd][k]
                for sgn in (1, -1):
                    p = grab(sgn * dy, sgn * dx)
                    valid = p != CDEF_VERY_LARGE
                    total += sec_taps[k] * np.where(
                        valid, _constrain(p - x, sec, damping), 0)
                    mx = np.maximum(mx, np.where(valid, p, mx))
                    mn = np.minimum(mn, np.where(valid, p, mn))
    y = x + ((8 + total - (total < 0)) >> 4)
    dst[y0:y0 + h, x0:x0 + w] = np.clip(y, mn, mx)


def cdef_frame(planes, seq, hdr, plans, bd):
    """Apply CDEF in place. [SPEC §7.15.1]"""
    c = hdr["cdef"]
    if hdr.get("coded_lossless") or hdr.get("allow_intrabc"):
        return planes
    nstr = 1 << c["bits"]
    if all(c["y_pri"][i] == 0 and c["y_sec"][i] == 0 and
           c["uv_pri"][i] == 0 and c["uv_sec"][i] == 0
           for i in range(nstr)):
        return planes
    coeff_shift = bd - 8
    mi_rows, mi_cols = plans.mi_rows, plans.mi_cols
    skip = plans.grid("skip").astype(np.int64)
    cdef_mi = plans.grid("cdef").astype(np.int64)
    subx = seq.get("subsampling_x", 1) if len(planes) > 1 else 0
    suby = seq.get("subsampling_y", 1) if len(planes) > 1 else 0
    srcs = [p.astype(np.int64).copy() for p in planes]
    dsts = [p.astype(np.int64).copy() for p in planes]
    for r in range(0, mi_rows, 2):  # 8x8 luma units
        for col in range(0, mi_cols, 2):
            r1 = min(r + 1, mi_rows - 1)
            c1 = min(col + 1, mi_cols - 1)
            if skip[r, col] and skip[r1, col] and skip[r, c1] and \
                    skip[r1, c1]:
                continue
            idx = int(cdef_mi[r, col])
            if idx < 0:
                continue
            y_pri = c["y_pri"][idx] << coeff_shift
            y_sec = c["y_sec"][idx] << coeff_shift
            uv_pri = c["uv_pri"][idx] << coeff_shift
            uv_sec = c["uv_sec"][idx] << coeff_shift
            dirn, var = 0, 0
            if y_pri or uv_pri:
                # direction always estimated from luma; each plane then
                # uses it only when its own primary strength is nonzero
                y0, x0 = r * 4, col * 4
                blk = srcs[0][y0:y0 + 8, x0:x0 + 8]
                if blk.shape == (8, 8):
                    dirn, var = _direction(blk, bd)
            # luma: variance-adjusted primary strength
            if y_pri:
                if var:
                    i = min(12, (var >> 6).bit_length() - 1) \
                        if (var >> 6) else 0
                    pri_adj = (y_pri * (4 + i) + 8) >> 4
                else:
                    pri_adj = 0
            else:
                pri_adj = 0
            damping = c["damping"] + coeff_shift
            if pri_adj or y_sec:
                _filter_unit(srcs[0], dsts[0], r * 4, col * 4,
                             min(8, mi_rows * 4 - r * 4),
                             min(8, mi_cols * 4 - col * 4),
                             pri_adj, y_sec, damping,
                             dirn if y_pri else 0, bd, coeff_shift)
            if len(planes) > 1 and (uv_pri or uv_sec):
                uvdir = dirn if uv_pri else 0
                if subx != suby and uv_pri:
                    # 4:2:2 direction remap [libaom cdef conv422]
                    uvdir = [7, 0, 2, 4, 5, 6, 6, 6][dirn] if subx else dirn
                uh = min(8 >> suby, (mi_rows * 4 >> suby) - (r * 4 >> suby))
                uw = min(8 >> subx, (mi_cols * 4 >> subx) -
                         (col * 4 >> subx))
                for pl in (1, 2):
                    _filter_unit(srcs[pl], dsts[pl], (r * 4) >> suby,
                                 (col * 4) >> subx, uh, uw, uv_pri, uv_sec,
                                 damping - 1, uvdir, bd, coeff_shift)
    for i, p in enumerate(planes):
        p[...] = dsts[i].astype(p.dtype)
    return planes
