"""Intra prediction [SPEC §7.11.2] — NumPy spec model.

Covers DC (+edge variants), V/H, the 56 directional modes (8 base angles
x +/-3 delta steps of 3 degrees, with intra-edge filter/upsample),
Smooth/SmoothV/SmoothH, Paeth, filter-intra (recursive), CfL, and
palette mapping.  All integer.
"""

import numpy as np

from av1dec_tpu.ops.tables_data import (DR_INTRA_DERIVATIVE,
                                        FILTER_INTRA_TAPS, SM_WEIGHTS)

DC_PRED, V_PRED, H_PRED = 0, 1, 2
D45_PRED, D135_PRED, D113_PRED, D157_PRED, D203_PRED, D67_PRED = 3, 4, 5, 6, 7, 8
SMOOTH_PRED, SMOOTH_V_PRED, SMOOTH_H_PRED, PAETH_PRED = 9, 10, 11, 12
UV_CFL_PRED = 13

MODE_TO_ANGLE = [0, 90, 180, 45, 135, 113, 157, 203, 67, 0, 0, 0, 0]
ANGLE_STEP = 3

INTRA_EDGE_KERNELS = np.array([[0, 4, 8, 4, 0],
                               [0, 5, 6, 5, 0],
                               [2, 4, 4, 4, 2]], dtype=np.int64)


def round2(x, n):
    if n == 0:
        return x
    return (x + (1 << (n - 1))) >> n


def round2_signed(x, n):
    return np.where(x >= 0, round2(x, n), -round2(-x, n))


def clip1(x, bd):
    return np.clip(x, 0, (1 << bd) - 1)


def intra_edge_filter_strength(w, h, filter_type, delta):
    # [SPEC §7.11.2.9]
    d = abs(delta)
    blk_wh = w + h
    strength = 0
    if filter_type == 0:
        if blk_wh <= 8:
            if d >= 56:
                strength = 1
        elif blk_wh <= 12:
            if d >= 40:
                strength = 1
        elif blk_wh <= 16:
            if d >= 40:
                strength = 1
        elif blk_wh <= 24:
            if d >= 8:
                strength = 1
            if d >= 16:
                strength = 2
            if d >= 32:
                strength = 3
        elif blk_wh <= 32:
            strength = 1
            if d >= 4:
                strength = 2
            if d >= 32:
                strength = 3
        else:
            strength = 3
    else:
        if blk_wh <= 8:
            if d >= 40:
                strength = 1
            if d >= 64:
                strength = 2
        elif blk_wh <= 16:
            if d >= 20:
                strength = 1
            if d >= 48:
                strength = 2
        elif blk_wh <= 24:
            if d >= 4:
                strength = 3
        else:
            strength = 3
    return strength


def use_intra_edge_upsample(w, h, filter_type, delta):
    # [SPEC §7.11.2.10]
    d = abs(delta)
    blk_wh = w + h
    if d <= 0 or d >= 40:
        return 0
    return int(blk_wh <= 8) if filter_type else int(blk_wh <= 16)


def intra_edge_filter(buf, sz, strength):
    """In-place smoothing over buf[0..sz-1] [SPEC §7.11.2.12]."""
    if strength == 0:
        return
    edge = buf[:sz].copy()
    kern = INTRA_EDGE_KERNELS[strength - 1]
    for i in range(1, sz):
        s = 0
        for j in range(5):
            k = min(max(i - 2 + j, 0), sz - 1)
            s += kern[j] * edge[k]
        buf[i] = (s + 8) >> 4


def intra_edge_upsample(buf, sz, bd):
    """Returns 2x upsampled edge as new array indexed from -2
    [SPEC §7.11.2.11 / libaom av1_upsample_intra_edge].
    buf is indexed buf[-1..sz-1] via offset array; we take (sz+1,) array
    with buf[0] == edge[-1] and return (2*sz+2,) array out where
    out[i] == up[i-2] (i.e. up[-2..2*sz-1])."""
    inb = np.zeros(sz + 3, dtype=np.int64)
    inb[0] = buf[0]  # p[-1]
    inb[1] = buf[0]
    inb[2: sz + 2] = buf[1: sz + 1]
    inb[sz + 2] = buf[sz]
    out = np.zeros(2 * sz + 2, dtype=np.int64)
    out[0] = inb[0]  # p[-2]
    for i in range(sz):
        s = -inb[i] + 9 * inb[i + 1] + 9 * inb[i + 2] - inb[i + 3]
        s = np.clip((s + 8) >> 4, 0, (1 << bd) - 1)
        out[2 * i + 1] = s        # p[2i - 1]
        out[2 * i + 2] = inb[i + 2]  # p[2i]
    return out


def predict_intra(frame, plane_dims, x, y, w, h, mode, angle_delta,
                  have_left, have_above, have_above_right, have_below_left,
                  bd, filter_type, enable_edge_filter,
                  filter_intra_mode=-1):
    """Predict one transform block [SPEC §7.11.2].

    frame: the plane being reconstructed (2-D int array, mi-padded dims)
    plane_dims: (plane_h, plane_w) valid decode area (mi-based)
    Returns (h, w) int64 prediction.
    """
    max_y, max_x = plane_dims[0] - 1, plane_dims[1] - 1
    size = w + h
    # AboveRow[-1 .. w+h-1] stored with offset 1; LeftCol likewise
    above = np.zeros(size + 1, dtype=np.int64)
    left = np.zeros(size + 1, dtype=np.int64)

    if not have_above and have_left:
        above[1:] = frame[y, x - 1]
    elif not have_above and not have_left:
        above[1:] = (1 << (bd - 1)) - 1
    else:
        above_limit = min(max_x, x + (2 * w if have_above_right else w) - 1)
        n_direct = max(0, min(size, above_limit - x + 1))
        above[1: 1 + n_direct] = frame[y - 1, x: x + n_direct]
        if n_direct < size:
            above[1 + n_direct:] = frame[y - 1, above_limit]
    if not have_left and have_above:
        left[1:] = frame[y - 1, x]
    elif not have_left and not have_above:
        left[1:] = (1 << (bd - 1)) + 1
    else:
        left_limit = min(max_y, y + (2 * h if have_below_left else h) - 1)
        n_direct = max(0, min(size, left_limit - y + 1))
        left[1: 1 + n_direct] = frame[y: y + n_direct, x - 1]
        if n_direct < size:
            left[1 + n_direct:] = frame[left_limit, x - 1]
    if have_above and have_left:
        corner = frame[y - 1, x - 1]
    elif have_above:
        corner = frame[y - 1, x]
    elif have_left:
        corner = frame[y, x - 1]
    else:
        corner = 1 << (bd - 1)
    above[0] = corner
    left[0] = corner

    if filter_intra_mode >= 0:
        return _filter_intra(above, left, w, h, filter_intra_mode, bd)
    if mode >= V_PRED and mode <= D67_PRED:
        p_angle = MODE_TO_ANGLE[mode] + angle_delta * ANGLE_STEP
        # real (non-replicated) extension pixel counts; edge filtering
        # and upsampling cover the h/w extension ONLY when some real
        # top-right / bottom-left pixels exist [libaom
        # build_intra_predictors n_topright_px / n_bottomleft_px]
        n_tr = max(0, min(w, max_x - (x + w) + 1)) \
            if (have_above and have_above_right) else 0
        n_bl = max(0, min(h, max_y - (y + h) + 1)) \
            if (have_left and have_below_left) else 0
        return _directional(above, left, w, h, p_angle, have_above,
                            have_left, bd, filter_type, enable_edge_filter,
                            max_x, max_y, x, y, frame, n_tr, n_bl)
    if mode in (SMOOTH_PRED, SMOOTH_V_PRED, SMOOTH_H_PRED):
        return _smooth(above, left, w, h, mode)
    if mode == PAETH_PRED:
        return _paeth(above, left, w, h)
    # DC
    return _dc(above, left, w, h, have_above, have_left, bd)


def _dc(above, left, w, h, have_above, have_left, bd):
    if have_above and have_left:
        s = above[1: 1 + w].sum() + left[1: 1 + h].sum()
        avg = (s + ((w + h) >> 1)) // (w + h)
    elif have_above:
        avg = round2(above[1: 1 + w].sum(), int(np.log2(w)))
    elif have_left:
        avg = round2(left[1: 1 + h].sum(), int(np.log2(h)))
    else:
        avg = 1 << (bd - 1)
    return np.full((h, w), avg, dtype=np.int64)


def _paeth(above, left, w, h):
    a = above[1: 1 + w][None, :]
    l = left[1: 1 + h][:, None]
    tl = above[0]
    base = a + l - tl
    pa = np.abs(base - a)
    pl = np.abs(base - l)
    ptl = np.abs(base - tl)
    out = np.where((pa <= pl) & (pa <= ptl), np.broadcast_to(a, (h, w)),
                   np.where(pl <= ptl, np.broadcast_to(l, (h, w)), tl))
    return out.astype(np.int64)


def _smooth(above, left, w, h, mode):
    sw_w = SM_WEIGHTS[w: w + w].astype(np.int64)
    sw_h = SM_WEIGHTS[h: h + h].astype(np.int64)
    a = above[1: 1 + w].astype(np.int64)
    l = left[1: 1 + h].astype(np.int64)
    right = above[w]       # AboveRow[w-1]
    bottom = left[h]       # LeftCol[h-1]
    if mode == SMOOTH_PRED:
        sm = (sw_h[:, None] * a[None, :] +
              (256 - sw_h[:, None]) * bottom +
              sw_w[None, :] * l[:, None] +
              (256 - sw_w[None, :]) * right)
        return round2(sm, 9)
    if mode == SMOOTH_V_PRED:
        sm = sw_h[:, None] * a[None, :] + (256 - sw_h[:, None]) * bottom
        return round2(sm, 8)
    sm = sw_w[None, :] * l[:, None] + (256 - sw_w[None, :]) * right
    return round2(sm, 8)


_FI_TAPS_LISTS = None


def _filter_intra(above, left, w, h, fi_mode, bd):
    # [SPEC §7.11.2.3]: recursive 4x2 patches.  Pure-Python integer
    # inner loop (the patch recursion is inherently serial; numpy scalar
    # ops here would be ~50x slower per patch).
    global _FI_TAPS_LISTS
    if _FI_TAPS_LISTS is None:
        _FI_TAPS_LISTS = [[[int(t) for t in row] for row in mode_taps]
                          for mode_taps in FILTER_INTRA_TAPS]
    taps = _FI_TAPS_LISTS[fi_mode]
    hi = (1 << bd) - 1
    # buf as plain Python lists of ints
    buf = [[0] * (w + 1) for _ in range(h + 1)]
    arow = above[0: 1 + w].tolist()
    buf[0][:] = arow
    lcol = left[1: 1 + h].tolist()
    for r in range(h):
        buf[r + 1][0] = lcol[r]
    for i in range(1, h + 1, 2):
        bm1 = buf[i - 1]
        b0 = buf[i]
        b1 = buf[i + 1]
        for j in range(1, w + 1, 4):
            p0 = bm1[j - 1]
            p1 = bm1[j]
            p2 = bm1[j + 1]
            p3 = bm1[j + 2]
            p4 = bm1[j + 3]
            p5 = b0[j - 1]
            p6 = b1[j - 1]
            for k in range(8):
                t = taps[k]
                s = (t[0] * p0 + t[1] * p1 + t[2] * p2 + t[3] * p3 +
                     t[4] * p4 + t[5] * p5 + t[6] * p6)
                v = (s + 8) >> 4 if s >= 0 else -((-s + 8) >> 4)
                if v < 0:
                    v = 0
                elif v > hi:
                    v = hi
                (b0 if k < 4 else b1)[j + (k & 3)] = v
    out = np.asarray([row[1:] for row in buf[1:]], dtype=np.int64)
    return out


def _directional(above, left, w, h, p_angle, have_above, have_left, bd,
                 filter_type, enable_edge_filter, max_x, max_y, x, y,
                 frame, n_tr=0, n_bl=0):
    upsample_above = 0
    upsample_left = 0
    if enable_edge_filter and p_angle != 90 and p_angle != 180:
        if 90 < p_angle < 180 and (w + h) >= 24:
            # corner filter [SPEC §7.11.2.4 step 1]
            s = left[1] * 5 + above[0] * 6 + above[1] * 5
            v = round2(np.int64(s), 4)
            above[0] = v
            left[0] = v
        if have_above:
            strength = intra_edge_filter_strength(w, h, filter_type,
                                                  p_angle - 90)
            num_px = min(w, max_x - x + 1) + (h if p_angle < 90 else 0) + 1
            intra_edge_filter(above, num_px, strength)
        if have_left:
            strength = intra_edge_filter_strength(w, h, filter_type,
                                                  p_angle - 180)
            num_px = min(h, max_y - y + 1) + (w if p_angle > 180 else 0) + 1
            intra_edge_filter(left, num_px, strength)
        upsample_above = use_intra_edge_upsample(w, h, filter_type,
                                                 p_angle - 90)
        upsample_left = use_intra_edge_upsample(w, h, filter_type,
                                                p_angle - 180)
    if upsample_above:
        num_px_a = w + (h if p_angle < 90 else 0)
        above_u = intra_edge_upsample(above, num_px_a, bd)
    if upsample_left:
        num_px_l = h + (w if p_angle > 180 else 0)
        left_u = intra_edge_upsample(left, num_px_l, bd)

    def abv(idx):
        # AboveRow[idx] in spec indexing (idx may be -1 or -2 upsampled)
        if upsample_above:
            if idx + 2 >= len(above_u):
                # beyond the upsampled region: the raw replicated tail
                return above[min(len(above) - 1, num_px_a + 1)]
            return above_u[idx + 2]
        return above[idx + 1]

    def lft(idx):
        if upsample_left:
            if idx + 2 >= len(left_u):
                return left[min(len(left) - 1, num_px_l + 1)]
            return left_u[idx + 2]
        return left[idx + 1]

    out = np.zeros((h, w), dtype=np.int64)
    if p_angle < 90:
        dx = int(DR_INTRA_DERIVATIVE[p_angle])
        max_base_x = (w + h - 1) << upsample_above
        for i in range(h):
            idx = (i + 1) * dx
            for j in range(w):
                base = (idx >> (6 - upsample_above)) + (j << upsample_above)
                if base < max_base_x:
                    shift = ((idx << upsample_above) >> 1) & 0x1F
                    v = abv(base) * (32 - shift) + abv(base + 1) * shift
                    out[i, j] = round2(np.int64(v), 5)
                else:
                    out[i, j] = abv(max_base_x)
    elif p_angle > 90 and p_angle < 180:
        dx = int(DR_INTRA_DERIVATIVE[180 - p_angle])
        dy = int(DR_INTRA_DERIVATIVE[p_angle - 90])
        for i in range(h):
            for j in range(w):
                idx = (j << 6) - (i + 1) * dx
                base = idx >> (6 - upsample_above)
                if base >= -(1 << upsample_above):
                    shift = ((idx << upsample_above) >> 1) & 0x1F
                    v = abv(base) * (32 - shift) + abv(base + 1) * shift
                    out[i, j] = round2(np.int64(v), 5)
                else:
                    idx2 = (i << 6) - (j + 1) * dy
                    base2 = idx2 >> (6 - upsample_left)
                    shift = ((idx2 << upsample_left) >> 1) & 0x1F
                    v = lft(base2) * (32 - shift) + lft(base2 + 1) * shift
                    out[i, j] = round2(np.int64(v), 5)
    elif p_angle > 180:
        dy = int(DR_INTRA_DERIVATIVE[270 - p_angle])
        max_base_y = (w + h - 1) << upsample_left
        for j in range(w):
            idx = (j + 1) * dy
            for i in range(h):
                base = (idx >> (6 - upsample_left)) + (i << upsample_left)
                if base < max_base_y:
                    shift = ((idx << upsample_left) >> 1) & 0x1F
                    v = lft(base) * (32 - shift) + lft(base + 1) * shift
                    out[i, j] = round2(np.int64(v), 5)
                else:
                    out[i, j] = lft(max_base_y)
    elif p_angle == 90:
        out[:] = above[1: 1 + w][None, :]
    else:  # 180
        out[:] = left[1: 1 + h][:, None]
    return out


def cfl_predict(dc_pred, luma_ac, alpha, bd):
    """CfL [SPEC §7.11.5]: dc_pred (h,w), luma_ac (h,w) q3, alpha signed."""
    scaled = round2_signed(alpha * luma_ac, 6)
    return clip1(dc_pred + scaled, bd)


def cfl_luma_ac(luma, y0, x0, w, h, sub_x, sub_y, luma_max_y, luma_max_x):
    """Subsampled, average-removed luma [SPEC §7.11.5.2-3], q3."""
    t = np.zeros((h, w), dtype=np.int64)
    for i in range(h):
        for j in range(w):
            ly = min((y0 + i) << sub_y, luma_max_y)
            lx = min((x0 + j) << sub_x, luma_max_x)
            if sub_x and sub_y:
                v = (int(luma[ly, lx]) + int(luma[ly, lx + 1]) +
                     int(luma[ly + 1, lx]) + int(luma[ly + 1, lx + 1])) << 1
            elif sub_x:
                v = (int(luma[ly, lx]) + int(luma[ly, lx + 1])) << 2
            else:
                v = int(luma[ly, lx]) << 3
            t[i, j] = v
    import math
    avg = round2(t.sum(), int(math.log2(w)) + int(math.log2(h)))
    return t - avg
