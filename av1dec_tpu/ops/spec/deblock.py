"""AV1 deblocking loop filter — numpy spec model. [SPEC §7.14]

Normative order: per plane, filter ALL vertical edges (pass 0) across the
frame, then all horizontal edges (pass 1).  Edge decisions are made per
4-sample segment from the covering transform/prediction block geometry.
"""
import numpy as np

# block width/height in mi (4px) units, indexed by BLOCK_SIZE
MI_W = [1, 1, 2, 2, 2, 4, 4, 4, 8, 8, 8, 16, 16, 16, 32, 32,
        1, 4, 2, 8, 4, 16]
MI_H = [1, 2, 1, 2, 4, 2, 4, 8, 4, 8, 16, 8, 16, 32, 16, 32,
        4, 1, 8, 2, 16, 4]
TXW4 = [1, 2, 4, 8, 16, 1, 2, 2, 4, 4, 8, 8, 16, 1, 4, 2, 8, 4, 16]
TXH4 = [1, 2, 4, 8, 16, 2, 1, 4, 2, 8, 4, 16, 8, 4, 1, 8, 2, 16, 4]

GLOBALMV = 15  # y_mode numbering: inter modes start after intra+UV; the
# mode field stores PredictionMode; for intra frames unused.


def _mi_filter_levels(hdr, plans, idx, num_mode_deltas=2):
    """Per-mi filter level for lf index idx (0=Y vert, 1=Y horz, 2=U, 3=V).
    [SPEC §7.14.2 adjust-filter-level; libaom-equivalent formulation]"""
    lf = hdr["lf"]
    base = int(lf["level"][idx])
    mi_rows, mi_cols = plans.mi_rows, plans.mi_cols
    lvl = np.full((mi_rows, mi_cols), base, np.int32)
    if hdr["delta_lf_present"]:
        lvl = lvl + plans.grid(f"delta_lf{idx}").astype(np.int32)
    lvl = np.clip(lvl, 0, 63)
    seg = hdr["seg"]
    if seg["enabled"]:
        feat = idx + 1  # SEG_LVL_ALT_LF_Y_V == 1
        seg_id = plans.grid("seg_id").astype(np.int32)
        en = np.asarray(seg["feature_enabled"], np.int32).reshape(8, 8)
        data = np.asarray(seg["feature_data"], np.int32).reshape(8, 8)
        active = en[seg_id, feat] != 0
        lvl = np.where(active, np.clip(lvl + data[seg_id, feat], 0, 63),
                       lvl)
    if lf["delta_enabled"]:
        scale = 1 << (lvl >> 5)
        is_inter = plans.grid("is_inter").astype(np.int32) != 0
        ref0 = plans.grid("ref0").astype(np.int32)
        mode = plans.grid("mode").astype(np.int32)
        rd = np.asarray(lf["ref_deltas"], np.int32)
        md = np.asarray(lf["mode_deltas"], np.int32)
        # intra: ref_deltas[INTRA_FRAME]; inter: ref delta + mode delta
        # (mode delta idx 0 for GLOBALMV, 1 for other inter modes)
        delta = np.where(
            is_inter,
            rd[np.clip(ref0, 0, 7)] + md[(mode != GLOBALMV).astype(int)],
            rd[0])
        lvl = np.clip(lvl + delta * scale, 0, 63)
    return lvl


def _thresholds(lvl, sharpness):
    """(limit, blimit, thresh) per entry from the edge filter level.
    [SPEC §7.14.4]"""
    shift = (1 if sharpness > 0 else 0) + (1 if sharpness > 4 else 0)
    limit = lvl >> shift
    if sharpness > 0:
        limit = np.minimum(limit, 9 - sharpness)
    limit = np.maximum(limit, 1)
    blimit = 2 * (lvl + 2) + limit
    thresh = lvl >> 4
    return limit, blimit, thresh


def _tx_maps(plans, plane, pw4, ph4):
    """Rasterize per-4x4 tx width/height + tx-origin masks for a plane.

    Vectorized: transform blocks tile the plane without overlap, so a
    2-D difference array + cumulative sum reconstructs each piecewise-
    constant rect fill exactly (one np.add.at per field instead of a
    Python loop over every tx record)."""
    tx = np.asarray(plans.tx)
    sel = tx[:, 0] == plane
    x4 = tx[sel, 1].astype(np.int64)
    y4 = tx[sel, 2].astype(np.int64)
    tsz = tx[sel, 3].astype(np.int64)
    keep = (x4 < pw4) & (y4 < ph4)
    x4, y4, tsz = x4[keep], y4[keep], tsz[keep]
    # tsz 19 = lossless 4x4 WHT (1 cell); others per the size LUTs
    w4 = np.asarray(TXW4 + [1], np.int64)[tsz]
    h4 = np.asarray(TXH4 + [1], np.int64)[tsz]
    x1 = np.minimum(x4 + w4, pw4)
    y1 = np.minimum(y4 + h4, ph4)

    def rect_fill(vals):
        d = np.zeros((ph4 + 1, pw4 + 1), np.int64)
        np.add.at(d, (y4, x4), vals)
        np.add.at(d, (y4, x1), -vals)
        np.add.at(d, (y1, x4), -vals)
        np.add.at(d, (y1, x1), vals)
        return d.cumsum(0).cumsum(1)[:ph4, :pw4]

    cover = rect_fill(np.ones(len(x4), np.int64))
    txw = np.where(cover > 0, rect_fill(w4), 1).astype(np.int32)
    txh = np.where(cover > 0, rect_fill(h4), 1).astype(np.int32)
    # origin masks: column runs (edge_v) / row runs (edge_h)
    dv = np.zeros((ph4 + 1, pw4), np.int64)
    np.add.at(dv, (y4, x4), 1)
    np.add.at(dv, (y1, x4), -1)
    edge_v = dv.cumsum(0)[:ph4] > 0
    dh = np.zeros((ph4, pw4 + 1), np.int64)
    np.add.at(dh, (y4, x4), 1)
    np.add.at(dh, (y4, x1), -1)
    edge_h = dh.cumsum(1)[:, :pw4] > 0
    return txw, txh, edge_v, edge_h


def _filter_lines(P, Q, length, limit, blimit, thresh, bd):
    """Filter a batch of edge-crossing pixel lines.

    P: [...,7] pixels left/above the edge, P[...,6] adjacent (p0).
    Q: [...,7] pixels right/below, Q[...,0] adjacent (q0).
    length: per-line filter size (0=none, 4, 6, 8, 14).
    Returns new (P, Q) (int32).  [SPEC §7.14.6]
    """
    F = 1 << (bd - 8)
    limit = limit * F
    blimit = blimit * F
    thresh = thresh * F
    p = [P[..., 6 - i].astype(np.int64) for i in range(7)]  # p0..p6
    q = [Q[..., i].astype(np.int64) for i in range(7)]      # q0..q6

    def ad(a, b):
        return np.abs(a - b)

    # base filter mask: samples within min(length/2, 3)-1 of the edge
    m = (ad(p[1], p[0]) <= limit) & (ad(q[1], q[0]) <= limit) & \
        (ad(p[0], q[0]) * 2 + ad(p[1], q[1]) // 2 <= blimit)
    m6 = m & (ad(p[2], p[1]) <= limit) & (ad(q[2], q[1]) <= limit)
    m8 = m6 & (ad(p[3], p[2]) <= limit) & (ad(q[3], q[2]) <= limit)
    mask = np.where(length == 4, m, np.where(length == 6, m6, m8)) & \
        (length > 0)

    flat6 = (ad(p[1], p[0]) <= F) & (ad(q[1], q[0]) <= F) & \
            (ad(p[2], p[0]) <= F) & (ad(q[2], q[0]) <= F)
    flat8 = flat6 & (ad(p[3], p[0]) <= F) & (ad(q[3], q[0]) <= F)
    flat2 = (ad(p[4], p[0]) <= F) & (ad(q[4], q[0]) <= F) & \
            (ad(p[5], p[0]) <= F) & (ad(q[5], q[0]) <= F) & \
            (ad(p[6], p[0]) <= F) & (ad(q[6], q[0]) <= F)

    def rnd(x, b):
        return (x + (1 << (b - 1))) >> b

    outp = [x.copy() for x in p]
    outq = [x.copy() for x in q]

    # wide 13-tap (length 14, luma): border-replicated window with a
    # doubled sliding triple centered on the output (16 weights, >>4).
    # Derived from the oracle by exact-interval fitting; equals libaom's
    # filter14 weight rows.
    w14 = mask & (length == 14) & flat8 & flat2
    if w14.any():
        S = [p[6], p[5], p[4], p[3], p[2], p[1], p[0],
             q[0], q[1], q[2], q[3], q[4], q[5], q[6]]

        def wide(i):
            # weights: clip window [i-7, i+7] + extra copies of the
            # doubled triple S[i-1], S[i], S[i+1] (clipped)
            acc = S[min(max(i - 1, 0), 13)] + S[i] + \
                S[min(max(i + 1, 0), 13)]
            for j in range(i - 6, i + 7):
                acc = acc + S[min(max(j, 0), 13)]
            return rnd(acc, 4)

        for i in range(6):
            outp[i] = np.where(w14, wide(6 - i), outp[i])     # p_i at S[6-i]
            outq[i] = np.where(w14, wide(7 + i), outq[i])     # q_i at S[7+i]

    # 7-tap (length 8)
    w8 = mask & (length >= 8) & flat8 & ~w14
    if w8.any():
        o2 = rnd(p[3] * 3 + p[2] * 2 + p[1] + p[0] + q[0], 3)
        o1 = rnd(p[3] * 2 + p[2] + p[1] * 2 + p[0] + q[0] + q[1], 3)
        o0 = rnd(p[3] + p[2] + p[1] + p[0] * 2 + q[0] + q[1] + q[2], 3)
        u0 = rnd(p[2] + p[1] + p[0] + q[0] * 2 + q[1] + q[2] + q[3], 3)
        u1 = rnd(p[1] + p[0] + q[0] + q[1] * 2 + q[2] + q[3] * 2, 3)
        u2 = rnd(p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 3, 3)
        for i, v in enumerate((o0, o1, o2)):
            outp[i] = np.where(w8, v, outp[i])
        for i, v in enumerate((u0, u1, u2)):
            outq[i] = np.where(w8, v, outq[i])

    # 5-tap (length 6, chroma)
    w6 = mask & (length == 6) & flat6
    if w6.any():
        o1 = rnd(p[2] * 3 + p[1] * 2 + p[0] * 2 + q[0], 3)
        o0 = rnd(p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1], 3)
        u0 = rnd(p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2], 3)
        u1 = rnd(p[0] + q[0] * 2 + q[1] * 2 + q[2] * 3, 3)
        for i, v in enumerate((o0, o1)):
            outp[i] = np.where(w6, v, outp[i])
        for i, v in enumerate((u0, u1)):
            outq[i] = np.where(w6, v, outq[i])

    # narrow 4-tap with hev
    w4 = mask & ~w14 & ~w8 & ~w6
    if w4.any():
        half = 128 * F
        lo, hi = -half, half - 1

        def sc(x):
            return np.clip(x, lo, hi)

        hev = (ad(p[1], p[0]) > thresh) | (ad(q[1], q[0]) > thresh)
        ps1, ps0 = p[1] - half, p[0] - half
        qs0, qs1 = q[0] - half, q[1] - half
        a = sc(np.where(hev, sc(ps1 - qs1), 0) + 3 * (qs0 - ps0))
        f1 = sc(a + 4) >> 3
        f2 = sc(a + 3) >> 3
        top = (1 << bd) - 1
        n_q0 = np.clip(sc(qs0 - f1) + half, 0, top)
        n_p0 = np.clip(sc(ps0 + f2) + half, 0, top)
        f3 = np.where(hev, 0, (f1 + 1) >> 1)
        n_q1 = np.clip(sc(qs1 - f3) + half, 0, top)
        n_p1 = np.clip(sc(ps1 + f3) + half, 0, top)
        outp[0] = np.where(w4, n_p0, outp[0])
        outp[1] = np.where(w4, n_p1, outp[1])
        outq[0] = np.where(w4, n_q0, outq[0])
        outq[1] = np.where(w4, n_q1, outq[1])

    NP = P.copy().astype(np.int64)
    NQ = Q.copy().astype(np.int64)
    for i in range(7):
        NP[..., 6 - i] = outp[i]
        NQ[..., i] = outq[i]
    return NP, NQ


def build_deblock_maps(seq, hdr, plans, num_planes):
    """Dense per-edge parameter maps for the whole frame.

    Returns None when deblocking is disabled for this frame, else a
    list (per plane) of ((flen_v, lvl_v), (flen_h, lvl_h)) int32 cell
    maps in *pass orientation*: map[a, k] holds the decision for the
    edge at position 4k along the filtering axis at cell row `a`
    (flen 0 = no filtering; lvl is the post-neighbor-fallback filter
    level the thresholds derive from).  The same maps drive both the
    host filter below and the device kernel
    (av1dec_tpu/ops/kernels/deblock.py) so their edge decisions are
    identical by construction.  [SPEC §7.14.2-7.14.5]
    """
    lf = hdr["lf"]
    levels = lf["level"]
    if hdr.get("coded_lossless") or hdr.get("allow_intrabc"):
        return None
    if not any(levels):
        return None
    mi_rows, mi_cols = plans.mi_rows, plans.mi_cols
    bsz = plans.grid("bsize").astype(np.int32)
    skip = plans.grid("skip").astype(np.int32)
    is_inter = plans.grid("is_inter").astype(np.int32)
    eff_skip = (skip != 0) & (is_inter != 0)
    bw4 = np.asarray(MI_W, np.int32)[bsz]
    bh4 = np.asarray(MI_H, np.int32)[bsz]
    mi_lvls = {}
    out = []

    for plane in range(num_planes):
        subx = seq.get("subsampling_x", 1) if plane else 0
        suby = seq.get("subsampling_y", 1) if plane else 0
        # 4x4 units whose origin lies at/beyond the CROPPED plane dims
        # are not filtered [SPEC §7.14.2 "if x >= width ... return"]:
        # the mi area (and the superblock-padded alloc) can carry
        # decoded overhang from partial blocks past the frame edge
        pw = (hdr["frame_width"] + subx) >> subx
        ph = (hdr["frame_height"] + suby) >> suby
        pw4, ph4 = (pw + 3) >> 2, (ph + 3) >> 2
        plane_off = ((plane == 0 and levels[0] == 0 and levels[1] == 0)
                     or (plane == 1 and levels[2] == 0)
                     or (plane == 2 and levels[3] == 0))
        if plane_off:
            out.append((
                (np.zeros((ph4, pw4), np.int32),
                 np.zeros((ph4, pw4), np.int32)),
                (np.zeros((pw4, ph4), np.int32),
                 np.zeros((pw4, ph4), np.int32))))
            continue
        txw, txh, edge_v, edge_h = _tx_maps(plans, plane, pw4, ph4)
        # luma mi coords for each plane 4x4 cell (bottom-right of group)
        mc = np.minimum((np.arange(pw4) << subx) | subx, mi_cols - 1)
        mr = np.minimum((np.arange(ph4) << suby) | suby, mi_rows - 1)
        plane_maps = []
        for pass_ in range(2):
            idx = pass_ if plane == 0 else plane + 1
            if idx not in mi_lvls:
                mi_lvls[idx] = _mi_filter_levels(hdr, plans, idx)
            lvl_mi = mi_lvls[idx]
            lvl_cells = lvl_mi[np.ix_(mr, mc)]
            skip_cells = eff_skip[np.ix_(mr, mc)]
            if pass_ == 0:
                # vertical edges at plane cell columns px>0
                dim_cells = txw
                edge = edge_v
                bdim = bw4[np.ix_(mr, mc)]
                pos_mi = mc[None, :].repeat(ph4, 0)
                pos_axis = mc
            else:
                dim_cells = txh
                edge = edge_h
                bdim = bh4[np.ix_(mr, mc)]
                pos_mi = mr[:, None].repeat(pw4, 1)
                pos_axis = mr
            # block origin (luma mi) along the axis; aligned to block dims
            origin = pos_mi - (pos_mi % np.maximum(bdim, 1))
            if pass_ == 1:
                edge = edge.T
                dim_cells = dim_cells.T
                lvl_cells = lvl_cells.T
                skip_cells = skip_cells.T
                origin = origin.T
            n4 = dim_cells.shape[1]
            lvl = lvl_cells.astype(np.int32)
            lvl[:, 1:] = np.where(lvl[:, 1:] == 0, lvl[:, :-1], lvl[:, 1:])
            # block edge: cur block origin strictly beyond prev cell
            blk_edge = np.zeros_like(edge)
            blk_edge[:, 1:] = origin[:, 1:] > pos_axis[None, :n4 - 1]
            apply = edge & (lvl > 0)
            apply[:, 1:] &= (~skip_cells[:, 1:] | ~skip_cells[:, :-1] |
                             blk_edge[:, 1:])
            apply[:, 0] = False  # frame-boundary edge is never filtered
            mind = dim_cells.copy()
            mind[:, 1:] = np.minimum(dim_cells[:, 1:], dim_cells[:, :-1])
            mind *= 4
            if plane == 0:
                flen = np.where(mind >= 16, 14,
                                np.where(mind >= 8, 8, 4))
            else:
                flen = np.where(mind >= 8, 6, 4)
            flen = np.where(apply, flen, 0).astype(np.int32)
            plane_maps.append((flen, lvl))
        out.append(tuple(plane_maps))
    return out


def deblock_frame(planes, seq, hdr, plans, bd):
    """Apply the loop filter in place to `planes` (list of int arrays)."""
    maps = build_deblock_maps(seq, hdr, plans, len(planes))
    if maps is None:
        return planes
    sharpness = hdr["lf"]["sharpness"]
    for plane in range(len(planes)):
        arr = planes[plane].astype(np.int64)
        for pass_ in range(2):
            flen_map, lvl_map = maps[plane][pass_]
            if pass_ == 1:
                arr = arr.T
            n4_along, n4_edge = flen_map.shape
            npx = arr.shape[0]
            limit_m, blimit_m, thresh_m = _thresholds(lvl_map, sharpness)
            for cx in range(1, n4_edge):
                flen = flen_map[:, cx]
                if not flen.any():
                    continue
                # expand per-cell -> per-pixel-row
                rows = min(npx, n4_along * 4)

                def ex(v):
                    return np.repeat(v, 4)[:rows]

                X = cx * 4
                lo = max(0, X - 7)
                P = np.zeros((rows, 7), np.int64)
                P[:, 7 - (X - lo):] = arr[:rows, lo:X]
                hi = min(arr.shape[1], X + 7)
                Q = np.zeros((rows, 7), np.int64)
                Q[:, : hi - X] = arr[:rows, X:hi]
                NP, NQ = _filter_lines(P, Q, ex(flen),
                                       ex(limit_m[:, cx]),
                                       ex(blimit_m[:, cx]),
                                       ex(thresh_m[:, cx]), bd)
                arr[:rows, lo:X] = NP[:, 7 - (X - lo):]
                arr[:rows, X:hi] = NQ[:, : hi - X]
            if pass_ == 1:
                arr = arr.T
        planes[plane][...] = arr.astype(planes[plane].dtype)
    return planes
