"""Vectorized CDEF — whole-frame formulation of ops.spec.cdef.

Same integer math as the scalar spec model (bit-exact; cross-checked in
tests), restructured as dense per-pixel gathers so it vectorizes on
numpy today and maps 1:1 onto jnp for the device path:
  - direction search: one [nUnits, 64] x [64, 15] contraction per
    projection axis
  - filtering: 12 shifted-image gathers with per-pixel offsets derived
    from the per-unit direction
"""
import numpy as np

from av1dec_tpu.ops.spec.cdef import CDEF_VERY_LARGE, DIRECTIONS, DIV_TABLE

# one-hot projection matrices: P[d][i*8+j, k] = 1 iff partial[d][k] += x[i,j]
_PROJ = np.zeros((8, 64, 15), np.int64)
for _i in range(8):
    for _j in range(8):
        for _d, _idx in enumerate([
                _i + _j, _i + (_j >> 1), _i, 3 + _i - (_j >> 1),
                7 + _i - _j, 3 - (_i >> 1) + _j, _j, (_i >> 1) + _j]):
            _PROJ[_d, _i * 8 + _j, _idx] = 1

_DIR_DY = np.array([[d[k][0] for k in range(2)] for d in DIRECTIONS])
_DIR_DX = np.array([[d[k][1] for k in range(2)] for d in DIRECTIONS])


def _directions_all(luma, bd):
    """luma: mi-domain luma plane (H, W), H and W multiples of 8.
    Returns (dir, var) arrays of shape [H//8, W//8]."""
    H, W = luma.shape
    x = (luma.astype(np.int64) >> (bd - 8)) - 128
    blocks = x.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 64)
    partial = np.einsum('bs,dsk->bdk', blocks, _PROJ)  # [B, 8, 15]
    cost = np.zeros((blocks.shape[0], 8), np.int64)
    cost[:, 2] = 105 * (partial[:, 2, :8] ** 2).sum(1)
    cost[:, 6] = 105 * (partial[:, 6, :8] ** 2).sum(1)
    dv = np.asarray(DIV_TABLE, np.int64)
    for d in (0, 4):
        cost[:, d] = (
            (partial[:, d, :7] ** 2 + partial[:, d, 14:7:-1] ** 2)
            @ dv[:7]) + partial[:, d, 7] ** 2 * 105
    for d in (1, 3, 5, 7):
        cost[:, d] = 105 * (partial[:, d, 3:8] ** 2).sum(1) + \
            (partial[:, d, :3] ** 2 + partial[:, d, 10:7:-1] ** 2) @ \
            dv[[1, 3, 5]]
    best = cost.argmax(1)
    b = np.arange(len(best))
    var = (cost[b, best] - cost[b, (best + 4) & 7]) >> 10
    return best.reshape(H // 8, W // 8), var.reshape(H // 8, W // 8)


def _shift_for(strength, damping):
    """floor(log2) via float — exact for the small integer strengths."""
    bl = np.floor(np.log2(np.maximum(strength, 1).astype(np.float64))
                  ).astype(np.int32)
    return np.maximum(0, damping - bl)


def _constrain_v(diff, strength, shift):
    """strength: per-pixel array (0 disables); shift precomputed."""
    ad = np.abs(diff)
    out = np.sign(diff) * np.minimum(
        ad, np.maximum(0, strength - (ad >> shift)))
    return out


def _filter_plane(plane_arr, pri_px, sec_px, dir_px, pri_shift, sec_shift,
                  bd, coeff_shift, apply_px):
    """Filter one plane wholesale.  All *_px are per-pixel int32 arrays."""
    H, W = plane_arr.shape
    pad = np.full((H + 4, W + 4), CDEF_VERY_LARGE, np.int32)
    pad[2:H + 2, 2:W + 2] = plane_arr
    yy, xx = np.mgrid[0:H, 0:W]
    yy = (yy + 2).astype(np.int32)
    xx = (xx + 2).astype(np.int32)
    x = plane_arr.astype(np.int32)
    total = np.zeros((H, W), np.int32)
    mx = x.copy()
    mn = x.copy()
    pri_tap0 = np.where(((pri_px >> coeff_shift) & 1) == 0, 4, 3)
    pri_tap1 = np.where(((pri_px >> coeff_shift) & 1) == 0, 2, 3)
    sec_taps = (2, 1)
    for k in range(2):
        tap_p = pri_tap0 if k == 0 else pri_tap1
        # primary
        dy = _DIR_DY[dir_px, k]
        dx = _DIR_DX[dir_px, k]
        for sgn in (1, -1):
            p = pad[yy + sgn * dy, xx + sgn * dx]
            valid = p != CDEF_VERY_LARGE
            total += np.where(valid & (pri_px > 0),
                              tap_p * _constrain_v(p - x, pri_px,
                                                   pri_shift), 0)
            upd = valid & (pri_px > 0)
            mx = np.where(upd, np.maximum(mx, p), mx)
            mn = np.where(upd, np.minimum(mn, p), mn)
        # secondary (two cross directions)
        for rot in (2, 6):
            dy = _DIR_DY[(dir_px + rot) & 7, k]
            dx = _DIR_DX[(dir_px + rot) & 7, k]
            for sgn in (1, -1):
                p = pad[yy + sgn * dy, xx + sgn * dx]
                valid = p != CDEF_VERY_LARGE
                total += np.where(valid & (sec_px > 0),
                                  sec_taps[k] * _constrain_v(
                                      p - x, sec_px, sec_shift), 0)
                upd = valid & (sec_px > 0)
                mx = np.where(upd, np.maximum(mx, p), mx)
                mn = np.where(upd, np.minimum(mn, p), mn)
    y = x + ((8 + total - (total < 0)) >> 4)
    y = np.clip(y, mn, mx)
    return np.where(apply_px, y, plane_arr)


def cdef_frame(planes, seq, hdr, plans, bd):
    """Drop-in replacement for ops.spec.cdef.cdef_frame (in place)."""
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

    # per 8x8-luma-unit quantities
    uR, uC = (mi_rows + 1) // 2, (mi_cols + 1) // 2
    r1 = np.minimum(np.arange(uR) * 2 + 1, mi_rows - 1)
    c1 = np.minimum(np.arange(uC) * 2 + 1, mi_cols - 1)
    r0 = np.arange(uR) * 2
    c0 = np.arange(uC) * 2
    unit_skip = skip[np.ix_(r0, c0)] & skip[np.ix_(r0, c1)] & \
        skip[np.ix_(r1, c0)] & skip[np.ix_(r1, c1)]
    idx = cdef_mi[np.ix_(r0, c0)]
    active = (unit_skip == 0) & (idx >= 0)
    idxc = np.clip(idx, 0, nstr - 1)
    y_pri_u = np.asarray(c["y_pri"], np.int32)[idxc] << coeff_shift
    y_sec_u = np.asarray(c["y_sec"], np.int32)[idxc] << coeff_shift
    uv_pri_u = np.asarray(c["uv_pri"], np.int32)[idxc] << coeff_shift
    uv_sec_u = np.asarray(c["uv_sec"], np.int32)[idxc] << coeff_shift

    need_dir = (y_pri_u > 0) | (uv_pri_u > 0)
    dirs, var = _directions_all(planes[0], bd)
    dirs = np.where(need_dir & active, dirs, 0)

    # luma primary strength: variance adjustment
    v6 = var >> 6
    i_adj = np.where(v6 > 0,
                     np.minimum(12, np.floor(np.log2(np.maximum(v6, 1)))
                                .astype(np.int64)), 0)
    pri_adj = np.where(var != 0, (y_pri_u * (4 + i_adj) + 8) >> 4, 0)
    pri_adj = np.where(y_pri_u > 0, pri_adj, 0)

    damping = c["damping"] + coeff_shift

    def expand(u, rep_y, rep_x, H, W):
        return np.repeat(np.repeat(u, rep_y, axis=0), rep_x,
                         axis=1)[:H, :W]

    # luma
    H, W = planes[0].shape
    apply_y = active & ((pri_adj > 0) | (y_sec_u > 0))
    planes[0][...] = _filter_plane(
        planes[0], expand(pri_adj, 8, 8, H, W),
        expand(np.where(active, y_sec_u, 0), 8, 8, H, W),
        expand(np.where(y_pri_u > 0, dirs, 0), 8, 8, H, W),
        expand(_shift_for(pri_adj, damping), 8, 8, H, W),
        expand(_shift_for(y_sec_u, damping), 8, 8, H, W),
        bd, coeff_shift, expand(apply_y, 8, 8, H, W))

    if len(planes) > 1:
        uvdir = np.where(uv_pri_u > 0, dirs, 0)
        if subx != suby and subx:
            uvdir = np.asarray([7, 0, 2, 4, 5, 6, 6, 6])[uvdir]
            uvdir = np.where(uv_pri_u > 0, uvdir, 0)
        Hc, Wc = planes[1].shape
        ry, rx = 8 >> suby, 8 >> subx
        apply_uv = active & ((uv_pri_u > 0) | (uv_sec_u > 0))
        for pl in (1, 2):
            planes[pl][...] = _filter_plane(
                planes[pl], expand(np.where(active, uv_pri_u, 0),
                                   ry, rx, Hc, Wc),
                expand(np.where(active, uv_sec_u, 0), ry, rx, Hc, Wc),
                expand(uvdir, ry, rx, Hc, Wc),
                expand(_shift_for(uv_pri_u, damping - 1), ry, rx, Hc, Wc),
                expand(_shift_for(uv_sec_u, damping - 1), ry, rx, Hc, Wc),
                bd, coeff_shift, expand(apply_uv, ry, rx, Hc, Wc))
    return planes
