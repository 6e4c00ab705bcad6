"""Device wavefront intra reconstruction — one jitted scan per frame.

jnp mirror of `pipeline.wavefront`'s NumPy executor [SPEC §7.11.2,
SURVEY §7.1]: the host builds a level schedule with all control flow
precomputed as per-block int scalars; the device executes the whole
frame as ONE `lax.scan` over wavefront levels (no host round trips).
Each scan step applies every block class (transform shape) present in
the frame: gather edges from the evolving flat frame buffer, compute
the intra prediction, add the (device-precomputed) residual, clamp and
scatter back.

All int32 (AV1 decode is integer-exact); bit-exactness is enforced by
tests/test_wavefront.py against the NumPy executor, which in turn is
checked against the serial spec model and the libaom oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av1dec_tpu.ops.spec import intra
from av1dec_tpu.ops.tables_data import FILTER_INTRA_TAPS, SM_WEIGHTS
from av1dec_tpu.pipeline.wavefront import (MF_DC, MF_DIR, MF_FI, MF_H,
                                           MF_PAETH, MF_PAL, MF_SMOOTH,
                                           MF_SMOOTH_H, MF_SMOOTH_V, MF_V,
                                           _SCALAR_FIELDS)

_F = {name: i for i, name in enumerate(_SCALAR_FIELDS)}
_KERN = np.concatenate([np.zeros((1, 5), np.int64),
                        np.asarray(intra.INTRA_EDGE_KERNELS)],
                       axis=0).astype(np.int32)


def _gather_edges(frame, sv, w, h, bd):
    size = w + h
    x, y = sv["x"], sv["y"]
    base, stride = sv["base"], sv["stride"]
    i = jnp.arange(size, dtype=jnp.int32)
    cols = jnp.minimum(x[:, None] + i[None, :], sv["above_lim"][:, None])
    idx_a = base[:, None] + (y[:, None] - 1) * stride[:, None] + cols
    idx_rep_a = base + y * stride + (x - 1)
    idx_a = jnp.where((sv["above_case"] == 1)[:, None],
                      idx_rep_a[:, None], idx_a)
    above_v = frame[jnp.maximum(idx_a, 0)]
    above_v = jnp.where((sv["above_case"] == 2)[:, None],
                        (1 << (bd - 1)) - 1, above_v)
    rows = jnp.minimum(y[:, None] + i[None, :], sv["left_lim"][:, None])
    idx_l = base[:, None] + rows * stride[:, None] + (x - 1)[:, None]
    idx_rep_l = base + (y - 1) * stride + x
    idx_l = jnp.where((sv["left_case"] == 1)[:, None],
                      idx_rep_l[:, None], idx_l)
    left_v = frame[jnp.maximum(idx_l, 0)]
    left_v = jnp.where((sv["left_case"] == 2)[:, None],
                       (1 << (bd - 1)) + 1, left_v)
    cc = sv["corner_case"]
    idx_c = jnp.where(cc == 0, base + (y - 1) * stride + (x - 1),
                      jnp.where(cc == 1, base + (y - 1) * stride + x,
                                base + y * stride + (x - 1)))
    corner = jnp.where(cc == 3, 1 << (bd - 1), frame[jnp.maximum(idx_c, 0)])
    above = jnp.concatenate([corner[:, None], above_v], axis=1)
    left = jnp.concatenate([corner[:, None], left_v], axis=1)
    return above, left


def _edge_filter(edge, npx, strength):
    B, n = edge.shape
    i = jnp.arange(n, dtype=jnp.int32)
    acc = jnp.zeros_like(edge)
    kv = jnp.asarray(_KERN)[jnp.clip(strength, 0, 3)]
    for j in range(5):
        k = jnp.clip(i[None, :] - 2 + j, 0,
                     jnp.maximum(npx, 1)[:, None] - 1)
        acc = acc + kv[:, j][:, None] * jnp.take_along_axis(edge, k, axis=1)
    sm = (acc + 8) >> 4
    upd = (strength > 0)[:, None] & (i[None, :] >= 1) & \
        (i[None, :] < npx[:, None])
    return jnp.where(upd, sm, edge)


def _upsample(edge, npx, bd):
    B, n = edge.shape
    size = n - 1
    i = jnp.arange(size + 3, dtype=jnp.int32)
    src = jnp.minimum(jnp.maximum(i[None, :] - 1, 0), npx[:, None])
    inb = jnp.take_along_axis(edge, src, axis=1)
    s = (-inb[:, :size] + 9 * inb[:, 1:size + 1] +
         9 * inb[:, 2:size + 2] - inb[:, 3:size + 3])
    s = jnp.clip((s + 8) >> 4, 0, (1 << bd) - 1)
    out = jnp.zeros((B, 2 * size + 2), jnp.int32)
    out = out.at[:, 0].set(inb[:, 0])
    ii = jnp.arange(size)
    out = out.at[:, 2 * ii + 1].set(s)
    out = out.at[:, 2 * ii + 2].set(inb[:, 2:size + 2])
    return out


def _dir_lut(edge, edge_up, up, npx_u):
    B, n = edge.shape
    size = n - 1
    lutlen = 2 * size + 3
    k = jnp.arange(lutlen, dtype=jnp.int32)
    idx_n = jnp.clip(k[None, :] - 1, 0, size)
    lut_n = jnp.take_along_axis(edge, jnp.broadcast_to(idx_n, (B, lutlen)),
                                axis=1)
    idx_u = jnp.minimum(k[None, :], 2 * size + 1)
    lut_u = jnp.take_along_axis(edge_up,
                                jnp.broadcast_to(idx_u, (B, lutlen)), axis=1)
    tail = jnp.take_along_axis(
        edge, jnp.minimum(size, npx_u + 1)[:, None], axis=1)
    lut_u = jnp.where(k[None, :] < (2 * npx_u + 2)[:, None], lut_u, tail)
    return jnp.where((up > 0)[:, None], lut_u, lut_n)


def _take3(lut, idx, B, h, w):
    """Gather [B, h, w] indices from per-lane LUT [B, n]."""
    return jnp.take_along_axis(lut, idx.reshape(B, -1),
                               axis=1).reshape(B, h, w)


def _predict_dir(above, left, sv, w, h, bd, enable_edge_filter):
    B = above.shape[0]
    size = w + h
    p_angle = sv["p_angle"]
    if enable_edge_filter:
        do_c = sv["corner_filt"] > 0
        cv = (left[:, 1] * 5 + above[:, 0] * 6 + above[:, 1] * 5 + 8) >> 4
        above = above.at[:, 0].set(jnp.where(do_c, cv, above[:, 0]))
        left = left.at[:, 0].set(jnp.where(do_c, cv, left[:, 0]))
        above = _edge_filter(above, sv["npx_above"], sv["str_above"])
        left = _edge_filter(left, sv["npx_left"], sv["str_left"])
    up_a, up_l = sv["up_above"], sv["up_left"]
    npx_a = w + jnp.where(p_angle < 90, h, 0)
    npx_l = h + jnp.where(p_angle > 180, w, 0)
    lutA = _dir_lut(above, _upsample(above, npx_a, bd), up_a, npx_a)
    lutL = _dir_lut(left, _upsample(left, npx_l, bd), up_l, npx_l)

    jj = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    ii = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    dx = sv["dx"][:, None, None]
    dy = sv["dy"][:, None, None]
    ua = up_a[:, None, None]
    ul = up_l[:, None, None]
    pa = p_angle[:, None, None]

    idx1 = (ii + 1) * dx
    base1 = (idx1 >> (6 - ua)) + (jj << ua)
    max_base_x = (size - 1) << ua
    shift1 = ((idx1 << ua) >> 1) & 0x1F
    b1c = jnp.minimum(base1, max_base_x)
    v1 = _take3(lutA, b1c + 2, B, h, w) * (32 - shift1) + \
        _take3(lutA, jnp.minimum(b1c + 3, 2 * size + 2), B, h, w) * shift1
    z1 = jnp.where(base1 < max_base_x, (v1 + 16) >> 5,
                   jnp.take_along_axis(
                       lutA, (max_base_x + 2).reshape(B, 1),
                       axis=1).reshape(B, 1, 1))

    idx2 = (jj << 6) - (ii + 1) * dx
    base2 = idx2 >> (6 - ua)
    shift2 = ((idx2 << ua) >> 1) & 0x1F
    b2c = jnp.clip(base2, -2, size * 2)
    va = _take3(lutA, b2c + 2, B, h, w) * (32 - shift2) + \
        _take3(lutA, jnp.minimum(b2c + 3, 2 * size + 2), B, h, w) * shift2
    idx2l = (ii << 6) - (jj + 1) * dy
    base2l = idx2l >> (6 - ul)
    shift2l = ((idx2l << ul) >> 1) & 0x1F
    b2lc = jnp.clip(base2l, -2, size * 2)
    vl = _take3(lutL, b2lc + 2, B, h, w) * (32 - shift2l) + \
        _take3(lutL, jnp.minimum(b2lc + 3, 2 * size + 2), B, h, w) * shift2l
    z2 = jnp.where(base2 >= -(1 << ua), (va + 16) >> 5, (vl + 16) >> 5)

    idx3 = (jj + 1) * dy
    base3 = (idx3 >> (6 - ul)) + (ii << ul)
    max_base_y = (size - 1) << ul
    shift3 = ((idx3 << ul) >> 1) & 0x1F
    b3c = jnp.minimum(base3, max_base_y)
    v3 = _take3(lutL, b3c + 2, B, h, w) * (32 - shift3) + \
        _take3(lutL, jnp.minimum(b3c + 3, 2 * size + 2), B, h, w) * shift3
    z3 = jnp.where(base3 < max_base_y, (v3 + 16) >> 5,
                   jnp.take_along_axis(
                       lutL, (max_base_y + 2).reshape(B, 1),
                       axis=1).reshape(B, 1, 1))

    return jnp.where(pa < 90, z1, jnp.where(pa < 180, z2, z3))


def _predict_fi(above, left, fi_mode, w, h, bd):
    """Filter-intra: serial 4x2 patch recursion [SPEC §7.11.2.3].
    vmapped over lanes; fori over patches in recursion order."""
    B = above.shape[0]
    taps = jnp.asarray(
        np.asarray(FILTER_INTRA_TAPS, np.int32)[:, :, :7])  # [5, 8, 7]
    tv = taps[jnp.clip(fi_mode, 0, 4)]                      # [B, 8, 7]
    n_i = h // 2
    n_j = w // 4
    W1 = w + 1
    # buf flat [B, (h+1)*(w+1)]
    buf = jnp.zeros((B, (h + 1) * (w + 1)), jnp.int32)
    buf = buf.at[:, 0:w + 1].set(above[:, 0:w + 1])
    rows0 = (jnp.arange(h, dtype=jnp.int32) + 1) * W1
    buf = buf.at[:, rows0].set(left[:, 1:h + 1])
    hi = (1 << bd) - 1

    def patch(p, buf):
        si = p // n_j
        sj = p % n_j
        i = 1 + 2 * si
        j = 1 + 4 * sj
        o = (i - 1) * W1 + (j - 1)
        g = jnp.stack([o, o + 1, o + 2, o + 3, o + 4,
                       o + W1, o + 2 * W1])                    # [7]
        pv = buf[:, g]                                          # [B, 7]
        s = (tv * pv[:, None, :]).sum(-1)                       # [B, 8]
        v = jnp.where(s >= 0, (s + 8) >> 4, -((-s + 8) >> 4))
        v = jnp.clip(v, 0, hi)
        ok = jnp.arange(8, dtype=jnp.int32)
        dst = i * W1 + j + (ok % 4) + (ok // 4) * W1            # [8]
        return buf.at[:, dst].set(v)

    buf = jax.lax.fori_loop(0, n_i * n_j, patch, buf)
    return buf.reshape(B, h + 1, w + 1)[:, 1:, 1:]


def _smooth_b(above, left, w, h, mode):
    sw_w = jnp.asarray(SM_WEIGHTS[w: w + w].astype(np.int32))[None, None, :]
    sw_h = jnp.asarray(SM_WEIGHTS[h: h + h].astype(np.int32))[None, :, None]
    a = above[:, None, 1:1 + w]
    l = left[:, 1:1 + h, None]
    right = above[:, w][:, None, None]
    bottom = left[:, h][:, None, None]
    if mode == MF_SMOOTH:
        sm = (sw_h * a + (256 - sw_h) * bottom +
              sw_w * l + (256 - sw_w) * right)
        return (sm + 256) >> 9
    if mode == MF_SMOOTH_V:
        return (sw_h * a + (256 - sw_h) * bottom + 128) >> 8
    return (sw_w * l + (256 - sw_w) * right + 128) >> 8


def _paeth_b(above, left, w, h):
    a = above[:, None, 1:1 + w]
    l = left[:, 1:1 + h, None]
    tl = above[:, 0][:, None, None]
    base = a + l - tl
    pa = jnp.abs(base - a)
    pl = jnp.abs(base - l)
    ptl = jnp.abs(base - tl)
    sh = (a.shape[0], h, w)
    return jnp.where((pa <= pl) & (pa <= ptl), jnp.broadcast_to(a, sh),
                     jnp.where(pl <= ptl, jnp.broadcast_to(l, sh),
                               jnp.broadcast_to(tl, sh)))


def _cfl_adjust(frame, pred, sv, w, h, bd, sub_x, sub_y):
    B = pred.shape[0]
    lstride = sv["stride"] << sub_x
    ii = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    jj = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    ly = jnp.minimum((sv["y"][:, None, None] + ii) << sub_y,
                     sv["cfl_maxy"][:, None, None])
    lx = jnp.minimum((sv["x"][:, None, None] + jj) << sub_x,
                     sv["cfl_maxx"][:, None, None])
    b = ly * lstride[:, None, None] + lx
    if sub_x and sub_y:
        t = (frame[b] + frame[b + 1] + frame[b + lstride[:, None, None]] +
             frame[b + lstride[:, None, None] + 1]) << 1
    elif sub_x:
        t = (frame[b] + frame[b + 1]) << 2
    else:
        t = frame[b] << 3
    shift = int(np.log2(w)) + int(np.log2(h))
    avg = (t.reshape(B, -1).sum(1) + (1 << (shift - 1))) >> shift
    ac = t - avg[:, None, None]
    alpha = sv["cfl_alpha"][:, None, None]
    sc = alpha * ac
    scaled = jnp.where(sc >= 0, (sc + 32) >> 6, -((-sc + 32) >> 6))
    return jnp.clip(pred + scaled, 0, (1 << bd) - 1)


def _apply_class(frame, packed, start, count, res_t, pal_t, *, w, h, bd,
                 Bmax, sub_x, sub_y, eef, fams):
    """One (level, class) batch: predict + residual + scatter.

    packed: [N+Bmax, F] int32; start/count: scalars; res_t: [R, h, w];
    pal_t: [P, h, w] or None.  `fams`: static set of mode families
    present in this class (prunes dead code at trace time)."""
    rows = jax.lax.dynamic_slice_in_dim(packed, start, Bmax, axis=0)
    sv = {f: rows[:, k] for f, k in _F.items()}
    lane = jnp.arange(Bmax, dtype=jnp.int32)
    valid = lane < count
    above, left = _gather_edges(frame, sv, w, h, bd)
    mf = sv["mode_family"]
    B = Bmax
    out = jnp.zeros((B, h, w), jnp.int32)

    if MF_DIR in fams:
        out = jnp.where((mf == MF_DIR)[:, None, None],
                        _predict_dir(above, left, sv, w, h, bd, eef), out)
    if MF_V in fams:
        out = jnp.where((mf == MF_V)[:, None, None],
                        jnp.broadcast_to(above[:, None, 1:1 + w],
                                         (B, h, w)), out)
    if MF_H in fams:
        out = jnp.where((mf == MF_H)[:, None, None],
                        jnp.broadcast_to(left[:, 1:1 + h, None],
                                         (B, h, w)), out)
    if MF_DC in fams:
        dc_case = sv["dc_case"]
        s_a = above[:, 1:1 + w].sum(1)
        s_l = left[:, 1:1 + h].sum(1)
        avg = jnp.where(
            dc_case == 0, (s_a + s_l + ((w + h) >> 1)) // (w + h),
            jnp.where(dc_case == 1, (s_a + (w >> 1)) >> int(np.log2(w)),
                      jnp.where(dc_case == 2,
                                (s_l + (h >> 1)) >> int(np.log2(h)),
                                1 << (bd - 1))))
        pred = jnp.broadcast_to(avg[:, None, None], (B, h, w))
        if "cfl" in fams:
            cfl = _cfl_adjust(frame, pred, sv, w, h, bd, sub_x, sub_y)
            pred = jnp.where((sv["cfl_maxx"] > 0)[:, None, None], cfl, pred)
        out = jnp.where((mf == MF_DC)[:, None, None], pred, out)
    for fam in (MF_SMOOTH, MF_SMOOTH_V, MF_SMOOTH_H):
        if fam in fams:
            out = jnp.where((mf == fam)[:, None, None],
                            _smooth_b(above, left, w, h, fam), out)
    if MF_PAETH in fams:
        out = jnp.where((mf == MF_PAETH)[:, None, None],
                        _paeth_b(above, left, w, h), out)
    if MF_PAL in fams:
        pal = pal_t[jnp.maximum(sv["pal_idx"], 0)]
        out = jnp.where((mf == MF_PAL)[:, None, None], pal, out)
    if MF_FI in fams:
        fi = _predict_fi(above, left, sv["fi_mode"], w, h, bd)
        out = jnp.where((mf == MF_FI)[:, None, None], fi, out)

    # residual
    ridx = sv["res_idx"]
    res = res_t[jnp.maximum(ridx, 0)]
    out = jnp.where((ridx >= 0)[:, None, None],
                    jnp.clip(out + res, 0, (1 << bd) - 1), out)

    # scatter (invalid lanes -> OOB index, dropped)
    ii = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    jj = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    fidx = (sv["base"][:, None, None] +
            (sv["y"][:, None, None] + ii) * sv["stride"][:, None, None] +
            sv["x"][:, None, None] + jj)
    fidx = jnp.where(valid[:, None, None], fidx, frame.shape[0])
    return frame.at[fidx.reshape(-1)].set(out.reshape(-1), mode="drop")


@functools.partial(jax.jit, static_argnames=("config",))
def run_wavefront(frame0, class_inputs, res_tensors, pal_tensors, config):
    """frame0: flat int32 [flat_len].
    class_inputs: {key: (packed [N+Bmax, F] int32, starts [L] int32,
                         counts [L] int32)}
    res_tensors: {key: [R, h, w] int32}; pal_tensors: {key: [P, h, w]}.
    config: hashable ((key, Bmax, fams frozenset), ...), bd, sub_x,
    sub_y, eef, L."""
    (classes, bd, sub_x, sub_y, eef, L) = config

    packed = {k: class_inputs[k][0] for k, _, _ in classes}
    starts = jnp.stack([class_inputs[k][1] for k, _, _ in classes], axis=1)
    counts = jnp.stack([class_inputs[k][2] for k, _, _ in classes], axis=1)

    def step(frame, sc):
        st, cn = sc
        for ci, (key, Bmax, fams) in enumerate(classes):
            w, h = key
            frame = _apply_class(
                frame, packed[key], st[ci], cn[ci],
                res_tensors[key], pal_tensors.get(key),
                w=w, h=h, bd=bd, Bmax=Bmax, sub_x=sub_x, sub_y=sub_y,
                eef=eef, fams=fams)
        return frame, ()

    frame, _ = jax.lax.scan(step, frame0, (starts, counts), length=L)
    return frame
