"""Superres horizontal upscale. [SPEC §7.16]

Applied after CDEF, before loop restoration: each row is upscaled from
the coded (downscaled) width to the upscaled width with a 64-phase
8-tap normative filter.
"""
import numpy as np

from av1dec_tpu.ops.spec.superres_filter import UPSCALE_FILTER

SCALE_BITS = 14          # RS_SCALE_SUBPEL_BITS
SCALE_MASK = (1 << 14) - 1
EXTRA_BITS = 8           # RS_SCALE_EXTRA_BITS (14 - 6 filter phase bits)
EXTRA_OFF = 1 << (EXTRA_BITS - 1)
FILTER = np.asarray(UPSCALE_FILTER, np.int64)   # [64][8]


def upscale_plane_rows(src, src_w, dst_w, n_rows, bd):
    """src: 2D plane (padded ok); upscales rows [0, n_rows) from width
    src_w to dst_w.  Returns new array [n_rows, dst_w] int64."""
    step = ((src_w << SCALE_BITS) + (dst_w >> 1)) // dst_w
    err = step * dst_w - (src_w << SCALE_BITS)
    # C semantics: trunc division for the (negative) initial offset
    num = -((dst_w - src_w) << (SCALE_BITS - 1)) + (dst_w >> 1)
    x0 = -((-num) // dst_w) if num < 0 else num // dst_w
    e2 = err // 2 if err >= 0 else -((-err) // 2)  # C trunc division
    x0 += EXTRA_OFF - e2
    # keep x0 SIGNED: the first samples sit slightly left of src[0]
    xs = x0 + step * np.arange(dst_w)
    px = xs >> SCALE_BITS          # floor shift (negative -> -1)
    subpel = (xs & SCALE_MASK) >> EXTRA_BITS
    # gather 8 taps around px-3..px+4.  Border extension replicates from
    # the ALIGNED (mi-domain) width, so reads use the real decoded
    # padding columns first (libaom extends from y_width, not crop).
    rows = np.asarray(src[:n_rows], np.int64)
    taps = FILTER[subpel]                                  # [dst_w, 8]
    acc = np.zeros((n_rows, dst_w), np.int64)
    for t in range(8):
        col = np.clip(px + t - 3, 0, rows.shape[1] - 1)
        acc += taps[:, t] * rows[:, col]
    out = (acc + 64) >> 7
    return np.clip(out, 0, (1 << bd) - 1)


def superres_frame(planes, seq, hdr, bd):
    """Upscale all planes; returns NEW list of planes at upscaled
    width (heights preserved, mi-padded)."""
    fw = hdr["frame_width"]
    uw = hdr["upscaled_width"]
    out = []
    for i, p in enumerate(planes):
        subx = seq.get("subsampling_x", 1) if i else 0
        sw = (fw + subx) >> subx
        dw = (uw + subx) >> subx
        up = np.zeros((p.shape[0], dw), np.int64)
        up[:p.shape[0]] = upscale_plane_rows(p, sw, dw, p.shape[0], bd)
        out.append(up)
    return out
