"""CDF-row substitution search v2: localize the first wrong symbol by
scoring reconstructions against the oracle with single-row substitutions.

Usage: python tools/sub_search.py <ivf> [lo [hi]]
Without lo/hi, locates the first failing tx record and searches the
reads around it.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np  # noqa: E402
import aomffi  # noqa: E402
from av1dec_tpu.bindings import NativeParser  # noqa: E402
from av1dec_tpu.pipeline.recon import FrameRecon  # noqa: E402
import pymodel  # noqa: E402
import trace_diff  # noqa: E402


def setup(path):
    p = NativeParser()
    p.set_decode_tiles(False)
    hdrs = []
    for _, tu in aomffi.read_ivf(path):
        hdrs.extend(p.parse_tu(tu))
        break
    hdr, seq = hdrs[0], p.seq
    payload = trace_diff.tile_bytes_of_first_frame(path)
    tile = payload[len(payload) - hdr["tile_sizes"][0]:]
    oracle = aomffi.oracle_decode_ivf(path)[0]
    refp = [x.astype(np.int64) for x in (oracle.y, oracle.u, oracle.v)
            if x is not None]
    return seq, hdr, tile, refp


def decode(seq, hdr, tile, sub=None):
    dec = pymodel.MiniDecoder(seq, hdr, tile)
    if sub:
        dec.r.substitute = sub
    try:
        dec.decode_tile()
        planes = FrameRecon(seq, hdr, dec).run()
    except Exception:
        return None, None, None
    return dec, planes, None


def score(planes, refp):
    if planes is None:
        return None
    return sum(int((m[: r.shape[0], : r.shape[1]] != r).sum())
               for m, r in zip(planes, refp))


def first_bad_read(dec, planes, refp):
    """Approximate read index where things first go wrong: the txb_skip
    tag of the first tx record whose region mismatches."""
    TX_DIMS = pymodel.TXW4, pymodel.TXH4
    for rec in np.asarray(dec.tx):
        plane, x4, y4, tsz, tt, eob, off, mi, av = [int(v) for v in rec]
        w, h = pymodel.TXW4[tsz] * 4, pymodel.TXH4[tsz] * 4
        x, y = x4 * 4, y4 * 4
        r = refp[plane]
        if y >= r.shape[0] or x >= r.shape[1]:
            continue
        sub = planes[plane][y: y + h, x: x + w]
        rr = r[y: y + min(h, r.shape[0] - y), x: x + min(w, r.shape[1] - x)]
        if (sub[: rr.shape[0], : rr.shape[1]] != rr).any():
            # find this record's txb tag
            key = f"txb_skip@p{plane},{x4},{y4}"
            for idx, tag in dec.read_tags:
                if tag == key:
                    return idx, key
            return None, key
    return None, None


def all_rows():
    rows = []
    for name, arr in pymodel.T.items():
        a = np.asarray(arr)
        flat = a.reshape(-1, a.shape[-1])
        for ri in range(flat.shape[0]):
            row = flat[ri]
            if 0 < row.max() < 32768:
                rows.append((name, ri, row.copy()))
    return rows


def main():
    path = sys.argv[1]
    seq, hdr, tile, refp = setup(path)
    dec0, planes0, _ = decode(seq, hdr, tile)
    base = score(planes0, refp)
    print(f"baseline: {base} mismatches, {len(dec0.r.trace)} reads")
    if base == 0:
        return
    if len(sys.argv) > 2:
        lo = int(sys.argv[2])
        hi = int(sys.argv[3]) if len(sys.argv) > 3 else lo + 25
    else:
        k0, key = first_bad_read(dec0, planes0, refp)
        print(f"first bad record read ~{k0} ({key})")
        if k0 is None:
            print("could not localize; supply lo/hi")
            return
        lo, hi = max(0, k0 - 30), k0 + 3
    rows = all_rows()
    print(f"searching reads {lo}..{hi} over {len(rows)} rows")
    for k in range(lo, hi):
        best = None
        for name, ri, row in rows:
            dec, planes, _ = decode(seq, hdr, tile, {k: row})
            bad = score(planes, refp)
            if bad is not None and (best is None or bad < best[0]):
                best = (bad, name, ri)
                if bad == 0:
                    break
        tagmap = dict((i, t) for i, t in dec0.read_tags)
        tag = tagmap.get(k, "")
        if best and best[0] < base:
            print(f"read {k} {tag}: entry={dec0.r.trace[k]} best={best}")
        if best and best[0] == 0:
            print("EXACT — bug at this read")
            return


if __name__ == "__main__":
    main()
