"""Fast substitution search: prefix-scored, descending from the first
failing record's reads.  Usage: sub_search2.py <ivf> [n_reads_back]"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np  # noqa: E402
import sub_search as S  # noqa: E402
import pymodel  # noqa: E402
from av1dec_tpu.pipeline.recon import FrameRecon  # noqa: E402


class Trunc:
    """Duck-typed plans with truncated record list."""

    def __init__(self, dec, n):
        self.mi_rows = dec.mi_rows
        self.mi_cols = dec.mi_cols
        self.coeffs = dec.coeffs
        self.palettes = dec.palettes
        self.grid = dec.grid
        self.tx = np.asarray(dec.tx)[:n]


def prefix_score(seq, hdr, tile, refp, n_records, sub=None):
    dec = pymodel.MiniDecoder(seq, hdr, tile)
    if sub:
        dec.r.substitute = sub
    try:
        dec.decode_tile()
    except Exception:
        return None, None
    tr = Trunc(dec, n_records)
    try:
        planes = FrameRecon(seq, hdr, tr).run()
    except Exception:
        return None, None
    bad = 0
    for rec in tr.tx:
        plane, x4, y4, tsz, tt, eob, off, mi, av = [int(v) for v in rec]
        w, h = pymodel.TXW4[tsz] * 4, pymodel.TXH4[tsz] * 4
        x, y = x4 * 4, y4 * 4
        r = refp[plane]
        if y >= r.shape[0] or x >= r.shape[1]:
            continue
        sub_ = planes[plane][y: y + h, x: x + w]
        rr = r[y: y + min(h, r.shape[0] - y), x: x + min(w, r.shape[1] - x)]
        bad += int((sub_[: rr.shape[0], : rr.shape[1]] != rr).sum())
    return bad, dec


def main():
    path = sys.argv[1]
    back = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    seq, hdr, tile, refp = S.setup(path)
    dec0, planes0, _ = S.decode(seq, hdr, tile)
    full_base = S.score(planes0, refp)
    print(f"full baseline: {full_base}")
    if full_base == 0:
        return
    # first failing record index
    tx = np.asarray(dec0.tx)
    first_bad_rec = None
    for i, rec in enumerate(tx):
        plane, x4, y4, tsz, tt, eob, off, mi, av = [int(v) for v in rec]
        w, h = pymodel.TXW4[tsz] * 4, pymodel.TXH4[tsz] * 4
        x, y = x4 * 4, y4 * 4
        r = refp[plane]
        if y >= r.shape[0] or x >= r.shape[1]:
            continue
        sub_ = planes0[plane][y: y + h, x: x + w]
        rr = r[y: y + min(h, r.shape[0] - y), x: x + min(w, r.shape[1] - x)]
        if (sub_[: rr.shape[0], : rr.shape[1]] != rr).any():
            first_bad_rec = i
            break
    n_records = first_bad_rec + 1
    # map record -> read index via txb tag
    plane, x4, y4 = [int(tx[first_bad_rec][j]) for j in (0, 1, 2)]
    key = f"txb_skip@p{plane},{x4},{y4}"
    k0 = None
    for idx, tag in dec0.read_tags:
        if tag == key:
            k0 = idx
    if k0 is None:
        k0 = len(dec0.r.trace) - 1
    print(f"first bad record {first_bad_rec} ({key}), read ~{k0}; "
          f"prefix n_records={n_records}")
    base, _ = prefix_score(seq, hdr, tile, refp, n_records)
    print(f"prefix baseline: {base}")

    rows = S.all_rows()
    seen = set()
    uniq = []
    for name, ri, row in rows:
        sig = tuple(int(v) >> 6 for v in row)
        if sig in seen:
            continue
        seen.add(sig)
        uniq.append((name, ri, row))
    print(f"{len(uniq)} unique rows")
    t0 = time.time()
    tried = 0
    for k in range(k0 + 1, max(0, k0 - back), -1):
        if k >= len(dec0.r.trace):
            continue
        if dec0.r.trace[k][0] == "B":
            continue  # literals have no cdf
        best = None
        for name, ri, row in uniq:
            bad, _ = prefix_score(seq, hdr, tile, refp, n_records, {k: row})
            tried += 1
            if bad is not None and (best is None or bad < best[0]):
                best = (bad, name, ri)
                if bad == 0:
                    break
        print(f"read {k}: entry={dec0.r.trace[k]} best={best} "
              f"({tried} decodes, {time.time()-t0:.0f}s)", flush=True)
        if best and best[0] == 0:
            # verify with full recon
            dec, planes, _ = S.decode(seq, hdr, tile,
                                      {k: best_row(uniq, best)})
            print("full score with winner:", S.score(planes, refp))
            print("WINNER at read", k, best)
            return


def best_row(uniq, best):
    for name, ri, row in uniq:
        if name == best[1] and ri == best[2]:
            return {0: row}[0]
    return None


if __name__ == "__main__":
    main()
