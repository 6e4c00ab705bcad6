"""Context-substitution search for inter streams: find the symbol where
our (shared C++/Python) context selection diverges from libaom.

For each tagged structural read before the first mismatching block, try
decoding with each alternative context row of the same syntax element;
score by how far decode+recon stays bit-exact vs the oracle.  A
substitution that pushes the first-error point far forward marks the
wrong-context symbol.

Usage: python tools/sub_search_inter.py <ivf> <frame_idx> [window]
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np  # noqa: E402
import aomffi  # noqa: E402
from av1dec_tpu.bindings import NativeParser  # noqa: E402
from av1dec_tpu.pipeline.recon import FrameRecon  # noqa: E402
from av1dec_tpu.ops.spec.itx import TX_DIMS  # noqa: E402
import pymodel_inter  # noqa: E402
import trace_diff_inter  # noqa: E402


def setup(path, frame_idx):
    p = NativeParser()
    p.set_decode_tiles(False)
    hdrs = []
    for _, tu in aomffi.read_ivf(path):
        hdrs.extend(p.parse_tu(tu))
    hdr = hdrs[frame_idx]
    seq = p.seq
    tile = trace_diff_inter.tile_bytes_of_frame(path, frame_idx,
                                                hdr["tile_sizes"][0])
    oracle = aomffi.oracle_decode_ivf(path)
    # oracle refs via refresh replay
    p2 = NativeParser()
    slots = {}
    snapshots = []
    fj = 0
    for _, tu in aomffi.read_ivf(path):
        for h2 in p2.parse_tu(tu):
            snapshots.append(dict(slots))
            for i in range(8):
                if (h2["refresh_frame_flags"] >> i) & 1:
                    slots[i] = fj
            fj += 1
    refs = {}
    for rf in range(1, 8):
        idx = hdr["ref_frame_idx"][rf - 1]
        src = oracle[snapshots[frame_idx][idx]]
        pl = [x.astype(np.int64) for x in (src.y, src.u, src.v)
              if x is not None]
        refs[rf] = {"planes": pl, "width": pl[0].shape[1],
                    "height": pl[0].shape[0]}
    orc = oracle[frame_idx]
    refp = [x.astype(np.int64) for x in (orc.y, orc.u, orc.v)
            if x is not None]
    return seq, hdr, tile, refs, refp


def decode_and_score(seq, hdr, tile, refs, refp, sub=None, thresh=None):
    if thresh is None:
        import os
        thresh = int(os.environ.get('SUBSEARCH_THRESH', '40'))
    dec = pymodel_inter.InterDecoder(seq, hdr, tile)
    if sub:
        dec.r.substitute = sub
    try:
        dec.decode_tile()
    except Exception:  # noqa: BLE001
        return dec, -1, 10**9
    try:
        planes = FrameRecon(seq, hdr, dec, refs=refs).run()
    except Exception:  # noqa: BLE001
        return dec, -1, 10**9
    total = 0
    first_bad = 10**9
    tx = dec.tx
    for ti in range(len(tx)):
        plane, x4, y4, tsz, tt, eob, off, mi, avail = [int(v)
                                                       for v in tx[ti]]
        w, h = (4, 4) if tsz == 19 else TX_DIMS[tsz]
        x, y = x4 * 4, y4 * 4
        m = planes[plane][y: y + h, x: x + w]
        rr = refp[plane][y: y + h, x: x + w]
        if m.shape != rr.shape or not m.size:
            continue
        err = int(np.abs(m - rr).max())
        if err > thresh and ti < first_bad:
            first_bad = ti
        if err > thresh:
            total += err
    return dec, first_bad, total


def main():
    path, frame_idx = sys.argv[1], int(sys.argv[2])
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    seq, hdr, tile, refs, refp = setup(path, frame_idx)
    dec, first_bad, total = decode_and_score(seq, hdr, tile, refs, refp)
    print(f"baseline: first bad tx record {first_bad} (of {len(dec.tx)}),"
          f" badness {total}")
    if first_bad >= 10**8:
        print("frame is (near) exact — nothing to search")
        return
    # trace index just before the first bad tx record: use read_tags
    # ordering — find the tag of the mi of that record
    # simple approach: search the last `window` tagged reads before the
    # read cursor that produced the bad record.  We approximate with the
    # tag whose index is largest but <= bad-ti-correlated; instead just
    # scan ALL tags in [end-window, end] where end = index of first tag
    # belonging to a block at/after the bad record's mi.
    tx = dec.tx
    bad_mi = int(tx[first_bad][7])
    bad_tag_idx = None
    for k, t in dec.read_tags:
        if t.endswith(f"@{bad_mi // dec.mi_cols},{bad_mi % dec.mi_cols}"):
            bad_tag_idx = k
            break
    if bad_tag_idx is None:
        bad_tag_idx = len(dec.r.trace)
    lo = max(0, bad_tag_idx - window)
    hi = min(len(dec.r.trace), bad_tag_idx + 200)
    print(f"searching tagged reads in trace window [{lo}, {hi})")
    cdf = pymodel_inter.InterDecoder(seq, hdr, tile).cdf  # fresh rows
    KIND_ROWS = {
        "skip": [cdf["Skip"][i] for i in range(3)],
        "is_inter": [cdf["IntraInter"][i] for i in range(4)],
        "newmv": [cdf["NewMv"][i] for i in range(6)],
        "txsize": [cdf["TxSize"][c][x] for c in range(4)
                   for x in range(3)],
        "txfm_split": [cdf["TxfmPartition"][i] for i in range(21)],
        "sref": [cdf["SingleRef"][c][p] for c in range(3)
                 for p in range(6)],
        "interp": [cdf["SwitchableInterp"][i] for i in range(16)],
        "if_ymode": [cdf["IfYMode"][i] for i in range(4)],
        "compmode": [cdf["InterCompoundMode"][i] for i in range(8)],
    }
    results = []
    for k, tag in dec.read_tags:
        if not (lo <= k < hi):
            continue
        kind = tag.split("@")[0]
        if kind == "partition":
            # same-nsyms rows only: ctx = (bsl-1)*4 + l*2 + a
            bsz = int(tag.split(",")[-1])
            from pymodel import MWL
            bsl = MWL[bsz]
            rows = [cdf["Partition"][(bsl - 1) * 4 + i] for i in range(4)]
        elif kind == "txb_skip":
            rows = [cdf["TxbSkip"][c][x] for c in range(4)
                    for x in range(13)]
        else:
            rows = KIND_ROWS.get(kind)
        if rows is None:
            continue
        for ri, row in enumerate(rows):
            _, fb, tot = decode_and_score(seq, hdr, tile, refs, refp,
                                          sub={k: row})
            if fb > first_bad:
                results.append((fb, -tot, k, tag, ri))
                print(f"  read {k} ({tag}) -> row {ri}: first_bad {fb} "
                      f"badness {tot}", flush=True)
    results.sort(reverse=True)
    print("TOP:", results[:10])


if __name__ == "__main__":
    main()
