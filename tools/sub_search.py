"""CDF-row substitution search: find which read diverges from the real
decoder by substituting alternate rows and checking reconstruction
against the oracle.  Usage: python tools/sub_search.py <ivf> [max_reads]"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np  # noqa: E402
import aomffi  # noqa: E402
from av1dec_tpu.bindings import NativeParser  # noqa: E402
from av1dec_tpu.pipeline.recon import FrameRecon  # noqa: E402
import pymodel  # noqa: E402
import trace_diff  # noqa: E402


def decode_and_score(path, seq, hdr, tile, oracle, substitute=None):
    dec = pymodel.MiniDecoder(seq, hdr, tile)
    if substitute:
        dec.r.substitute = substitute
    try:
        dec.decode_tile()
    except Exception:
        return None, None
    try:
        fr = FrameRecon(seq, hdr, dec)
        planes = fr.run()
    except Exception:
        return None, None
    refp = [x for x in (oracle.y, oracle.u, oracle.v) if x is not None]
    bad = sum(int((m[: r.shape[0], : r.shape[1]] !=
                   r.astype(np.int64)).sum())
              for m, r in zip(planes, refp))
    return bad, dec


def main():
    path = sys.argv[1]
    max_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 60
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

    base_bad, base_dec = decode_and_score(path, seq, hdr, tile, oracle)
    print(f"baseline mismatches: {base_bad}; reads: {len(base_dec.r.trace)}")

    # substitution candidates: every row of every table (flattened rows)
    T = pymodel.T
    rows = []
    for name, arr in T.items():
        a = np.asarray(arr)
        flat = a.reshape(-1, a.shape[-1])
        for ri in range(flat.shape[0]):
            row = flat[ri]
            if row.max() > 0 and row.max() < 32768:
                rows.append((name, ri, row.copy()))
    print(f"{len(rows)} candidate rows")

    results = []
    for k in range(min(max_reads, len(base_dec.r.trace))):
        best = None
        for name, ri, row in rows:
            bad, _ = decode_and_score(path, seq, hdr, tile, oracle,
                                      substitute={k: row})
            if bad is not None and (best is None or bad < best[0]):
                best = (bad, name, ri)
                if bad == 0:
                    break
        if best and best[0] < base_bad * 0.7:
            print(f"read {k}: best substitution {best[1]}[{best[2]}] -> "
                  f"{best[0]} mismatches")
            results.append((k, best))
            if best[0] == 0:
                print("EXACT!")
                break
    if not results:
        print("no substitution improved significantly")


if __name__ == "__main__":
    main()
