"""Round-trip localization: decode a tile with the Python spec model,
re-encode the decoded symbols with the exact libaom entropy encoder
replica, and report the first byte where the re-encoding differs from
the real tile bytes — that is (within renorm lag) the first symbol
where our decode's context/CDF state diverged from libaom's.

Usage: python tools/roundtrip.py <ivf> <frame_idx>
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import aomffi  # noqa: E402
from av1dec_tpu.bindings import NativeParser  # noqa: E402
import pymodel_inter  # noqa: E402
import pymodel  # noqa: E402
import trace_diff_inter  # noqa: E402
from msac_encode import MsacEncoder  # noqa: E402


def roundtrip(seq, hdr, tile, verbose=True):
    if hdr["frame_is_intra"]:
        dec = pymodel.MiniDecoder(seq, hdr, tile)
    else:
        dec = pymodel_inter.InterDecoder(seq, hdr, tile)
    dec.r.record = []
    err = None
    try:
        dec.decode_tile()
    except Exception as e:  # noqa: BLE001
        err = e
    enc = MsacEncoder()
    # map record index -> output byte offset before encoding it
    offsets = []
    for rec in dec.r.record:
        offsets.append(len(enc.precarry))
        if rec[0] == "S":
            enc.encode_symbol(rec[1] + [0], rec[3], rec[2])
        else:
            enc.encode_bool_prob(rec[1], rec[2])
    out = enc.done()
    n = min(len(out), len(tile))
    first_diff = None
    for i in range(n):
        if out[i] != tile[i]:
            first_diff = i
            break
    tagd = dict(getattr(dec, "read_tags", []))

    def tag_before(ri):
        best = None
        for k, t in getattr(dec, "read_tags", []):
            if k <= ri:
                best = (k, t)
            else:
                break
        return best

    if verbose:
        print(f"decoded {len(dec.r.record)} symbols"
              + (f" (decode error: {err})" if err else ""))
        print(f"re-encoded {len(out)} bytes vs tile {len(tile)} bytes")
    if first_diff is None:
        if verbose:
            print(f"round-trip CLEAN over {n} bytes "
                  f"(len diff {len(out) - len(tile)})")
        return None, dec
    # first record whose output offset reaches first_diff
    lo = 0
    for ri, off in enumerate(offsets):
        if off >= first_diff:
            lo = ri
            break
    else:
        ri = len(offsets) - 1
    if verbose:
        print(f"FIRST BYTE DIFF at {first_diff}/{len(tile)} "
              f"(~record {ri} of {len(offsets)})")
        print(f"  nearest tag at/before: {tag_before(ri)}")
        for k, t in getattr(dec, "read_tags", []):
            if ri - 2 <= k <= ri + 30:
                print(f"   tag {k}: {t}")
    return ri, dec


def main():
    path, frame_idx = sys.argv[1], int(sys.argv[2])
    p = NativeParser()
    p.set_decode_tiles(False)
    hdrs = []
    for _, tu in aomffi.read_ivf(path):
        hdrs.extend(p.parse_tu(tu))
    hdr = hdrs[frame_idx]
    tile = trace_diff_inter.tile_bytes_of_frame(path, frame_idx,
                                                hdr["tile_sizes"][0])
    roundtrip(p.seq, hdr, tile)


if __name__ == "__main__":
    main()
