"""Differential symbol-trace debugging for INTER frames: C++ decoder vs
the independent Python spec model (pymodel_inter).

Usage: python tools/trace_diff_inter.py <file.ivf> <frame_idx>

Requires the target frame to use default CDFs (primary_ref_frame == 7,
e.g. error-resilient streams) so the Python model can decode standalone.
Single tile only.  Prints the first diverging symbol with the model's
syntax tag context.
"""
import os
import subprocess
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import aomffi  # noqa: E402
from av1dec_tpu.bindings import NativeParser  # noqa: E402
import pymodel_inter  # noqa: E402
from trace_diff import obu_walk  # noqa: E402


def tile_bytes_of_frame(path, frame_idx, tile_size):
    fi = 0
    for _, tu in aomffi.read_ivf(path):
        for typ, payload in obu_walk(tu):
            if typ in (6, 4):  # OBU_FRAME | OBU_TILE_GROUP
                if fi == frame_idx:
                    return payload[len(payload) - tile_size:]
                fi += 1
    return None


def cpp_trace(path, frame_idx):
    env = dict(os.environ, AV1N_TRACE="1")
    code = (
        "import sys; sys.path.insert(0,'.'); sys.path.insert(0,'tools')\n"
        "import aomffi\n"
        "from av1dec_tpu.bindings import NativeParser\n"
        "p = NativeParser()\n"
        f"for _, d in aomffi.read_ivf({path!r}):\n"
        "    p.parse_tu(d, with_plans=True)\n"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True)
    # split stderr into per-tile traces on counter reset ("T 0 ")
    tiles = []
    cur = None
    for line in out.stderr.splitlines():
        if not line.startswith("T "):
            continue
        parts = line.split()
        if parts[1] == "0":
            cur = []
            tiles.append(cur)
        if cur is None:
            continue
        if parts[2] == "B":
            cur.append(("B", int(parts[3]), int(parts[4]), int(parts[5])))
        else:
            cur.append((int(parts[2]), int(parts[3]), int(parts[4]),
                        int(parts[5])))
    return tiles[frame_idx] if frame_idx < len(tiles) else []


def main(path, frame_idx):
    p = NativeParser()
    p.set_decode_tiles(False)
    hdrs = []
    for _, tu in aomffi.read_ivf(path):
        hdrs.extend(p.parse_tu(tu))
    hdr = hdrs[frame_idx]
    seq = p.seq
    assert hdr["tiles"]["cols"] == 1 and hdr["tiles"]["rows"] == 1
    if not hdr["frame_is_intra"]:
        assert hdr["primary_ref_frame"] == 7, \
            "need PRIMARY_REF_NONE (default CDFs) for standalone decode"
    tile = tile_bytes_of_frame(path, frame_idx, hdr["tile_sizes"][0])

    dec = pymodel_inter.InterDecoder(seq, hdr, tile)
    py_err = None
    try:
        dec.decode_tile()
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        py_err = e
    py_trace = dec.r.trace
    c_trace = cpp_trace(path, frame_idx)

    print(f"py symbols: {len(py_trace)}  c++ symbols: {len(c_trace)}"
          + (f"  (py error: {py_err})" if py_err else ""))
    n = min(len(py_trace), len(c_trace))
    tags = dict(dec.read_tags)

    def tag_before(i):
        best = None
        for k, t in dec.read_tags:
            if k <= i:
                best = (k, t)
            else:
                break
        return best

    for i in range(n):
        if py_trace[i] != c_trace[i]:
            print(f"FIRST DIVERGENCE at symbol {i} "
                  f"(last tag: {tag_before(i)}):")
            for j in range(max(0, i - 8), min(n, i + 8)):
                mark = " <<<" if j == i else ""
                t = f"  tag={tags[j]}" if j in tags else ""
                print(f"  [{j}] py={py_trace[j]} c={c_trace[j]}{t}{mark}")
            return 1
    print(f"traces identical over common prefix ({n})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2])))
