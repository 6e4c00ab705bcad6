"""Differential symbol-trace debugging: C++ decoder vs Python spec model.

Usage: python tools/trace_diff.py <file.ivf>
Extracts the first frame's tile bytes, decodes with both implementations,
and reports the first diverging symbol.
"""

import os
import subprocess
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import aomffi  # noqa: E402
from av1dec_tpu.bindings import NativeParser  # noqa: E402
import pymodel  # noqa: E402


def obu_walk(tu):
    """Yield (obu_type, payload_bytes)."""
    pos = 0
    while pos < len(tu):
        b0 = tu[pos]
        typ = (b0 >> 3) & 0xF
        ext = (b0 >> 2) & 1
        has_size = (b0 >> 1) & 1
        pos += 1 + ext
        size = len(tu) - pos
        if has_size:
            size = 0
            shift = 0
            while True:
                byte = tu[pos]
                pos += 1
                size |= (byte & 0x7F) << shift
                shift += 7
                if not (byte & 0x80):
                    break
        yield typ, tu[pos: pos + size]
        pos += size


def tile_bytes_of_first_frame(path):
    for _, tu in aomffi.read_ivf(path):
        for typ, payload in obu_walk(tu):
            if typ == 6:  # OBU_FRAME: header | tile group
                # reparse header size via the native parser is complex;
                # single-tile: tile data starts after the frame header.
                # We get the tile size from the native parser json
                # (tile_sizes) and take the LAST n bytes.
                return payload
        break
    return None


def main(path):
    # headers via native parser
    p = NativeParser()
    p.set_decode_tiles(False)
    hdrs = []
    for _, tu in aomffi.read_ivf(path):
        hdrs.extend(p.parse_tu(tu))
        break
    hdr = hdrs[0]
    seq = p.seq
    payload = tile_bytes_of_first_frame(path)
    tile_size = hdr["tile_sizes"][0]
    tile = payload[len(payload) - tile_size:]
    assert hdr["tiles"]["cols"] == 1 and hdr["tiles"]["rows"] == 1

    # python model trace
    dec = pymodel.MiniDecoder(seq, hdr, tile)
    py_err = None
    try:
        dec.decode_tile()
    except Exception as e:  # trace up to failure is still useful
        py_err = e
    py_trace = dec.r.trace

    # C++ trace
    env = dict(os.environ, AV1N_TRACE="1")
    code = (
        "import sys; sys.path.insert(0,'.'); sys.path.insert(0,'tools')\n"
        "import aomffi\n"
        "from av1dec_tpu.bindings import NativeParser\n"
        "p = NativeParser()\n"
        f"data = next(iter(aomffi.read_ivf({path!r})))[1]\n"
        "p.parse_tu(data, with_plans=True)\n"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True)
    c_trace = []
    for line in out.stderr.splitlines():
        if line.startswith("T "):
            parts = line.split()
            if parts[2] == "B":
                c_trace.append(("B", int(parts[3]), int(parts[4]),
                                int(parts[5])))
            else:
                c_trace.append((int(parts[2]), int(parts[3]), int(parts[4]),
                                int(parts[5])))

    print(f"py symbols: {len(py_trace)}  c++ symbols: {len(c_trace)}"
          + (f"  (py error: {py_err})" if py_err else ""))
    n = min(len(py_trace), len(c_trace))
    for i in range(n):
        if py_trace[i] != c_trace[i]:
            print(f"FIRST DIVERGENCE at symbol {i}:")
            for j in range(max(0, i - 6), min(n, i + 6)):
                mark = " <<<" if j == i else ""
                print(f"  [{j}] py={py_trace[j]} c={c_trace[j]}{mark}")
            return 1
    print("traces identical over common prefix")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
