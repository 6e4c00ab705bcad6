"""Generate av1dec_tpu/ops/inter_tables.py — normative inter-prediction
constant tables recovered from the system libaom binary (the values are
spec-mandated [SPEC §7.11.3]; any conformant decoder contains identical
tables — same provenance approach as gen_pixel_tables.py):

- Subpel_Filters[6][16][8]  [SPEC §7.11.3.4]: REGULAR/SMOOTH/SHARP 8-tap,
  BILINEAR, and the 4-tap REGULAR/SMOOTH variants used for w<=4
- Warped_Filters[193][8]    [SPEC §7.11.3.5]
- Obmc masks (2..32)        [SPEC §7.11.3.10]
- II_Weights_1d[128] (interintra smooth masks) [SPEC §7.11.3.13]
- Wedge master arrays       [SPEC §7.11.3.11]
"""

import subprocess
import sys

import numpy as np

AOM = "/usr/lib/x86_64-linux-gnu/libaom.so.3.6.0"
OUT = "av1dec_tpu/ops/inter_tables.py"


def rodata_bytes(path):
    out = subprocess.check_output(["readelf", "-S", "--wide", path]).decode()
    for line in out.splitlines():
        if ".rodata" in line:
            parts = line.split()
            i = parts.index(".rodata")
            off = int(parts[i + 3], 16)
            size = int(parts[i + 4], 16)
    return open(path, "rb").read()[off: off + size]


def find_i16_blocks(i16, nrows, anchor_row=None):
    """All offsets (in int16 units) of [nrows][8] blocks whose rows sum to
    128 and (optionally) whose first row matches anchor_row."""
    n = len(i16)
    sums = i16.reshape(-1)  # scan both even and odd 8-alignments
    hits = []
    row_ok = np.zeros(n // 8, bool)
    for align in range(8):
        rows = i16[align: align + (n - align) // 8 * 8].reshape(-1, 8)
        rs = rows.sum(axis=1)
        for start in np.nonzero(rs == 128)[0]:
            off = align + start * 8
            if anchor_row is not None and not np.array_equal(
                    i16[off: off + 8], anchor_row):
                continue
            blk = i16[off: off + nrows * 8]
            if len(blk) < nrows * 8:
                continue
            if np.all(blk.reshape(nrows, 8).sum(axis=1) == 128):
                hits.append(off)
    del sums, row_ok
    return sorted(set(hits))


def main():
    b = rodata_bytes(AOM)
    i16 = np.frombuffer(b[: len(b) // 2 * 2], dtype="<i2").astype(np.int64)
    u8 = np.frombuffer(b, dtype=np.uint8)

    ident = np.array([0, 0, 0, 128, 0, 0, 0, 0], np.int64)
    # classify banks by their (documented) phase-1 rows
    row1_of = {
        "regular8": [0, 2, -6, 126, 8, -2, 0, 0],
        "smooth8": [0, 2, 28, 62, 34, 2, 0, 0],
        "sharp8": [-2, 2, -6, 126, 8, -2, 2, 0],
        "bilinear": [0, 0, 0, 120, 8, 0, 0, 0],
        "regular4": [0, 0, -4, 126, 8, -2, 0, 0],
        "smooth4": [0, 0, 30, 62, 34, 2, 0, 0],
    }
    blocks = {}
    for off in find_i16_blocks(i16, 16, ident):
        blk = i16[off: off + 128].reshape(16, 8)
        for key, row1 in row1_of.items():
            if key not in blocks and blk[1].tolist() == row1:
                blocks[key] = blk.copy()
    need = ["regular8", "smooth8", "sharp8", "bilinear", "regular4",
            "smooth4"]
    missing = [k for k in need if k not in blocks]
    assert not missing, f"subpel banks not found: {missing} " \
                        f"(have {list(blocks)})"
    # sanity: regular8 phase 1 is the documented row
    assert blocks["regular8"][1].tolist() == [0, 2, -6, 126, 8, -2, 0, 0], \
        blocks["regular8"][1]
    subpel = np.stack([blocks[k] for k in need])

    # warp filter: 193 rows of 8 int16 summing to 128, first row
    # [0, 0, 127, 1, 0, 0, 0, 0] (offset -64 in 1/64-pel steps)
    warp = None
    first = np.array([0, 0, 127, 1, 0, 0, 0, 0], np.int64)
    for off in find_i16_blocks(i16, 193, first):
        warp = i16[off: off + 193 * 8].reshape(193, 8).copy()
        break
    assert warp is not None, "warped filter table not found"
    assert warp[192].tolist()[-3] == 127 or warp[192].sum() == 128

    # obmc masks [SPEC §7.11.3.10] — locate by the documented 8-length
    # sequence, then sanity-check neighbors
    o8 = np.array([36, 42, 48, 53, 57, 61, 64, 64], np.uint8)
    pos = -1
    for cand in range(len(u8) - 8):
        if np.array_equal(u8[cand: cand + 8], o8):
            pos = cand
            break
    assert pos > 0, "obmc_mask_8 not found"
    # layout in libaom: masks stored individually; emit the known values
    obmc = {
        2: [45, 64],
        4: [39, 50, 59, 64],
        8: o8.tolist(),
        16: [34, 37, 40, 43, 46, 49, 52, 54, 56, 58, 60, 61, 64, 64, 64,
             64],
        32: [33, 35, 36, 38, 40, 41, 43, 44, 45, 47, 48, 50, 51, 52, 53,
             55, 56, 57, 58, 59, 60, 60, 61, 62, 64, 64, 64, 64, 64, 64,
             64, 64],
    }
    # verify each claimed mask exists in the binary
    for k, v in obmc.items():
        vv = bytes(v)
        assert b.find(vv) >= 0, f"obmc mask {k} not in rodata: {v}"

    # interintra smooth weights ii_weights1d[MAX_SB_SIZE]
    anchor = bytes([60, 58, 56, 54, 52, 50, 48, 47])
    p = b.find(anchor)
    assert p > 0, "ii_weights1d not found"
    iiw = np.frombuffer(b[p: p + 128], dtype=np.uint8).copy()

    # wedge master arrays [SPEC §7.11.3.11]: 64-entry 1-D profiles =
    # 28 zeros + 8-value transition + 28 sixty-fours (layout verified by
    # dumping rodata: odd master directly precedes even)
    anchor2 = bytes([2, 6, 18, 37, 53, 60, 63, 64, 64])
    p2 = b.find(anchor2)
    assert p2 > 0, "wedge master oblique not found"
    start = p2 - 29  # "2" is entry 29
    even = np.frombuffer(b[start: start + 64], dtype=np.uint8).copy()
    assert even[28] == 1 and even[27] == 0 and even[-1] == 64, even
    anchor3 = bytes([4, 11, 27, 46, 58, 62, 63, 64, 64])
    p3 = b.find(anchor3)
    assert p3 > 0, "wedge master oblique odd not found"
    start3 = p3 - 29
    odd = np.frombuffer(b[start3: start3 + 64], dtype=np.uint8).copy()
    assert odd[28] == 1 and odd[27] == 0 and odd[-1] == 64, odd
    # vertical master: not in rodata (libaom synthesizes its masks);
    # spec profile: 30 zeros, 7-value transition, then 64s
    vert = np.array([0] * 30 + [2, 6, 18, 37, 53, 60, 63] + [64] * 27,
                    np.uint8)

    with open(OUT, "w") as f:
        f.write('"""GENERATED by tools/gen_inter_tables.py — DO NOT EDIT.\n')
        f.write("Normative inter-prediction tables; see generator "
                "docstring.\n")
        f.write('"""\n\nimport numpy as np\n\n')

        def emit(name, arr, dtype="int32"):
            a = np.asarray(arr).astype(dtype)
            f.write(f"{name} = np.array({a.tolist()!r}, "
                    f"dtype=np.{dtype})\n\n")

        emit("SUBPEL_FILTERS", subpel)     # [6][16][8]
        emit("WARPED_FILTER", warp)        # [193][8]
        for k, v in obmc.items():
            emit(f"OBMC_MASK_{k}", v)
        emit("II_WEIGHTS_1D", iiw)
        emit("WEDGE_MASTER_OBLIQUE_EVEN", even)
        emit("WEDGE_MASTER_OBLIQUE_ODD", odd)
        emit("WEDGE_MASTER_VERTICAL", vert)
    print(f"wrote {OUT}")
    print("smooth8[1] =", blocks["smooth8"][1].tolist())
    print("sharp8[1]  =", blocks["sharp8"][1].tolist())
    print("regular4[1]=", blocks["regular4"][1].tolist())
    print("warp[90]   =", warp[90].tolist())
    print("even master:", even.tolist())
    print("vert master:", vert.tolist())
    return 0


if __name__ == "__main__":
    sys.exit(main())
