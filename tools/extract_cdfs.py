"""Forensic extraction of the AV1 default CDF tables [SPEC §9].

The AV1 spec's default CDF tables (~hundreds of context sets) are normative
constants.  No AV1 source exists on this machine and egress is blocked, but
four independent binaries carry these exact constants (libaom, libdav1d,
libgav1, libSvtAv1Enc).  This tool recovers them from libaom's .rodata:

Storage format (libaom == spec convention): an N-symbol CDF is stored as
CDF_SIZE(max_syms) = max_syms+1 uint16 slots: (N-1) strictly-decreasing
"inverse cumulative" values (32768 - cum), then a 0 terminal, then a 0
adaptation counter, then zero padding up to the declared stride.

Identification: each table has a distinctive *fingerprint* — the sequence
of per-row symbol counts and the declared stride — derived from the AV1
syntax itself (context counts are normative).  We search .rodata for
stride-aware matches of each fingerprint.  Cross-validation: values of
every extracted cdf row are checked for CDF plausibility, and the whole
extraction is validated end-to-end by bit-exact decode tests vs the
oracle decoder.

Output: av1dec_tpu/native/src/cdf_tables.inc (generated C++).
"""

from __future__ import annotations

import subprocess
import sys
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

LIB = "/usr/lib/x86_64-linux-gnu/libaom.so.3.6.0"
OUT = "av1dec_tpu/native/src/cdf_tables.inc"


def load_rodata(path: str) -> np.ndarray:
    out = subprocess.check_output(["readelf", "-S", "--wide", path]).decode()
    for line in out.splitlines():
        if " .rodata " in line:
            parts = line.split()
            i = parts.index(".rodata")
            off = int(parts[i + 3], 16)
            size = int(parts[i + 4], 16)
            break
    else:
        raise RuntimeError(".rodata not found")
    data = open(path, "rb").read()[off: off + size]
    return np.frombuffer(data[: len(data) // 2 * 2], dtype="<u2").astype(np.int64)


@dataclass
class Table:
    name: str          # C++ identifier suffix
    rows: List[int]    # nsyms per row (0 = all-zero/unused row)
    stride: int        # declared CDF_SIZE slots per row

    @property
    def total(self) -> int:
        return len(self.rows) * self.stride


def uniform(name: str, n_rows: int, nsyms: int, stride: Optional[int] = None):
    return Table(name, [nsyms] * n_rows, stride or (nsyms + 1))


class Scanner:
    """Vectorized fingerprint matcher over the u16 array.

    Precomputes, per offset: runlen[i] = length of the strictly-decreasing
    positive (<32768) run starting at i, and zrun[i] = length of the zero
    run starting at i.  A CDF row of nsyms at offset with stride s matches
    iff runlen >= nsyms-1 and zrun[off+nsyms-1] >= s-(nsyms-1).
    """

    def __init__(self, u: np.ndarray) -> None:
        self.u = u
        n = len(u)
        good = (u > 0) & (u < 32768)
        runlen = np.zeros(n + 1, dtype=np.int32)
        zrun = np.zeros(n + 1, dtype=np.int32)
        gl = good.tolist()
        ul = u.tolist()
        for i in range(n - 1, -1, -1):
            if gl[i]:
                if i + 1 < n and gl[i + 1] and ul[i + 1] < ul[i]:
                    runlen[i] = runlen[i + 1] + 1
                else:
                    runlen[i] = 1
            if ul[i] == 0:
                zrun[i] = zrun[i + 1] + 1
        self.runlen = runlen
        self.zrun = zrun

    def row_ok(self, nsyms: int, stride: int) -> np.ndarray:
        """Boolean array: does a row of nsyms/stride match at offset i?"""
        n = len(self.u)
        L = max(nsyms - 1, 0)
        out = np.zeros(n, dtype=bool)
        if L == 0:
            out[: n] = self.zrun[:n] >= stride
            return out
        valid = np.arange(n) + stride <= n
        rl = self.runlen[:n] >= L
        zr = np.zeros(n, dtype=bool)
        zr[: n - L] = self.zrun[L: n] >= (stride - L)
        return rl & zr & valid

    def find(self, t: Table, start: int = 0,
             end: Optional[int] = None) -> List[int]:
        n = len(self.u)
        end = n - t.total if end is None else min(end, n - t.total)
        if end <= start:
            return []
        cache = {}
        ok = np.ones(end - start, dtype=bool)
        for i, nsyms in enumerate(t.rows):
            key = nsyms
            if key not in cache:
                cache[key] = self.row_ok(nsyms, t.stride)
            ro = cache[key]
            seg = ro[start + i * t.stride: start + i * t.stride + (end - start)]
            if len(seg) < end - start:
                seg = np.pad(seg, (0, end - start - len(seg)))
            ok &= seg
            if not ok.any():
                return []
        return (np.nonzero(ok)[0] + start).tolist()


# ---------------------------------------------------------------------------
# Catalog: shapes forced by the AV1 syntax [SPEC §9 / §5.11]
# ---------------------------------------------------------------------------

# entropymode-side tables
PARTITION = Table("PartitionCdf", [4] * 4 + [10] * 12 + [8] * 4, 11)
KF_Y_MODE = uniform("KfYModeCdf", 25, 13, 14)
ANGLE_DELTA = uniform("AngleDeltaCdf", 8, 7)
IF_Y_MODE = uniform("IfYModeCdf", 4, 13, 14)
UV_MODE = Table("UvModeCdf", [13] * 13 + [14] * 13, 15)
INTRA_EXT_TX = Table("IntraExtTxCdf", [0] * 52 + [7] * 52 + [5] * 52, 17)
INTER_EXT_TX = Table("InterExtTxCdf", [0] * 4 + [16] * 4 + [12] * 4 + [2] * 4,
                     17)
CFL_SIGN = uniform("CflSignCdf", 1, 8)
CFL_ALPHA = uniform("CflAlphaCdf", 6, 16)
SWITCHABLE_INTERP = uniform("SwitchableInterpCdf", 16, 3)
NEWMV = uniform("NewMvCdf", 6, 2)
ZEROMV = uniform("ZeroMvCdf", 2, 2)
REFMV = uniform("RefMvCdf", 6, 2)
DRL = uniform("DrlCdf", 3, 2)
INTER_COMPOUND_MODE = uniform("InterCompoundModeCdf", 8, 8)
INTERINTRA = uniform("InterIntraCdf", 4, 2)
INTERINTRA_MODE = uniform("InterIntraModeCdf", 4, 4)
WEDGE_INTERINTRA = uniform("WedgeInterIntraCdf", 22, 2)
COMPOUND_TYPE = uniform("CompoundTypeCdf", 22, 2)
WEDGE_IDX = uniform("WedgeIdxCdf", 22, 16)
MOTION_MODE = uniform("MotionModeCdf", 22, 3)
OBMC = uniform("ObmcCdf", 22, 2)
PALETTE_Y_SIZE = uniform("PaletteYSizeCdf", 7, 7)
PALETTE_UV_SIZE = uniform("PaletteUvSizeCdf", 7, 7)
PALETTE_Y_COLOR = Table("PaletteYColorIdxCdf",
                        sum(([n] * 5 for n in range(2, 9)), []), 9)
PALETTE_UV_COLOR = Table("PaletteUvColorIdxCdf",
                         sum(([n] * 5 for n in range(2, 9)), []), 9)
PALETTE_Y_MODE = uniform("PaletteYModeCdf", 21, 2)
PALETTE_UV_MODE = uniform("PaletteUvModeCdf", 2, 2)
COMP_INTER = uniform("CompInterCdf", 5, 2)
SINGLE_REF = uniform("SingleRefCdf", 18, 2)
COMP_REF_TYPE = uniform("CompRefTypeCdf", 5, 2)
UNI_COMP_REF = uniform("UniCompRefCdf", 9, 2)
COMP_REF = uniform("CompRefCdf", 9, 2)
COMP_BWDREF = uniform("CompBwdRefCdf", 6, 2)
TXFM_PARTITION = uniform("TxfmPartitionCdf", 21, 2)
SKIP = uniform("SkipCdf", 3, 2)
SKIP_MODE = uniform("SkipModeCdf", 3, 2)
SEG_TREE = uniform("SegTreeCdf", 1, 8)
SEGMENT_PRED = uniform("SegmentPredCdf", 3, 2)
SPATIAL_PRED_SEG = uniform("SpatialPredSegCdf", 3, 8)
TX_SIZE = Table("TxSizeCdf", [2, 2, 2] + [3] * 9, 4)
DELTA_Q = uniform("DeltaQCdf", 1, 4)
DELTA_LF_MULTI = uniform("DeltaLfMultiCdf", 4, 4)
DELTA_LF = uniform("DeltaLfCdf", 1, 4)
INTRABC = uniform("IntraBcCdf", 1, 2)
FILTER_INTRA_MODE = uniform("FilterIntraModeCdf", 1, 5)
FILTER_INTRA = uniform("FilterIntraCdf", 22, 2)
SWITCHABLE_RESTORE = uniform("SwitchableRestoreCdf", 1, 3)
WIENER_RESTORE = uniform("WienerRestoreCdf", 1, 2)
SGRPROJ_RESTORE = uniform("SgrprojRestoreCdf", 1, 2)
INTRA_INTER = uniform("IntraInterCdf", 4, 2)

# MV context (nmv_context struct layout: joints then 2 components)
MV_JOINTS = uniform("MvJointsCdf", 1, 4)
MV_COMP = Table("MvCompCdf",  # one nmv_component
                [11] + [4] * 2 + [4] + [2] + [2] + [2] + [2] + [2] * 10,
                0)  # per-field strides differ; handled specially below

# coefficient tables (token_cdfs.h); leading dim = 4 quantizer contexts
TXB_SKIP = uniform("TxbSkipCdf", 4 * 5 * 13, 2)
EOB_EXTRA = uniform("EobExtraCdf", 4 * 5 * 2 * 9, 2)
DC_SIGN = uniform("DcSignCdf", 4 * 2 * 3, 2)
COEFF_BASE_EOB = uniform("CoeffBaseEobCdf", 4 * 5 * 2 * 4, 3)
COEFF_BASE = uniform("CoeffBaseCdf", 4 * 5 * 2 * 42, 4)
COEFF_BR = uniform("CoeffBrCdf", 4 * 5 * 2 * 21, 4)
EOB_PT_16 = uniform("EobPt16Cdf", 4 * 2 * 2, 5)
EOB_PT_32 = uniform("EobPt32Cdf", 4 * 2 * 2, 6)
EOB_PT_64 = uniform("EobPt64Cdf", 4 * 2 * 2, 7)
EOB_PT_128 = uniform("EobPt128Cdf", 4 * 2 * 2, 8)
EOB_PT_256 = uniform("EobPt256Cdf", 4 * 2 * 2, 9)
EOB_PT_512 = uniform("EobPt512Cdf", 4 * 2 * 2, 10)
EOB_PT_1024 = uniform("EobPt1024Cdf", 4 * 2 * 2, 11)

ALL_SIMPLE = [
    PARTITION, KF_Y_MODE, ANGLE_DELTA, IF_Y_MODE, UV_MODE, INTRA_EXT_TX,
    INTER_EXT_TX, CFL_SIGN, CFL_ALPHA, SWITCHABLE_INTERP, NEWMV, ZEROMV,
    REFMV, DRL, INTER_COMPOUND_MODE, INTERINTRA, INTERINTRA_MODE,
    WEDGE_INTERINTRA, COMPOUND_TYPE, WEDGE_IDX, MOTION_MODE, OBMC,
    PALETTE_Y_SIZE, PALETTE_UV_SIZE, PALETTE_Y_COLOR, PALETTE_UV_COLOR,
    PALETTE_Y_MODE, PALETTE_UV_MODE, COMP_INTER, SINGLE_REF, COMP_REF_TYPE,
    UNI_COMP_REF, COMP_REF, COMP_BWDREF, TXFM_PARTITION, SKIP, SKIP_MODE,
    SEG_TREE, SEGMENT_PRED, SPATIAL_PRED_SEG, TX_SIZE, DELTA_Q,
    DELTA_LF_MULTI, DELTA_LF, INTRABC, FILTER_INTRA_MODE, FILTER_INTRA,
    SWITCHABLE_RESTORE, WIENER_RESTORE, SGRPROJ_RESTORE, INTRA_INTER,
    MV_JOINTS,  # MV_COMP handled specially
    TXB_SKIP, EOB_EXTRA, DC_SIGN, COEFF_BASE_EOB, COEFF_BASE, COEFF_BR,
    EOB_PT_16, EOB_PT_32, EOB_PT_64, EOB_PT_128, EOB_PT_256, EOB_PT_512,
    EOB_PT_1024,
]


def main() -> int:
    u = load_rodata(LIB)
    print(f"rodata: {len(u)} u16 words")
    sc = Scanner(u)
    results = {}
    ambiguous = {}
    missing = []
    for t in ALL_SIMPLE:
        hits = sc.find(t)
        if len(hits) == 1:
            results[t.name] = hits[0]
            print(f"  {t.name:28s} @ {hits[0]} (unique)")
        elif len(hits) == 0:
            missing.append(t.name)
            print(f"  {t.name:28s} NOT FOUND")
        else:
            ambiguous[t.name] = hits
            print(f"  {t.name:28s} {len(hits)} candidates: {hits[:8]}")
    print(f"\nunique: {len(results)}, ambiguous: {len(ambiguous)}, "
          f"missing: {len(missing)} {missing}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
