"""Independent Python spec-model of the AV1 entropy layer (intra subset).

Implements the SPEC §8.2 symbol decoder in the spec's own bit-at-a-time
formulation, plus the §5.11 intra syntax walk with its own context
bookkeeping — an implementation deliberately *parallel* to the C++
decoder.  Used for differential symbol-trace debugging and as the golden
trace generator (SURVEY.md §4 unit tier).

Covers: partitions (incl. boundary gather), intra mode info (kf y mode,
angle, uv/CfL, filter intra), tx size, full coefficient decode.  No
palette / intrabc / inter.
"""

import sys

import numpy as np

sys.path.insert(0, "tools")
from gen_cdf_tables import TABLES, rodata, AOM, SVT, apply_overrides  # noqa: E402

EC_MIN_PROB = 4


def load_tables():
    src = {"aom": rodata(AOM), "svt": rodata(SVT)}
    out = {}
    for name, source, off, dims in TABLES:
        total = int(np.prod(dims))
        out[name] = apply_overrides(
            name, src[source][off: off + total].reshape(dims).astype(
                np.int64).copy())
    return out


T = load_tables()


class Msac:
    """SPEC §8.2 bit-at-a-time symbol decoder."""

    def __init__(self, data, allow_update):
        self.d = data
        self.pos = 0
        self.allow_update = allow_update
        num_bits = min(len(data) * 8, 15)
        buf = self.f(num_bits)
        padded = buf << (15 - num_bits)
        self.val = ((1 << 15) - 1) ^ padded
        self.rng = 1 << 15
        self.trace = []

    def f(self, n):
        x = 0
        for _ in range(n):
            if self.pos < len(self.d) * 8:
                bit = (self.d[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
            else:
                bit = 0
            self.pos += 1
            x = (x << 1) | bit
        return x

    def _renorm(self, rng, val):
        bits = 0
        while rng < (1 << 15):
            rng <<= 1
            bits += 1
        if bits:
            new = self.f(bits)
            val = new ^ (((val + 1) << bits) - 1)
        self.rng = rng
        self.val = val  # up to 16 bits (rng in [2^15, 2^16))

    def read_symbol_noadapt(self, icdf, nsyms):
        # substitution hook: replace the cdf row for read #k (debug)
        sub = getattr(self, "substitute", None)
        if sub is not None and len(self.trace) in sub:
            icdf = sub[len(self.trace)]
        N = nsyms - 1
        cur = self.rng
        sym = -1
        while True:
            sym += 1
            prev = cur
            fv = int(icdf[sym]) if sym < N else 0
            cur = ((self.rng >> 8) * (fv >> 6)) >> 1
            cur += EC_MIN_PROB * (N - sym)
            if self.val >= cur:
                break
        rng = prev - cur
        val = self.val - cur
        self._renorm(rng, val)
        self.trace.append((nsyms, sym, self.rng, int(icdf[0])))
        if getattr(self, "record", None) is not None:
            self.record.append(
                ("S", [int(icdf[k]) for k in range(nsyms - 1)], nsyms, sym))
        return sym

    def read_symbol(self, cdf_row, nsyms):
        sym = self.read_symbol_noadapt(cdf_row, nsyms)
        if self.allow_update:
            update_cdf(cdf_row, sym, nsyms)
        return sym

    def read_bool(self, cdf_row):
        return self.read_symbol(cdf_row, 2)

    def read_bool_prob(self, fv):
        cur = ((self.rng >> 8) * (fv >> 6) >> 1) + EC_MIN_PROB
        if self.val >= cur:
            ret = 0
            rng = self.rng - cur
            val = self.val - cur
        else:
            ret = 1
            rng = cur
            val = self.val
        self._renorm(rng, val)
        self.trace.append(("B", ret, self.rng, fv))
        if getattr(self, "record", None) is not None:
            self.record.append(("B", fv, ret))
        return ret

    def read_literal(self, n):
        x = 0
        for _ in range(n):
            x = (x << 1) | self.read_bool_prob(16384)
        return x

    def read_golomb(self):
        nbits = 0
        while not self.read_bool_prob(16384):
            nbits += 1
            if nbits >= 32:
                break
        x = 1
        for _ in range(nbits):
            x = (x << 1) | self.read_bool_prob(16384)
        return x - 1


def update_cdf(cdf, val, n):
    speed = [0, 0, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2]
    count = int(cdf[n])
    rate = 3 + (count > 15) + (count > 31) + speed[n]
    tmp = 32768
    for i in range(n - 1):
        if i == val:
            tmp = 0
        if tmp < cdf[i]:
            cdf[i] -= (cdf[i] - tmp) >> rate
        else:
            cdf[i] += (tmp - cdf[i]) >> rate
    cdf[n] += count < 32


# geometry tables (mirror native/src/tables.cc)
BW4 = [1, 1, 2, 2, 2, 4, 4, 4, 8, 8, 8, 16, 16, 16, 32, 32, 1, 4, 2, 8, 4, 16]
BH4 = [1, 2, 1, 2, 4, 2, 4, 8, 4, 8, 16, 8, 16, 32, 16, 32, 4, 1, 8, 2, 16, 4]
MWL = [0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 0, 2, 1, 3, 2, 4]
MHL = [0, 1, 0, 1, 2, 1, 2, 3, 2, 3, 4, 3, 4, 5, 4, 5, 2, 0, 3, 1, 4, 2]
TXW4 = [1, 2, 4, 8, 16, 1, 2, 2, 4, 4, 8, 8, 16, 1, 4, 2, 8, 4, 16]
TXH4 = [1, 2, 4, 8, 16, 2, 1, 4, 2, 8, 4, 16, 8, 4, 1, 8, 2, 16, 4]
TXWL = [2, 3, 4, 5, 6, 2, 3, 3, 4, 4, 5, 5, 6, 2, 4, 3, 5, 4, 6]
TXHL = [2, 3, 4, 5, 6, 3, 2, 4, 3, 5, 4, 6, 5, 4, 2, 5, 3, 6, 4]
TSQR = [0, 1, 2, 3, 4, 0, 0, 1, 1, 2, 2, 3, 3, 0, 0, 1, 1, 2, 2]
TSQRUP = [0, 1, 2, 3, 4, 1, 1, 2, 2, 3, 3, 4, 4, 2, 2, 3, 3, 4, 4]
SPLIT_TX = [0, 0, 1, 2, 3, 0, 0, 1, 1, 2, 2, 3, 3, 5, 6, 7, 8, 9, 10]
MAXRECT = [0, 5, 6, 1, 7, 8, 2, 9, 10, 3, 11, 12, 4, 4, 4, 4, 13, 14, 15,
           16, 17, 18]
MAXDEPTH = [0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 4, 4, 4, 2, 2, 3, 3, 4, 4]
ADJ = [0, 1, 2, 3, 3, 5, 6, 7, 8, 9, 10, 3, 3, 13, 14, 15, 16, 9, 10]
TXCLASS = [0]*10 + [2, 1, 2, 1, 2, 1]
IMC = [0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0]  # intra mode ctx
SUBSIZE_NONE = [0, None, None, 3, None, None, 6, None, None, 9, None, None,
                12, None, None, 15]
# Partition_Subsize rows (partition x bsize) for square sizes
PS = {
    0: {3: 3, 6: 6, 9: 9, 12: 12, 15: 15},
    1: {3: 2, 6: 5, 9: 8, 12: 11, 15: 14},
    2: {3: 1, 6: 4, 9: 7, 12: 10, 15: 13},
    3: {3: 0, 6: 3, 9: 6, 12: 9, 15: 12},
    4: {3: 2, 6: 5, 9: 8, 12: 11, 15: 14},
    5: {3: 2, 6: 5, 9: 8, 12: 11, 15: 14},
    6: {3: 1, 6: 4, 9: 7, 12: 10, 15: 13},
    7: {3: 1, 6: 4, 9: 7, 12: 10, 15: 13},
    8: {6: 17, 9: 19, 12: 21},
    9: {6: 16, 9: 18, 12: 20},
}
SS = {  # Subsampled_Size[bsize] for 420 (sub_x=1, sub_y=1)
    0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 2, 6: 3, 7: 4, 8: 5, 9: 6, 10: 7,
    11: 8, 12: 9, 13: 10, 14: 11, 15: 12, 16: 1, 17: 2, 18: 16, 19: 17,
    20: 18, 21: 19,
}
EXT_TX_INV = {
    1: [9, 0, 10, 11, 3, 1, 2],
    2: [9, 0, 3, 1, 2],
    3: [9, 0],
    4: [9, 10, 11, 0, 1, 2, 4, 5, 3, 6, 7, 8],
    5: [9, 10, 11, 12, 13, 14, 15, 0, 1, 2, 4, 5, 3, 6, 7, 8],
}
INTRA_MODE_TO_TX = [0, 1, 2, 0, 3, 1, 2, 2, 1, 3, 1, 2, 3, 0]


def scan_order(tx_size, tx_type):
    adj = ADJ[tx_size]
    w, h = TXW4[adj] * 4, TXH4[adj] * 4
    cls = TXCLASS[tx_type]
    if cls == 1:  # HORIZ -> mcol
        return [r * w + c for c in range(w) for r in range(h)], w, h
    if cls == 2:  # VERT -> mrow
        return list(range(w * h)), w, h
    out = []
    for d in range(w + h - 1):
        rlo, rhi = max(0, d - (w - 1)), min(h - 1, d)
        asc = (d & 1) if w == h else (w < h)
        rng = range(rlo, rhi + 1) if asc else range(rhi, rlo - 1, -1)
        for r in rng:
            out.append(r * w + (d - r))
    return out, w, h


def _inverse_recenter(r, v):
    if v > 2 * r:
        return v
    if v & 1:
        return r - ((v + 1) >> 1)
    return r + (v >> 1)


def save_cdfs(dec):
    """Frame-end CDF snapshot: deep copy with adaptation counters reset
    (counter = slot right after the first zero/terminal in each row)
    [SPEC §7.20 / libaom av1_reset_cdf_symbol_counters]."""
    out = {}
    for k, v in dec.cdf.items():
        a = np.array(v, copy=True)
        rows = a.reshape(-1, a.shape[-1])
        for r in range(rows.shape[0]):
            row = rows[r]
            for i in range(len(row) - 1):
                if row[i] == 0:
                    row[i + 1] = 0
                    break
        out[k] = a
    if hasattr(dec, "nmv"):
        out["__nmv__"] = []
        for comp in dec.nmv:
            cc = {}
            for k, v in comp.items():
                a = np.array(v, copy=True)
                rows = a.reshape(-1, a.shape[-1]) if a.ndim > 1 else a.reshape(1, -1)
                for r in range(rows.shape[0]):
                    row = rows[r]
                    for i in range(len(row) - 1):
                        if row[i] == 0:
                            row[i + 1] = 0
                            break
            cc = {k: np.array(v, copy=True) for k, v in comp.items()}
            for k, a in cc.items():
                rows = a.reshape(-1, a.shape[-1]) if a.ndim > 1 else a.reshape(1, -1)
                for r in range(rows.shape[0]):
                    row = rows[r]
                    for i in range(len(row) - 1):
                        if row[i] == 0:
                            row[i + 1] = 0
                            break
            out["__nmv__"].append(cc)
    return out


class MiniDecoder:
    """Intra-frame spec-model decoder over one tile."""

    def __init__(self, seq, hdr, tile_bytes, cdfs=None):
        self.seq = seq
        self.hdr = hdr
        self.mi_rows = hdr["mi_rows"]
        self.mi_cols = hdr["mi_cols"]
        self.sub_x = seq["subsampling_x"]
        self.sub_y = seq["subsampling_y"]
        self.r = Msac(tile_bytes, not hdr["disable_cdf_update"])
        if cdfs is not None:
            self.cdf = {k: v.copy() for k, v in cdfs.items()
                        if not k.startswith("__")}
        else:
            self.cdf = {k: v.copy() for k, v in T.items()}
            # coefficient tables: select quantizer context [SPEC §7.20]
            q = hdr["quant"]["base_q_idx"]
            qc = 0 if q <= 20 else 1 if q <= 60 else 2 if q <= 120 else 3
            for k in ("TxbSkip", "EobExtra", "DcSign", "CoeffBaseEob",
                      "CoeffBase", "CoeffBr", "EobPt16", "EobPt32",
                      "EobPt64", "EobPt128", "EobPt256", "EobPt512",
                      "EobPt1024"):
                self.cdf[k] = T[k][qc].copy()
        # neighbor state
        self.above_part = np.zeros(self.mi_cols + 32, dtype=np.int64)
        self.left_part = np.zeros(self.mi_rows + 32, dtype=np.int64)
        self.above_tx = np.full(self.mi_cols + 32, 64, dtype=np.int64)
        self.left_tx = np.full(self.mi_rows + 32, 64, dtype=np.int64)
        self.above_ctx = [np.zeros((self.mi_cols >> (self.sub_x if p else 0))
                                   + 32, dtype=np.int64) for p in range(3)]
        self.left_ctx = [np.zeros((self.mi_rows >> (self.sub_y if p else 0))
                                  + 32, dtype=np.int64) for p in range(3)]
        self.mode = np.zeros((self.mi_rows, self.mi_cols), dtype=np.int64)
        self.skipg = np.zeros((self.mi_rows, self.mi_cols), dtype=np.int64)
        self.cdefg = np.zeros((self.mi_rows, self.mi_cols), dtype=np.int64)
        self.bsizeg = np.zeros((self.mi_rows, self.mi_cols), dtype=np.int64)
        self.byg = np.zeros((self.mi_rows, self.mi_cols), dtype=np.int64)
        self.bxg = np.zeros((self.mi_rows, self.mi_cols), dtype=np.int64)
        self.cdef_read = set()
        self.sb4 = 32 if seq["use_128x128_superblock"] else 16
        self.bdec = [np.zeros((38, 38), dtype=np.int64) for _ in range(3)]
        # emitted plans (duck-typed like bindings.FramePlans)
        self.uv_modeg = np.zeros_like(self.mode)
        self.angle_yg = np.zeros_like(self.mode)
        self.angle_uvg = np.zeros_like(self.mode)
        self.fig = np.full_like(self.mode, -1)
        self.cfl_idxg = np.zeros_like(self.mode)
        self.cfl_signsg = np.zeros_like(self.mode)
        self.tx_records = []
        self.coeff_out = []
        self.read_tags = []  # (trace_idx, tag) for substitution search

    # plans duck-typing -----------------------------------------------------
    @property
    def tx(self):
        return np.array(self.tx_records, dtype=np.int64).reshape(-1, 9)

    @property
    def coeffs(self):
        return np.array(self.coeff_out, dtype=np.int64)

    @property
    def palettes(self):
        return []

    @property
    def lr(self):
        return np.array(getattr(self, "lr_units", []),
                        dtype=np.int64).reshape(-1, 13)

    def grid(self, name):
        return {
            "mode": self.mode, "uv_mode": self.uv_modeg,
            "angle_y": self.angle_yg, "angle_uv": self.angle_uvg,
            "filter_intra": self.fig, "cfl_alpha_idx": self.cfl_idxg,
            "cfl_signs": self.cfl_signsg, "skip": self.skipg,
            "bsize": self.bsizeg,
            "by": self.byg, "bx": self.bxg,
            "palette_y": np.zeros_like(self.mode),
            "palette_uv": np.zeros_like(self.mode),
            "intrabc": np.zeros_like(self.mode),
            "qindex": np.full_like(self.mode,
                                   self.hdr["quant"]["base_q_idx"]),
            "lossless": np.zeros_like(self.mode),
            "is_inter": np.zeros_like(self.mode),
            "ref0": np.zeros_like(self.mode),
            "delta_lf0": np.zeros_like(self.mode),
            "delta_lf1": np.zeros_like(self.mode),
            "delta_lf2": np.zeros_like(self.mode),
            "delta_lf3": np.zeros_like(self.mode),
            "seg_id": np.zeros_like(self.mode),
            "cdef": self.cdefg,
        }[name]

    def decode_tile(self):
        for r in range(0, self.mi_rows, self.sb4):
            # clear left ctx per sb row
            for p in range(3):
                self.left_ctx[p][:] = 0
            self.left_part[:] = 0
            self.left_tx[:] = 64
            for c in range(0, self.mi_cols, self.sb4):
                self.cdef_read = set()
                for p in range(3):
                    sx = self.sub_x if p else 0
                    sy = self.sub_y if p else 0
                    sw, sh = self.sb4 >> sx, self.sb4 >> sy
                    # spec: borders marked to TILE edge (sbWidth4/Height4)
                    sw4 = (self.mi_cols - c) >> sx
                    sh4 = (self.mi_rows - r) >> sy
                    bd = self.bdec[p]; bd[:] = 0
                    bd[0, 0:min(sw, sw4 - 1) + 2] = 1    # row -1 (index 0)
                    bd[0:min(sh, sh4 - 1) + 2, 0] = 1    # col -1
                    bd[sh+1, 0] = 0     # below-left corner [sbSize4][-1]
                sb = 15 if self.sb4 == 16 else 16  # BLOCK_64X64/128
                self.read_lr(r, c)
                self.decode_partition(r, c, 12 if self.sb4 == 16 else 15)

    # ---- loop restoration syntax [SPEC 5.11.57-58] ----
    WIENER_TAPS_MIN = [-5, -23, -17]
    WIENER_TAPS_MAX = [10, 8, 46]
    WIENER_TAPS_K = [1, 2, 3]
    SGR_XQD_MIN = [-96, -32]
    SGR_XQD_MAX = [31, 95]
    SGR_RADII = [(2, 1)] * 10 + [(0, 1)] * 4 + [(2, 0)] * 2

    def read_lr(self, r, c):
        if self.hdr.get("allow_intrabc"):
            return
        if not hasattr(self, "lr_units"):
            self.lr_units = []
            self.lr_ref_w = [[[3, -7, 15], [3, -7, 15]] for _ in range(3)]
            self.lr_ref_s = [[-32, 31] for _ in range(3)]
        for plane in range(1 if self.seq.get("mono_chrome") else 3):
            frt = self.hdr["lr"]["frame_restoration_type"][plane]
            if frt == 0:
                continue
            sx = self.sub_x if plane else 0
            sy = self.sub_y if plane else 0
            size = self.hdr["lr"]["loop_restoration_size"][plane]
            rows = max((((self.hdr["frame_height"] + sy) >> sy)
                        + (size >> 1)) // size, 1)
            cols = max((((self.hdr["upscaled_width"] + sx) >> sx)
                        + (size >> 1)) // size, 1)
            r0 = (r * (4 >> sy) + size - 1) // size
            r1 = min(rows, ((r + self.sb4) * (4 >> sy) + size - 1) // size)
            num, den = 4 >> sx, size
            if self.hdr.get("use_superres"):
                num = (4 >> sx) * self.hdr["superres_denom"]
                den = size * 8
            c0 = (c * num + den - 1) // den
            c1 = min(cols, ((c + self.sb4) * num + den - 1) // den)
            for ur in range(r0, r1):
                for uc in range(c0, c1):
                    self.read_lr_unit(plane, ur, uc, frt)

    def read_lr_unit(self, plane, ur, uc, frt):
        rec = [plane, ur, uc, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
        if frt == 1:
            typ = 1 if self.r.read_bool(self.cdf["WienerRestore"]) else 0
        elif frt == 2:
            typ = 2 if self.r.read_bool(self.cdf["SgrprojRestore"]) else 0
        else:
            typ = self.r.read_symbol(self.cdf["SwitchableRestore"], 3)
        rec[3] = typ
        if typ == 1:  # wiener
            for p in range(2):
                first = 1 if plane else 0
                for j in range(first, 3):
                    v = self._subexp_signed(
                        self.WIENER_TAPS_MIN[j], self.WIENER_TAPS_MAX[j] + 1,
                        self.WIENER_TAPS_K[j], self.lr_ref_w[plane][p][j])
                    rec[4 + p * 3 + j] = v
                    self.lr_ref_w[plane][p][j] = v
        elif typ == 2:  # sgrproj
            s = self.r.read_literal(4)
            rec[10] = s
            for i in range(2):
                rad = self.SGR_RADII[s][i]
                if rad:
                    v = self._subexp_signed(
                        self.SGR_XQD_MIN[i], self.SGR_XQD_MAX[i] + 1, 4,
                        self.lr_ref_s[plane][i])
                else:
                    v = 0
                    if i == 1:
                        v = max(self.SGR_XQD_MIN[1],
                                min(self.SGR_XQD_MAX[1], 128 - rec[11]))
                rec[11 + i] = v
                self.lr_ref_s[plane][i] = v
        self.lr_units.append(rec)

    def _subexp_signed(self, low, high, k, ref):
        mx = high - low
        rr = ref - low
        v = self._subexp_bool(mx, k)
        if (rr << 1) <= mx:
            x = _inverse_recenter(rr, v)
        else:
            x = mx - 1 - _inverse_recenter(mx - 1 - rr, v)
        return x + low

    def _subexp_bool(self, num_syms, k):
        i = 0
        mk = 0
        while True:
            b2 = k + i - 1 if i else k
            a = 1 << b2
            if num_syms <= mk + 3 * a:
                n = num_syms - mk
                w = n.bit_length()
                m = (1 << w) - n
                v = self.r.read_literal(w - 1)
                if v < m:
                    return v + mk
                extra = self.r.read_literal(1)
                return ((v << 1) - m + extra) + mk
            if self.r.read_literal(1):
                i += 1
                mk += a
            else:
                return self.r.read_literal(b2) + mk

    # ---- partition ----
    def decode_partition(self, r, c, bsize):
        if r >= self.mi_rows or c >= self.mi_cols:
            return
        num4 = BW4[bsize]
        half = num4 >> 1
        quarter = half >> 1
        has_rows = (r + half) < self.mi_rows
        has_cols = (c + half) < self.mi_cols
        part = 0
        bsl = MWL[bsize]
        if bsize < 3:
            self.decode_block(r, c, bsize)
            return
        if bsize >= 3:
            above = (int(self.above_part[c]) >> bsl) & 1
            left = (int(self.left_part[r]) >> bsl) & 1
            ctx = (bsl - 1) * 4 + left * 2 + above
            if has_rows and has_cols:
                nsyms = 4 if bsize == 3 else 8 if bsize == 15 else 10
                self.read_tags.append((len(self.r.trace), f'partition@{r},{c},{bsize}'))
                part = self.r.read_symbol(self.cdf["Partition"][ctx], nsyms)
            elif has_cols:
                p = self.gather(ctx, bsize, True)
                part = 3 if self.r.read_symbol_noadapt([p], 2) else 1
            elif has_rows:
                p = self.gather(ctx, bsize, False)
                part = 3 if self.r.read_symbol_noadapt([p], 2) else 2
            else:
                part = 3
        sub = PS[part][bsize]
        split = PS[3][bsize]
        if part == 0:
            self.decode_block(r, c, sub)
        elif part == 1:
            self.decode_block(r, c, sub)
            if has_rows:
                self.decode_block(r + half, c, sub)
        elif part == 2:
            self.decode_block(r, c, sub)
            if has_cols:
                self.decode_block(r, c + half, sub)
        elif part == 3:
            self.decode_partition(r, c, sub)
            self.decode_partition(r, c + half, sub)
            self.decode_partition(r + half, c, sub)
            self.decode_partition(r + half, c + half, sub)
        elif part == 4:
            self.decode_block(r, c, split)
            self.decode_block(r, c + half, split)
            self.decode_block(r + half, c, sub)
        elif part == 5:
            self.decode_block(r, c, sub)
            self.decode_block(r + half, c, split)
            self.decode_block(r + half, c + half, split)
        elif part == 6:
            self.decode_block(r, c, split)
            self.decode_block(r + half, c, split)
            self.decode_block(r, c + half, sub)
        elif part == 7:
            self.decode_block(r, c, sub)
            self.decode_block(r, c + half, split)
            self.decode_block(r + half, c + half, split)
        elif part == 8:
            for i in range(4):
                rr = r + i * quarter
                if i > 0 and rr >= self.mi_rows:
                    break
                self.decode_block(rr, c, sub)
        elif part == 9:
            for i in range(4):
                cc = c + i * quarter
                if i > 0 and cc >= self.mi_cols:
                    break
                self.decode_block(r, cc, sub)
        # ctx update
        if bsize >= 3 and (part != 3 or bsize == 3):
            def upd(rr, cc, s, over):
                a = 63 ^ ((2 << MWL[s]) - 1)
                l = 63 ^ ((2 << MHL[s]) - 1)
                for i in range(BW4[over]):
                    if cc + i < self.mi_cols:
                        self.above_part[cc + i] = a
                for i in range(BH4[over]):
                    if rr + i < self.mi_rows:
                        self.left_part[rr + i] = l
            if part == 4:
                upd(r, c, split, sub)
                upd(r + half, c, sub, sub)
            elif part == 5:
                upd(r, c, sub, sub)
                upd(r + half, c, split, sub)
            elif part == 6:
                upd(r, c, split, sub)
                upd(r, c + half, sub, sub)
            elif part == 7:
                upd(r, c, sub, sub)
                upd(r, c + half, split, sub)
            else:
                upd(r, c, sub, bsize)

    def gather(self, ctx, bsize, vert):
        row = self.cdf["Partition"][ctx]
        def ep(i):
            return (32768 if i == 0 else int(row[i - 1])) - int(row[i])
        p = 0
        if vert:
            p = ep(2) + ep(3) + ep(4) + ep(6) + ep(7)
            if bsize != 15:
                p += ep(9)
        else:
            p = ep(1) + ep(3) + ep(4) + ep(5) + ep(6)
            if bsize != 15:
                p += ep(8)
        return p

    # ---- block ----
    def decode_block(self, r, c, bsize):
        bw4, bh4 = BW4[bsize], BH4[bsize]
        self.avail_u = r > 0
        self.avail_l = c > 0
        has_chroma = ((r & 1) or not (bh4 & 1) or not self.sub_y) and \
                     ((c & 1) or not (bw4 & 1) or not self.sub_x)
        self.avail_u_chroma = self.avail_u
        self.avail_l_chroma = self.avail_l
        if has_chroma:
            if self.sub_y and bh4 == 1:
                self.avail_u_chroma = (r - 1) > 0
            if self.sub_x and bw4 == 1:
                self.avail_l_chroma = (c - 1) > 0
        else:
            self.avail_u_chroma = self.avail_l_chroma = False
        # skip
        above_skip = int(self.skipg[r - 1, c]) if self.avail_u else 0
        left_skip = int(self.skipg[r, c - 1]) if self.avail_l else 0
        self.read_tags.append((len(self.r.trace), f'skip@{r},{c}'))
        skip = self.r.read_bool(self.cdf["Skip"][above_skip + left_skip])
        # cdef (once per 64x64, at first non-skip block)
        if not skip and not self.hdr["coded_lossless"] and \
                self.seq["enable_cdef"] and not self.hdr["allow_intrabc"]:
            key = (r >> 4, c >> 4)
            if key not in self.cdef_read:
                self.cdef_read.add(key)
                cv = self.r.read_literal(self.hdr["cdef"]["bits"])
                h64 = max(1, bh4 >> 4)
                w64 = max(1, bw4 >> 4)
                for i in range(h64):
                    for j in range(w64):
                        self.cdef_read.add(((r >> 4) + i, (c >> 4) + j))
                        r0, c0 = ((r >> 4) + i) << 4, ((c >> 4) + j) << 4
                        self.cdefg[r0: r0 + 16, c0: c0 + 16] = cv
        # delta q/lf assumed absent (delta_q_present == 0 in test streams)
        assert not self.hdr["delta_q_present"]
        # y mode (kf)
        am = int(self.mode[r - 1, c]) if self.avail_u else 0
        lm = int(self.mode[r, c - 1]) if self.avail_l else 0
        self.read_tags.append((len(self.r.trace), f'ymode@{r},{c}'))
        ymode = self.r.read_symbol(self.cdf["KfYMode"][IMC[am]][IMC[lm]], 13)
        angle_y = 0
        if bsize >= 3 and 1 <= ymode <= 8:
            angle_y = self.r.read_symbol(self.cdf["AngleDelta"][ymode - 1],
                                         7) - 3
        uv_mode = 0
        angle_uv = 0
        cfl_idx = 0
        cfl_signs = 0
        if has_chroma:
            cfl_allowed = int(bw4 <= 8 and bh4 <= 8)
            uv_mode = self.r.read_symbol(
                self.cdf["UvMode"][cfl_allowed][ymode],
                14 if cfl_allowed else 13)
            if uv_mode == 13:
                joint = self.r.read_symbol(self.cdf["CflSign"], 8)
                cfl_signs = joint
                su, sv = (joint + 1) // 3, (joint + 1) % 3
                if su:
                    cfl_idx = self.r.read_symbol(
                        self.cdf["CflAlpha"][joint - 2], 16) << 4
                if sv:
                    cfl_idx += self.r.read_symbol(
                        self.cdf["CflAlpha"][sv * 3 + su - 3], 16)
            if bsize >= 3 and 1 <= uv_mode <= 8:
                angle_uv = self.r.read_symbol(
                    self.cdf["AngleDelta"][uv_mode - 1], 7) - 3
        # palette: requires allow_screen_content_tools
        assert not self.hdr["allow_screen_content_tools"]
        # filter intra
        fi_mode = -1
        if self.seq["enable_filter_intra"] and ymode == 0 and \
                max(bw4, bh4) <= 8:
            if self.r.read_bool(self.cdf["FilterIntra"][bsize]):
                fi_mode = self.r.read_symbol(self.cdf["FilterIntraMode"], 5)
        # tx size
        tx = self.read_tx_size(r, c, bsize, skip)
        # store grids
        self.mode[r: r + bh4, c: c + bw4] = ymode
        self.skipg[r: r + bh4, c: c + bw4] = skip
        self.bsizeg[r: r + bh4, c: c + bw4] = bsize
        self.byg[r: r + bh4, c: c + bw4] = r
        self.bxg[r: r + bh4, c: c + bw4] = c
        self.uv_modeg[r: r + bh4, c: c + bw4] = uv_mode
        self.angle_yg[r: r + bh4, c: c + bw4] = angle_y
        self.angle_uvg[r: r + bh4, c: c + bw4] = angle_uv
        self.fig[r: r + bh4, c: c + bw4] = fi_mode
        self.cfl_idxg[r: r + bh4, c: c + bw4] = cfl_idx
        self.cfl_signsg[r: r + bh4, c: c + bw4] = cfl_signs
        # residual
        self.residual(r, c, bsize, tx, skip, has_chroma, ymode, uv_mode,
                      fi_mode)
        for i in range(bw4):
            if c + i < self.mi_cols:
                self.above_tx[c + i] = TXW4[tx] * 4
        for i in range(bh4):
            if r + i < self.mi_rows:
                self.left_tx[r + i] = TXH4[tx] * 4

    def read_tx_size(self, r, c, bsize, skip):
        maxrect = MAXRECT[bsize]
        if self.hdr["coded_lossless"]:
            return 0
        # allowSelect = !skip || !is_inter: intra blocks read a tx depth
        # even when skipped [SPEC §5.11.16 read_block_tx_size]
        if self.hdr["tx_mode"] != 2 or bsize == 0:
            return 0 if self.hdr["tx_mode"] == 0 else maxrect
        depth_syms = min(MAXDEPTH[bsize], 2) + 1
        t, d = maxrect, 0
        while t != 0:
            t = SPLIT_TX[t]
            d += 1
        cat = min(max(d - 1, 0), 3)
        mw, mh = TXW4[maxrect] * 4, TXH4[maxrect] * 4
        above = int(self.above_tx[c] >= mw) if self.avail_u else 0
        left = int(self.left_tx[r] >= mh) if self.avail_l else 0
        if self.avail_u and self.avail_l:
            ctx = above + left
        elif self.avail_u:
            ctx = above
        elif self.avail_l:
            ctx = left
        else:
            ctx = 0
        self.read_tags.append((len(self.r.trace), 'txsize'))
        depth = self.r.read_symbol(self.cdf["TxSize"][cat][ctx], depth_syms)
        tx = maxrect
        for _ in range(depth):
            tx = SPLIT_TX[tx]
        return tx

    def residual(self, r, c, bsize, tx, skip, has_chroma, ymode, uv_mode,
                 fi_mode):
        w_chunks = max(1, BW4[bsize] >> 4)
        h_chunks = max(1, BH4[bsize] >> 4)
        size_chunk = 12 if (w_chunks > 1 or h_chunks > 1) else bsize
        for cy in range(h_chunks):
            for cx in range(w_chunks):
                mr = r + (cy << 4)
                mc = c + (cx << 4)
                planes = 3 if has_chroma and not self.seq["mono_chrome"] \
                    else 1
                for plane in range(planes):
                    if plane == 0:
                        tsz = tx
                    else:
                        pb = SS[bsize] if (self.sub_x and self.sub_y) \
                            else bsize
                        tsz = MAXRECT[pb]
                        if TXW4[tsz] == 16 or TXH4[tsz] == 16:
                            tsz = 9 if TXW4[tsz] == 4 else 10 if \
                                TXH4[tsz] == 4 else 3
                    step_x, step_y = TXW4[tsz], TXH4[tsz]
                    psz = SS[size_chunk] if plane else size_chunk
                    n4w, n4h = BW4[psz], BH4[psz]
                    sx = self.sub_x if plane else 0
                    sy = self.sub_y if plane else 0
                    base_x = (mc >> sx) * 4
                    base_y = (mr >> sy) * 4
                    for yy in range(0, n4h, step_y):
                        for xx in range(0, n4w, step_x):
                            sx0 = base_x + 4 * xx
                            sy0 = base_y + 4 * yy
                            if sx0 >= ((self.mi_cols * 4) >> sx) or \
                               sy0 >= ((self.mi_rows * 4) >> sy):
                                continue
                            self.cur_avail = self.avail_bits(
                                plane, sx0, sy0, tsz, xx, yy, sx, sy)
                            if skip:
                                self.set_ctx(plane, sx0 >> 2, sy0 >> 2,
                                             TXW4[tsz], TXH4[tsz], 0)
                                av = self.avail_bits(plane, sx0, sy0,
                                                     tsz, xx, yy, sx, sy)
                                self.tx_records += [plane, sx0 >> 2,
                                                    sy0 >> 2, tsz, 0, 0, -1,
                                                    r * self.mi_cols + c, av]
                            else:
                                self.read_coeffs(plane, sx0, sy0, tsz, bsize,
                                            ymode, uv_mode, fi_mode,
                                            r * self.mi_cols + c)

    def avail_bits(self, plane, sx0, sy0, tsz, xx, yy, sx, sy):
        # [SPEC transform_block availability]
        sbmask = self.sb4 - 1
        mi_r_tx = (sy0 << sy) >> 2
        mi_c_tx = (sx0 << sx) >> 2
        py = (mi_r_tx & sbmask) >> sy
        px = (mi_c_tx & sbmask) >> sx
        w4, h4 = TXW4[tsz], TXH4[tsz]
        have_left = int(xx > 0 or (self.avail_l_chroma if plane
                                   else self.avail_l))
        have_above = int(yy > 0 or (self.avail_u_chroma if plane
                                    else self.avail_u))
        bd = self.bdec[plane]
        have_ar = int(bd[py, px + w4 + 1])      # [py-1][px+w4]
        have_bl = int(bd[py + h4 + 1, px])      # [py+h4][px-1]
        # mark decoded
        bd[py + 1: py + h4 + 1, px + 1: px + w4 + 1] = 1
        return have_left | (have_above << 1) | (have_ar << 2) | \
            (have_bl << 3)

    def set_ctx(self, plane, x4, y4, w4, h4, v):
        # beyond-frame cells of overhanging txs are cleared, not set
        sx = self.sub_x if plane else 0
        sy = self.sub_y if plane else 0
        ncols, nrows = self.mi_cols >> sx, self.mi_rows >> sy
        self.above_ctx[plane][x4: x4 + w4] = v
        self.left_ctx[plane][y4: y4 + h4] = v
        if x4 + w4 > ncols:
            self.above_ctx[plane][max(x4, ncols): x4 + w4] = 0
        if y4 + h4 > nrows:
            self.left_ctx[plane][max(y4, nrows): y4 + h4] = 0

    def read_coeffs(self, plane, sx, sy, tsz, bsize, ymode, uv_mode, fi_mode,
               mi=0):
        x4, y4 = sx >> 2, sy >> 2
        w4, h4 = TXW4[tsz], TXH4[tsz]
        txszctx = (TSQR[tsz] + TSQRUP[tsz] + 1) >> 1
        pt = int(plane > 0)
        adj = ADJ[tsz]
        adj_w, adj_h = TXW4[adj] * 4, TXH4[adj] * 4
        bwl = TXWL[adj]
        # txb skip ctx
        ts_ctx = self.txb_skip_ctx(plane, tsz, x4, y4, w4, h4, bsize)
        self.read_tags.append((len(self.r.trace), f'txb_skip@p{plane},{x4},{y4}'))
        if self.r.read_bool(self.cdf["TxbSkip"][txszctx][ts_ctx]):
            self.set_ctx(plane, x4, y4, w4, h4, 0)
            self.tx_records += [plane, x4, y4, tsz, 0, 0, -1, mi,
                                self.cur_avail]
            return
        # tx type
        tx_type = self.read_tx_type(plane, tsz, ymode, uv_mode, fi_mode)
        scan, _, _ = scan_order(tsz, tx_type)
        cls = TXCLASS[tx_type]
        # eob pt
        ms = TXWL[adj] + TXHL[adj] - 4
        ctx = 0 if cls == 0 else 1
        name = ["EobPt16", "EobPt32", "EobPt64", "EobPt128", "EobPt256",
                "EobPt512", "EobPt1024"][ms]
        nsym = ms + 5
        eob_pt = self.r.read_symbol(self.cdf[name][pt][ctx], nsym) + 1
        if eob_pt < 3:
            eob = eob_pt
        else:
            bits = eob_pt - 2
            base = (1 << (eob_pt - 2)) + 1
            b = self.r.read_bool(
                self.cdf["EobExtra"][txszctx][pt][eob_pt - 3])
            rest = self.r.read_literal(bits - 1) if bits > 1 else 0
            eob = base + (b << (bits - 1)) + rest
        stride = adj_w + 4
        levels = np.zeros(stride * (adj_h + 4), dtype=np.int64)
        quant = np.zeros(adj_w * adj_h, dtype=np.int64)
        for ci in range(eob - 1, -1, -1):
            pos = scan[ci]
            if ci == eob - 1:
                if ci == 0:
                    ectx = 0
                elif ci <= (adj_w * adj_h) // 8:
                    ectx = 1
                elif ci <= (adj_w * adj_h) // 4:
                    ectx = 2
                else:
                    ectx = 3
                lv = self.r.read_symbol(
                    self.cdf["CoeffBaseEob"][txszctx][pt][ectx], 3) + 1
            else:
                bctx = self.base_ctx(levels, pos, bwl, stride, cls, adj_h,
                                     (TXW4[tsz] * 4, TXH4[tsz] * 4))
                lv = self.r.read_symbol(
                    self.cdf["CoeffBase"][txszctx][pt][bctx], 4)
            if lv > 2:
                brctx = self.br_ctx(levels, pos, bwl, stride, cls)
                for _ in range(4):
                    k = self.r.read_symbol(
                        self.cdf["CoeffBr"][min(txszctx, 3)][pt][brctx], 4)
                    lv += k
                    if k < 3:
                        break
            row, col = pos >> bwl, pos & ((1 << bwl) - 1)
            levels[row * stride + col] = min(lv, 127)
            quant[pos] = lv
        dc_sign = 0
        cul = 0
        for ci in range(eob):
            pos = scan[ci]
            lv = int(quant[pos])
            if lv:
                if ci == 0:
                    dctx = self.dc_sign_ctx(plane, x4, y4, w4, h4)
                    sign = self.r.read_bool(self.cdf["DcSign"][pt][dctx])
                else:
                    sign = self.r.read_literal(1)
                if lv >= 15:
                    lv += self.r.read_golomb()
                cul += lv
                quant[pos] = -lv if sign else lv
                if ci == 0:
                    dc_sign = 1 if sign else 2
        cul = min(cul, 63)
        self.set_ctx(plane, x4, y4, w4, h4, cul | (dc_sign << 6))
        off = len(self.coeff_out)
        self.coeff_out.extend(int(v) for v in quant)
        self.tx_records += [plane, x4, y4, tsz, tx_type, eob, off, mi,
                            self.cur_avail]

    def read_tx_type(self, plane, tsz, ymode, uv_mode, fi_mode):
        red = self.hdr["reduced_tx_set"]
        squp = TSQRUP[tsz]
        if squp > 3:
            st = 0
        elif squp == 3:
            st = 0
        elif red:
            st = 2
        else:
            st = 2 if TSQR[tsz] == 2 else 1
        if plane:
            if squp > 3 or self.hdr["coded_lossless"]:
                return 0
            t = INTRA_MODE_TO_TX[uv_mode]
            if st and t not in EXT_TX_INV[st]:
                t = 0
            if st == 0 and t != 0:
                t = 0
            return t
        if st == 0 or self.hdr["quant"]["base_q_idx"] == 0:
            return 0
        intra_dir = [0, 1, 2, 6, 0][fi_mode] if fi_mode >= 0 else ymode
        nsym = len(EXT_TX_INV[st])
        sym = self.r.read_symbol(
            self.cdf["IntraExtTx"][st][TSQR[tsz]][intra_dir], nsym)
        return EXT_TX_INV[st][sym]

    def txb_skip_ctx(self, plane, tsz, x4, y4, w4, h4, bsize):
        if plane == 0:
            if BW4[bsize] == w4 and BH4[bsize] == h4:
                return 0
            sk = [[1, 2, 2, 2, 3], [1, 4, 4, 4, 5], [1, 4, 4, 4, 5],
                  [1, 4, 4, 4, 5], [1, 4, 4, 4, 6]]
            top = 0
            lft = 0
            for i in range(w4):
                top |= int(self.above_ctx[plane][x4 + i])
            for i in range(h4):
                lft |= int(self.left_ctx[plane][y4 + i])
            top &= 63
            lft &= 63
            return sk[min(min(top, lft), 4)][min(top | lft, 4)]
        a = 0
        l = 0
        for i in range(w4):
            a |= int(self.above_ctx[plane][x4 + i])
        for i in range(h4):
            l |= int(self.left_ctx[plane][y4 + i])
        base = int(a != 0) + int(l != 0)
        pb = SS[bsize] if (self.sub_x and self.sub_y) else bsize
        bigger = BW4[pb] != w4 or BH4[pb] != h4
        return base + (10 if bigger else 7)

    def dc_sign_ctx(self, plane, x4, y4, w4, h4):
        s = 0
        for i in range(w4):
            v = int(self.above_ctx[plane][x4 + i]) >> 6
            s += 1 if v == 2 else -1 if v == 1 else 0
        for i in range(h4):
            v = int(self.left_ctx[plane][y4 + i]) >> 6
            s += 1 if v == 2 else -1 if v == 1 else 0
        return 1 if s < 0 else 2 if s > 0 else 0

    @staticmethod
    def base_ctx(levels, pos, bwl, stride, cls, height=None, real_wh=None):
        # rect band rule uses the REAL (unadjusted) tx shape [libaom
        # av1_nz_map_ctx_offset per-size tables]
        row, col = pos >> bwl, pos & ((1 << bwl) - 1)
        width = 1 << bwl
        if height is None:
            height = width
        if real_wh is not None:
            width, height = real_wh
        p = row * stride + col
        mag = min(int(levels[p + 1]), 3) + min(int(levels[p + stride]), 3)
        if cls == 0:
            mag += min(int(levels[p + stride + 1]), 3)
            mag += min(int(levels[p + 2]), 3)
            mag += min(int(levels[p + 2 * stride]), 3)
        elif cls == 2:
            mag += min(int(levels[p + 2 * stride]), 3)
            mag += min(int(levels[p + 3 * stride]), 3)
            mag += min(int(levels[p + 4 * stride]), 3)
        else:
            mag += min(int(levels[p + 2]), 3)
            mag += min(int(levels[p + 3]), 3)
            mag += min(int(levels[p + 4]), 3)
        ctx = min(4, (mag + 1) >> 1)
        if cls == 0:
            if pos == 0:
                return 0
            if width < height and row < 2:
                off = 11
            elif width > height and col < 2:
                off = 16
            else:
                rc = min(row, 4) + min(col, 4)
                off = 1 if rc < 2 else 6 if rc < 4 else 21
            return ctx + off
        idx = row if cls == 2 else col
        off = 0 if idx == 0 else 5 if idx == 1 else 10
        return 26 + ctx + off

    @staticmethod
    def br_ctx(levels, pos, bwl, stride, cls):
        row, col = pos >> bwl, pos & ((1 << bwl) - 1)
        p = row * stride + col
        mag = int(levels[p + 1]) + int(levels[p + stride])
        if cls == 0:
            mag += int(levels[p + stride + 1])
            mag = min((mag + 1) >> 1, 6)
            if pos == 0:
                return mag
            if row < 2 and col < 2:
                return mag + 7
        elif cls == 1:
            mag += int(levels[p + 2])
            mag = min((mag + 1) >> 1, 6)
            if pos == 0:
                return mag
            if col == 0:
                return mag + 7
        else:
            mag += int(levels[p + 2 * stride])
            mag = min((mag + 1) >> 1, 6)
            if pos == 0:
                return mag
            if row == 0:
                return mag + 7
        return mag + 14
