"""Transform conformance fuzzer: validate our inverse transforms against
libaom itself, via forged keyframe bitstreams.

Builds a synthetic keyframe tile (using the validated msac encoder
replica and default CDFs) containing one intra DC block of a chosen
block size whose luma transform carries CHOSEN coefficient levels.
libaom decodes the forged frame; since the DC prediction is a known
constant, the decoded pixels reveal libaom's dequant+inverse-transform
output exactly, which we diff against ops/spec/itx.

Usage: python tools/itx_oracle.py [n_trials]
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np  # noqa: E402
import aomffi  # noqa: E402
import pymodel  # noqa: E402
from pymodel import (BW4, BH4, TXW4, TXH4, TXWL, TXHL, ADJ, MAXRECT, MWL,
                     MHL, PS, SS, MAXDEPTH, SPLIT_TX, scan_order)  # noqa: E402
from av1dec_tpu.bindings import NativeParser  # noqa: E402
from av1dec_tpu.ops.spec import dequant, itx as ITX  # noqa: E402
from msac_encode import MsacEncoder  # noqa: E402
from trace_diff import obu_walk  # noqa: E402
import trace_diff_inter  # noqa: E402


def leb128(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


class ForgedKf(pymodel.MiniDecoder):
    """Generates a fully forged keyframe tile.  One target block gets
    coded luma coefficients (levels dict pos->level, eob); all other
    blocks are skipped DC.  Partition plan maps (r,c,bsize)->val."""

    def __init__(self, seq, hdr, plan, target, levels, eob):
        super().__init__(seq, hdr, b"\x00")
        self.r.record = []
        self.plan = plan
        self.target = target          # (r, c) mi of the coded block
        self.levels = levels          # {raster_pos: level}
        self.eob = eob

    def force(self, row, nsyms, sym):
        self.r.record.append(
            ("S", [int(row[k]) for k in range(nsyms - 1)], nsyms, sym))
        if self.r.allow_update:
            pymodel.update_cdf(row, sym, nsyms)
        return sym

    def force_bit(self, bit):
        self.r.record.append(("B", 16384, bit))
        return bit

    def decode_partition(self, r, c, bsize):
        if r >= self.mi_rows or c >= self.mi_cols:
            return
        bsl = MWL[bsize]
        above = (int(self.above_part[c]) >> bsl) & 1
        left = (int(self.left_part[r]) >> bsl) & 1
        ctx = (bsl - 1) * 4 + left * 2 + above
        nsyms = 4 if bsize == 3 else 8 if bsize == 15 else 10
        val = self.plan.get((r, c, bsize), 0)
        self.force(self.cdf["Partition"][ctx], nsyms, val)
        half = BW4[bsize] >> 1
        quarter = half >> 1
        if val == 0:
            self.decode_block(r, c, bsize)
            sub = bsize
        elif val == 3:
            sub = PS[3][bsize]
            for rr, cc in ((r, c), (r, c + half), (r + half, c),
                           (r + half, c + half)):
                self.decode_partition(rr, cc, sub)
            return
        elif val == 8:
            sub = PS[8][bsize]
            for i in range(4):
                self.decode_block(r + i * quarter, c, sub)
        elif val == 9:
            sub = PS[9][bsize]
            for i in range(4):
                self.decode_block(r, c + i * quarter, sub)
        else:
            raise NotImplementedError
        a = 63 ^ ((2 << MWL[sub]) - 1)
        lft = 63 ^ ((2 << MHL[sub]) - 1)
        for i in range(BW4[bsize]):
            if c + i < self.mi_cols:
                self.above_part[c + i] = a
        for i in range(BH4[bsize]):
            if r + i < self.mi_rows:
                self.left_part[r + i] = lft

    def decode_block(self, r, c, bsize):
        bw4, bh4 = BW4[bsize], BH4[bsize]
        self.avail_u = r > 0
        self.avail_l = c > 0
        coded = (r, c) == self.target
        a = int(self.skipg[r - 1, c]) if self.avail_u else 0
        lft = int(self.skipg[r, c - 1]) if self.avail_l else 0
        self.force(self.cdf["Skip"][a + lft], 2, 0 if coded else 1)
        from pymodel import IMC
        am = int(self.mode[r - 1, c]) if self.avail_u else 0
        lm = int(self.mode[r, c - 1]) if self.avail_l else 0
        self.force(self.cdf["KfYMode"][IMC[am]][IMC[lm]], 13, 0)
        has_chroma = ((r & 1) or not (bh4 & 1) or not self.sub_y) and \
                     ((c & 1) or not (bw4 & 1) or not self.sub_x)
        if has_chroma and not self.seq["mono_chrome"]:
            cfl_allowed = int(bw4 <= 8 and bh4 <= 8)
            self.force(self.cdf["UvMode"][cfl_allowed][0],
                       14 if cfl_allowed else 13, 0)
        if self.seq["enable_filter_intra"] and max(bw4, bh4) <= 8:
            self.force(self.cdf["FilterIntra"][bsize], 2, 0)
        # tx size: depth 0 (max rect)
        if self.hdr["tx_mode"] == 2 and bsize != 0:
            maxrect = MAXRECT[bsize]
            depth_syms = min(MAXDEPTH[bsize], 2) + 1
            t, d = maxrect, 0
            while t != 0:
                t = SPLIT_TX[t]
                d += 1
            cat = min(max(d - 1, 0), 3)
            mw, mh = TXW4[maxrect] * 4, TXH4[maxrect] * 4
            above = int(self.above_tx[c] >= mw) if self.avail_u else 0
            left = int(self.left_tx[r] >= mh) if self.avail_l else 0
            ctx = (above + left) if (self.avail_u and self.avail_l) else \
                (above if self.avail_u else (left if self.avail_l else 0))
            self.force(self.cdf["TxSize"][cat][ctx], depth_syms, 0)
            tx = maxrect
        else:
            tx = MAXRECT[bsize]
        self.mode[r: r + bh4, c: c + bw4] = 0
        self.skipg[r: r + bh4, c: c + bw4] = 0 if coded else 1
        self.bsizeg[r: r + bh4, c: c + bw4] = bsize
        self.byg[r: r + bh4, c: c + bw4] = r
        self.bxg[r: r + bh4, c: c + bw4] = c
        self.uv_modeg[r: r + bh4, c: c + bw4] = 0
        self.fig[r: r + bh4, c: c + bw4] = -1
        # residual
        if not coded:
            self.avail_u_chroma = self.avail_u
            self.avail_l_chroma = self.avail_l
            self.residual(r, c, bsize, tx, 1, has_chroma, 0, 0, -1)
        else:
            self.forge_coeffs(r, c, bsize, tx, has_chroma)
        for i in range(bw4):
            if c + i < self.mi_cols:
                self.above_tx[c + i] = TXW4[tx] * 4
        for i in range(bh4):
            if r + i < self.mi_rows:
                self.left_tx[r + i] = TXH4[tx] * 4

    def forge_coeffs(self, r, c, bsize, tx, has_chroma):
        """Emit the target block's coeff syntax: luma = chosen levels
        (single tx = whole block), chroma all-zero."""
        # luma txb: coded
        from pymodel import TSQR, TSQRUP
        tsz = tx
        txszctx = (TSQR[tsz] + TSQRUP[tsz] + 1) >> 1
        x4, y4 = c, r
        w4, h4 = TXW4[tsz], TXH4[tsz]
        ts_ctx = self.txb_skip_ctx(0, tsz, x4, y4, w4, h4, bsize)
        self.force(self.cdf["TxbSkip"][txszctx][ts_ctx], 2, 0)
        # tx type: keyframe DC intra: st depends on size; force DCT
        red = self.hdr["reduced_tx_set"]
        squp = TSQRUP[tsz]
        if squp >= 3:
            st = 0
        elif red:
            st = 2
        else:
            st = 2 if TSQR[tsz] == 2 else 1
        if st != 0 and self.hdr["quant"]["base_q_idx"] != 0:
            from pymodel import EXT_TX_INV
            inv = EXT_TX_INV[st]
            sym = inv.index(0)  # DCT_DCT
            self.force(self.cdf["IntraExtTx"][st][TSQR[tsz]][0],
                       len(inv), sym)
        scan, _, _ = scan_order(tsz, 0)
        adj = ADJ[tsz]
        adj_w, adj_h = TXW4[adj] * 4, TXH4[adj] * 4
        eob = self.eob
        # eob_pt coding
        ms = TXWL[adj] + TXHL[adj] - 4
        name = ["EobPt16", "EobPt32", "EobPt64", "EobPt128", "EobPt256",
                "EobPt512", "EobPt1024"][ms]
        nsym = ms + 5
        eob_pt = max(1, (eob - 1).bit_length() + 1) if eob > 2 else eob
        # find eob_pt such that eob in range
        for pt in range(1, nsym + 1):
            lo = 1 if pt == 1 else (1 << (pt - 2)) + 1
            hi = 1 if pt == 1 else (1 << (pt - 1))
            if lo <= eob <= hi:
                eob_pt = pt
                break
        self.force(self.cdf[name][0][0], nsym, eob_pt - 1)
        if eob_pt >= 3:
            bits = eob_pt - 2
            base = (1 << (eob_pt - 2)) + 1
            rem = eob - base
            b = (rem >> (bits - 1)) & 1
            self.force(self.cdf["EobExtra"][txszctx][0][eob_pt - 3], 2, b)
            rest = rem & ((1 << (bits - 1)) - 1)
            for k in range(bits - 2, -1, -1):
                self.force_bit((rest >> k) & 1)
        # levels, reverse scan
        stride = adj_w + 4
        lbuf = np.zeros(stride * (adj_h + 4), dtype=np.int64)
        bwl = TXWL[adj]
        cls = 0
        for ci in range(eob - 1, -1, -1):
            pos = scan[ci]
            lv = abs(self.levels.get(pos, 0))
            if ci == eob - 1:
                assert lv >= 1
                if ci == 0:
                    ectx = 0
                elif ci <= (adj_w * adj_h) // 8:
                    ectx = 1
                elif ci <= (adj_w * adj_h) // 4:
                    ectx = 2
                else:
                    ectx = 3
                self.force(self.cdf["CoeffBaseEob"][txszctx][0][ectx], 3,
                           min(lv, 3) - 1)
            else:
                bctx = self.base_ctx(lbuf, pos, bwl, stride, cls, adj_h,
                                     (TXW4[tsz] * 4, TXH4[tsz] * 4))
                self.force(self.cdf["CoeffBase"][txszctx][0][bctx], 4,
                           min(lv, 3))
            if lv > 2:
                brctx = self.br_ctx(lbuf, pos, bwl, stride, cls)
                rem = min(lv, 15) - 3
                for _ in range(4):
                    k = min(rem, 3)
                    self.force(
                        self.cdf["CoeffBr"][min(txszctx, 3)][0][brctx], 4,
                        k)
                    rem -= k
                    if k < 3:
                        break
            row_, col_ = pos >> bwl, pos & ((1 << bwl) - 1)
            lbuf[row_ * stride + col_] = min(lv, 127)
        # signs + golomb
        for ci in range(eob):
            pos = scan[ci]
            lv = self.levels.get(pos, 0)
            if lv:
                sign = 1 if lv < 0 else 0
                if ci == 0:
                    dctx = self.dc_sign_ctx(0, x4, y4, w4, h4)
                    self.force(self.cdf["DcSign"][0][dctx], 2, sign)
                else:
                    self.force_bit(sign)
                a = abs(lv)
                if a >= 15:
                    # golomb a-15
                    x = a - 15 + 1
                    nb = x.bit_length() - 1
                    for _ in range(nb):
                        self.force_bit(0)
                    for k in range(nb, -1, -1):
                        self.force_bit((x >> k) & 1)
        cul = min(sum(abs(v) for v in self.levels.values()), 63)
        dc = self.levels.get(0, 0)
        dcs = (1 if dc < 0 else 2) if dc else 0
        self.set_ctx(0, x4 * 4 >> 2, y4 * 4 >> 2, w4, h4, cul | (dcs << 6))
        # emit the plan record + coeffs so FrameRecon reconstructs it
        off_out = len(self.coeff_out)
        quant = np.zeros(adj_w * adj_h, dtype=np.int64)
        for pos, lv in self.levels.items():
            quant[pos] = lv
        self.coeff_out.extend(int(v) for v in quant)
        av = (1 if c > 0 else 0) | (2 if r > 0 else 0)
        self.tx_records += [0, x4, y4, tsz, 0, eob, off_out,
                            r * self.mi_cols + c, av]
        # chroma: all-zero txbs
        if has_chroma and not self.seq["mono_chrome"]:
            pb = SS[bsize] if (self.sub_x and self.sub_y) else bsize
            utsz = MAXRECT[pb]
            if TXW4[utsz] == 16 or TXH4[utsz] == 16:
                utsz = 9 if TXW4[utsz] == 4 else 10 if TXH4[utsz] == 4 \
                    else 3
            utxszctx = (TSQR[utsz] + TSQRUP[utsz] + 1) >> 1
            for plane in (1, 2):
                ux4 = (c >> self.sub_x)
                uy4 = (r >> self.sub_y)
                ctx = self.txb_skip_ctx(plane, utsz, ux4, uy4, TXW4[utsz],
                                        TXH4[utsz], bsize)
                self.force(self.cdf["TxbSkip"][utxszctx][ctx], 2, 1)
                self.set_ctx(plane, ux4, uy4, TXW4[utsz], TXH4[utsz], 0)
                self.tx_records += [plane, ux4, uy4, utsz, 0, 0, -1,
                                    r * self.mi_cols + c, 3]


def run_case(base_path, bsize, plan, target, levels, eob, verbose=False):
    """Forge the keyframe of `base_path` with the given structure; return
    (our_residual, libaom_residual) for the target block's luma tx."""
    p = NativeParser()
    p.set_decode_tiles(False)
    frames = list(aomffi.read_ivf(base_path))
    hdrs = []
    for _, tu in frames:
        hdrs.extend(p.parse_tu(tu))
    seq, hdr = p.seq, hdrs[0]
    d = ForgedKf(seq, hdr, plan, target, levels, eob)
    d.decode_tile()
    enc = MsacEncoder()
    for rec in d.r.record:
        if rec[0] == "S":
            enc.encode_symbol(rec[1] + [0], rec[3], rec[2])
        else:
            enc.encode_bool_prob(rec[1], rec[2])
    forged = enc.done()
    tu = frames[0][1]
    hb = None
    for typ, payload in obu_walk(tu):
        if typ == 6:
            hb = len(payload) - hdr["tile_sizes"][0]
    out = b""
    pos = 0
    while pos < len(tu):
        b0 = tu[pos]
        typ = (b0 >> 3) & 0xF
        ext = (b0 >> 2) & 1
        hl = 1 + ext
        sp = pos + hl
        size = 0
        shift = 0
        while True:
            byte = tu[sp]
            sp += 1
            size |= (byte & 0x7F) << shift
            shift += 7
            if not (byte & 0x80):
                break
        payload = tu[sp: sp + size]
        if typ == 6:
            payload = payload[:hb] + forged
        out += tu[pos: pos + hl] + leb128(len(payload)) + payload
        pos = sp + size
    dec = aomffi.AomDecoder()
    res = dec.decode(out)
    pic = res[0]
    dec.close()
    # target block geometry
    r, c = target
    bw, bh = BW4[bsize] * 4, BH4[bsize] * 4
    y0, x0 = r * 4, c * 4
    tsz = MAXRECT[bsize]
    q = hdr["quant"]
    # DC pred of the target block under the all-128-ish forged frame:
    # compute libaom's residual = pixels - our recon's DC pred.  We get
    # the pred by decoding the same forged frame with OUR pipeline.
    from av1dec_tpu.pipeline.recon import FrameRecon
    ours_planes = FrameRecon(seq, hdr, d).run()
    ours = np.asarray(ours_planes[0][y0: y0 + bh, x0: x0 + bw])
    libaom = pic.y.astype(np.int64)[y0: y0 + bh, x0: x0 + bw]
    return ours, libaom


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # base stream: any intra keyframe at 192x128 with tx_mode SELECT
    base = "/tmp/inter_battery/err_resilient.ivf"
    rng = np.random.default_rng(0)
    CASES = [
        # (name, bsize, plan, target mi)
        ("8x32", 18, {(0, 0, 12): 3, (0, 0, 9): 9}, (0, 0)),
        ("32x8", 19, {(0, 0, 12): 3, (0, 0, 9): 8}, (0, 0)),
        ("16x4", 17, {(0, 0, 12): 3, (0, 0, 9): 3, (0, 0, 6): 8}, (0, 0)),
        ("4x16", 16, {(0, 0, 12): 3, (0, 0, 9): 3, (0, 0, 6): 9}, (0, 0)),
        ("64x16", 21, {(0, 0, 12): 8}, (0, 0)),
        ("16x64", 20, {(0, 0, 12): 9}, (0, 0)),
        ("32x32", 9, {(0, 0, 12): 3}, (0, 0)),
        ("16x16", 6, {(0, 0, 12): 3, (0, 0, 9): 3}, (0, 0)),
    ]
    bad = 0
    for name, bsize, plan, target in CASES:
        tsz = MAXRECT[bsize]
        adj = ADJ[tsz]
        aw, ah = TXW4[adj] * 4, TXH4[adj] * 4
        scan, _, _ = scan_order(tsz, 0)
        for trial in range(n):
            eob = int(rng.integers(1, min(24, len(scan))))
            levels = {}
            for ci in range(eob):
                lv = int(rng.integers(-8, 9))
                if ci == eob - 1 and lv == 0:
                    lv = 1
                if lv:
                    levels[scan[ci]] = lv
            try:
                ours, lib = run_case(base, bsize, plan, target, levels,
                                     eob)
            except Exception as e:  # noqa: BLE001
                print(f"{name} trial {trial}: harness error {e}")
                bad += 1
                continue
            d = np.abs(ours - lib)
            if d.max() > 0:
                bad += 1
                ys, xs = np.nonzero(d)
                print(f"{name} trial {trial}: MISMATCH max {d.max()} at "
                      f"{list(zip(ys[:4].tolist(), xs[:4].tolist()))} "
                      f"eob {eob}")
            else:
                print(f"{name} trial {trial}: exact")
    print("TOTAL mismatching trials:", bad)


if __name__ == "__main__":
    main()
