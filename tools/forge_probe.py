"""Differential localization against libaom via forged hybrid tiles.

Decode a tile with the Python spec model up to superblock N, then
synthesize a trivial continuation (all-intra-DC-skip blocks) encoded
with the exact msac encoder replica from the model's live CDF state.
Feed the forged stream to libaom: if its output matches the model's
prediction, the first N superblocks' semantics agree with libaom;
otherwise the divergence is inside them.  Bisect N.

Usage: python tools/forge_probe.py <ivf> <frame_idx>
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np  # noqa: E402
import aomffi  # noqa: E402
import pymodel  # noqa: E402
import pymodel_inter  # noqa: E402
import trace_diff_inter  # noqa: E402
from av1dec_tpu.bindings import NativeParser  # noqa: E402
from av1dec_tpu.pipeline.recon import FrameRecon  # noqa: E402
from msac_encode import MsacEncoder  # noqa: E402


class ForgingDecoder(pymodel_inter.InterDecoder):
    """Decodes real bits for SBs < cut, forges all-intra-DC-skip after."""

    def __init__(self, seq, hdr, tile, cut_sb, cut_block=None, cdfs=None):
        super().__init__(seq, hdr, tile, cdfs=cdfs)
        self.cut_sb = cut_sb
        self.cut_block = cut_block  # global decode_block counter cut
        self._blk_i = 0
        self._sb_i = 0
        self.forging = False
        self.r.record = []

    def force(self, row, nsyms, sym):
        """Emit symbol `sym` as if decoded: record + adapt, no bit read."""
        self.r.record.append(
            ("S", [int(row[k]) for k in range(nsyms - 1)], nsyms, sym))
        if self.r.allow_update:
            pymodel.update_cdf(row, sym, nsyms)
        return sym

    def decode_tile(self):
        # mirror MiniDecoder.decode_tile with a per-SB hook
        for r in range(0, self.mi_rows, self.sb4):
            for pl in range(3):
                self.left_ctx[pl][:] = 0
            self.left_part[:] = 0
            self.left_tx[:] = 64
            for c in range(0, self.mi_cols, self.sb4):
                if self._sb_i >= self.cut_sb:
                    self.forging = True
                self._sb_i += 1
                self.cdef_read = set()
                for pl in range(3):
                    sx = self.sub_x if pl else 0
                    sy = self.sub_y if pl else 0
                    sw, sh = self.sb4 >> sx, self.sb4 >> sy
                    sw4 = (self.mi_cols - c) >> sx
                    sh4 = (self.mi_rows - r) >> sy
                    bd = self.bdec[pl]
                    bd[:] = 0
                    bd[0, 0:min(sw, sw4 - 1) + 2] = 1
                    bd[0:min(sh, sh4 - 1) + 2, 0] = 1
                    bd[sh + 1, 0] = 0
                self.read_lr(r, c)
                self.decode_partition(r, c,
                                      12 if self.sb4 == 16 else 15)

    def decode_block(self, r, c, bsize):
        if self.cut_block is not None and not self.forging and \
                self._blk_i >= self.cut_block:
            self.forging = True
        self._blk_i += 1
        if self.forging and not self.hdr["frame_is_intra"]:
            return self.inter_frame_mode_info(r, c, bsize)
        return super().decode_block(r, c, bsize)

    def decode_partition(self, r, c, bsize):
        if not self.forging:
            return super().decode_partition(r, c, bsize)
        # forged: PARTITION_NONE at the SB root
        if r >= self.mi_rows or c >= self.mi_cols:
            return
        from pymodel import MWL
        bsl = MWL[bsize]
        above = (int(self.above_part[c]) >> bsl) & 1
        left = (int(self.left_part[r]) >> bsl) & 1
        ctx = (bsl - 1) * 4 + left * 2 + above
        nsyms = 4 if bsize == 3 else 8 if bsize == 15 else 10
        self.force(self.cdf["Partition"][ctx], nsyms, 0)  # NONE
        self.decode_block(r, c, bsize)
        a = 63 ^ ((2 << MWL[bsize]) - 1)
        lft = 63 ^ ((2 << pymodel.MHL[bsize]) - 1)
        for i in range(pymodel.BW4[bsize]):
            if c + i < self.mi_cols:
                self.above_part[c + i] = a
        for i in range(pymodel.BH4[bsize]):
            if r + i < self.mi_rows:
                self.left_part[r + i] = lft

    def inter_frame_mode_info(self, r, c, bsize):
        if not self.forging:
            return super().inter_frame_mode_info(r, c, bsize)
        bw4, bh4 = pymodel.BW4[bsize], pymodel.BH4[bsize]
        self.r0, self.c0, self.bsize = r, c, bsize
        self.avail_u = r > 0
        self.avail_l = c > 0
        # skip_mode absent (asserted), skip = 1
        a = int(self.skipg[r - 1, c]) if self.avail_u else 0
        lft = int(self.skipg[r, c - 1]) if self.avail_l else 0
        self.force(self.cdf["Skip"][a + lft], 2, 1)
        self.skip = 1
        self.skip_mode = 0
        # is_inter = 0 (intra)
        if self.avail_u and self.avail_l:
            li, ai = self.ref0g[r, c - 1] <= 0, self.ref0g[r - 1, c] <= 0
            ctx = 3 if (li and ai) else int(li or ai)
        elif self.avail_u or self.avail_l:
            ctx = 2 * int(self.ref0g[r - 1, c] <= 0 if self.avail_u
                          else self.ref0g[r, c - 1] <= 0)
        else:
            ctx = 0
        self.force(self.cdf["IntraInter"][ctx], 2, 0)
        # intra: ymode DC, uv DC, no angle, filter_intra off, txsize d0
        self.force(self.cdf["IfYMode"][pymodel_inter.SIZE_GROUP[bsize]],
                   13, 0)
        has_chroma = ((r & 1) or not (bh4 & 1) or not self.sub_y) and \
                     ((c & 1) or not (bw4 & 1) or not self.sub_x)
        if has_chroma and not self.seq["mono_chrome"]:
            cfl_allowed = int(bw4 <= 8 and bh4 <= 8)
            self.force(self.cdf["UvMode"][cfl_allowed][0],
                       14 if cfl_allowed else 13, 0)
        if self.seq["enable_filter_intra"] and max(bw4, bh4) <= 8:
            self.force(self.cdf["FilterIntra"][bsize], 2, 0)
        # tx size: intra reads depth even when skipped
        if self.hdr["tx_mode"] == 2 and bsize != 0 and \
                not self.hdr["coded_lossless"]:
            from pymodel import MAXDEPTH, MAXRECT, SPLIT_TX, TXW4, TXH4
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
            if self.avail_u and self.is_interg[r - 1, c]:
                above = int(4 * pymodel.BW4[int(self.bsizeg[r - 1, c])]
                            >= mw)
            if self.avail_l and self.is_interg[r, c - 1]:
                left = int(4 * pymodel.BH4[int(self.bsizeg[r, c - 1])]
                           >= mh)
            if self.avail_u and self.avail_l:
                ctx = above + left
            elif self.avail_u:
                ctx = above
            elif self.avail_l:
                ctx = left
            else:
                ctx = 0
            self.force(self.cdf["TxSize"][cat][ctx], depth_syms, 0)
            tx = maxrect
        else:
            tx = 0 if self.hdr["tx_mode"] == 0 else pymodel.MAXRECT[bsize]
        # grids
        self.mode[r: r + bh4, c: c + bw4] = 0
        self.uv_modeg[r: r + bh4, c: c + bw4] = 0
        self.angle_yg[r: r + bh4, c: c + bw4] = 0
        self.angle_uvg[r: r + bh4, c: c + bw4] = 0
        self.fig[r: r + bh4, c: c + bw4] = -1
        self.skipg[r: r + bh4, c: c + bw4] = 1
        self.is_interg[r: r + bh4, c: c + bw4] = 0
        self.ref0g[r: r + bh4, c: c + bw4] = 0
        self.ref1g[r: r + bh4, c: c + bw4] = -1
        self.mvg[r: r + bh4, c: c + bw4] = 0
        self.bsizeg[r: r + bh4, c: c + bw4] = bsize
        self.byg[r: r + bh4, c: c + bw4] = r
        self.bxg[r: r + bh4, c: c + bw4] = c
        # skip residual: emit skip tx records + ctx clears
        self.cur_is_inter = False
        self.avail_u_chroma = self.avail_u
        self.avail_l_chroma = self.avail_l
        pymodel.MiniDecoder.residual(self, r, c, bsize, tx, 1,
                                     has_chroma, 0, 0, -1)
        for i in range(bw4):
            if c + i < self.mi_cols:
                self.above_tx[c + i] = pymodel.TXW4[tx] * 4
        for i in range(bh4):
            if r + i < self.mi_rows:
                self.left_tx[r + i] = pymodel.TXH4[tx] * 4


def leb128(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


def rebuild_tu(tu, hdr_bytes, new_tile):
    out = b""
    pos = 0
    while pos < len(tu):
        b0 = tu[pos]
        typ = (b0 >> 3) & 0xF
        ext = (b0 >> 2) & 1
        hdr_len = 1 + ext
        p = pos + hdr_len
        size = 0
        shift = 0
        sp = p
        while True:
            byte = tu[sp]
            sp += 1
            size |= (byte & 0x7F) << shift
            shift += 7
            if not (byte & 0x80):
                break
        payload = tu[sp: sp + size]
        if typ == 6:
            payload = payload[:hdr_bytes] + new_tile
        out += tu[pos: pos + hdr_len] + leb128(len(payload)) + payload
        pos = sp + size
    return out


def chained_cdfs(path, frame_idx, seq, hdrs):
    """CDF state for frame_idx per its primary ref (replaying saves);
    returns None when PRIMARY_REF_NONE."""
    import pymodel
    hdr = hdrs[frame_idx]
    if hdr["frame_is_intra"] or hdr["primary_ref_frame"] == 7:
        return None
    # replay: decode every frame, track slot -> saved cdfs
    slots = {}
    for fi in range(frame_idx):
        h = hdrs[fi]
        t = trace_diff_inter.tile_bytes_of_frame(path, fi,
                                                 h["tile_sizes"][0])
        if h["frame_is_intra"]:
            d = pymodel.MiniDecoder(seq, h, t)
        else:
            load = None
            if h["primary_ref_frame"] != 7:
                load = slots.get(h["ref_frame_idx"][h["primary_ref_frame"]])
            d = pymodel_inter.InterDecoder(seq, h, t, cdfs=load)
        d.decode_tile()
        if not h.get("disable_frame_end_update_cdf"):
            saved = pymodel.save_cdfs(d)
        else:
            saved = load
        for i in range(8):
            if (h["refresh_frame_flags"] >> i) & 1:
                slots[i] = saved
    return slots.get(hdr["ref_frame_idx"][hdr["primary_ref_frame"]])


def probe(path, frame_idx, cut_sb, seq, hdrs, frames, oracle_refs,
          cut_block=None, cdfs=None):
    hdr = hdrs[frame_idx]
    tile = trace_diff_inter.tile_bytes_of_frame(path, frame_idx,
                                                hdr["tile_sizes"][0])
    dec = ForgingDecoder(seq, hdr, tile, cut_sb, cut_block, cdfs=cdfs)
    dec.decode_tile()
    enc = MsacEncoder()
    for rec in dec.r.record:
        if rec[0] == "S":
            enc.encode_symbol(rec[1] + [0], rec[3], rec[2])
        else:
            enc.encode_bool_prob(rec[1], rec[2])
    forged = enc.done()
    # model's predicted pixels
    planes = FrameRecon(seq, hdr, dec, refs=oracle_refs).run()
    # libaom decode of the forged stream
    tu = frames[frame_idx][1]
    hdr_bytes = None
    # locate payload length to infer header size
    from trace_diff import obu_walk
    for typ, payload in obu_walk(tu):
        if typ == 6:
            hdr_bytes = len(payload) - hdr["tile_sizes"][0]
    new_tu = rebuild_tu(tu, hdr_bytes, forged)
    d = aomffi.AomDecoder()
    out = None
    try:
        for i, (pts, t) in enumerate(frames):
            res = d.decode(new_tu if i == frame_idx else t)
            if i == frame_idx:
                out = res[0] if res else None
            if i == frame_idx:
                break
        if out is None:
            res = d.decode(None)
            out = res[0] if res else None
    except RuntimeError as e:
        d.close()
        return None, f"libaom error: {e}"
    d.close()
    if out is None:
        return None, "no output"
    bad = 0
    for m, r_ in zip(planes, (out.y, out.u, out.v)):
        if r_ is None:
            continue
        m = np.asarray(m)[: r_.shape[0], : r_.shape[1]]
        bad += int((m != r_.astype(np.int64)).sum())
    return bad, None


def main():
    path, frame_idx = sys.argv[1], int(sys.argv[2])
    p = NativeParser()
    p.set_decode_tiles(False)
    hdrs = []
    frames = list(aomffi.read_ivf(path))
    for _, tu in frames:
        hdrs.extend(p.parse_tu(tu))
    seq = p.seq
    oracle = aomffi.oracle_decode_ivf(path)
    # oracle refs
    p2 = NativeParser()
    slots = {}
    snaps = []
    fj = 0
    for _, tu in frames:
        for h2 in p2.parse_tu(tu):
            snaps.append(dict(slots))
            for i in range(8):
                if (h2["refresh_frame_flags"] >> i) & 1:
                    slots[i] = fj
            fj += 1
    hdr = hdrs[frame_idx]
    refs = {}
    for rf in range(1, 8):
        idx = hdr["ref_frame_idx"][rf - 1]
        src = oracle[snaps[frame_idx][idx]]
        pl = [x.astype(np.int64) for x in (src.y, src.u, src.v)
              if x is not None]
        refs[rf] = {"planes": pl, "width": pl[0].shape[1],
                    "height": pl[0].shape[0]}
    n_sbs = ((hdr["mi_rows"] + 15) // 16) * ((hdr["mi_cols"] + 15) // 16)
    cdfs = chained_cdfs(path, frame_idx, seq, hdrs)
    if len(sys.argv) > 3 and sys.argv[3] == "--blocks":
        lo, hi = int(sys.argv[4]), int(sys.argv[5])
        for cut in range(lo, hi):
            bad, err = probe(path, frame_idx, 10**9, seq, hdrs, frames,
                             refs, cut_block=cut, cdfs=cdfs)
            print(f"cut at block {cut}: "
                  + (f"mismatches {bad}" if err is None else err),
                  flush=True)
        return
    for cut in range(n_sbs + 1):
        bad, err = probe(path, frame_idx, cut, seq, hdrs, frames, refs,
                         cdfs=cdfs)
        print(f"cut at SB {cut}: "
              + (f"mismatches {bad}" if err is None else err), flush=True)


if __name__ == "__main__":
    main()
