"""Independent Python spec-model of the AV1 inter entropy layer.

Extends pymodel.MiniDecoder with the inter-frame syntax walk: mode info
(is_inter / ref frames / inter modes), the MV prediction stack
[SPEC §7.10.2], DRL, MV decode [SPEC §5.11.31-33], var-tx size trees
[SPEC §5.11.47], inter tx types and the inter residual walk
(transform_tree).  Written directly from the spec, deliberately parallel
to the native C++ decoder, for differential symbol-trace debugging
(SURVEY.md §4 unit tier).

Unsupported (asserts): segmentation, delta q/lf, palette in inter
frames, skip mode, multiple tiles.  Temporal MVP (use_ref_frame_mvs)
is supported via a motion-field context fed from previous frames'
models (see MotionCtx), or asserts if absent.
"""

import numpy as np

import pymodel
from pymodel import (BW4, BH4, TXW4, TXH4, TSQR, TSQRUP, SPLIT_TX, MAXRECT,
                     EXT_TX_INV, T, MiniDecoder, SS, IMC)

INTRA_FRAME = 0
NONE_FRAME = -1
LAST_FRAME, LAST2_FRAME, LAST3_FRAME, GOLDEN_FRAME = 1, 2, 3, 4
BWDREF_FRAME, ALTREF2_FRAME, ALTREF_FRAME = 5, 6, 7

NEARESTMV, NEARMV, GLOBALMV, NEWMV = 13, 14, 15, 16
NEAREST_NEARESTMV = 17
NEAR_NEARMV = 18
NEAREST_NEWMV = 19
NEW_NEARESTMV = 20
NEAR_NEWMV = 21
NEW_NEARMV = 22
GLOBAL_GLOBALMV = 23
NEW_NEWMV = 24

MV_BORDER = 128
MAX_REF_MV_STACK_SIZE = 8
REF_MV_WEIGHT_NEAREST = 640
MAX_VARTX_DEPTH = 2

# rect-ext tail {0,0,1,1,2,2} per libaom size_group_lookup (verified by
# forged-bitstream probing; see tools/forge_probe.py)
SIZE_GROUP = [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3,
              0, 0, 1, 1, 2, 2]

# Compound mode context map [SPEC §5.11.24 Compound_Mode_Ctx_Map]
COMP_MODE_CTX_MAP = [[0, 1, 1, 1, 1], [3, 4, 4, 4, 4], [5, 6, 6, 6, 6]]


def has_newmv(mode):
    return mode in (NEWMV, NEW_NEWMV, NEAR_NEWMV, NEW_NEARMV,
                    NEAREST_NEWMV, NEW_NEARESTMV)


def has_nearmv(mode):
    return mode in (NEARMV, NEAR_NEARMV, NEAR_NEWMV, NEW_NEARMV)


def get_sub_mode(mode, which):
    """Per-list component of a (compound) mode [SPEC §5.11.26]."""
    if which == 0:
        if mode in (NEWMV, NEW_NEWMV, NEW_NEARESTMV, NEW_NEARMV):
            return NEWMV
        if mode in (NEARESTMV, NEAREST_NEARESTMV, NEAREST_NEWMV):
            return NEARESTMV
        if mode in (NEARMV, NEAR_NEARMV, NEAR_NEWMV):
            return NEARMV
        return GLOBALMV
    if mode in (NEW_NEWMV, NEAREST_NEWMV, NEAR_NEWMV):
        return NEWMV
    if mode in (NEAREST_NEARESTMV, NEW_NEARESTMV):
        return NEARESTMV
    if mode in (NEAR_NEARMV, NEW_NEARMV):
        return NEARMV
    return GLOBALMV


def round2signed(v, n):
    a = abs(v)
    r = (a + (1 << (n - 1))) >> n
    return -r if v < 0 else r


class InterDecoder(MiniDecoder):
    """Spec-model decoder over one tile of an inter frame."""

    def __init__(self, seq, hdr, tile_bytes, mctx=None, cdfs=None):
        super().__init__(seq, hdr, tile_bytes, cdfs=cdfs)
        self.mctx = mctx  # motion-field / tpl context (or None)
        # per-component NMV cdfs (adaptation is independent per comp)
        mvnames = ("MvClasses", "MvClass0Fp", "MvFp", "MvSign",
                   "MvClass0Hp", "MvHp", "MvClass0", "MvBits")
        if cdfs is not None and "__nmv__" in cdfs:
            self.nmv = [{k: v.copy() for k, v in comp.items()}
                        for comp in cdfs["__nmv__"]]
        else:
            self.nmv = [{k: T[k].copy() for k in mvnames}
                        for _ in range(2)]
        g = hdr.get("gm") or {}
        self.gm_type = list(g.get("type", [0] * 8))
        self.gm_params = np.asarray(
            g.get("params", [0] * 48), np.int64).reshape(8, 6)
        # ref order-hint sign bias [SPEC §7.8 set_frame_refs wrapup]
        self.order_hint = hdr.get("order_hint", 0)
        self.hint_bits = hdr.get("order_hint_bits", 0)
        self.enable_hint = hdr.get("enable_order_hint_seq", 0)
        hints = hdr.get("order_hints", [0] * 8)
        self.sign_bias = [0] * 8
        for rf in range(1, 8):
            self.sign_bias[rf] = int(
                self.rel_dist(hints[rf], self.order_hint) > 0)
        # grids
        shape = (self.mi_rows, self.mi_cols)
        self.is_interg = np.zeros(shape, np.int64)
        self.ref0g = np.full(shape, NONE_FRAME, np.int64)
        self.ref1g = np.full(shape, NONE_FRAME, np.int64)
        self.mvg = np.zeros(shape + (2, 2), np.int64)   # [list][row,col]
        self.interpg = np.zeros(shape + (2,), np.int64)
        self.skip_modeg = np.zeros(shape, np.int64)
        self.comp_group_idxg = np.zeros(shape, np.int64)
        self.compound_idxg = np.ones(shape, np.int64)
        self.txtypeg = np.zeros(shape, np.int64)
        self.inter_tx_szg = np.zeros(shape, np.int64)
        self.motion_modeg = np.zeros(shape, np.int64)
        assert not hdr["seg"]["enabled"], "segmentation not modeled"
        assert not hdr["delta_q_present"] and not hdr["delta_lf_present"]
        assert hdr["tiles"]["cols"] == 1 and hdr["tiles"]["rows"] == 1

    def rel_dist(self, a, b):
        if not self.enable_hint:
            return 0
        diff = a - b
        m = 1 << (self.hint_bits - 1)
        return (diff & (m - 1)) - (diff & m)

    # ------------------------------------------------------------------
    # block dispatch
    # ------------------------------------------------------------------
    def decode_block(self, r, c, bsize):
        if self.hdr["frame_is_intra"]:
            return super().decode_block(r, c, bsize)
        return self.inter_frame_mode_info(r, c, bsize)

    def inter_frame_mode_info(self, r, c, bsize):
        bw4, bh4 = BW4[bsize], BH4[bsize]
        self.r0, self.c0, self.bsize = r, c, bsize
        self.bw4, self.bh4 = bw4, bh4
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
        # neighbor ref snapshot [SPEC §5.11.15]
        self.left_refs = (
            (int(self.ref0g[r, c - 1]), int(self.ref1g[r, c - 1]))
            if self.avail_l else (INTRA_FRAME, NONE_FRAME))
        self.above_refs = (
            (int(self.ref0g[r - 1, c]), int(self.ref1g[r - 1, c]))
            if self.avail_u else (INTRA_FRAME, NONE_FRAME))
        self.left_intra = self.left_refs[0] <= INTRA_FRAME
        self.above_intra = self.above_refs[0] <= INTRA_FRAME
        self.left_single = self.left_refs[1] <= INTRA_FRAME
        self.above_single = self.above_refs[1] <= INTRA_FRAME

        # skip mode [SPEC §5.11.11]
        skip_mode = 0
        if self.hdr["skip_mode_present"] and min(bw4, bh4) >= 2:
            a = int(self.skip_modeg[r - 1, c]) if self.avail_u else 0
            l = int(self.skip_modeg[r, c - 1]) if self.avail_l else 0
            skip_mode = self.r.read_bool(self.cdf["SkipMode"][a + l])
        self.skip_mode = skip_mode
        # skip
        if skip_mode:
            skip = 1
        else:
            a = int(self.skipg[r - 1, c]) if self.avail_u else 0
            l = int(self.skipg[r, c - 1]) if self.avail_l else 0
            self.read_tags.append((len(self.r.trace), f'skip@{r},{c}'))
            skip = self.r.read_bool(self.cdf["Skip"][a + l])
        self.skip = skip
        # cdef
        if not skip and not self.hdr["coded_lossless"] and \
                self.seq["enable_cdef"] and not self.hdr["allow_intrabc"]:
            key = (r >> 4, c >> 4)
            if key not in self.cdef_read:
                self.cdef_read.add(key)
                cv = self.r.read_literal(self.hdr["cdef"]["bits"])
                for i in range(max(1, bh4 >> 4)):
                    for j in range(max(1, bw4 >> 4)):
                        self.cdef_read.add(((r >> 4) + i, (c >> 4) + j))
                        r0 = ((r >> 4) + i) << 4
                        c0 = ((c >> 4) + j) << 4
                        self.cdefg[r0: r0 + 16, c0: c0 + 16] = cv
        # is_inter [SPEC §5.11.20]
        if skip_mode:
            is_inter = 1
        else:
            if self.avail_u and self.avail_l:
                ctx = 3 if (self.left_intra and self.above_intra) else \
                    int(self.left_intra or self.above_intra)
            elif self.avail_u or self.avail_l:
                ctx = 2 * int(self.above_intra if self.avail_u
                              else self.left_intra)
            else:
                ctx = 0
            self.read_tags.append((len(self.r.trace), f'is_inter@{r},{c}'))
            is_inter = self.r.read_bool(self.cdf["IntraInter"][ctx])
        if is_inter:
            self.inter_block_mode_info(r, c, bsize, has_chroma)
        else:
            self.intra_block_mode_info(r, c, bsize, has_chroma)
        self.skip_modeg[r: r + bh4, c: c + bw4] = skip_mode
        self.is_interg[r: r + bh4, c: c + bw4] = is_inter
        self.skipg[r: r + bh4, c: c + bw4] = self.skip
        self.bsizeg[r: r + bh4, c: c + bw4] = bsize
        self.byg[r: r + bh4, c: c + bw4] = r
        self.bxg[r: r + bh4, c: c + bw4] = c

    # ------------------------------------------------------------------
    # intra block inside inter frame [SPEC §5.11.19]
    # ------------------------------------------------------------------
    def intra_block_mode_info(self, r, c, bsize, has_chroma):
        bw4, bh4 = BW4[bsize], BH4[bsize]
        self.ref0g[r: r + bh4, c: c + bw4] = INTRA_FRAME
        self.ref1g[r: r + bh4, c: c + bw4] = NONE_FRAME
        self.mvg[r: r + bh4, c: c + bw4] = 0
        self.read_tags.append((len(self.r.trace), f'if_ymode@{r},{c}'))
        ymode = self.r.read_symbol(self.cdf["IfYMode"][SIZE_GROUP[bsize]],
                                   13)
        angle_y = 0
        if bsize >= 3 and 1 <= ymode <= 8:
            angle_y = self.r.read_symbol(
                self.cdf["AngleDelta"][ymode - 1], 7) - 3
        uv_mode = 0
        angle_uv = 0
        cfl_idx = 0
        cfl_signs = 0
        if has_chroma and not self.seq["mono_chrome"]:
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
        assert not self.hdr["allow_screen_content_tools"], "palette"
        fi_mode = -1
        if self.seq["enable_filter_intra"] and ymode == 0 and \
                max(bw4, bh4) <= 8:
            if self.r.read_bool(self.cdf["FilterIntra"][bsize]):
                fi_mode = self.r.read_symbol(self.cdf["FilterIntraMode"], 5)
        tx = self.read_tx_size_intra(r, c, bsize, self.skip)
        self.mode[r: r + bh4, c: c + bw4] = ymode
        self.uv_modeg[r: r + bh4, c: c + bw4] = uv_mode
        self.angle_yg[r: r + bh4, c: c + bw4] = angle_y
        self.angle_uvg[r: r + bh4, c: c + bw4] = angle_uv
        self.fig[r: r + bh4, c: c + bw4] = fi_mode
        self.cfl_idxg[r: r + bh4, c: c + bw4] = cfl_idx
        self.cfl_signsg[r: r + bh4, c: c + bw4] = cfl_signs
        self.residual_intra(r, c, bsize, tx, self.skip, has_chroma, ymode,
                            uv_mode, fi_mode)
        for i in range(bw4):
            if c + i < self.mi_cols:
                self.above_tx[c + i] = TXW4[tx] * 4
        for i in range(bh4):
            if r + i < self.mi_rows:
                self.left_tx[r + i] = TXH4[tx] * 4

    def read_tx_size_intra(self, r, c, bsize, skip):
        # kf read_tx_size [SPEC §5.11.16] plus the inter-neighbor rule:
        # an inter neighbor contributes its BLOCK dims to the ctx
        # [libaom get_tx_size_context]
        from pymodel import MAXDEPTH, MWL  # noqa: F401
        maxrect = MAXRECT[bsize]
        if self.hdr["coded_lossless"]:
            return 0
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
        if self.avail_u and self.is_interg[r - 1, c]:
            above = int(4 * BW4[int(self.bsizeg[r - 1, c])] >= mw)
        if self.avail_l and self.is_interg[r, c - 1]:
            left = int(4 * BH4[int(self.bsizeg[r, c - 1])] >= mh)
        if self.avail_u and self.avail_l:
            ctx = above + left
        elif self.avail_u:
            ctx = above
        elif self.avail_l:
            ctx = left
        else:
            ctx = 0
        self.read_tags.append((len(self.r.trace), 'txsize'))
        depth = self.r.read_symbol(self.cdf["TxSize"][cat][ctx],
                                   depth_syms)
        tx = maxrect
        for _ in range(depth):
            tx = SPLIT_TX[tx]
        return tx

    def residual_intra(self, r, c, bsize, tx, skip, has_chroma, ymode,
                       uv_mode, fi_mode):
        self.cur_is_inter = False
        MiniDecoder.residual(self, r, c, bsize, tx, skip, has_chroma,
                             ymode, uv_mode, fi_mode)

    # ------------------------------------------------------------------
    # inter block [SPEC §5.11.23]
    # ------------------------------------------------------------------
    def inter_block_mode_info(self, r, c, bsize, has_chroma):
        bw4, bh4 = BW4[bsize], BH4[bsize]
        self.read_ref_frames(r, c, bsize)
        is_compound = self.ref_frame[1] > INTRA_FRAME
        self.find_mv_stack(is_compound)
        if self.skip_mode:
            ymode = NEAREST_NEARESTMV
        elif is_compound:
            ctx = COMP_MODE_CTX_MAP[self.ref_mv_ctx >> 1][
                min(self.new_mv_ctx, 4)]
            self.read_tags.append((len(self.r.trace), f'compmode@{r},{c}'))
            ymode = NEAREST_NEARESTMV + self.r.read_symbol(
                self.cdf["InterCompoundMode"][ctx], 8)
        else:
            self.read_tags.append((len(self.r.trace), f'newmv@{r},{c}'))
            if self.r.read_bool(self.cdf["NewMv"][self.new_mv_ctx]) == 0:
                ymode = NEWMV
            elif self.r.read_bool(
                    self.cdf["ZeroMv"][self.zero_mv_ctx]) == 0:
                ymode = GLOBALMV
            elif self.r.read_bool(
                    self.cdf["RefMv"][self.ref_mv_ctx]) == 0:
                ymode = NEARESTMV
            else:
                ymode = NEARMV
        self.ymode = ymode
        self.ref_mv_idx = 0
        if ymode in (NEWMV, NEW_NEWMV):
            for idx in range(2):
                if self.num_mv_found > idx + 1:
                    if not self.r.read_bool(
                            self.cdf["Drl"][self.drl_ctx[idx]]):
                        self.ref_mv_idx = idx
                        break
                    self.ref_mv_idx = idx + 1
        elif has_nearmv(ymode):
            self.ref_mv_idx = 1
            for idx in range(1, 3):
                if self.num_mv_found > idx + 1:
                    if not self.r.read_bool(
                            self.cdf["Drl"][self.drl_ctx[idx]]):
                        self.ref_mv_idx = idx
                        break
                    self.ref_mv_idx = idx + 1
        self.assign_mv(is_compound)
        self.read_interintra_mode(is_compound)
        self.read_motion_mode(is_compound)
        self.read_compound_type(r, c, bsize, is_compound)
        self.read_interpolation_filter(is_compound)
        # store grids
        self.mode[r: r + bh4, c: c + bw4] = ymode
        self.ref0g[r: r + bh4, c: c + bw4] = self.ref_frame[0]
        self.ref1g[r: r + bh4, c: c + bw4] = self.ref_frame[1]
        for i in range(2):
            self.mvg[r: r + bh4, c: c + bw4, i, 0] = self.mv[i][0]
            self.mvg[r: r + bh4, c: c + bw4, i, 1] = self.mv[i][1]
        self.interpg[r: r + bh4, c: c + bw4, 0] = self.interp_filter[0]
        self.interpg[r: r + bh4, c: c + bw4, 1] = self.interp_filter[1]
        self.motion_modeg[r: r + bh4, c: c + bw4] = self.motion_mode
        # var-tx size reading [SPEC §5.11.16 alt path]
        self.read_inter_tx_sizes(r, c, bsize)
        # residual
        self.cur_is_inter = True
        self.residual_inter(r, c, bsize, has_chroma)

    # --- reference frames [SPEC §5.11.25] ------------------------------
    def _count_refs(self, frame):
        cnt = 0
        for rf in (self.above_refs if self.avail_u else ()):
            cnt += int(rf == frame)
        for rf in (self.left_refs if self.avail_l else ()):
            cnt += int(rf == frame)
        return cnt

    @staticmethod
    def _rc_ctx(c0, c1):
        return 0 if c0 < c1 else 1 if c0 == c1 else 2

    def read_ref_frames(self, r, c, bsize):
        hdr = self.hdr
        if self.skip_mode:
            smf = hdr.get("skip_mode_frame", [0, 0])
            self.ref_frame = [smf[0], smf[1]]
            return
        bw4, bh4 = BW4[bsize], BH4[bsize]
        comp_mode = 0
        if hdr["reference_select"] and min(bw4, bh4) >= 2:
            # comp mode ctx [SPEC §5.11.25 derivation]
            if self.avail_u and self.avail_l:
                if self.above_single and self.left_single:
                    ctx = int(self._is_bwd(self.above_refs[0])) ^ \
                        int(self._is_bwd(self.left_refs[0]))
                elif self.above_single:
                    ctx = 2 + int(self._is_bwd(self.above_refs[0]) or
                                  self.above_intra)
                elif self.left_single:
                    ctx = 2 + int(self._is_bwd(self.left_refs[0]) or
                                  self.left_intra)
                else:
                    ctx = 4
            elif self.avail_u:
                ctx = (int(self._is_bwd(self.above_refs[0]))
                       if self.above_single else 3)
            elif self.avail_l:
                ctx = (int(self._is_bwd(self.left_refs[0]))
                       if self.left_single else 3)
            else:
                ctx = 1
            comp_mode = self.r.read_bool(self.cdf["CompInter"][ctx])
        if comp_mode:
            self.read_comp_ref(r, c, bsize)
            return
        cnt = [self._count_refs(f) for f in range(8)]
        fwd = cnt[LAST_FRAME] + cnt[LAST2_FRAME] + cnt[LAST3_FRAME] + \
            cnt[GOLDEN_FRAME]
        bwd = cnt[BWDREF_FRAME] + cnt[ALTREF2_FRAME] + cnt[ALTREF_FRAME]
        self.read_tags.append((len(self.r.trace), f'sref@{r},{c}'))
        p1 = self.r.read_bool(
            self.cdf["SingleRef"][self._rc_ctx(fwd, bwd)][0])
        if p1:
            c2 = self._rc_ctx(cnt[BWDREF_FRAME] + cnt[ALTREF2_FRAME],
                              cnt[ALTREF_FRAME])
            p2 = self.r.read_bool(self.cdf["SingleRef"][c2][1])
            if p2:
                ref = ALTREF_FRAME
            else:
                c6 = self._rc_ctx(cnt[BWDREF_FRAME], cnt[ALTREF2_FRAME])
                p6 = self.r.read_bool(self.cdf["SingleRef"][c6][5])
                ref = ALTREF2_FRAME if p6 else BWDREF_FRAME
        else:
            c3 = self._rc_ctx(cnt[LAST_FRAME] + cnt[LAST2_FRAME],
                              cnt[LAST3_FRAME] + cnt[GOLDEN_FRAME])
            p3 = self.r.read_bool(self.cdf["SingleRef"][c3][2])
            if p3:
                c5 = self._rc_ctx(cnt[LAST3_FRAME], cnt[GOLDEN_FRAME])
                p5 = self.r.read_bool(self.cdf["SingleRef"][c5][4])
                ref = GOLDEN_FRAME if p5 else LAST3_FRAME
            else:
                c4 = self._rc_ctx(cnt[LAST_FRAME], cnt[LAST2_FRAME])
                p4 = self.r.read_bool(self.cdf["SingleRef"][c4][3])
                ref = LAST2_FRAME if p4 else LAST_FRAME
        self.ref_frame = [ref, NONE_FRAME]

    def _is_bwd(self, ref):
        return ref >= BWDREF_FRAME

    def read_comp_ref(self, r, c, bsize):
        raise NotImplementedError("compound reference coding")

    # ------------------------------------------------------------------
    # MV prediction stack [SPEC §7.10.2]
    # ------------------------------------------------------------------
    def is_inside(self, mv_r, mv_c):
        return 0 <= mv_r < self.mi_rows and 0 <= mv_c < self.mi_cols

    def is_decoded(self, mv_r, mv_c):
        return self.ref0g[mv_r, mv_c] != NONE_FRAME

    def lower_mv_precision(self, mv):
        for i in range(2):
            v = int(mv[i])
            if self.hdr["cur_frame_force_integer_mv"]:
                a = abs(v)
                aligned = ((a + 3) >> 3) << 3
                mv[i] = aligned if v > 0 else -aligned
            elif v & 1:
                if not self.hdr["allow_high_precision_mv"]:
                    mv[i] = v - 1 if v > 0 else v + 1

    def setup_global_mv(self, ref_list):
        ref = self.ref_frame[ref_list]
        typ = self.gm_type[ref] if ref != INTRA_FRAME else 0
        if ref == INTRA_FRAME or typ == 0:
            mv = [0, 0]
        elif typ == 1:  # TRANSLATION
            mv = [int(self.gm_params[ref][0]) >> 13,
                  int(self.gm_params[ref][1]) >> 13]
        else:
            x = self.c0 * 4 + self.bw4 * 2 - 1
            y = self.r0 * 4 + self.bh4 * 2 - 1
            g = self.gm_params[ref]
            xc = (int(g[2]) - (1 << 16)) * x + int(g[3]) * y + int(g[0])
            yc = int(g[4]) * x + (int(g[5]) - (1 << 16)) * y + int(g[1])
            if self.hdr["allow_high_precision_mv"]:
                mv = [round2signed(yc, 13), round2signed(xc, 13)]
            else:
                mv = [round2signed(yc, 14) * 2, round2signed(xc, 14) * 2]
        self.lower_mv_precision(mv)
        return mv

    def _cand_mv(self, mv_r, mv_c, lst):
        return [int(self.mvg[mv_r, mv_c, lst, 0]),
                int(self.mvg[mv_r, mv_c, lst, 1])]

    def search_stack(self, mv_r, mv_c, cand_list, weight):
        # [SPEC §7.10.2.3]
        cand_mode = int(self.mode[mv_r, mv_c])
        cand_size = int(self.bsizeg[mv_r, mv_c])
        large = min(BW4[cand_size], BH4[cand_size]) >= 2
        if (cand_mode in (GLOBALMV, GLOBAL_GLOBALMV)) and \
                self.gm_type[self.ref_frame[0]] > 1 and large:
            cand_mv = list(self.global_mvs[0])
        else:
            cand_mv = self._cand_mv(mv_r, mv_c, cand_list)
        self.lower_mv_precision(cand_mv)
        if has_newmv(cand_mode):
            self.new_mv_count += 1
        self.found_match = 1
        for idx in range(self.num_mv_found):
            if cand_mv == self.ref_mv_stack[idx][0]:
                self.weight_stack[idx] += weight
                return
        if self.num_mv_found < MAX_REF_MV_STACK_SIZE:
            self.ref_mv_stack[self.num_mv_found][0] = cand_mv
            self.weight_stack[self.num_mv_found] = weight
            self.num_mv_found += 1

    def compound_search_stack(self, mv_r, mv_c, weight):
        # [SPEC §7.10.2.4]
        cand_mode = int(self.mode[mv_r, mv_c])
        cand_size = int(self.bsizeg[mv_r, mv_c])
        large = min(BW4[cand_size], BH4[cand_size]) >= 2
        cand_mvs = []
        for i in range(2):
            if cand_mode == GLOBAL_GLOBALMV and \
                    self.gm_type[self.ref_frame[i]] > 1 and large:
                mv = list(self.global_mvs[i])
            else:
                mv = self._cand_mv(mv_r, mv_c, i)
            self.lower_mv_precision(mv)
            cand_mvs.append(mv)
        if has_newmv(cand_mode):
            self.new_mv_count += 1
        self.found_match = 1
        for idx in range(self.num_mv_found):
            if cand_mvs == self.ref_mv_stack[idx]:
                self.weight_stack[idx] += weight
                return
        if self.num_mv_found < MAX_REF_MV_STACK_SIZE:
            self.ref_mv_stack[self.num_mv_found] = [list(cand_mvs[0]),
                                                    list(cand_mvs[1])]
            self.weight_stack[self.num_mv_found] = weight
            self.num_mv_found += 1

    def add_ref_mv_candidate(self, mv_r, mv_c, is_compound, weight):
        if self.ref0g[mv_r, mv_c] <= INTRA_FRAME and \
                self.ref1g[mv_r, mv_c] <= INTRA_FRAME:
            return  # not inter (intrabc impossible in inter frames)
        if not is_compound:
            for cand_list in range(2):
                cand_ref = int((self.ref1g if cand_list else
                                self.ref0g)[mv_r, mv_c])
                if cand_ref == self.ref_frame[0]:
                    self.search_stack(mv_r, mv_c, cand_list, weight)
        else:
            if int(self.ref0g[mv_r, mv_c]) == self.ref_frame[0] and \
                    int(self.ref1g[mv_r, mv_c]) == self.ref_frame[1]:
                self.compound_search_stack(mv_r, mv_c, weight)

    def scan_row(self, delta_row, is_compound, max_row_offset, processed):
        # mirrors libaom scan_row_mbmi: len = min(curW, candW),
        # weight = max(2, inc) with processed-rows bookkeeping
        end4 = min(min(self.bw4, self.mi_cols - self.c0), 16)
        use_step16 = self.bw4 >= 16
        delta_col = 0
        if abs(delta_row) > 1:
            delta_col = 1
            if (self.c0 & 1) and self.bw4 < 2:
                delta_col -= 1
        i = 0
        while i < end4:
            mv_r = self.r0 + delta_row
            mv_c = self.c0 + delta_col + i
            if not self.is_inside(mv_r, mv_c):
                break
            cand = int(self.bsizeg[mv_r, mv_c])
            n4_w = BW4[cand]
            length = min(self.bw4, n4_w)
            if use_step16:
                length = max(4, length)
            elif abs(delta_row) > 1:
                length = max(2, length)
            weight = 2
            if 2 <= self.bw4 <= n4_w:
                inc = min(-max_row_offset + delta_row + 1, BH4[cand])
                weight = max(weight, inc)
                processed[0] = inc - delta_row - 1
            self.add_ref_mv_candidate(mv_r, mv_c, is_compound,
                                      length * weight)
            i += length

    def scan_col(self, delta_col, is_compound, max_col_offset, processed):
        end4 = min(min(self.bh4, self.mi_rows - self.r0), 16)
        use_step16 = self.bh4 >= 16
        delta_row = 0
        if abs(delta_col) > 1:
            delta_row = 1
            if (self.r0 & 1) and self.bh4 < 2:
                delta_row -= 1
        i = 0
        while i < end4:
            mv_r = self.r0 + delta_row + i
            mv_c = self.c0 + delta_col
            if not self.is_inside(mv_r, mv_c):
                break
            cand = int(self.bsizeg[mv_r, mv_c])
            n4_h = BH4[cand]
            length = min(self.bh4, n4_h)
            if use_step16:
                length = max(4, length)
            elif abs(delta_col) > 1:
                length = max(2, length)
            weight = 2
            if 2 <= self.bh4 <= n4_h:
                inc = min(-max_col_offset + delta_col + 1, BW4[cand])
                weight = max(weight, inc)
                processed[0] = inc - delta_col - 1
            self.add_ref_mv_candidate(mv_r, mv_c, is_compound,
                                      length * weight)
            i += length

    def scan_point(self, delta_row, delta_col, is_compound):
        mv_r = self.r0 + delta_row
        mv_c = self.c0 + delta_col
        if self.is_inside(mv_r, mv_c) and self.is_decoded(mv_r, mv_c):
            self.add_ref_mv_candidate(mv_r, mv_c, is_compound, 4)

    def find_mv_stack(self, is_compound):
        self.num_mv_found = 0
        self.new_mv_count = 0
        self.ref_mv_stack = [[[0, 0], [0, 0]]
                             for _ in range(MAX_REF_MV_STACK_SIZE)]
        self.weight_stack = [0] * MAX_REF_MV_STACK_SIZE
        self.global_mvs = [self.setup_global_mv(0), [0, 0]]
        if is_compound:
            self.global_mvs[1] = self.setup_global_mv(1)
        # offsets & weights per libaom setup_ref_mv_list
        row_adj = 1 if (self.bh4 < 2 and (self.r0 & 1)) else 0
        col_adj = 1 if (self.bw4 < 2 and (self.c0 & 1)) else 0
        max_row_offset = 0
        if self.avail_u:
            max_row_offset = (-4 if self.bh4 < 2 else -6) + row_adj
            max_row_offset = max(max_row_offset, -self.r0)
        max_col_offset = 0
        if self.avail_l:
            max_col_offset = (-4 if self.bw4 < 2 else -6) + col_adj
            max_col_offset = max(max_col_offset, -self.c0)
        proc_rows, proc_cols = [0], [0]
        self.found_match = 0
        if abs(max_row_offset) >= 1:
            self.scan_row(-1, is_compound, max_row_offset, proc_rows)
        found_above = self.found_match
        self.found_match = 0
        if abs(max_col_offset) >= 1:
            self.scan_col(-1, is_compound, max_col_offset, proc_cols)
        found_left = self.found_match
        self.found_match = 0
        if max(self.bw4, self.bh4) <= 16:
            self.scan_point(-1, self.bw4, is_compound)
            if self.found_match:
                found_above = 1
            self.found_match = 0
        close_matches = found_above + found_left
        num_nearest = self.num_mv_found
        num_new = self.new_mv_count
        if num_nearest > 0:
            for idx in range(num_nearest):
                self.weight_stack[idx] += REF_MV_WEIGHT_NEAREST
        self.zero_mv_ctx = 0
        if self.hdr["use_ref_frame_mvs"]:
            assert self.mctx is not None, "temporal MVP needs motion ctx"
            self.temporal_scan(is_compound)
        self.scan_point(-1, -1, is_compound)
        if self.found_match:
            found_above = 1
        self.found_match = 0
        for idx in (2, 3):
            row_offset = -(idx << 1) + 1 + row_adj
            col_offset = -(idx << 1) + 1 + col_adj
            if abs(row_offset) <= abs(max_row_offset) and \
                    abs(row_offset) > proc_rows[0]:
                self.scan_row(row_offset, is_compound, max_row_offset,
                              proc_rows)
                if self.found_match:
                    found_above = 1
                self.found_match = 0
            if abs(col_offset) <= abs(max_col_offset) and \
                    abs(col_offset) > proc_cols[0]:
                self.scan_col(col_offset, is_compound, max_col_offset,
                              proc_cols)
                if self.found_match:
                    found_left = 1
                self.found_match = 0
        total_matches = found_above + found_left
        self._sort(0, num_nearest)
        self._sort(num_nearest, self.num_mv_found)
        if self.num_mv_found < 2:
            self.extra_search(is_compound)
        # mode contexts [SPEC §7.10.2.13]
        if close_matches == 0:
            self.new_mv_ctx = min(total_matches, 1)
            self.ref_mv_ctx = total_matches
        elif close_matches == 1:
            self.new_mv_ctx = 3 - min(num_new, 1)
            self.ref_mv_ctx = 2 + total_matches
        else:
            self.new_mv_ctx = 5 - min(num_new, 1)
            self.ref_mv_ctx = 5
        # clamp [SPEC §7.10.2.14]
        mb_to_top = -(self.r0 * 32)
        mb_to_bottom = (self.mi_rows - self.bh4 - self.r0) * 32
        mb_to_left = -(self.c0 * 32)
        mb_to_right = (self.mi_cols - self.bw4 - self.c0) * 32
        border_row = MV_BORDER + self.bh4 * 32
        border_col = MV_BORDER + self.bw4 * 32
        for lst in range(1 + int(is_compound)):
            for idx in range(self.num_mv_found):
                mv = self.ref_mv_stack[idx][lst]
                mv[0] = max(mb_to_top - border_row,
                            min(mb_to_bottom + border_row, mv[0]))
                mv[1] = max(mb_to_left - border_col,
                            min(mb_to_right + border_col, mv[1]))
        # drl ctx
        self.drl_ctx = [0] * MAX_REF_MV_STACK_SIZE
        for idx in range(self.num_mv_found):
            z = 0
            if idx + 1 < self.num_mv_found:
                w0 = self.weight_stack[idx]
                w1 = self.weight_stack[idx + 1]
                if w0 >= REF_MV_WEIGHT_NEAREST:
                    z = 1 if w1 < REF_MV_WEIGHT_NEAREST else 0
                else:
                    z = 2
            self.drl_ctx[idx] = z

    def _sort(self, start, end):
        while end > start:
            new_end = start
            for idx in range(start + 1, end):
                if self.weight_stack[idx - 1] < self.weight_stack[idx]:
                    self.ref_mv_stack[idx - 1], self.ref_mv_stack[idx] = \
                        self.ref_mv_stack[idx], self.ref_mv_stack[idx - 1]
                    self.weight_stack[idx - 1], self.weight_stack[idx] = \
                        self.weight_stack[idx], self.weight_stack[idx - 1]
                    new_end = idx
            end = new_end

    def temporal_scan(self, is_compound):
        raise NotImplementedError("temporal MVP scan (wire mctx first)")

    def add_extra_mv_candidate(self, mv_r, mv_c, is_compound):
        # [SPEC §7.10.2.13]
        if is_compound:
            for cand_list in range(2):
                cand_ref = int((self.ref1g if cand_list else
                                self.ref0g)[mv_r, mv_c])
                if cand_ref <= INTRA_FRAME:
                    continue
                for lst in range(2):
                    cand_mv = self._cand_mv(mv_r, mv_c, cand_list)
                    if cand_ref == self.ref_frame[lst] and \
                            self.ref_id_count[lst] < 2:
                        self.ref_id_mvs[lst][self.ref_id_count[lst]] = \
                            cand_mv
                        self.ref_id_count[lst] += 1
                    elif self.ref_diff_count[lst] < 2:
                        if self.sign_bias[cand_ref] != \
                                self.sign_bias[self.ref_frame[lst]]:
                            cand_mv = [-cand_mv[0], -cand_mv[1]]
                        self.ref_diff_mvs[lst][self.ref_diff_count[lst]] = \
                            cand_mv
                        self.ref_diff_count[lst] += 1
        else:
            for cand_list in range(2):
                cand_ref = int((self.ref1g if cand_list else
                                self.ref0g)[mv_r, mv_c])
                if cand_ref <= INTRA_FRAME:
                    continue
                cand_mv = self._cand_mv(mv_r, mv_c, cand_list)
                if self.sign_bias[cand_ref] != \
                        self.sign_bias[self.ref_frame[0]]:
                    cand_mv = [-cand_mv[0], -cand_mv[1]]
                idx = 0
                while idx < self.num_mv_found and \
                        self.ref_mv_stack[idx][0] != cand_mv:
                    idx += 1
                if idx == self.num_mv_found and self.num_mv_found < 2:
                    self.ref_mv_stack[self.num_mv_found][0] = cand_mv
                    self.weight_stack[self.num_mv_found] = 2
                    self.num_mv_found += 1

    def extra_search(self, is_compound):
        # [SPEC §7.10.2.12]
        self.ref_id_count = [0, 0]
        self.ref_diff_count = [0, 0]
        self.ref_id_mvs = [[[0, 0], [0, 0]], [[0, 0], [0, 0]]]
        self.ref_diff_mvs = [[[0, 0], [0, 0]], [[0, 0], [0, 0]]]
        w4 = min(min(16, self.bw4), self.mi_cols - self.c0)
        h4 = min(min(16, self.bh4), self.mi_rows - self.r0)
        num4x4 = min(w4, h4)
        for pass_ in range(2):
            idx = 0
            while idx < num4x4 and self.num_mv_found < 2:
                if pass_ == 0:
                    mv_r, mv_c = self.r0 - 1, self.c0 + idx
                else:
                    mv_r, mv_c = self.r0 + idx, self.c0 - 1
                if not self.is_inside(mv_r, mv_c):
                    break
                self.add_extra_mv_candidate(mv_r, mv_c, is_compound)
                if pass_ == 0:
                    idx += BW4[int(self.bsizeg[mv_r, mv_c])]
                else:
                    idx += BH4[int(self.bsizeg[mv_r, mv_c])]
        if is_compound:
            combined = [[[0, 0], [0, 0]], [[0, 0], [0, 0]]]
            for lst in range(2):
                comp_count = 0
                for idx in range(self.ref_id_count[lst]):
                    if comp_count >= 2:
                        break
                    combined[comp_count][lst] = list(
                        self.ref_id_mvs[lst][idx])
                    comp_count += 1
                for idx in range(self.ref_diff_count[lst]):
                    if comp_count >= 2:
                        break
                    combined[comp_count][lst] = list(
                        self.ref_diff_mvs[lst][idx])
                    comp_count += 1
                while comp_count < 2:
                    combined[comp_count][lst] = list(self.global_mvs[lst])
                    comp_count += 1
            if self.num_mv_found == 1:
                if combined[0][0] == self.ref_mv_stack[0][0] and \
                        combined[0][1] == self.ref_mv_stack[0][1]:
                    self.ref_mv_stack[1] = [list(combined[1][0]),
                                            list(combined[1][1])]
                else:
                    self.ref_mv_stack[1] = [list(combined[0][0]),
                                            list(combined[0][1])]
                self.weight_stack[1] = 2
                self.num_mv_found = 2
            else:
                self.num_mv_found = 2
                for idx in range(2):
                    self.ref_mv_stack[idx] = [list(combined[idx][0]),
                                              list(combined[idx][1])]
                    self.weight_stack[idx] = 2
        else:
            for idx in range(self.num_mv_found, 2):
                self.ref_mv_stack[idx][0] = list(self.global_mvs[0])

    # --- MV decode [SPEC §5.11.31-33] ----------------------------------
    def assign_mv(self, is_compound):
        self.mv = [[0, 0], [0, 0]]
        for i in range(1 + int(is_compound)):
            comp_mode = get_sub_mode(self.ymode, i)
            if comp_mode == GLOBALMV:
                self.mv[i] = list(self.global_mvs[i])
                continue
            pos = 0 if comp_mode == NEARESTMV else self.ref_mv_idx
            if comp_mode == NEWMV and self.num_mv_found <= 1:
                pos = 0
            self.mv[i] = list(self.ref_mv_stack[pos][i])
            if comp_mode == NEWMV:
                self.read_mv(i)

    def read_mv(self, i):
        pred = self.mv[i]
        diff = [0, 0]
        self.read_tags.append((len(self.r.trace), 'mv'))
        joint = self.r.read_symbol(self.cdf["MvJoints"], 4)
        if joint in (2, 3):
            diff[0] = self.read_mv_component(0)
        if joint in (1, 3):
            diff[1] = self.read_mv_component(1)
        self.mv[i] = [pred[0] + diff[0], pred[1] + diff[1]]

    def read_mv_component(self, comp):
        c = self.nmv[comp]
        force_int = self.hdr["cur_frame_force_integer_mv"]
        allow_hp = self.hdr["allow_high_precision_mv"]
        sign = self.r.read_bool(c["MvSign"])
        mv_class = self.r.read_symbol(c["MvClasses"], 11)
        if mv_class == 0:
            int_bit = self.r.read_bool(c["MvClass0"])
            fr = 3 if force_int else self.r.read_symbol(
                c["MvClass0Fp"][int_bit], 4)
            hp = self.r.read_bool(c["MvClass0Hp"]) if allow_hp else 1
            mag = ((int_bit << 3) | (fr << 1) | hp) + 1
        else:
            d = 0
            for j in range(mv_class):
                d |= self.r.read_bool(c["MvBits"][j]) << j
            mag = 2 << (mv_class + 2)
            fr = 3 if force_int else self.r.read_symbol(c["MvFp"], 4)
            hp = self.r.read_bool(c["MvHp"]) if allow_hp else 1
            mag += ((d << 3) | (fr << 1) | hp) + 1
        return -mag if sign else mag

    # --- interintra / motion mode / compound / filter ------------------
    def read_interintra_mode(self, is_compound):
        self.interintra = 0
        if not self.skip_mode and \
                self.seq.get("enable_interintra_compound") and \
                not is_compound and 3 <= self.bsize <= 9 and \
                max(BW4[self.bsize], BH4[self.bsize]) <= 8:
            # bsize in BLOCK_8X8..BLOCK_32X32
            grp = SIZE_GROUP[self.bsize]
            if self.r.read_bool(self.cdf["InterIntra"][grp]):
                raise NotImplementedError("interintra decode")

    def read_motion_mode(self, is_compound):
        self.motion_mode = 0
        if self.skip_mode or not self.hdr["is_motion_mode_switchable"]:
            return
        raise NotImplementedError("motion mode decode (OBMC/warp)")

    def read_compound_type(self, r, c, bsize, is_compound):
        self.compound_type = 0
        self.comp_group_idx = 0
        self.compound_idx = 1
        if self.skip_mode:
            return
        if is_compound:
            raise NotImplementedError("compound type decode")

    def read_interpolation_filter(self, is_compound):
        hdr = self.hdr
        if hdr["cur_frame_force_integer_mv"] or (
                self.ymode in (GLOBALMV, GLOBAL_GLOBALMV) and
                self.gm_type[self.ref_frame[0]] == 1):
            pass  # still coded per spec only when switchable & needed
        if hdr["interpolation_filter"] != 4:  # not SWITCHABLE
            self.interp_filter = [hdr["interpolation_filter"]] * 2
            return
        if self.skip_mode or self.motion_mode == 2:
            self.interp_filter = [0, 0]
            return
        # [SPEC §5.11.28 read_interpolation_filter]
        if not self._needs_interp_filter():
            self.interp_filter = [0, 0]
            return
        n_dir = 2 if self.seq.get("enable_dual_filter") else 1
        self.interp_filter = [0, 0]
        for d in range(n_dir):
            ctx = ((d & 1) * 2 + int(self.ref_frame[1] > INTRA_FRAME)) * 4
            left_type = 3
            above_type = 3
            r, c = self.r0, self.c0
            if self.avail_l:
                if int(self.ref0g[r, c - 1]) == self.ref_frame[0] or \
                        int(self.ref1g[r, c - 1]) == self.ref_frame[0]:
                    left_type = int(self.interpg[r, c - 1, d])
            if self.avail_u:
                if int(self.ref0g[r - 1, c]) == self.ref_frame[0] or \
                        int(self.ref1g[r - 1, c]) == self.ref_frame[0]:
                    above_type = int(self.interpg[r - 1, c, d])
            if left_type == above_type:
                ctx += left_type
            elif left_type == 3:
                ctx += above_type
            elif above_type == 3:
                ctx += left_type
            else:
                ctx += 3
            self.read_tags.append((len(self.r.trace), f'interp@{r},{c}'))
            self.interp_filter[d] = self.r.read_symbol(
                self.cdf["SwitchableInterp"][ctx], 3)
        if n_dir == 1:
            self.interp_filter[1] = self.interp_filter[0]

    def _needs_interp_filter(self):
        # large == Min(Block_Width, Block_Height) >= 8
        large = min(BW4[self.bsize], BH4[self.bsize]) >= 2
        if self.ymode in (GLOBALMV, GLOBAL_GLOBALMV):
            return large and self.gm_type[self.ref_frame[0]] == 1
        if self.ymode == GLOBAL_GLOBALMV:
            return large and (self.gm_type[self.ref_frame[0]] == 1 or
                              self.gm_type[self.ref_frame[1]] == 1)
        return True

    # ------------------------------------------------------------------
    # var-tx size tree [SPEC §5.11.47]
    # ------------------------------------------------------------------
    def read_inter_tx_sizes(self, r, c, bsize):
        bw4, bh4 = BW4[bsize], BH4[bsize]
        max_tx = MAXRECT[bsize]
        if self.hdr["coded_lossless"]:
            self.inter_tx_szg[r: r + bh4, c: c + bw4] = 0
            return
        if self.hdr["tx_mode"] == 2 and bsize > 0 and not self.skip:
            tx_w4, tx_h4 = TXW4[max_tx], TXH4[max_tx]
            for row in range(0, bh4, tx_h4):
                for col in range(0, bw4, tx_w4):
                    self.read_var_tx_size(row, col, max_tx, 0)
        else:
            tx = 0 if self.hdr["tx_mode"] == 0 else max_tx
            self.inter_tx_szg[r: r + bh4, c: c + bw4] = tx
            for i in range(bw4):
                if c + i < self.mi_cols:
                    self.above_tx[c + i] = BW4[bsize] * 4
            for i in range(bh4):
                if r + i < self.mi_rows:
                    self.left_tx[r + i] = BH4[bsize] * 4

    def read_var_tx_size(self, row, col, tx_sz, depth):
        r, c = self.r0, self.c0
        if r + row >= self.mi_rows or c + col >= self.mi_cols:
            return
        if tx_sz == 0 or depth == MAX_VARTX_DEPTH:
            split = 0
        else:
            # ctx [SPEC get txfm_split ctx]
            above = int(int(self.above_tx[c + col]) < TXW4[tx_sz] * 4)
            left = int(int(self.left_tx[r + row]) < TXH4[tx_sz] * 4)
            size = min(64, max(BW4[self.bsize] * 4, BH4[self.bsize] * 4))
            max_tx_sz = {4: 0, 8: 1, 16: 2, 32: 3, 64: 4}[size]
            ctx = (int(TSQRUP[tx_sz] != max_tx_sz) * 3 +
                   (5 - 1 - max_tx_sz) * 6 + above + left)
            self.read_tags.append(
                (len(self.r.trace), f'txfm_split@{r+row},{c+col}'))
            split = self.r.read_bool(self.cdf["TxfmPartition"][ctx])
        if split:
            sub = SPLIT_TX[tx_sz]
            step_w, step_h = TXW4[sub], TXH4[sub]
            for i in range(0, TXH4[tx_sz], step_h):
                for j in range(0, TXW4[tx_sz], step_w):
                    self.read_var_tx_size(row + i, col + j, sub, depth + 1)
        else:
            h4, w4 = TXH4[tx_sz], TXW4[tx_sz]
            self.inter_tx_szg[r + row: r + row + h4,
                              c + col: c + col + w4] = tx_sz
            for i in range(w4):
                if c + col + i < self.mi_cols:
                    self.above_tx[c + col + i] = TXW4[tx_sz] * 4
            for i in range(h4):
                if r + row + i < self.mi_rows:
                    self.left_tx[r + row + i] = TXH4[tx_sz] * 4

    # ------------------------------------------------------------------
    # inter residual walk [SPEC §5.11.34-36]
    # ------------------------------------------------------------------
    def residual_inter(self, r, c, bsize, has_chroma):
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
                    sx = self.sub_x if plane else 0
                    sy = self.sub_y if plane else 0
                    psz = SS[size_chunk] if plane else size_chunk
                    n4w, n4h = BW4[psz], BH4[psz]
                    base_x = (mc >> sx) * 4
                    base_y = (mr >> sy) * 4
                    if plane == 0 and not self.hdr["coded_lossless"]:
                        self.transform_tree(base_x, base_y, n4w * 4,
                                            n4h * 4, r, c)
                        continue
                    if plane == 0:
                        tsz = 0
                    else:
                        pb = SS[bsize] if (self.sub_x and self.sub_y) \
                            else bsize
                        tsz = MAXRECT[pb]
                        if TXW4[tsz] == 16 or TXH4[tsz] == 16:
                            tsz = 9 if TXW4[tsz] == 4 else 10 if \
                                TXH4[tsz] == 4 else 3
                        if self.hdr["coded_lossless"]:
                            tsz = 0
                    step_x, step_y = TXW4[tsz], TXH4[tsz]
                    for yy in range(0, n4h, step_y):
                        for xx in range(0, n4w, step_x):
                            sx0 = base_x + 4 * xx
                            sy0 = base_y + 4 * yy
                            if sx0 >= ((self.mi_cols * 4) >> sx) or \
                               sy0 >= ((self.mi_rows * 4) >> sy):
                                continue
                            self.cur_avail = self.avail_bits(
                                plane, sx0, sy0, tsz, xx, yy, sx, sy)
                            if self.skip:
                                self.set_ctx(plane, sx0 >> 2, sy0 >> 2,
                                             TXW4[tsz], TXH4[tsz], 0)
                                self.tx_records += [
                                    plane, sx0 >> 2, sy0 >> 2, tsz, 0, 0,
                                    -1, r * self.mi_cols + c,
                                    self.cur_avail]
                            else:
                                self.read_coeffs(plane, sx0, sy0, tsz,
                                                 bsize, 0, 0, -1,
                                                 r * self.mi_cols + c)

    def transform_tree(self, start_x, start_y, w, h, br, bc):
        # [SPEC §5.11.36] luma inter txs follow the var-tx tree
        max_x = self.mi_cols * 4
        max_y = self.mi_rows * 4
        if start_x >= max_x or start_y >= max_y:
            return
        row = start_y >> 2
        col = start_x >> 2
        tsz = int(self.inter_tx_szg[row, col])
        lw, lh = TXW4[tsz] * 4, TXH4[tsz] * 4
        if lw == w and lh == h:
            self.cur_avail = self.avail_bits(
                0, start_x, start_y, tsz, (start_x >> 2) - self.c0,
                (start_y >> 2) - self.r0, 0, 0)
            if self.skip:
                self.set_ctx(0, start_x >> 2, start_y >> 2, TXW4[tsz],
                             TXH4[tsz], 0)
                self.tx_records += [0, start_x >> 2, start_y >> 2, tsz, 0,
                                    0, -1, br * self.mi_cols + bc,
                                    self.cur_avail]
            else:
                self.read_coeffs(0, start_x, start_y, tsz, self.bsize, 0,
                                 0, -1, br * self.mi_cols + bc)
            return
        if w > h:
            self.transform_tree(start_x, start_y, w // 2, h, br, bc)
            self.transform_tree(start_x + w // 2, start_y, w // 2, h,
                                br, bc)
        elif w < h:
            self.transform_tree(start_x, start_y, w, h // 2, br, bc)
            self.transform_tree(start_x, start_y + h // 2, w, h // 2,
                                br, bc)
        else:
            self.transform_tree(start_x, start_y, w // 2, h // 2, br, bc)
            self.transform_tree(start_x + w // 2, start_y, w // 2, h // 2,
                                br, bc)
            self.transform_tree(start_x, start_y + h // 2, w // 2, h // 2,
                                br, bc)
            self.transform_tree(start_x + w // 2, start_y + h // 2,
                                w // 2, h // 2, br, bc)

    # ------------------------------------------------------------------
    # tx types for inter [SPEC §5.11.48 / §8.3.2]
    # ------------------------------------------------------------------
    def read_tx_type(self, plane, tsz, ymode, uv_mode, fi_mode):
        if not getattr(self, "cur_is_inter", False):
            return MiniDecoder.read_tx_type(self, plane, tsz, ymode,
                                            uv_mode, fi_mode)
        hdr = self.hdr
        sqrup = TSQRUP[tsz]
        # inter tx set [libaom av1_get_ext_tx_set_type]
        if sqrup > 3:
            st = 0
        elif hdr["reduced_tx_set"] or sqrup == 3:
            st = 3
        elif TSQR[tsz] == 2:
            st = 4
        else:
            st = 5
        # st here = EXT_TX_INV key: 3->INTER_3, 4->INTER_2, 5->INTER_1
        if plane:
            if st == 0 or hdr["coded_lossless"]:
                return 0
            # chroma copies the co-located luma tx type [SPEC §8.3.2]:
            # luma coords = chroma coords << subsampling, clamped to the
            # block origin (sub-8x8 chroma pairs sit above/left of it)
            r_l = max(self.r0, self._cur_sy0 << self.sub_y)
            c_l = max(self.c0, self._cur_sx0 << self.sub_x)
            t = int(self.txtypeg[min(r_l, self.mi_rows - 1),
                                 min(c_l, self.mi_cols - 1)])
            if t not in EXT_TX_INV[st]:
                t = 0
            return t
        if st == 0 or hdr["quant"]["base_q_idx"] == 0 or \
                hdr["coded_lossless"]:
            return 0
        set_idx = {3: 3, 4: 2, 5: 1}[st]
        nsym = len(EXT_TX_INV[st])
        self.read_tags.append((len(self.r.trace), 'inter_tx_type'))
        sym = self.r.read_symbol(
            self.cdf["InterExtTx"][set_idx][TSQR[tsz]], nsym)
        return EXT_TX_INV[st][sym]

    def read_coeffs(self, plane, sx, sy, tsz, bsize, ymode, uv_mode,
                    fi_mode, mi=0):
        self._cur_sx0 = sx >> 2
        self._cur_sy0 = sy >> 2
        n_before = len(self.tx_records)
        MiniDecoder.read_coeffs(self, plane, sx, sy, tsz, bsize, ymode,
                                uv_mode, fi_mode, mi)
        # record luma tx types for chroma derivation (inter blocks)
        if plane == 0 and getattr(self, "cur_is_inter", False):
            rec = self.tx_records[n_before:]
            tx_type = rec[4] if len(rec) >= 9 else 0
            h4, w4 = TXH4[tsz], TXW4[tsz]
            r0, c0 = sy >> 2, sx >> 2
            self.txtypeg[r0: r0 + h4, c0: c0 + w4] = tx_type

    def txb_skip_ctx(self, plane, tsz, x4, y4, w4, h4, bsize):
        if plane == 0 and getattr(self, "cur_is_inter", False):
            # inter luma: plane bsize vs tx dims rule is identical but the
            # bsize passed is the block size (not chunked) — reuse
            return MiniDecoder.txb_skip_ctx(self, plane, tsz, x4, y4, w4,
                                            h4, bsize)
        return MiniDecoder.txb_skip_ctx(self, plane, tsz, x4, y4, w4, h4,
                                        bsize)

    # ------------------------------------------------------------------
    # full plans duck-typing (recon-compatible)
    # ------------------------------------------------------------------
    @property
    def warps(self):
        return np.zeros((0, 8), np.int64)

    def grid(self, name):
        zeros = np.zeros((self.mi_rows, self.mi_cols), np.int64)
        own = {
            "is_inter": self.is_interg,
            "ref0": self.ref0g,
            "ref1": self.ref1g,
            "mv0y": self.mvg[:, :, 0, 0], "mv0x": self.mvg[:, :, 0, 1],
            "mv1y": self.mvg[:, :, 1, 0], "mv1x": self.mvg[:, :, 1, 1],
            "interp": self.interpg[:, :, 0] | (self.interpg[:, :, 1] << 4),
            "motion_mode": self.motion_modeg,
            "compound_type": zeros,
            "wedge": zeros,
            "interintra": zeros,
            "ii_wedge": zeros,
            "intrabc": zeros,
            "skip_mode": self.skip_modeg,
            "tx_size": self.inter_tx_szg,
        }
        if name in own:
            return own[name]
        return MiniDecoder.grid(self, name)
