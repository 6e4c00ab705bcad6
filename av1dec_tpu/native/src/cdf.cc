// CDF context initialization from the recovered default tables.
// [SPEC §7.20: init_non_coeff_cdfs resets to the §9 defaults;
//  init_coeff_cdfs picks the quantizer-context defaults]
#include "cdf.h"

#include <cstring>
#include <initializer_list>

#include "cdf_tables.inc"

namespace av1 {

#define CP(dst, src) \
  static_assert(sizeof(dst) == sizeof(src), "size mismatch"); \
  std::memcpy(dst, src, sizeof(dst))

void init_non_coeff_cdfs(CdfContext* c) {
  CP(c->partition, kDefaultPartition);
  CP(c->kf_y_mode, kDefaultKfYMode);
  CP(c->if_y_mode, kDefaultIfYMode);
  CP(c->uv_mode, kDefaultUvMode);
  CP(c->angle_delta, kDefaultAngleDelta);
  CP(c->intra_ext_tx, kDefaultIntraExtTx);
  CP(c->inter_ext_tx, kDefaultInterExtTx);
  CP(c->cfl_sign, kDefaultCflSign);
  CP(c->cfl_alpha, kDefaultCflAlpha);
  CP(c->filter_intra_mode, kDefaultFilterIntraMode);
  CP(c->filter_intra, kDefaultFilterIntra);
  CP(c->switchable_interp, kDefaultSwitchableInterp);
  CP(c->newmv, kDefaultNewMv);
  CP(c->zeromv, kDefaultZeroMv);
  CP(c->refmv, kDefaultRefMv);
  CP(c->drl, kDefaultDrl);
  CP(c->inter_compound_mode, kDefaultInterCompoundMode);
  CP(c->interintra, kDefaultInterIntra);
  CP(c->interintra_mode, kDefaultInterIntraMode);
  CP(c->wedge_interintra, kDefaultWedgeInterIntra);
  CP(c->compound_type, kDefaultCompoundType);
  CP(c->wedge_idx, kDefaultWedgeIdx);
  CP(c->motion_mode, kDefaultMotionMode);
  CP(c->obmc, kDefaultObmc);
  CP(c->intra_inter, kDefaultIntraInter);
  CP(c->comp_inter, kDefaultCompInter);
  CP(c->comp_ref_type, kDefaultCompRefType);
  CP(c->uni_comp_ref, kDefaultUniCompRef);
  CP(c->single_ref, kDefaultSingleRef);
  CP(c->comp_ref, kDefaultCompRef);
  CP(c->comp_bwdref, kDefaultCompBwdRef);
  CP(c->comp_group_idx, kDefaultCompGroupIdx);
  CP(c->compound_idx, kDefaultCompoundIdx);
  CP(c->palette_y_size, kDefaultPaletteYSize);
  CP(c->palette_uv_size, kDefaultPaletteUvSize);
  CP(c->palette_y_mode, kDefaultPaletteYMode);
  CP(c->palette_uv_mode, kDefaultPaletteUvMode);
  CP(c->palette_y_color, kDefaultPaletteYColorIdx);
  CP(c->palette_uv_color, kDefaultPaletteUvColorIdx);
  CP(c->txfm_partition, kDefaultTxfmPartition);
  CP(c->skip, kDefaultSkip);
  CP(c->skip_mode, kDefaultSkipMode);
  CP(c->segment_id, kDefaultSegmentId);
  CP(c->segment_pred, kDefaultSegmentPred);
  CP(c->tx_size, kDefaultTxSize);
  CP(c->delta_q, kDefaultDeltaQ);
  CP(c->delta_lf, kDefaultDeltaLf);
  CP(c->delta_lf_multi, kDefaultDeltaLfMulti);
  CP(c->intrabc, kDefaultIntraBc);
  CP(c->restore_wiener, kDefaultWienerRestore);
  CP(c->restore_sgrproj, kDefaultSgrprojRestore);
  CP(c->restore_switchable, kDefaultSwitchableRestore);
  for (MvCdf* m : {&c->mv, &c->dv}) {
    CP(m->joints, kDefaultMvJoints);
    for (int i = 0; i < 2; i++) {
      CP(m->comp[i].classes, kDefaultMvClasses);
      CP(m->comp[i].class0_fp, kDefaultMvClass0Fp);
      CP(m->comp[i].fp, kDefaultMvFp);
      CP(m->comp[i].sign, kDefaultMvSign);
      CP(m->comp[i].class0_hp, kDefaultMvClass0Hp);
      CP(m->comp[i].hp, kDefaultMvHp);
      CP(m->comp[i].class0, kDefaultMvClass0);
      CP(m->comp[i].bits, kDefaultMvBits);
    }
  }
}

void init_coeff_cdfs(CdfContext* c, int base_q_idx) {
  // quantizer context [SPEC §7.20]: <=20 -> 0, <=60 -> 1, <=120 -> 2, else 3
  int q = base_q_idx <= 20 ? 0 : base_q_idx <= 60 ? 1 : base_q_idx <= 120 ? 2
                                                                          : 3;
  CP(c->txb_skip, kDefaultTxbSkip[q]);
  CP(c->eob_extra, kDefaultEobExtra[q]);
  CP(c->dc_sign, kDefaultDcSign[q]);
  CP(c->eob_pt_16, kDefaultEobPt16[q]);
  CP(c->eob_pt_32, kDefaultEobPt32[q]);
  CP(c->eob_pt_64, kDefaultEobPt64[q]);
  CP(c->eob_pt_128, kDefaultEobPt128[q]);
  CP(c->eob_pt_256, kDefaultEobPt256[q]);
  CP(c->eob_pt_512, kDefaultEobPt512[q]);
  CP(c->eob_pt_1024, kDefaultEobPt1024[q]);
  CP(c->coeff_base_eob, kDefaultCoeffBaseEob[q]);
  CP(c->coeff_base, kDefaultCoeffBase[q]);
  CP(c->coeff_br, kDefaultCoeffBr[q]);
}

#undef CP

namespace {

// Reset one CDF row's adaptation counter: rows are laid out as
// (probs..., terminal 0, counter, padding); the counter directly follows
// the first zero (the terminal).  [libaom av1_reset_cdf_symbol_counters]
template <size_t N>
void rst(uint16_t (&row)[N]) {
  for (size_t i = 0; i + 1 < N; i++) {
    if (row[i] == 0) {
      row[i + 1] = 0;
      break;
    }
  }
}

template <typename T, size_t N>
void rst(T (&arr)[N]) {
  for (auto& sub : arr) rst(sub);
}

}  // namespace

void reset_cdf_counters(CdfContext* c) {
  rst(c->partition);
  rst(c->kf_y_mode);
  rst(c->if_y_mode);
  rst(c->uv_mode);
  rst(c->angle_delta);
  rst(c->intra_ext_tx);
  rst(c->inter_ext_tx);
  rst(c->cfl_sign);
  rst(c->cfl_alpha);
  rst(c->filter_intra_mode);
  rst(c->filter_intra);
  rst(c->switchable_interp);
  rst(c->newmv);
  rst(c->zeromv);
  rst(c->refmv);
  rst(c->drl);
  rst(c->inter_compound_mode);
  rst(c->interintra);
  rst(c->interintra_mode);
  rst(c->wedge_interintra);
  rst(c->compound_type);
  rst(c->wedge_idx);
  rst(c->motion_mode);
  rst(c->obmc);
  rst(c->intra_inter);
  rst(c->comp_inter);
  rst(c->comp_ref_type);
  rst(c->uni_comp_ref);
  rst(c->single_ref);
  rst(c->comp_ref);
  rst(c->comp_bwdref);
  rst(c->comp_group_idx);
  rst(c->compound_idx);
  rst(c->palette_y_size);
  rst(c->palette_uv_size);
  rst(c->palette_y_mode);
  rst(c->palette_uv_mode);
  rst(c->palette_y_color);
  rst(c->palette_uv_color);
  rst(c->txfm_partition);
  rst(c->skip);
  rst(c->skip_mode);
  rst(c->segment_id);
  rst(c->segment_pred);
  rst(c->tx_size);
  rst(c->delta_q);
  rst(c->delta_lf);
  rst(c->delta_lf_multi);
  rst(c->intrabc);
  rst(c->restore_wiener);
  rst(c->restore_sgrproj);
  rst(c->restore_switchable);
  for (MvCdf* m : {&c->mv, &c->dv}) {
    rst(m->joints);
    for (int i = 0; i < 2; i++) {
      rst(m->comp[i].classes);
      rst(m->comp[i].class0_fp);
      rst(m->comp[i].fp);
      rst(m->comp[i].sign);
      rst(m->comp[i].class0_hp);
      rst(m->comp[i].hp);
      rst(m->comp[i].class0);
      rst(m->comp[i].bits);
    }
  }
  rst(c->txb_skip);
  rst(c->eob_extra);
  rst(c->dc_sign);
  rst(c->eob_pt_16);
  rst(c->eob_pt_32);
  rst(c->eob_pt_64);
  rst(c->eob_pt_128);
  rst(c->eob_pt_256);
  rst(c->eob_pt_512);
  rst(c->eob_pt_1024);
  rst(c->coeff_base_eob);
  rst(c->coeff_base);
  rst(c->coeff_br);
}

}  // namespace av1
