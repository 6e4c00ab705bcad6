// Runtime CDF context: all adaptive symbol CDFs for one tile/frame.
// Layout mirrors the default tables [SPEC §9]; each cdf row is
// (probs..., terminal 0, adaptation counter) — see msac.h.
#pragma once

#include <cstdint>

namespace av1 {

struct MvComponentCdf {
  uint16_t classes[12];
  uint16_t class0_fp[2][5];
  uint16_t fp[5];
  uint16_t sign[3];
  uint16_t class0_hp[3];
  uint16_t hp[3];
  uint16_t class0[3];
  uint16_t bits[10][3];
};

struct MvCdf {
  uint16_t joints[5];
  MvComponentCdf comp[2];
};

struct CdfContext {
  // partition / modes
  uint16_t partition[20][11];
  uint16_t kf_y_mode[5][5][14];
  uint16_t if_y_mode[4][14];
  uint16_t uv_mode[2][13][15];
  uint16_t angle_delta[8][8];
  uint16_t intra_ext_tx[3][4][13][17];
  uint16_t inter_ext_tx[4][4][17];
  uint16_t cfl_sign[9];
  uint16_t cfl_alpha[6][17];
  uint16_t filter_intra_mode[6];
  uint16_t filter_intra[22][3];
  uint16_t switchable_interp[16][4];
  // inter mode
  uint16_t newmv[6][3];
  uint16_t zeromv[2][3];
  uint16_t refmv[6][3];
  uint16_t drl[3][3];
  uint16_t inter_compound_mode[8][9];
  uint16_t interintra[4][3];
  uint16_t interintra_mode[4][5];
  uint16_t wedge_interintra[22][3];
  uint16_t compound_type[22][3];
  uint16_t wedge_idx[22][17];
  uint16_t motion_mode[22][4];
  uint16_t obmc[22][3];
  uint16_t intra_inter[4][3];
  uint16_t comp_inter[5][3];
  uint16_t comp_ref_type[5][3];
  uint16_t uni_comp_ref[3][3][3];
  uint16_t single_ref[3][6][3];
  uint16_t comp_ref[3][3][3];
  uint16_t comp_bwdref[3][2][3];
  uint16_t comp_group_idx[6][3];
  uint16_t compound_idx[6][3];
  // palette
  uint16_t palette_y_size[7][8];
  uint16_t palette_uv_size[7][8];
  uint16_t palette_y_mode[7][3][3];
  uint16_t palette_uv_mode[2][3];
  uint16_t palette_y_color[7][5][9];
  uint16_t palette_uv_color[7][5][9];
  // block level
  uint16_t txfm_partition[21][3];
  uint16_t skip[3][3];
  uint16_t skip_mode[3][3];
  uint16_t segment_id[3][9];
  uint16_t segment_pred[3][3];
  uint16_t tx_size[4][3][4];
  uint16_t delta_q[5];
  uint16_t delta_lf[5];
  uint16_t delta_lf_multi[4][5];
  uint16_t intrabc[3];
  // loop restoration
  uint16_t restore_wiener[3];
  uint16_t restore_sgrproj[3];
  uint16_t restore_switchable[4];
  // motion vectors (frame mv + intrabc dv)
  MvCdf mv;
  MvCdf dv;
  // coefficients (q-context selected at init_coeff_cdfs)
  uint16_t txb_skip[5][13][3];
  uint16_t eob_extra[5][2][9][3];
  uint16_t dc_sign[2][3][3];
  uint16_t eob_pt_16[2][2][6];
  uint16_t eob_pt_32[2][2][7];
  uint16_t eob_pt_64[2][2][8];
  uint16_t eob_pt_128[2][2][9];
  uint16_t eob_pt_256[2][2][10];
  uint16_t eob_pt_512[2][2][11];
  uint16_t eob_pt_1024[2][2][12];
  uint16_t coeff_base_eob[5][2][4][4];
  uint16_t coeff_base[5][2][42][5];
  uint16_t coeff_br[5][2][21][5];
};

// [SPEC §7.20 init_non_coeff_cdfs / init_coeff_cdfs]
void init_non_coeff_cdfs(CdfContext* c);
void init_coeff_cdfs(CdfContext* c, int base_q_idx);
// zero every CDF's adaptation counter (applied to the frame-end context
// before it is saved for later frames) [libaom av1_reset_cdf_symbol_counters]
void reset_cdf_counters(CdfContext* c);

}  // namespace av1
