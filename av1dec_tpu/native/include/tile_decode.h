// Tile decoder: entropy-decodes one tile into plan tensors. [SPEC §5.11]
#pragma once

#include <cstdint>
#include <vector>

#include "cdf.h"
#include "decoder.h"
#include "msac.h"
#include "plans.h"

namespace av1 {

// Frame-level motion context shared by all tiles of one inter frame:
// temporal motion field (libaom tpl_mvs layout: one (mv, ref_offset) per
// 8x8 cell [SPEC §7.9]), order hints, sign bias, and the previous frame's
// segment-id map for predictive coding [SPEC §5.11.12].
struct FrameMotionContext {
  std::vector<int16_t> tpl_mv;   // [h8 * w8 * 2] (row, col); INT16_MIN=inval
  std::vector<int16_t> tpl_off;  // [h8 * w8] ref_frame_offset
  int w8 = 0, h8 = 0;
  int order_hints[8] = {};       // OrderHints[1..7] = ref slots' hints
  int ref_sign_bias[8] = {};     // RefFrameSignBias [SPEC §7.8]
  int ref_width[8] = {};         // per LAST..ALTREF: upscaled width/height
  int ref_height[8] = {};        //   (for is_scaled) [SPEC §7.11.3.3]
  const uint8_t* prev_seg_ids = nullptr;  // PrevSegmentIds or null
};

// motion_field.cc
struct DecoderState;
void setup_motion_context(DecoderState* st, FrameMotionContext* m);
void store_frame_motion(DecoderState* st, const FramePlans& plans);

class TileDecoder {
 public:
  TileDecoder(const SequenceHeader& seq, const FrameHeader& hdr,
              CdfContext* cdf, FramePlans* plans);
  int decode_tile(const uint8_t* data, size_t size, int tile_row,
                  int tile_col);
  void set_cdf(CdfContext* cdf) { cdf_ = cdf; }
  void set_motion_ctx(const FrameMotionContext* m) { mctx_ = m; }
  Msac& reader() { return r_; }

 private:
  // partition / block
  int decode_partition(int r, int c, int bSize);
  int decode_block(int r, int c, int bSize);
  uint16_t gather_partition_prob(int ctx, int bSize, bool vert);
  // mode info
  int intra_frame_mode_info();
  void intra_segment_id();
  void read_segment_id(bool skip);
  void read_skip();
  void read_cdef();
  void read_delta_qindex();
  void read_delta_lf();
  int read_delta_abs(uint16_t* cdf, int nsyms);
  void intra_angle_info_y();
  void intra_angle_info_uv();
  void read_cfl_alphas();
  void filter_intra_mode_info();
  int block_qindex() const;
  int base_qindex_for_segment() const;  // get_qindex(1, seg)
  // palette
  void palette_mode_info();
  void read_palette_colors_y();
  void read_palette_colors_uv();
  void palette_tokens();
  int get_palette_cache(int plane, uint16_t* cache);
  const PaletteRecord* palette_at(int r, int c) const;
  // inter mode info (inter.cc) [SPEC §5.11.15-5.11.33]
  int inter_frame_mode_info();
  void inter_segment_id(int preSkip);
  int get_segment_id_pred() const;
  void read_skip_mode();
  void read_is_inter();
  int intra_block_mode_info();
  int inter_block_mode_info();
  void read_ref_frames();
  void find_mv_stack(bool isCompound);
  void scan_row(int deltaRow, bool isCompound, int maxRowOffset,
                int* processedRows);
  void scan_col(int deltaCol, bool isCompound, int maxColOffset,
                int* processedCols);
  void scan_point(int deltaRow, int deltaCol, bool isCompound);
  void add_ref_mv_candidate(int mvRow, int mvCol, bool isCompound,
                            int weight);
  void search_stack(int mvRow, int mvCol, int candList, int weight);
  void compound_search_stack(int mvRow, int mvCol, int weight);
  void temporal_scan();
  void add_tpl_ref_mv(int deltaRow, int deltaCol);
  void extra_search();
  void add_extra_mv_candidate(int mvRow, int mvCol);
  void sorting(int start, int end);
  void setup_global_mv(int refList, int16_t* mv) const;
  void lower_mv_precision(int16_t* mv) const;
  int rel_dist(int a, int b) const {  // [SPEC §5.9.3]
    if (!seq_.enable_order_hint) return 0;
    int diff = a - b;
    int m = 1 << (seq_.order_hint_bits - 1);
    return (diff & (m - 1)) - (diff & m);
  }
  bool is_inside(int mvRow, int mvCol) const;
  bool is_decoded(int mvRow, int mvCol) const;
  int read_drl_idx();
  int assign_mv(bool isCompound);
  int read_mv(int ref);
  int read_mv_component(int comp, bool use_dv);
  void read_interintra_mode(bool isCompound);
  void read_motion_mode(bool isCompound);
  void read_compound_type(bool isCompound);
  void read_interp_filter();
  bool has_overlappable_candidates() const;
  void find_warp_samples();
  void add_warp_sample(int deltaRow, int deltaCol);
  void add_warp_sample_c(int deltaRow, int deltaCol, int centerRow,
                         int centerCol);
  void warp_estimation();
  int read_segment_id_inter();
  // var-tx [SPEC §5.11.16]
  void read_var_tx_size(int row, int col, int txSz, int depth);
  void set_txfm_ctx_block(int txw_px, int txh_px);
  // tx
  void read_block_tx_size();
  int get_uv_tx_size() const;
  int read_tx_type(int plane, int txSz, int x4, int y4, int* out_type);
  // residual
  void residual();
  void transform_block(int plane, int baseX, int baseY, int txSz, int x,
                       int y);
  int coeffs(int plane, int startX, int startY, int txSz, int* out_tx_type,
             size_t* out_coef_off);
  void set_coeff_contexts(int plane, int x4, int y4, int w4, int h4,
                          uint8_t v);
  int get_txb_skip_ctx(int plane, int txSz, int x4, int y4, int w4, int h4);
  int get_dc_sign_ctx(int plane, int x4, int y4, int w4, int h4);
  static int get_coeff_base_ctx(const uint8_t* levels, int pos, int bwl,
                                int stride, int txClass, int realW,
                                int realH);
  static int get_br_ctx(const uint8_t* levels, int pos, int bwl, int stride,
                        int txClass);
  // loop restoration
  void read_lr(int r, int c, int bSize);
  void read_lr_unit(int plane, int unitRow, int unitCol);
  int decode_subexp_bool(int numSyms, int k);
  int decode_signed_subexp_with_ref_bool(int low, int high, int k, int ref);

  const SequenceHeader& seq_;
  const FrameHeader& hdr_;
  CdfContext* cdf_;
  FramePlans* plans_;
  Msac r_;

  int mi_rows_ = 0, mi_cols_ = 0;
  int mi_row_start_ = 0, mi_row_end_ = 0;
  int mi_col_start_ = 0, mi_col_end_ = 0;

  // current block state
  int mi_row_ = 0, mi_col_ = 0, bsize_ = 0, bw4_ = 0, bh4_ = 0;
  bool avail_u_ = false, avail_l_ = false, has_chroma_ = false;
  bool avail_u_chroma_ = false, avail_l_chroma_ = false;
  int y_mode_ = 0, uv_mode_ = 0;
  int angle_delta_y_ = 0, angle_delta_uv_ = 0;
  int skip_ = 0, segment_id_ = 0, use_intrabc_ = 0;
  int cfl_alpha_idx_ = 0, cfl_signs_ = 0;
  int filter_intra_mode_ = -1;
  int palette_size_[2] = {0, 0};
  int palette_colors_[3][8] = {};
  int cur_palette_ = -1;
  int tx_size_ = 0;

  // ---- inter state ----
  const FrameMotionContext* mctx_ = nullptr;
  int is_inter_ = 0, skip_mode_ = 0;
  int ref_frame_[2] = {0, -1};       // RefFrame[0/1] (spec enums)
  int16_t mv_[2][2] = {};            // Mv[list][row,col] (1/8 pel)
  int y_mode_is_inter_ = 0;
  int interp_filter_[2] = {0, 0};    // [vert? no: 0=horz-dir ctx order]
  int motion_mode_ = 0;
  int compound_type_ = 0;            // our encoding (plans.h)
  int wedge_packed_ = 0;
  int interintra_ = 0;               // 0 off else mode+1
  int ii_wedge_packed_ = 0;
  int new_mv_ctx_ = 0, ref_mv_ctx_ = 0, zero_mv_ctx_ = 0;
  int num_mv_found_ = 0, new_mv_count_ = 0;
  int found_match_ = 0, close_matches_ = 0, total_matches_ = 0;
  int16_t ref_mv_stack_[8][2][2] = {};  // [idx][list][row,col]
  int weight_stack_[8] = {};
  int drl_ctx_stack_[8] = {};
  int ref_mv_idx_ = 0;
  int16_t global_mvs_[2][2] = {};
  // extra_search scratch
  int16_t ref_id_mvs_[2][2][2];   // [list][n][rc]
  int16_t ref_diff_mvs_[2][2][2];
  int ref_id_count_[2] = {}, ref_diff_count_[2] = {};
  // warp samples
  int num_samples_ = 0, num_samples_scanned_ = 0;
  int cand_list_[8][4] = {};
  int32_t warp_params_[6] = {};
  int warp_invalid_ = 0;
  int comp_group_cur_ = 0, compound_idx_cur_ = 1;
  // per-frame decoded-ref grids (NONE=-1 until the mi is decoded)
  std::vector<int8_t> ref0_grid_, ref1_grid_;
  // per-mi comp_group_idx / compound_idx (for ctx derivation)
  std::vector<uint8_t> comp_group_grid_, compound_idx_grid_;
  // per-frame per-4x4 inter tx sizes (var tx) [SPEC §5.11.16]
  std::vector<uint8_t> inter_tx_sizes_;
  // per-4x4 luma tx types (chroma inter tx-type derivation) [SPEC §5.11.40]
  std::vector<uint8_t> tx_types_;
  void transform_tree(int startX, int startY, int w, int h);
  // seg-pred contexts (temporal segment prediction) [SPEC §5.11.12]
  std::vector<uint8_t> above_seg_pred_, left_seg_pred_;

  // per-superblock / tile state
  int read_deltas_ = 0;
  int current_qindex_ = 0;
  int delta_lf_[4] = {0, 0, 0, 0};

  // neighbor contexts
  std::vector<uint8_t> above_ctx_[3], left_ctx_[3];  // coeff contexts
  std::vector<uint8_t> above_part_, left_part_;
  std::vector<uint8_t> above_tx_, left_tx_;
  std::vector<uint8_t> seg_ids_;
  std::vector<int32_t> cdef_idx_;
  std::vector<int32_t> pal_grid_;  // palette record index per mi (-1)

  // loop restoration refs
  int lr_ref_wiener_[3][2][3] = {};
  int lr_ref_sgr_[3][2] = {};

  // BlockDecoded[plane][row+1][col+1], superblock-relative in plane 4x4
  // units with a 1-cell border [SPEC §7.11.2 availability]
  uint8_t block_decoded_[3][36][36] = {};
  void clear_block_decoded(int sb_r, int sb_c, int sb4);
  int bdec(int plane, int py, int px) const {
    if (py < -1 || px < -1 || py > 33 || px > 33) return 0;
    return block_decoded_[plane][py + 1][px + 1];
  }
};

}  // namespace av1
