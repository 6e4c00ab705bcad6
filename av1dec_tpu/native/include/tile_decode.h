// Tile decoder: entropy-decodes one tile into plan tensors. [SPEC §5.11]
#pragma once

#include <cstdint>
#include <vector>

#include "cdf.h"
#include "decoder.h"
#include "msac.h"
#include "plans.h"

namespace av1 {

class TileDecoder {
 public:
  TileDecoder(const SequenceHeader& seq, const FrameHeader& hdr,
              CdfContext* cdf, FramePlans* plans);
  int decode_tile(const uint8_t* data, size_t size, int tile_row,
                  int tile_col);
  void set_cdf(CdfContext* cdf) { cdf_ = cdf; }
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
  // tx
  void read_block_tx_size();
  int get_uv_tx_size() const;
  int read_tx_type(int plane, int txSz, int* out_type);
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
