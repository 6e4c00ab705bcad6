// Motion-field estimation (temporal MVP) and frame-end motion storage.
// [SPEC §7.9 motion field estimation, §7.19 motion vector storage]
//
// Storage layout follows the per-8x8 formulation (one (mv, ref_offset)
// pair per 8x8 cell); equivalent to the spec's MotionFieldMvs with the
// per-ref projection applied lazily at candidate-lookup time.
#include <algorithm>
#include <cstdlib>
#include <cstring>

#include "decoder.h"
#include "plans.h"
#include "tile_decode.h"

namespace av1 {

namespace {

constexpr int16_t MV_INVALID = INT16_MIN;
constexpr int MAX_FRAME_DISTANCE = 31;
constexpr int REFMVS_LIMIT = (1 << 12) - 1;

const int16_t kDivMult[32] = {
    0,    16384, 8192, 5461, 4096, 3276, 2730, 2340, 2048, 1820, 1638,
    1489, 1365,  1260, 1170, 1092, 1024, 963,  910,  862,  819,  780,
    744,  712,   682,  655,  630,  606,  585,  564,  546,  528};

inline int round2s(int64_t x, int n) {
  return (int)(x >= 0 ? (x + (1LL << (n - 1))) >> n
                      : -((-x + (1LL << (n - 1))) >> n));
}

inline int16_t clip_mv(int v) {
  return (int16_t)std::clamp(v, -(1 << 14) + 1, (1 << 14) - 1);
}

void mv_project(int16_t* out, const int16_t* ref, int num, int den) {
  den = std::min(den, MAX_FRAME_DISTANCE);
  num = num > 0 ? std::min(num, MAX_FRAME_DISTANCE)
                : std::max(num, -MAX_FRAME_DISTANCE);
  out[0] = clip_mv(round2s((int64_t)ref[0] * num * kDivMult[den], 14));
  out[1] = clip_mv(round2s((int64_t)ref[1] * num * kDivMult[den], 14));
}

// [libaom get_block_position]: projected position validity
bool block_position(int h8, int w8, int blk_row, int blk_col,
                    const int16_t* mv, int sign_bias, int* mi_r, int* mi_c) {
  int base_row = (blk_row >> 3) << 3;
  int base_col = (blk_col >> 3) << 3;
  int row_off = mv[0] >= 0 ? mv[0] >> 6 : -((-mv[0]) >> 6);
  int col_off = mv[1] >= 0 ? mv[1] >> 6 : -((-mv[1]) >> 6);
  int row = sign_bias ? blk_row - row_off : blk_row + row_off;
  int col = sign_bias ? blk_col - col_off : blk_col + col_off;
  if (row < 0 || row >= h8 || col < 0 || col >= w8) return false;
  if (row < base_row || row >= base_row + 8 ||  // MAX_OFFSET_HEIGHT = 0
      col < base_col - 8 || col >= base_col + 16)  // MAX_OFFSET_WIDTH = 64
    return false;
  *mi_r = row;
  *mi_c = col;
  return true;
}

// project one source ref's stored motion onto the current frame's grid
bool motion_field_projection(DecoderState* st, FrameMotionContext* m,
                             int src, int dir) {
  const FrameHeader& h = st->hdr;
  const RefSlot& slot = st->ref[h.ref_frame_idx[src - LAST_FRAME]];
  if (!slot.valid || !slot.saved_mvs || !slot.saved_mv_ref) return false;
  if (slot.mi_rows != h.mi_rows || slot.mi_cols != h.mi_cols) return false;
  if (slot.frame_type == KEY_FRAME || slot.frame_type == INTRA_ONLY_FRAME)
    return false;
  int cur = h.order_hint;
  int start_hint = slot.order_hint;
  int start_to_cur = st->get_relative_dist(start_hint, cur);
  if (dir == 2) start_to_cur = -start_to_cur;
  if (std::abs(start_to_cur) > MAX_FRAME_DISTANCE) return true;
  int ref_offset[TOTAL_REFS_PER_FRAME] = {};
  for (int rf = LAST_FRAME; rf <= ALTREF_FRAME; rf++)
    ref_offset[rf] =
        st->get_relative_dist(start_hint, slot.ref_order_hints[rf]);
  const int16_t* mvs = slot.saved_mvs->data();
  const int8_t* refs = slot.saved_mv_ref->data();
  int sign_bias = dir >> 1;
  for (int y8 = 0; y8 < m->h8; y8++) {
    for (int x8 = 0; x8 < m->w8; x8++) {
      size_t cell = (size_t)y8 * m->w8 + x8;
      int rf = refs[cell];
      if (rf <= INTRA_FRAME) continue;
      int roff = ref_offset[rf];
      if (roff <= 0 || roff > MAX_FRAME_DISTANCE) continue;
      int16_t proj[2];
      mv_project(proj, &mvs[cell * 2], start_to_cur, roff);
      int mi_r, mi_c;
      if (!block_position(m->h8, m->w8, y8, x8, proj, sign_bias, &mi_r,
                          &mi_c))
        continue;
      size_t dst = (size_t)mi_r * m->w8 + mi_c;
      m->tpl_mv[dst * 2] = mvs[cell * 2];
      m->tpl_mv[dst * 2 + 1] = mvs[cell * 2 + 1];
      m->tpl_off[dst] = (int16_t)roff;
    }
  }
  return true;
}

}  // namespace

// Build the per-frame motion context (order hints, sign bias, ref dims,
// previous segment map, temporal motion field) before tile decode.
void setup_motion_context(DecoderState* st, FrameMotionContext* m) {
  const FrameHeader& h = st->hdr;
  const SequenceHeader& s = st->seq;
  m->w8 = (h.mi_cols + 1) >> 1;
  m->h8 = (h.mi_rows + 1) >> 1;
  for (int rf = LAST_FRAME; rf <= ALTREF_FRAME; rf++) {
    const RefSlot& slot = st->ref[h.ref_frame_idx[rf - LAST_FRAME]];
    m->order_hints[rf] = slot.order_hint;
    m->ref_sign_bias[rf] =
        s.enable_order_hint &&
        st->get_relative_dist(slot.order_hint, h.order_hint) > 0;
    m->ref_width[rf] = slot.upscaled_width;
    m->ref_height[rf] = slot.frame_height;
  }
  // PrevSegmentIds [SPEC §7.21 load_previous / §6.8.2]
  m->prev_seg_ids = nullptr;
  if (h.primary_ref_frame != PRIMARY_REF_NONE) {
    const RefSlot& prev = st->ref[h.ref_frame_idx[h.primary_ref_frame]];
    if (prev.saved_seg_ids &&
        (int)prev.saved_seg_ids->size() == h.mi_rows * h.mi_cols)
      m->prev_seg_ids = prev.saved_seg_ids->data();
  }
  // temporal motion field [SPEC §7.9; libaom av1_setup_motion_field]
  m->tpl_mv.clear();
  m->tpl_off.clear();
  if (!h.use_ref_frame_mvs || !s.enable_order_hint) return;
  m->tpl_mv.assign((size_t)m->w8 * m->h8 * 2, MV_INVALID);
  m->tpl_off.assign((size_t)m->w8 * m->h8, 0);
  int cur = h.order_hint;
  int ref_stamp = 2;  // MFMV_STACK_SIZE - 1
  const RefSlot& lastSlot = st->ref[h.ref_frame_idx[0]];
  if (lastSlot.valid) {
    int alt_of_lst = lastSlot.ref_order_hints[ALTREF_FRAME];
    int gold_hint =
        st->ref[h.ref_frame_idx[GOLDEN_FRAME - LAST_FRAME]].order_hint;
    bool is_lst_overlay = alt_of_lst == gold_hint;
    if (!is_lst_overlay) motion_field_projection(st, m, LAST_FRAME, 2);
    ref_stamp--;
  }
  if (st->get_relative_dist(m->order_hints[BWDREF_FRAME], cur) > 0) {
    if (motion_field_projection(st, m, BWDREF_FRAME, 0)) ref_stamp--;
  }
  if (st->get_relative_dist(m->order_hints[ALTREF2_FRAME], cur) > 0) {
    if (motion_field_projection(st, m, ALTREF2_FRAME, 0)) ref_stamp--;
  }
  if (st->get_relative_dist(m->order_hints[ALTREF_FRAME], cur) > 0 &&
      ref_stamp >= 0) {
    if (motion_field_projection(st, m, ALTREF_FRAME, 0)) ref_stamp--;
  }
  if (ref_stamp >= 0) motion_field_projection(st, m, LAST2_FRAME, 2);
}

// Frame-end motion/segment storage into the pending slots, consumed by
// reference_frame_update [SPEC §7.19-7.20; libaom av1_copy_frame_mvs].
void store_frame_motion(DecoderState* st, const FramePlans& plans) {
  const FrameHeader& h = st->hdr;
  const SequenceHeader& s = st->seq;
  int rows8 = (h.mi_rows + 1) >> 1;
  int cols8 = (h.mi_cols + 1) >> 1;
  auto mvs = std::make_shared<std::vector<int16_t>>(
      (size_t)rows8 * cols8 * 2, 0);
  auto refs = std::make_shared<std::vector<int8_t>>((size_t)rows8 * cols8,
                                                    (int8_t)NONE_FRAME);
  // ref_frame_side: skip refs at/after the current frame in display order
  int side[TOTAL_REFS_PER_FRAME] = {};
  if (s.enable_order_hint && !h.frame_is_intra) {
    for (int rf = LAST_FRAME; rf <= ALTREF_FRAME; rf++) {
      int hint = st->ref[h.ref_frame_idx[rf - LAST_FRAME]].order_hint;
      if (st->get_relative_dist(hint, h.order_hint) > 0)
        side[rf] = 1;
      else if (hint == h.order_hint)
        side[rf] = -1;
    }
  }
  const int16_t* mi = plans.mi.data();
  auto grid = [&](int field, int r, int c) {
    return mi[(size_t)field * h.mi_rows * h.mi_cols + (size_t)r * h.mi_cols +
              c];
  };
  for (int y8 = 0; y8 < rows8; y8++) {
    for (int x8 = 0; x8 < cols8; x8++) {
      int r = std::min(y8 * 2 + 1, h.mi_rows - 1);
      int c = std::min(x8 * 2 + 1, h.mi_cols - 1);
      size_t cell = (size_t)y8 * cols8 + x8;
      for (int list = 0; list < 2; list++) {
        int rf = grid(list ? MI_REF1 : MI_REF0, r, c);
        if (rf <= INTRA_FRAME || side[rf]) continue;
        int mvy = grid(list ? MI_MV1Y : MI_MV0Y, r, c);
        int mvx = grid(list ? MI_MV1X : MI_MV0X, r, c);
        if (std::abs(mvy) > REFMVS_LIMIT || std::abs(mvx) > REFMVS_LIMIT)
          continue;
        (*refs)[cell] = (int8_t)rf;
        (*mvs)[cell * 2] = (int16_t)mvy;
        (*mvs)[cell * 2 + 1] = (int16_t)mvx;
      }
    }
  }
  st->pending_mvs = mvs;
  st->pending_mv_ref = refs;
  // segment-id map for predictive coding in later frames
  auto seg = std::make_shared<std::vector<uint8_t>>(
      (size_t)h.mi_rows * h.mi_cols, 0);
  for (int r = 0; r < h.mi_rows; r++)
    for (int c = 0; c < h.mi_cols; c++)
      (*seg)[(size_t)r * h.mi_cols + c] = (uint8_t)grid(MI_SEG_ID, r, c);
  st->pending_seg_ids = seg;
}

}  // namespace av1
