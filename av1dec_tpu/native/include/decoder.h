// Decoder state: sequence/frame headers plus the header-level reference
// bookkeeping (order hints, saved params per DPB slot) needed by
// [SPEC §5.9] parsing and [SPEC §7.20] reference update.
#pragma once

#include <array>
#include <cstdint>
#include <memory>
#include <vector>

#include "av1_common.h"

namespace av1 {

struct CdfContext;  // defined in cdf.h

// Per-DPB-slot state saved at reference_frame_update [SPEC §7.20]
struct RefSlot {
  int valid = 0;
  int frame_type = KEY_FRAME;
  int frame_id = 0;
  int order_hint = 0;
  int ref_order_hints[NUM_REF_FRAMES] = {};  // SavedOrderHints
  int upscaled_width = 0, frame_width = 0, frame_height = 0;
  int render_width = 0, render_height = 0;
  int mi_cols = 0, mi_rows = 0;
  int bit_depth = 8;
  int subsampling_x = 1, subsampling_y = 1;
  int showable_frame = 0;
  // saved params for load_previous() [SPEC §7.21]
  GlobalMotionParams saved_gm;
  LoopFilterParams saved_lf;
  SegmentationParams saved_seg;
  FilmGrainParams saved_grain;
  std::shared_ptr<CdfContext> saved_cdfs;               // load_cdfs target
  std::shared_ptr<std::vector<uint8_t>> saved_seg_ids;  // SavedSegmentIds
  // saved motion vectors for temporal MVP [SPEC §7.9]: per 8x8 cell
  std::shared_ptr<std::vector<int16_t>> saved_mvs;   // [mi/2 * mi/2 * 2]
  std::shared_ptr<std::vector<int8_t>> saved_mv_ref; // ref frame per cell
};

struct TileGroupRange {
  // byte range of one tile's coded data within the temporal unit buffer
  const uint8_t* data;
  size_t size;
  int tile_row, tile_col;
};

struct DecoderState {
  SequenceHeader seq;
  FrameHeader hdr;          // current frame header
  RefSlot ref[NUM_REF_FRAMES];
  // frame-end state of the frame being completed (set by the tile-decode
  // driver before reference_frame_update stores it into refreshed slots)
  std::shared_ptr<CdfContext> pending_cdfs;
  std::shared_ptr<std::vector<uint8_t>> pending_seg_ids;
  std::shared_ptr<std::vector<int16_t>> pending_mvs;
  std::shared_ptr<std::vector<int8_t>> pending_mv_ref;
  int seen_frame_header = 0;
  int temporal_id = 0, spatial_id = 0;
  int operating_point_idc = 0;
  int chosen_operating_point = 0;  // API-selected op [SPEC §6.4.1]
  // metadata OBUs [SPEC §5.8]: latest HDR CLL/MDCV + ITU-T T.35 count
  struct {
    int have_cll = 0;
    int max_cll = 0, max_fall = 0;
    int have_mdcv = 0;
    int primaries[3][2] = {};
    int white_point[2] = {};
    uint32_t max_luminance = 0, min_luminance = 0;
    int n_itut_t35 = 0;
  } metadata;
  // tiles of the current frame, filled by tile-group OBU parsing
  std::vector<TileGroupRange> tiles;
  int tile_group_end = -1;  // last tile number seen (TileNum)

  // helpers
  int get_relative_dist(int a, int b) const {
    // [SPEC §5.9.3]
    if (!seq.enable_order_hint) return 0;
    int bits = seq.order_hint_bits;
    int diff = a - b;
    int m = 1 << (bits - 1);
    return (diff & (m - 1)) - (diff & m);
  }
};

// obu.cc
int parse_temporal_unit(DecoderState* st, const uint8_t* data, size_t size,
                        int (*on_frame_ready)(DecoderState*, void*),
                        void* user);

// headers.cc
class BitReader;
int parse_sequence_header(BitReader& b, SequenceHeader* seq);
// returns 0 ok; fills st->hdr.  sz = payload size for trailing checks.
int parse_frame_header(BitReader& b, DecoderState* st);
// applies show_existing_frame / reference_frame_update bookkeeping for the
// header-level state (pixel-level handled by the Python pipeline)
void reference_frame_update(DecoderState* st);
void setup_past_independence(FrameHeader* h);

}  // namespace av1
