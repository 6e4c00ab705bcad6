// OBU-level parsing: temporal unit -> typed OBUs -> headers + tile ranges.
// [SPEC §5.2 open_bitstream_unit, §5.3 obu_header, §5.10 frame_obu,
//  §5.11.1 tile_group_obu]
#include <cstring>

#include "bitreader.h"
#include "decoder.h"

namespace av1 {

struct ObuHeaderInfo {
  int type = 0;
  int temporal_id = 0;
  int spatial_id = 0;
  int has_size = 0;
  size_t header_bytes = 0;
};

static int parse_obu_header(const uint8_t* data, size_t size,
                            ObuHeaderInfo* oh) {
  // [SPEC §5.3.2-5.3.3]
  if (size < 1) return -1;
  BitReader b(data, size);
  int forbidden = b.f(1);
  if (forbidden) return -1;
  oh->type = b.f(4);
  int ext = b.f(1);
  oh->has_size = b.f(1);
  b.f(1);  // obu_reserved_1bit
  if (ext) {
    if (size < 2) return -1;
    oh->temporal_id = b.f(3);
    oh->spatial_id = b.f(2);
    b.f(3);  // extension_header_reserved_3bits
  } else {
    oh->temporal_id = 0;
    oh->spatial_id = 0;
  }
  oh->header_bytes = 1 + (ext ? 1 : 0);
  return 0;
}

// Parse one tile group payload, appending tile byte ranges to st->tiles.
// Returns 1 if this tile group completes the frame, 0 otherwise, <0 error.
static int parse_tile_group(DecoderState* st, const uint8_t* data,
                            size_t size) {
  const TileInfo& t = st->hdr.tiles;
  int numTiles = t.tile_cols * t.tile_rows;
  BitReader b(data, size);
  int tile_start_and_end_present = 0;
  if (numTiles > 1) tile_start_and_end_present = b.f(1);
  int tg_start = 0, tg_end = numTiles - 1;
  if (numTiles > 1 && tile_start_and_end_present) {
    int tileBits = t.tile_cols_log2 + t.tile_rows_log2;
    tg_start = b.f(tileBits);
    tg_end = b.f(tileBits);
  }
  b.byte_align();
  size_t pos = b.bytes_read();
  for (int tileNum = tg_start; tileNum <= tg_end; tileNum++) {
    int lastTile = tileNum == tg_end;
    size_t tileSize;
    if (lastTile && tileNum == numTiles - 1) {
      tileSize = size - pos;
    } else if (lastTile) {
      tileSize = size - pos;
    } else {
      if (pos + t.tile_size_bytes > size) return -1;
      uint32_t sz = 0;
      for (int i = 0; i < t.tile_size_bytes; i++)
        sz |= (uint32_t)data[pos + i] << (8 * i);
      pos += t.tile_size_bytes;
      tileSize = sz + 1;
    }
    if (pos + tileSize > size) return -1;
    TileGroupRange r;
    r.data = data + pos;
    r.size = tileSize;
    r.tile_row = tileNum / t.tile_cols;
    r.tile_col = tileNum % t.tile_cols;
    st->tiles.push_back(r);
    pos += tileSize;
  }
  st->tile_group_end = tg_end;
  return tg_end == numTiles - 1 ? 1 : 0;
}

// Walk a temporal unit.  `on_frame_ready` fires when a frame's header and
// all its tile groups are available (tiles in st->tiles).
int parse_temporal_unit(DecoderState* st, const uint8_t* data, size_t size,
                        int (*on_frame_ready)(DecoderState*, void*),
                        void* user) {
  size_t pos = 0;
  while (pos < size) {
    ObuHeaderInfo oh;
    if (parse_obu_header(data + pos, size - pos, &oh) < 0) return -1;
    size_t payload_pos = pos + oh.header_bytes;
    uint64_t obu_size;
    if (oh.has_size) {
      bool ok;
      obu_size = read_leb128(data, size, &payload_pos, &ok);
      if (!ok) return -1;
    } else {
      obu_size = size - payload_pos;
    }
    if (payload_pos + obu_size > size) return -1;
    const uint8_t* payload = data + payload_pos;

    st->temporal_id = oh.temporal_id;
    st->spatial_id = oh.spatial_id;

    // operating point filtering [SPEC §5.3.1 drop_obu]
    bool drop = false;
    if (oh.type != OBU_SEQUENCE_HEADER && oh.type != OBU_TEMPORAL_DELIMITER &&
        st->operating_point_idc != 0) {
      int inTemporal = (st->operating_point_idc >> oh.temporal_id) & 1;
      int inSpatial = (st->operating_point_idc >> (oh.spatial_id + 8)) & 1;
      if (!(inTemporal && inSpatial)) drop = true;
    }

    if (!drop) {
      switch (oh.type) {
        case OBU_TEMPORAL_DELIMITER:
          st->seen_frame_header = 0;
          break;
        case OBU_SEQUENCE_HEADER: {
          BitReader b(payload, obu_size);
          if (parse_sequence_header(b, &st->seq) < 0) return -2;
          // operating-point selection [SPEC §6.4.1]: idc of the chosen
          // op drives drop_obu layer filtering above
          {
            int op = st->chosen_operating_point;
            if (op < 0 || op >= st->seq.operating_points_cnt) op = 0;
            st->operating_point_idc = st->seq.op[op].idc;
          }
          break;
        }
        case OBU_METADATA: {
          // [SPEC §5.8.1]: metadata_type leb128 then type payload
          size_t mp = 0;
          bool ok;
          uint64_t mtype = read_leb128(payload, obu_size, &mp, &ok);
          if (!ok) break;
          BitReader b(payload + mp, obu_size - mp);
          if (mtype == 1) {  // METADATA_TYPE_HDR_CLL [SPEC §5.8.4]
            st->metadata.max_cll = (int)b.f(16);
            st->metadata.max_fall = (int)b.f(16);
            st->metadata.have_cll = 1;
          } else if (mtype == 2) {  // HDR_MDCV [SPEC §5.8.5]
            for (int i = 0; i < 3; i++) {
              st->metadata.primaries[i][0] = (int)b.f(16);
              st->metadata.primaries[i][1] = (int)b.f(16);
            }
            st->metadata.white_point[0] = (int)b.f(16);
            st->metadata.white_point[1] = (int)b.f(16);
            st->metadata.max_luminance = (uint32_t)b.f(32);
            st->metadata.min_luminance = (uint32_t)b.f(32);
            st->metadata.have_mdcv = 1;
          } else if (mtype == 4) {  // ITUT_T35 [SPEC §5.8.2]
            st->metadata.n_itut_t35++;
          }  // scalability/timecode: parsed-and-ignored
          break;
        }
        case OBU_FRAME_HEADER:
        case OBU_REDUNDANT_FRAME_HEADER: {
          if (oh.type == OBU_REDUNDANT_FRAME_HEADER) break;  // skip re-parse
          if (st->seen_frame_header) break;  // duplicate in same TU
          st->seen_frame_header = 1;
          st->tiles.clear();
          BitReader b(payload, obu_size);
          if (parse_frame_header(b, st) < 0) return -3;
          if (st->hdr.show_existing_frame) {
            if (on_frame_ready && on_frame_ready(st, user) < 0) return -5;
            st->seen_frame_header = 0;
          }
          break;
        }
        case OBU_TILE_GROUP: {
          int done = parse_tile_group(st, payload, obu_size);
          if (done < 0) return -4;
          if (done == 1) {
            if (on_frame_ready && on_frame_ready(st, user) < 0) return -5;
            st->seen_frame_header = 0;
          }
          break;
        }
        case OBU_FRAME: {
          // [SPEC §5.10]: frame header, byte-align, then tile group
          st->seen_frame_header = 1;
          st->tiles.clear();
          BitReader b(payload, obu_size);
          if (parse_frame_header(b, st) < 0) return -3;
          b.byte_align();
          size_t consumed = b.bytes_read();
          int done = parse_tile_group(st, payload + consumed,
                                      obu_size - consumed);
          if (done < 0) return -4;
          if (done == 1) {
            if (on_frame_ready && on_frame_ready(st, user) < 0) return -5;
            st->seen_frame_header = 0;
          }
          break;
        }
        case OBU_TILE_LIST:
        case OBU_PADDING:
        default:
          break;  // parsed-and-ignored
      }
    }
    pos = payload_pos + obu_size;
  }
  return 0;
}

}  // namespace av1
