// Geometry/syntax lookup tables and runtime scan-order generation.
// [SPEC §9.3 conversion tables; scan orders §9.3 Default/Mcol/Mrow_Scan_*]
#include "tables.h"

#include <algorithm>
#include <vector>

namespace av1 {

#define B BLOCK_INVALID
const uint8_t kBlockWidth4[BLOCK_SIZES_ALL] = {
    1, 1, 2, 2, 2, 4, 4, 4, 8, 8, 8, 16, 16, 16, 32, 32, 1, 4, 2, 8, 4, 16};
const uint8_t kBlockHeight4[BLOCK_SIZES_ALL] = {
    1, 2, 1, 2, 4, 2, 4, 8, 4, 8, 16, 8, 16, 32, 16, 32, 4, 1, 8, 2, 16, 4};
const uint8_t kMiWidthLog2[BLOCK_SIZES_ALL] = {
    0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 0, 2, 1, 3, 2, 4};
const uint8_t kMiHeightLog2[BLOCK_SIZES_ALL] = {
    0, 1, 0, 1, 2, 1, 2, 3, 2, 3, 4, 3, 4, 5, 4, 5, 2, 0, 3, 1, 4, 2};

// Partition_Subsize[partition][bsize]: valid only for square bsize >= 8x8
const int8_t kPartitionSubsize[EXT_PARTITION_TYPES][BLOCK_SIZES_ALL] = {
    // PARTITION_NONE
    {BLOCK_4X4, B, B, BLOCK_8X8, B, B, BLOCK_16X16, B, B, BLOCK_32X32, B, B,
     BLOCK_64X64, B, B, BLOCK_128X128, B, B, B, B, B, B},
    // PARTITION_HORZ
    {B, B, B, BLOCK_8X4, B, B, BLOCK_16X8, B, B, BLOCK_32X16, B, B,
     BLOCK_64X32, B, B, BLOCK_128X64, B, B, B, B, B, B},
    // PARTITION_VERT
    {B, B, B, BLOCK_4X8, B, B, BLOCK_8X16, B, B, BLOCK_16X32, B, B,
     BLOCK_32X64, B, B, BLOCK_64X128, B, B, B, B, B, B},
    // PARTITION_SPLIT
    {B, B, B, BLOCK_4X4, B, B, BLOCK_8X8, B, B, BLOCK_16X16, B, B,
     BLOCK_32X32, B, B, BLOCK_64X64, B, B, B, B, B, B},
    // PARTITION_HORZ_A
    {B, B, B, BLOCK_8X4, B, B, BLOCK_16X8, B, B, BLOCK_32X16, B, B,
     BLOCK_64X32, B, B, BLOCK_128X64, B, B, B, B, B, B},
    // PARTITION_HORZ_B
    {B, B, B, BLOCK_8X4, B, B, BLOCK_16X8, B, B, BLOCK_32X16, B, B,
     BLOCK_64X32, B, B, BLOCK_128X64, B, B, B, B, B, B},
    // PARTITION_VERT_A
    {B, B, B, BLOCK_4X8, B, B, BLOCK_8X16, B, B, BLOCK_16X32, B, B,
     BLOCK_32X64, B, B, BLOCK_64X128, B, B, B, B, B, B},
    // PARTITION_VERT_B
    {B, B, B, BLOCK_4X8, B, B, BLOCK_8X16, B, B, BLOCK_16X32, B, B,
     BLOCK_32X64, B, B, BLOCK_64X128, B, B, B, B, B, B},
    // PARTITION_HORZ_4
    {B, B, B, B, B, B, BLOCK_16X4, B, B, BLOCK_32X8, B, B,
     BLOCK_64X16, B, B, B, B, B, B, B, B, B},
    // PARTITION_VERT_4
    {B, B, B, B, B, B, BLOCK_4X16, B, B, BLOCK_8X32, B, B,
     BLOCK_16X64, B, B, B, B, B, B, B, B, B},
};
#undef B

const uint8_t kTxWidth4[TX_SIZES_ALL] = {1, 2, 4, 8, 16, 1, 2, 2, 4,
                                         4, 8, 8, 16, 1, 4, 2, 8, 4, 16};
const uint8_t kTxHeight4[TX_SIZES_ALL] = {1, 2, 4, 8, 16, 2, 1, 4, 2,
                                          8, 4, 16, 8, 4, 1, 8, 2, 16, 4};
const uint8_t kTxWidthLog2[TX_SIZES_ALL] = {2, 3, 4, 5, 6, 2, 3, 3, 4,
                                            4, 5, 5, 6, 2, 4, 3, 5, 4, 6};
const uint8_t kTxHeightLog2[TX_SIZES_ALL] = {2, 3, 4, 5, 6, 3, 2, 4, 3,
                                             5, 4, 6, 5, 4, 2, 5, 3, 6, 4};
const uint8_t kTxSizeSqr[TX_SIZES_ALL] = {
    TX_4X4, TX_8X8, TX_16X16, TX_32X32, TX_64X64, TX_4X4, TX_4X4,
    TX_8X8, TX_8X8, TX_16X16, TX_16X16, TX_32X32, TX_32X32,
    TX_4X4, TX_4X4, TX_8X8, TX_8X8, TX_16X16, TX_16X16};
const uint8_t kTxSizeSqrUp[TX_SIZES_ALL] = {
    TX_4X4, TX_8X8, TX_16X16, TX_32X32, TX_64X64, TX_8X8, TX_8X8,
    TX_16X16, TX_16X16, TX_32X32, TX_32X32, TX_64X64, TX_64X64,
    TX_16X16, TX_16X16, TX_32X32, TX_32X32, TX_64X64, TX_64X64};
const uint8_t kSplitTxSize[TX_SIZES_ALL] = {
    TX_4X4, TX_4X4, TX_8X8, TX_16X16, TX_32X32, TX_4X4, TX_4X4,
    TX_8X8, TX_8X8, TX_16X16, TX_16X16, TX_32X32, TX_32X32,
    TX_4X8, TX_8X4, TX_8X16, TX_16X8, TX_16X32, TX_32X16};
const int8_t kMaxTxSizeRect[BLOCK_SIZES_ALL] = {
    TX_4X4, TX_4X8, TX_8X4, TX_8X8, TX_8X16, TX_16X8, TX_16X16, TX_16X32,
    TX_32X16, TX_32X32, TX_32X64, TX_64X32, TX_64X64, TX_64X64, TX_64X64,
    TX_64X64, TX_4X16, TX_16X4, TX_8X32, TX_32X8, TX_16X64, TX_64X16};
const uint8_t kMaxTxDepth[BLOCK_SIZES_ALL] = {
    0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 4, 4, 4, 2, 2, 3, 3, 4, 4};
const uint8_t kTxClass[TX_TYPES] = {
    TX_CLASS_2D, TX_CLASS_2D, TX_CLASS_2D, TX_CLASS_2D, TX_CLASS_2D,
    TX_CLASS_2D, TX_CLASS_2D, TX_CLASS_2D, TX_CLASS_2D, TX_CLASS_2D,
    TX_CLASS_VERT, TX_CLASS_HORIZ, TX_CLASS_VERT, TX_CLASS_HORIZ,
    TX_CLASS_VERT, TX_CLASS_HORIZ};
const uint8_t kAdjustedTxSize[TX_SIZES_ALL] = {
    TX_4X4, TX_8X8, TX_16X16, TX_32X32, TX_32X32, TX_4X8, TX_8X4,
    TX_8X16, TX_16X8, TX_16X32, TX_32X16, TX_32X32, TX_32X32,
    TX_4X16, TX_16X4, TX_8X32, TX_32X8, TX_16X32, TX_32X16};

const uint8_t kIntraModeContext[INTRA_MODES] = {0, 1, 2, 3, 4, 4, 4,
                                                4, 3, 0, 1, 2, 0};
// rect-ext tail is {0,0,1,1,2,2} (libaom size_group_lookup), NOT the
// width-based {1,1,2,2,3,3}: verified by forged-bitstream probes against
// the libaom decoder (first divergent inter syntax on 4-way partitions)
const uint8_t kSizeGroup[BLOCK_SIZES_ALL] = {0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3,
                                             3, 3, 3, 3, 3, 0, 0, 1, 1, 2, 2};
const uint8_t kIntraModeToTxType[UV_INTRA_MODES] = {
    DCT_DCT,   ADST_DCT,  DCT_ADST,  DCT_DCT, ADST_ADST, ADST_DCT,
    DCT_ADST,  DCT_ADST,  ADST_DCT,  ADST_ADST, ADST_DCT, DCT_ADST,
    ADST_ADST, DCT_DCT /* CFL */};

// symbol -> tx_type per ext-tx set  [SPEC §9.3]
const uint8_t kExtTxInv[6][16] = {
    // DCTONLY
    {DCT_DCT},
    // DTT4_IDTX_1DDCT (intra 1)
    {IDTX, DCT_DCT, V_DCT, H_DCT, ADST_ADST, ADST_DCT, DCT_ADST},
    // DTT4_IDTX (intra 2)
    {IDTX, DCT_DCT, ADST_ADST, ADST_DCT, DCT_ADST},
    // DCT_IDTX (inter 3)
    {IDTX, DCT_DCT},
    // DTT9_IDTX_1DDCT (inter 2)
    {IDTX, V_DCT, H_DCT, DCT_DCT, ADST_DCT, DCT_ADST, FLIPADST_DCT,
     DCT_FLIPADST, ADST_ADST, FLIPADST_FLIPADST, ADST_FLIPADST,
     FLIPADST_ADST},
    // ALL16 (inter 1)
    {IDTX, V_DCT, H_DCT, V_ADST, H_ADST, V_FLIPADST, H_FLIPADST, DCT_DCT,
     ADST_DCT, DCT_ADST, FLIPADST_DCT, DCT_FLIPADST, ADST_ADST,
     FLIPADST_FLIPADST, ADST_FLIPADST, FLIPADST_ADST},
};
const uint8_t kNumExtTxSymbols[6] = {1, 7, 5, 2, 12, 16};
uint8_t kExtTxUsed[6][TX_TYPES];

int get_ext_tx_set_type(int tx_size, int is_inter, int reduced_tx_set) {
  // [SPEC §5.11.48 get_tx_set / libaom av1_get_ext_tx_set_type]
  int sqr_up = kTxSizeSqrUp[tx_size];
  if (sqr_up > TX_32X32) return EXT_TX_SET_DCTONLY;
  if (sqr_up == TX_32X32)
    return is_inter ? EXT_TX_SET_DCT_IDTX : EXT_TX_SET_DCTONLY;
  if (reduced_tx_set)
    return is_inter ? EXT_TX_SET_DCT_IDTX : EXT_TX_SET_DTT4_IDTX;
  int sqr = kTxSizeSqr[tx_size];
  if (is_inter) {
    return sqr == TX_16X16 ? EXT_TX_SET_DTT9_IDTX_1DDCT : EXT_TX_SET_ALL16;
  } else {
    return sqr == TX_16X16 ? EXT_TX_SET_DTT4_IDTX
                           : EXT_TX_SET_DTT4_IDTX_1DDCT;
  }
}

int ext_tx_set_index(int set_type, int is_inter) {
  // cdf array index [libaom av1_ext_tx_set_idx]
  if (is_inter) {
    switch (set_type) {
      case EXT_TX_SET_ALL16: return 1;
      case EXT_TX_SET_DTT9_IDTX_1DDCT: return 2;
      case EXT_TX_SET_DCT_IDTX: return 3;
      default: return 0;
    }
  } else {
    switch (set_type) {
      case EXT_TX_SET_DTT4_IDTX_1DDCT: return 1;
      case EXT_TX_SET_DTT4_IDTX: return 2;
      default: return 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Scan orders: generated [SPEC §9.3 scan tables].
// default: alternating ("zig-zag") anti-diagonal scan; mcol: column-major;
// mrow: row-major.  Sizes use the *adjusted* tx dims (<=32).
// ---------------------------------------------------------------------------

static std::vector<int16_t> g_scan_store[TX_SIZES_ALL][3];
static ScanOrder g_scan[TX_SIZES_ALL][3];
static bool g_scan_init = false;

static void gen_scans(int tx) {
  int adj = kAdjustedTxSize[tx];
  int w = tx_size_wide(adj), h = tx_size_high(adj);
  int n = w * h;
  // default scans [SPEC §9.3, verified against libaom rodata]:
  // - square: zig-zag (alternating direction per anti-diagonal;
  //   odd diagonals r ascending, even r descending)
  // - wide rect (w > h): every diagonal r descending (bottom-left first)
  // - tall rect (w < h): every diagonal r ascending (top-right first)
  std::vector<int16_t>& dflt = g_scan_store[tx][0];
  dflt.clear();
  for (int d = 0; d < w + h - 1; d++) {
    int rlo = std::max(0, d - (w - 1));
    int rhi = std::min(h - 1, d);
    bool ascending = (w == h) ? ((d & 1) != 0) : (w < h);
    if (ascending) {
      for (int r = rlo; r <= rhi; r++) dflt.push_back(r * w + (d - r));
    } else {
      for (int r = rhi; r >= rlo; r--) dflt.push_back(r * w + (d - r));
    }
  }
  std::vector<int16_t>& mcol = g_scan_store[tx][1];
  mcol.clear();
  for (int c = 0; c < w; c++)
    for (int r = 0; r < h; r++) mcol.push_back(r * w + c);
  std::vector<int16_t>& mrow = g_scan_store[tx][2];
  mrow.clear();
  for (int i = 0; i < n; i++) mrow.push_back(i);
  for (int k = 0; k < 3; k++)
    g_scan[tx][k] = ScanOrder{g_scan_store[tx][k].data(), n};
}

void init_scan_tables() {
  if (g_scan_init) return;
  for (int t = 0; t < TX_SIZES_ALL; t++) gen_scans(t);
  for (int s = 0; s < 6; s++) {
    for (int t = 0; t < TX_TYPES; t++) kExtTxUsed[s][t] = 0;
    for (int i = 0; i < kNumExtTxSymbols[s]; i++)
      kExtTxUsed[s][kExtTxInv[s][i]] = 1;
  }
  g_scan_init = true;
}

const ScanOrder& get_scan(int tx_size, int tx_type) {
  int cls = kTxClass[tx_type];
  // HORIZ (H_*: 1-D horizontal transform) -> column-major scan;
  // VERT  (V_*) -> row-major scan; everything else -> default zig-zag
  int which = cls == TX_CLASS_HORIZ ? 1 : cls == TX_CLASS_VERT ? 2 : 0;
  return g_scan[tx_size][which];
}

}  // namespace av1
