// Geometry and syntax lookup tables  [SPEC §6.8 semantics / Annex tables].
// Scan orders are generated at runtime (init_scan_tables) instead of typed.
#pragma once

#include <cstdint>

namespace av1 {

// ---- Block sizes [SPEC §6.8.1 BlockSize enum order] ----
enum BlockSize : int {
  BLOCK_4X4 = 0, BLOCK_4X8, BLOCK_8X4, BLOCK_8X8, BLOCK_8X16, BLOCK_16X8,
  BLOCK_16X16, BLOCK_16X32, BLOCK_32X16, BLOCK_32X32, BLOCK_32X64,
  BLOCK_64X32, BLOCK_64X64, BLOCK_64X128, BLOCK_128X64, BLOCK_128X128,
  BLOCK_4X16, BLOCK_16X4, BLOCK_8X32, BLOCK_32X8, BLOCK_16X64, BLOCK_64X16,
  BLOCK_SIZES_ALL, BLOCK_INVALID = -1,
};

// ---- Partition types [SPEC §6.10.4] ----
enum PartitionType : int {
  PARTITION_NONE = 0, PARTITION_HORZ, PARTITION_VERT, PARTITION_SPLIT,
  PARTITION_HORZ_A, PARTITION_HORZ_B, PARTITION_VERT_A, PARTITION_VERT_B,
  PARTITION_HORZ_4, PARTITION_VERT_4, EXT_PARTITION_TYPES,
};

// ---- Intra prediction modes [SPEC §6.10.19] ----
enum PredictionMode : int {
  DC_PRED = 0, V_PRED, H_PRED, D45_PRED, D135_PRED, D113_PRED, D157_PRED,
  D203_PRED, D67_PRED, SMOOTH_PRED, SMOOTH_V_PRED, SMOOTH_H_PRED,
  PAETH_PRED, UV_CFL_PRED,  // chroma-only 14th mode
  INTRA_MODES = 13,
  // inter modes (Y mode namespace continues) [SPEC §6.10.20]
  NEARESTMV = 13, NEARMV, GLOBALMV, NEWMV,
  NEAREST_NEARESTMV, NEAR_NEARMV, NEAREST_NEWMV, NEW_NEARESTMV,
  NEAR_NEWMV, NEW_NEARMV, GLOBAL_GLOBALMV, NEW_NEWMV,
};
constexpr int UV_INTRA_MODES = 14;
constexpr int MAX_ANGLE_DELTA = 3;

enum FilterIntraMode : int {
  FILTER_DC_PRED = 0, FILTER_V_PRED, FILTER_H_PRED, FILTER_D157_PRED,
  FILTER_PAETH_PRED, FILTER_INTRA_MODES,
};

// ---- TX sizes [SPEC §6.10.23] ----
enum TxSize : int {
  TX_4X4 = 0, TX_8X8, TX_16X16, TX_32X32, TX_64X64,
  TX_4X8, TX_8X4, TX_8X16, TX_16X8, TX_16X32, TX_32X16, TX_32X64, TX_64X32,
  TX_4X16, TX_16X4, TX_8X32, TX_32X8, TX_16X64, TX_64X16,
  TX_SIZES_ALL, TX_SIZES = 5,
};
constexpr int MAX_TX_DEPTH = 2;

// ---- TX types [SPEC §6.10.22] ----
enum TxType : int {
  DCT_DCT = 0, ADST_DCT, DCT_ADST, ADST_ADST, FLIPADST_DCT, DCT_FLIPADST,
  FLIPADST_FLIPADST, ADST_FLIPADST, FLIPADST_ADST, IDTX, V_DCT, H_DCT,
  V_ADST, H_ADST, V_FLIPADST, H_FLIPADST, TX_TYPES,
};

enum TxClass : int { TX_CLASS_2D = 0, TX_CLASS_HORIZ, TX_CLASS_VERT };

enum TxSetType : int {
  EXT_TX_SET_DCTONLY = 0,
  EXT_TX_SET_DTT4_IDTX_1DDCT,
  EXT_TX_SET_DTT4_IDTX,
  EXT_TX_SET_DCT_IDTX,
  EXT_TX_SET_DTT9_IDTX_1DDCT,
  EXT_TX_SET_ALL16,
};

// ---- geometry LUTs (indexed by BlockSize) ----
extern const uint8_t kBlockWidth4[BLOCK_SIZES_ALL];    // in 4px units
extern const uint8_t kBlockHeight4[BLOCK_SIZES_ALL];
extern const uint8_t kMiWidthLog2[BLOCK_SIZES_ALL];
extern const uint8_t kMiHeightLog2[BLOCK_SIZES_ALL];
// Partition_Subsize[partition][bsize] [SPEC §9.3 Partition_Subsize]
extern const int8_t kPartitionSubsize[EXT_PARTITION_TYPES][BLOCK_SIZES_ALL];
// Split_Tx_Size / Max_Tx_Size_Rect / Max_Tx_Depth
extern const uint8_t kTxWidth4[TX_SIZES_ALL];
extern const uint8_t kTxHeight4[TX_SIZES_ALL];
extern const uint8_t kTxWidthLog2[TX_SIZES_ALL];
extern const uint8_t kTxHeightLog2[TX_SIZES_ALL];
extern const uint8_t kTxSizeSqr[TX_SIZES_ALL];     // square-down
extern const uint8_t kTxSizeSqrUp[TX_SIZES_ALL];   // square-up
extern const uint8_t kSplitTxSize[TX_SIZES_ALL];
extern const int8_t kMaxTxSizeRect[BLOCK_SIZES_ALL];
extern const uint8_t kMaxTxDepth[BLOCK_SIZES_ALL];
extern const uint8_t kTxClass[TX_TYPES];
// Intra mode ctx grouping for kf y mode cdf [SPEC Intra_Mode_Context]
extern const uint8_t kIntraModeContext[INTRA_MODES];
// Size-group lookup for if_y_mode cdf [SPEC Size_Group]
extern const uint8_t kSizeGroup[BLOCK_SIZES_ALL];
// intra_mode -> tx_type for chroma derivation [SPEC Mode_To_Txfm]
extern const uint8_t kIntraModeToTxType[UV_INTRA_MODES];
// Ext_Tx_Inv: symbol -> tx type per set  [SPEC §9.3 ext-tx tables]
extern const uint8_t kExtTxInv[6][16];
extern uint8_t kExtTxUsed[6][TX_TYPES];  // filled by init_scan_tables
extern const uint8_t kNumExtTxSymbols[6];
// adjusted tx size for 64xN handling [SPEC Adjusted_Tx_Size]
extern const uint8_t kAdjustedTxSize[TX_SIZES_ALL];

// ---- scan orders (runtime generated) ----
// scan[tx_size][class] -> pointer to scan table (length = visible coeffs)
struct ScanOrder {
  const int16_t* scan;
  int n;  // number of coefficient positions
};
// tx class here: 0 = default(2D/IDTX...), 1 = mcol (H_* types), 2 = mrow (V_*)
const ScanOrder& get_scan(int tx_size, int tx_type);
void init_scan_tables();

static inline int tx_size_wide(int t) { return 4 * kTxWidth4[t]; }
static inline int tx_size_high(int t) { return 4 * kTxHeight4[t]; }

int get_ext_tx_set_type(int tx_size, int is_inter, int reduced_tx_set);
// index into the intra/inter ext-tx cdf arrays (0 if set unused)
int ext_tx_set_index(int set_type, int is_inter);

}  // namespace av1
