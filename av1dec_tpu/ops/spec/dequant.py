"""Dequantization [SPEC §7.12.2] — NumPy spec model."""

import numpy as np

from av1dec_tpu.ops.tables_data import AC_Q, DC_Q

_BD_IDX = {8: 0, 10: 1, 12: 2}


def dc_q(qindex, bd):
    return int(DC_Q[_BD_IDX[bd], np.clip(qindex, 0, 255)])


def ac_q(qindex, bd):
    return int(AC_Q[_BD_IDX[bd], np.clip(qindex, 0, 255)])


def tx_scale_shift(tx_size):
    """av1_get_tx_scale: extra right-shift for large transforms."""
    # tx_size per native enum; sqr-up 32 -> 1, 64 -> 2
    SQR_UP = [0, 1, 2, 3, 4, 1, 1, 2, 2, 3, 3, 4, 4, 2, 2, 3, 3, 4, 4]
    if tx_size == 19:  # WHT
        return 0
    s = SQR_UP[tx_size]
    return 1 if s == 3 else 2 if s == 4 else 0


def dequant_block(levels, tx_size, qindex, bd, dc_delta_q, ac_delta_q,
                  lossless):
    """levels: int array (signed) in coded layout; returns dequantized
    coefficients, same shape.  [SPEC §7.12.2: dq = (level*q) & 0xFFFFFF,
    then >> tx scale]"""
    dcq = dc_q(np.clip(qindex + dc_delta_q, 0, 255), bd)
    acq = ac_q(np.clip(qindex + ac_delta_q, 0, 255), bd)
    if lossless:
        dcq = dc_q(0, bd)
        acq = ac_q(0, bd)
    lv = np.asarray(levels, dtype=np.int64)
    q = np.full(lv.shape, acq, dtype=np.int64)
    q.flat[0] = dcq
    shift = tx_scale_shift(tx_size)
    mag = (np.abs(lv) * q) & 0xFFFFFF
    mag >>= shift
    # CoeffMin/CoeffMax clamp [SPEC §7.12.3]
    hi = (1 << (7 + bd)) - 1
    return np.clip(np.where(lv < 0, -mag, mag), -hi - 1, hi)


def dequant_batch(levels, tx_size, qindex, bd, dc_delta_q, ac_delta_q):
    """Vectorized dequant: levels [B, n]; qindex/dc_delta_q/ac_delta_q
    per-block [B] arrays.  Non-lossless only."""
    bi = _BD_IDX[bd]
    dcq = DC_Q[bi, np.clip(qindex + dc_delta_q, 0, 255)].astype(np.int64)
    acq = AC_Q[bi, np.clip(qindex + ac_delta_q, 0, 255)].astype(np.int64)
    lv = np.asarray(levels, dtype=np.int64)
    q = np.broadcast_to(acq[:, None], lv.shape).copy()
    q[:, 0] = dcq
    shift = tx_scale_shift(tx_size)
    mag = ((np.abs(lv) * q) & 0xFFFFFF) >> shift
    hi = (1 << (7 + bd)) - 1
    return np.clip(np.where(lv < 0, -mag, mag), -hi - 1, hi)
