"""Dequantization [SPEC §7.12.2] — NumPy spec model."""

import numpy as np

from av1dec_tpu.ops.tables_data import AC_Q, DC_Q

_BD_IDX = {8: 0, 10: 1, 12: 2}


def dc_q(qindex, bd):
    return int(DC_Q[_BD_IDX[bd], np.clip(qindex, 0, 255)])


def ac_q(qindex, bd):
    return int(AC_Q[_BD_IDX[bd], np.clip(qindex, 0, 255)])


def tx_scale_shift(tx_size):
    """av1_get_tx_scale: extra right-shift by PIXEL COUNT —
    (pels > 256) + (pels > 1024) — NOT by square-up size.  8x32/32x8
    (256 pels) shift 0, 16x64/64x16 (1024 pels) shift 1; verified
    against libaom via forged-bitstream transform fuzzing
    (tools/itx_oracle.py)."""
    if tx_size == 19:  # WHT
        return 0
    from av1dec_tpu.ops.spec.itx import TX_DIMS
    w, h = TX_DIMS[tx_size]
    pels = w * h
    return (1 if pels > 256 else 0) + (1 if pels > 1024 else 0)


def dequant_block(levels, tx_size, qindex, bd, dc_delta_q, ac_delta_q,
                  lossless, qm=None):
    """levels: int array (signed) in coded layout; returns dequantized
    coefficients, same shape.  [SPEC §7.12.2: dq = (level*q) & 0xFFFFFF,
    then >> tx scale].  `qm`: optional inverse quantizer-matrix vector
    (uint8, raster over the coded grid) — dq scaled per position by
    (qm[pos] * q + 16) >> 5 [SPEC §7.12.2 quantizer matrix]."""
    dcq = dc_q(np.clip(qindex + dc_delta_q, 0, 255), bd)
    acq = ac_q(np.clip(qindex + ac_delta_q, 0, 255), bd)
    if lossless:
        dcq = dc_q(0, bd)
        acq = ac_q(0, bd)
    lv = np.asarray(levels, dtype=np.int64)
    q = np.full(lv.shape, acq, dtype=np.int64)
    q.flat[0] = dcq
    if qm is not None and not lossless:
        q = (np.asarray(qm, np.int64).reshape(q.shape) * q + 16) >> 5
    shift = tx_scale_shift(tx_size)
    mag = (np.abs(lv) * q) & 0xFFFFFF
    mag >>= shift
    # CoeffMin/CoeffMax clamp [SPEC §7.12.3]
    hi = (1 << (7 + bd)) - 1
    return np.clip(np.where(lv < 0, -mag, mag), -hi - 1, hi)


def dequant_batch(levels, tx_size, qindex, bd, dc_delta_q, ac_delta_q,
                  qm_levels=None, qm_chroma=None):
    """Vectorized dequant: levels [B, n]; qindex/dc_delta_q/ac_delta_q
    per-block [B] arrays.  Non-lossless only.  `qm_levels` [B] (15 =
    flat / not eligible) + `qm_chroma` [B] bool select the inverse
    quantizer matrix per block [SPEC §7.12.2]."""
    bi = _BD_IDX[bd]
    dcq = DC_Q[bi, np.clip(qindex + dc_delta_q, 0, 255)].astype(np.int64)
    acq = AC_Q[bi, np.clip(qindex + ac_delta_q, 0, 255)].astype(np.int64)
    lv = np.asarray(levels, dtype=np.int64)
    q = np.broadcast_to(acq[:, None], lv.shape).copy()
    q[:, 0] = dcq
    if qm_levels is not None and (np.asarray(qm_levels) < 15).any():
        from av1dec_tpu.ops.qm_data import qm_row
        from av1dec_tpu.ops.spec.itx import TX_DIMS as _TD
        w, h = (4, 4) if tx_size == 19 else _TD[tx_size]
        qml = np.asarray(qm_levels)
        qmc = np.asarray(qm_chroma, bool)
        for lvl in np.unique(qml[qml < 15]):
            for ch in (False, True):
                sel = (qml == lvl) & (qmc == ch)
                if not sel.any():
                    continue
                qv = qm_row(int(lvl), ch, w, h).astype(np.int64)
                q[sel] = (qv[None, :] * q[sel] + 16) >> 5
    shift = tx_scale_shift(tx_size)
    mag = ((np.abs(lv) * q) & 0xFFFFFF) >> shift
    hi = (1 << (7 + bd)) - 1
    return np.clip(np.where(lv < 0, -mag, mag), -hi - 1, hi)
