"""Batched inverse transforms on device (JAX). [SPEC §7.13.3]

Reuses the integer butterfly structures from the NumPy spec model
(`ops.spec.itx`): the 1-D kernels there operate on *lists of lane
arrays* using only +, -, *, >> — so tracing them with jnp arrays yields
a fully vectorized, jit-compilable integer transform over a batch of
transform blocks.  All shapes static per (tx_size, tx_type) bucket: the
decoder groups transform blocks into buckets and launches one jitted
call per bucket.

int32 throughout: AV1 inverse transforms are specified to fit int32
intermediates for valid conformant streams (libaom uses int32 too).
"""
import functools
import math

import jax
import jax.numpy as jnp

from av1dec_tpu.ops.spec import itx as S


def _round_shift(x, bit):
    if bit == 0:
        return x
    return (x + (1 << (bit - 1))) >> bit


def _apply_1d(kind, vecs, n):
    if kind == 0:
        return S._DCT[n](vecs)
    if kind == 1:
        return S._ADST[n](vecs)
    return S.iidentity(vecs, n)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def inverse_transform_batch(coeffs, tx_size, tx_type, bd=8):
    """coeffs: [B, adj_h, adj_w] int32 (coded layout, 64->32 clipped).
    Returns residual [B, h, w] int32."""
    w, h = S.TX_DIMS[tx_size]
    adj_w, adj_h = min(w, 32), min(h, 32)
    ck, rk, ud, lr = S.TX_1D[tx_type]
    row_hi = (1 << (bd + 7)) - 1           # rowClampRange [SPEC §7.13.3]
    col_hi = (1 << (max(bd + 6, 16) - 1)) - 1
    coeffs = coeffs.astype(jnp.int32)
    buf = jnp.zeros((coeffs.shape[0], h, w), jnp.int32)
    buf = buf.at[:, :adj_h, :adj_w].set(coeffs)

    if (int(math.log2(w)) - int(math.log2(h))) % 2 != 0:
        buf = _round_shift(buf * S.NEW_INV_SQRT2, S.COS_BIT)
    buf = jnp.clip(buf, -row_hi - 1, row_hi)

    # row transforms along width; lanes are [B, h]
    cols_in = [buf[:, :, j] for j in range(w)]
    rows_out = _apply_1d(rk, cols_in, w)
    buf = jnp.stack(rows_out, axis=2)            # [B, h, w]
    buf = jnp.clip(_round_shift(buf, S._ROW_SHIFT[(w, h)]),
                   -col_hi - 1, col_hi)
    rows_in = [buf[:, r, :] for r in range(h)]
    cols_out = _apply_1d(ck, rows_in, h)
    res = jnp.stack(cols_out, axis=1)            # [B, h, w]
    res = _round_shift(res, 4)
    if ud:
        res = res[:, ::-1, :]
    if lr:
        res = res[:, :, ::-1]
    return res


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dequant_batch(levels, qvec, tx_size, bd, lossless):
    """levels: [B, n] int32, qvec: [B, n] int32 dequant factors
    (dc at position 0, ac elsewhere, precomputed on host).
    Returns dequantized coeffs [B, n] int32. [SPEC §7.12.3]"""
    # Tx_Scale by pixel count: (pels>256) + (pels>1024) [libaom
    # av1_get_tx_scale; verified via tools/itx_oracle.py]
    shift = {3: 1, 9: 1, 10: 1, 17: 1, 18: 1,
             4: 2, 11: 2, 12: 2}.get(tx_size, 0)
    mag = ((jnp.abs(levels) * qvec) & 0xFFFFFF) >> shift
    d = jnp.where(levels < 0, -mag, mag)
    # CoeffMin/CoeffMax clamp [SPEC §7.12.3]
    hi = (1 << (7 + bd)) - 1
    return jnp.clip(d, -hi - 1, hi)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def residual_bucket(levels, dcq, acq, tx_size, tx_type, bd):
    """Fused dequant + inverse transform for one (tx_size, tx_type)
    bucket: levels [B, n] int32 (coded layout), dcq/acq [B] int32
    per-block quantizers.  Returns residual [B, h, w] int32.

    This is the decode-path device kernel: the host bucket loop uploads
    levels once per bucket and downloads residual blocks once.
    [SPEC §7.12.3 dequant, §7.13.3 inverse transform]
    """
    w, h = S.TX_DIMS[tx_size]
    adj_w, adj_h = min(w, 32), min(h, 32)
    shift = {3: 1, 9: 1, 10: 1, 17: 1, 18: 1,
             4: 2, 11: 2, 12: 2}.get(tx_size, 0)
    q = jnp.broadcast_to(acq[:, None], levels.shape)
    q = q.at[:, 0].set(dcq)
    mag = ((jnp.abs(levels) * q) & 0xFFFFFF) >> shift
    d = jnp.where(levels < 0, -mag, mag)
    hi = (1 << (7 + bd)) - 1
    d = jnp.clip(d, -hi - 1, hi)
    return inverse_transform_batch(d.reshape(-1, adj_h, adj_w),
                                   tx_size, tx_type, bd)


def residual_step(levels, qvec, pred, tx_size, tx_type, bd):
    """Fused device step: dequant -> inverse transform -> add -> clamp.
    levels [B, adj_h*adj_w], qvec [B, adj_h*adj_w], pred [B, h, w]."""
    w, h = S.TX_DIMS[tx_size]
    adj_w, adj_h = min(w, 32), min(h, 32)
    dq = dequant_batch(levels, qvec, tx_size, bd, False)
    res = inverse_transform_batch(
        dq.reshape(-1, adj_h, adj_w), tx_size, tx_type)
    return jnp.clip(pred + res, 0, (1 << bd) - 1)
