"""Wiener restoration filter passes on device (JAX). [SPEC §7.17.4]

Same integer math as ops.spec.lr._wiener; separable 7-tap with
intermediate rounding/clamping.  Operates on bordered windows so it
composes with halo exchange when the frame is spatially sharded.
"""
import jax.numpy as jnp


def wiener_horizontal(src, taps_h, bd):
    """src: [..., H, W+6] int32 with a 3-col border; taps_h: 7 ints.
    Returns intermediate [..., H, W] int32."""
    r0 = 5 if bd == 12 else 3
    off0 = 1 << (bd + 6)
    lim = (1 << (bd + 1 + 7 - r0)) - 1
    w = src.shape[-1] - 6
    acc = jnp.full(src.shape[:-1] + (w,), off0, jnp.int32)
    for t in range(7):
        acc = acc + taps_h[t] * src[..., t:t + w]
    v = (acc + (1 << (r0 - 1))) >> r0
    return jnp.clip(v, 0, lim)


def wiener_vertical(inter, taps_v, bd):
    """inter: [..., H+6, W] int32 with a 3-row border.
    Returns output [..., H, W] int32 pixels."""
    r1 = 9 if bd == 12 else 11
    h = inter.shape[-2] - 6
    acc = jnp.full(inter.shape[:-2] + (h, inter.shape[-1]),
                   -(1 << (bd + r1 - 1)), jnp.int32)
    for t in range(7):
        acc = acc + taps_v[t] * inter[..., t:t + h, :]
    v = (acc + (1 << (r1 - 1))) >> r1
    return jnp.clip(v, 0, (1 << bd) - 1)
