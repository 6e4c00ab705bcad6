"""Pallas CDEF filter kernel == XLA formulation, elementwise exact.

The Pallas tile kernel (ops/kernels/cdef._filter_plane_pallas) is the
TPU fast path; the XLA _filter_plane (itself oracle-checked against the
scalar spec model and libaom) is its reference.  Runs in interpreter
mode on the CPU backend.
"""
import numpy as np
import pytest


@pytest.mark.parametrize("shape", [(64, 64), (40, 72), (24, 128)])
def test_pallas_filter_matches_xla(shape):
    import jax.numpy as jnp

    from av1dec_tpu.ops.kernels import cdef as C

    rng = np.random.default_rng(7)
    H, W = shape
    bd = 8
    plane = rng.integers(0, 256, (H, W)).astype(np.int32)
    uH, uW = (H + 7) // 8, (W + 7) // 8

    def expand(u):
        return np.repeat(np.repeat(u, 8, 0), 8, 1)[:H, :W].astype(np.int32)

    pri_u = rng.integers(0, 16, (uH, uW))
    sec_u = rng.choice([0, 1, 2, 4], (uH, uW))
    dir_u = rng.integers(0, 8, (uH, uW))
    damping = 5

    def shift_for(s, d):
        return np.maximum(0, d - np.int64(np.floor(np.log2(
            np.maximum(s, 1)))))

    pri = expand(pri_u)
    sec = expand(sec_u)
    dirs = expand(dir_u)
    psh = expand(shift_for(pri_u, damping))
    ssh = expand(shift_for(sec_u, damping))
    app = ((pri > 0) | (sec > 0)).astype(np.int32)

    args = [jnp.asarray(plane), jnp.asarray(pri), jnp.asarray(sec),
            jnp.asarray(dirs), jnp.asarray(psh), jnp.asarray(ssh),
            jnp.asarray(app), 0]
    ref = np.asarray(C._filter_plane(*args))
    got = np.asarray(C._filter_plane_pallas(*args, interpret=True))
    assert (ref == got).all(), np.argwhere(ref != got)[:5]
