"""Test configuration.

All JAX tests run on the CPU backend with 8 virtual devices so the
sharded/multi-chip paths can be exercised without TPU hardware
(SURVEY.md §4 "Distributed / multi-host" row).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The sandbox's sitecustomize force-registers a remote TPU ("axon") PJRT
# plugin whose INITIALIZATION dials a tunnel that can block for minutes
# (even under JAX_PLATFORMS=cpu).  Registration is cheap and lazy, so
# deregister the factory before any backend is initialized; unit tests
# then run purely on the CPU backend.
try:
    import jax
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

import hashlib
import subprocess

import numpy as np
import pytest


@pytest.fixture(scope="session")
def native_lib():
    from av1dec_tpu import bindings

    bindings.rebuild_native()
    return bindings._load()


def _synth_frame(w, h, t, rng, bit_depth=8):
    """Synthetic video frame with structure + noise (shared by stream gens)."""
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx + yy + 4 * t) % 256).astype(np.int64)
    y[(yy // 16 + t) % 8 == 0] = 200
    y += rng.integers(-8, 8, y.shape)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    u = ((xx[:ch, :cw] // 2 + 16 * t) % 256).astype(np.int64)
    v = ((yy[:ch, :cw] // 2 + 128) % 256).astype(np.int64)
    shift = bit_depth - 8
    dt = np.uint16 if bit_depth > 8 else np.uint8
    clip = (1 << 8) - 1
    y = np.clip(y, 0, clip).astype(dt) << shift
    u = np.clip(u, 0, clip).astype(dt) << shift
    v = np.clip(v, 0, clip).astype(dt) << shift
    return y, u, v


@pytest.fixture(scope="session")
def stream_factory(tmp_path_factory):
    """Factory fixture: generate an IVF test stream with given params."""
    import aomffi

    base = tmp_path_factory.mktemp("streams")
    cache = {}

    def make(name="default", w=192, h=128, frames=10, bit_depth=8,
             kf_max_dist=9999, bitrate=400, options=(), monochrome=False,
             cpu_used=9):
        key = (name, w, h, frames, bit_depth, kf_max_dist, bitrate,
               tuple(options), monochrome)
        if key in cache:
            return cache[key]
        rng = np.random.default_rng(hash(name) & 0xFFFF)
        enc = aomffi.AomEncoder(
            w, h, bit_depth=bit_depth, cpu_used=cpu_used, bitrate_kbps=bitrate,
            kf_max_dist=kf_max_dist, lag=0, options=list(options),
            monochrome=monochrome)
        pkts = []
        for t in range(frames):
            pkts += enc.encode(*_synth_frame(w, h, t, rng, bit_depth), pts=t)
        pkts += enc.flush()
        enc.close()
        path = str(base / f"{name}.ivf")
        aomffi.write_ivf(path, pkts, w, h)
        cache[key] = path
        return path

    return make
