"""Sharded decode == unsharded decode, byte-identical, on REAL frames.

Runs on the 8-virtual-device CPU mesh conftest provisions
(SURVEY.md §4 distributed tier).  The column-sharded CDEF chain
(parallel/sharded_cdef.py) exchanges +-2px halos over the mesh's
`space` axis with ppermute; output must equal the single-device
whole-frame kernel bit for bit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aomffi
from av1dec_tpu.bindings import NativeParser
from av1dec_tpu.ops.kernels import cdef as cdef_dev
from av1dec_tpu.parallel.mesh import make_mesh
from av1dec_tpu.parallel.sharded_cdef import cdef_sharded
from av1dec_tpu.pipeline.recon import FrameRecon


def _real_frames(path, limit=2):
    """Decode frames of a real stream with the host pipeline; yield
    (seq, hdr, plans, planes int32)."""
    p = NativeParser()
    got = 0
    for _, d in aomffi.read_ivf(path):
        for hdr, plans in p.parse_tu(d, with_plans=True):
            if plans is None:
                continue
            fr = FrameRecon(p.seq, hdr, plans)
            planes = [np.asarray(x, np.int32) for x in fr.run()]
            yield p.seq, hdr, plans, planes
            got += 1
            if got >= limit:
                return


def test_sharded_cdef_matches_single(spec_stream, native_lib):
    """Column-sharded CDEF over the 8-device mesh == whole-frame CDEF,
    on a real decoded 256x192 frame with real strength gating."""
    assert len(jax.devices()) >= 8, "conftest must provision 8 devices"
    mesh = make_mesh(8)
    checked = 0
    for seq, hdr, plans, planes in _real_frames(spec_stream("tiles")):
        bd = seq["bit_depth"]
        gates = cdef_dev.compute_gates(seq, hdr, plans, len(planes), bd)
        if gates is None:
            continue
        single = cdef_dev._cdef_all(
            tuple(jnp.asarray(p) for p in planes),
            jnp.asarray(gates[0]), jnp.asarray(gates[1]),
            jnp.asarray(gates[2]), jnp.asarray(gates[3]),
            bd, gates[4], gates[5], gates[6])
        sharded = cdef_sharded(planes, gates, bd, mesh)
        for pl, (s, u) in enumerate(zip(sharded, single)):
            np.testing.assert_array_equal(
                np.asarray(s), np.asarray(u),
                err_msg=f"plane {pl}: sharded CDEF != unsharded")
        checked += 1
    assert checked > 0, "tiles stream must have CDEF-active frames"


def test_sharded_cdef_space_axis_sizes(spec_stream, native_lib):
    """The halo exchange must be correct at every space-axis width that
    divides the frame: run the same real frame over 1x2, 1x4 and 1x8
    meshes and require byte equality with the unsharded kernel."""
    from jax.sharding import Mesh
    devs = jax.devices()
    assert len(devs) >= 8
    for seq, hdr, plans, planes in _real_frames(spec_stream("tiles"),
                                                limit=1):
        bd = seq["bit_depth"]
        gates = cdef_dev.compute_gates(seq, hdr, plans, len(planes), bd)
        assert gates is not None
        single = cdef_dev._cdef_all(
            tuple(jnp.asarray(p) for p in planes),
            jnp.asarray(gates[0]), jnp.asarray(gates[1]),
            jnp.asarray(gates[2]), jnp.asarray(gates[3]),
            bd, gates[4], gates[5], gates[6])
        for nspace in (2, 4, 8):
            mesh = Mesh(np.asarray(devs[:nspace]).reshape(1, nspace),
                        ("data", "space"))
            sharded = cdef_sharded(planes, gates, bd, mesh)
            for pl, (s, u) in enumerate(zip(sharded, single)):
                np.testing.assert_array_equal(
                    np.asarray(s), np.asarray(u),
                    err_msg=f"nspace={nspace} plane {pl}")


def test_dryrun_multichip_entrypoint():
    """The driver-facing dryrun: real frame, sharded == unsharded."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_frames_sharded_matches_single(spec_stream, native_lib):
    """The decoder's MAIN compute — wavefront scan + deblock + CDEF —
    sharded one-frame-per-device over the `data` axis == the
    single-device DeviceRecon path, byte-identical (real frames)."""
    from jax.sharding import Mesh

    from av1dec_tpu.parallel.sharded_frames import decode_frames_sharded
    from av1dec_tpu.pipeline.device_recon import DeviceRecon

    p = NativeParser()
    drs = []
    for _, d in aomffi.read_ivf(spec_stream("multi")):
        for hdr, plans in p.parse_tu(d, with_plans=True):
            if plans is None:
                continue
            dr = DeviceRecon(p.seq, hdr, plans)
            if dr.supported():
                drs.append(dr)
    assert len(drs) >= 2
    drs = (drs * 2)[:4]  # 4 shards (frames may repeat; same geometry)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    got = decode_frames_sharded(drs, mesh)
    for dr, planes in zip(drs, got):
        ref = dr.run()
        for a, b in zip(ref, planes):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
