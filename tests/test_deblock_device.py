"""Device deblocking == host spec model, bit-exact. [SPEC §7.14]

The device kernel (ops/kernels/deblock.py) consumes the same dense
edge-decision maps as the refactored host filter
(ops.spec.deblock.build_deblock_maps), so this tier checks the
*execution* equivalence: data-parallel whole-frame passes vs the host's
sequential per-edge walk, over real encoded streams (and both are
transitively locked to the libaom oracle by the bitexact tier).
"""
import numpy as np
import pytest

import aomffi
from av1dec_tpu.bindings import NativeParser
from av1dec_tpu.ops.spec import deblock
from av1dec_tpu.pipeline.recon import FrameRecon
from conftest import SPEC_CASES

# streams with the loop filter active (hi cq / structured content)
_NAMES = sorted(SPEC_CASES)


def _pre_deblock_planes(seq, hdr, plans):
    """Reconstruct a frame but stop before the in-loop filter chain."""
    fr = FrameRecon(seq, hdr, plans)
    fr._postfilter = lambda: None
    return fr.run()


@pytest.mark.parametrize("name", _NAMES)
def test_device_deblock_matches_host(name, spec_stream, native_lib):
    import jax.numpy as jnp

    from av1dec_tpu.ops.kernels.deblock import deblock_all

    p = NativeParser()
    checked = 0
    for _, d in aomffi.read_ivf(spec_stream(name)):
        for hdr, plans in p.parse_tu(d, with_plans=True):
            if plans is None:
                continue
            seq = p.seq
            maps = deblock.build_deblock_maps(seq, hdr, plans,
                                              1 if seq["mono_chrome"]
                                              else 3)
            if maps is None or not any(
                    m[0][0].any() or m[1][0].any() for m in maps):
                continue
            pre = _pre_deblock_planes(seq, hdr, plans)
            host = [x.copy() for x in pre]
            deblock.deblock_frame(host, seq, hdr, plans,
                                  seq["bit_depth"])
            dev_maps = tuple(
                ((jnp.asarray(fv), jnp.asarray(lv)),
                 (jnp.asarray(fh), jnp.asarray(lh)))
                for (fv, lv), (fh, lh) in maps)
            got = deblock_all(
                tuple(jnp.asarray(np.asarray(x, np.int32)) for x in pre),
                dev_maps, hdr["lf"]["sharpness"], seq["bit_depth"])
            for a, b in zip(host, got):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b))
            checked += 1
    if checked == 0:
        pytest.skip("no deblocked frames in stream")
