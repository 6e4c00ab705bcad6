"""Device inter path == host spec pipeline, bit-exact, whole streams.

Inter frames whose blocks are all translational (SIMPLE motion mode,
unscaled refs, average/distance compound) run the device back-half:
MC lanes (ops/kernels/mc.py) -> wavefront scan with MF_INTER residual
lanes -> deblock -> CDEF.  This tier decodes real encoded streams
through the public API on both paths and requires identical output —
and requires that the device path actually took the inter frames
(recon_path stats), so eligibility can't silently regress to host.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from av1dec_tpu.api import Decoder  # noqa: E402
from av1dec_tpu.config import DecoderConfig  # noqa: E402
from av1dec_tpu.container import read_temporal_units  # noqa: E402

# streams encoded without warp/OBMC/masked-compound: every inter block
# should be device-eligible.  lowdelay/bframes keep default tools and
# may fall back on some frames — they still must match bit-exactly.
_SIMPLE = ["neither", "mrf3", "aq0b", "t160x96", "w136"]
_MIXED = ["lowdelay", "bframes", "interbd10", "intermono"]


def _decode(path, platform):
    dec = Decoder(DecoderConfig(platform=platform, apply_grain=False))
    out = []
    for _, tu in read_temporal_units(path):
        out += dec.decode(tu)
    stats = dec.stats
    dec.close()
    return out, stats


def _gen(name):
    import gen_inter_battery as gb
    return gb.gen_case(name, gb.CASES[name], "/tmp/inter_battery")


@pytest.mark.parametrize("name", _SIMPLE + _MIXED)
def test_device_inter_matches_host(name, native_lib):
    path = _gen(name)
    host, _ = _decode(path, "off")
    dev, stats = _decode(path, "cpu")
    assert len(host) == len(dev) > 0
    for a, b in zip(host, dev):
        assert a.md5() == b.md5()
    n_inter_dev = sum(1 for s in stats
                      if not s["intra"] and s["recon_path"] == "device")
    if name in _SIMPLE:
        assert n_inter_dev > 0, \
            f"no inter frame took the device path in {name}"
