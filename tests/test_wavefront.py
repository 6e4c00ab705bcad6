"""Wavefront-scheduled intra recon == serial FrameRecon (bit-exact).

The wavefront schedule (pipeline/wavefront.py) is the structural oracle
for the device executor [SURVEY §7.1 diagonal scheme]; this locks its
equivalence to the per-block spec model on representative streams.
"""
import glob

import numpy as np
import pytest

import aomffi
from av1dec_tpu.bindings import NativeParser
from av1dec_tpu.pipeline.recon import FrameRecon
from av1dec_tpu.pipeline.wavefront import WavefrontRecon


def _streams():
    return sorted(glob.glob("/tmp/pytest_streams/*.ivf"))


@pytest.mark.parametrize("path", _streams(),
                         ids=lambda p: p.split("/")[-1].replace(".ivf", ""))
def test_wavefront_matches_serial(path, native_lib):
    p = NativeParser()
    checked = 0
    for _, d in aomffi.read_ivf(path):
        for hdr, plans in p.parse_tu(d, with_plans=True):
            if plans is None:
                continue
            ref = FrameRecon(p.seq, hdr, plans).run()
            wr = WavefrontRecon(p.seq, hdr, plans)
            if wr.sch is None:
                continue
            got = wr.run()
            for a, b in zip(ref, got):
                assert (np.asarray(a) == np.asarray(b)).all()
            checked += 1
    assert checked > 0


@pytest.mark.parametrize("path", _streams()[:6],
                         ids=lambda p: p.split("/")[-1].replace(".ivf", ""))
def test_device_wavefront_matches_serial(path, native_lib):
    """Device (jitted scan) executor == serial spec model, CPU backend."""
    from av1dec_tpu.pipeline.device_recon import DeviceRecon
    p = NativeParser()
    checked = 0
    for _, d in aomffi.read_ivf(path):
        for hdr, plans in p.parse_tu(d, with_plans=True):
            if plans is None:
                continue
            dr = DeviceRecon(p.seq, hdr, plans)
            if not dr.supported():
                continue
            ref = FrameRecon(p.seq, hdr, plans).run()
            got = dr.run()
            for a, b in zip(ref, got):
                assert (np.asarray(a) == np.asarray(b)).all()
            checked += 1
    if checked == 0:
        pytest.skip("no device-eligible frames in stream")
