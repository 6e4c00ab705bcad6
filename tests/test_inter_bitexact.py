"""Inter-frame end-to-end bit-exactness vs the libaom oracle.

A representative subset of the full inter battery
(tools/gen_inter_battery.py; run `python tools/check_decode.py
/tmp/inter_battery/*.ivf` for the complete 38-stream sweep).  Covers:
CDF chaining across frames (primary_ref loading), the MV prediction
stack, compound modes, OBMC, warped motion, temporal MVP, sub-8x8
chroma, film grain synthesis, 10-bit, and frame-geometry edge cases.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

CASES = [
    "err_resilient",   # default CDFs every frame, all filters
    "er_nofilt",       # error-resilient, filters off
    "er_small",        # error-resilient, small frame
    "notmvp",          # CDF chaining, no temporal MVP
    "neither",         # no warp, no obmc
    "lowdelay",        # basic low-delay chain
    "threads1",        # cpu-used 3 variant
    "switchable",      # switchable interp filters
    "warp",            # warped motion + OBMC + temporal MVP
    "warponly",        # warped motion isolated
    "obmc",            # overlapped MC incl. small-chroma skip rule
    "obmconly",        # OBMC isolated
    "compound",        # compound refs, masked/dist-wtd/interintra
    "bframes",         # forward/backward refs, show_existing_frame
    "small_mvp",       # temporal MVP on a small frame
    "tile0",           # multi-tile inter
    "aq0",             # aq-mode 0 (segmentation off)
    "mrf3",            # 3 reference frames
    "t160x128",        # geometry edge + intra edge upsample clamp
    "t192x64",         # wide geometry
    "w136",            # non-128-multiple width
    "g128x128",        # full-feature geometry sweep
    "long128",         # 16-frame CDF/ref chaining
    "wrap128",         # order-hint wraparound
    "interbd10",       # 10-bit inter
    "intermono",       # monochrome inter
    "grain",           # film grain synthesis
    "grain10",         # film grain at 10-bit
    "scaledref",       # scaled references + cdef-idx backfill case
    "scaledref2",      # scaled references (half-width inter frames)
    "sres_inter",      # superres in the inter ref loop
    "qm_inter",        # quantizer matrices on inter frames
    "screen",          # screen content: palette + intrabc
]


def _stream(name):
    import gen_inter_battery as gb
    outdir = "/tmp/inter_battery"
    os.makedirs(outdir, exist_ok=True)
    return gb.gen_case(name, gb.CASES[name], outdir)


@pytest.mark.parametrize("name", CASES)
def test_inter_stream_bitexact(name):
    import check_decode
    path = _stream(name)
    assert check_decode.check(path, verbose=False), \
        f"{name}: mismatch vs libaom oracle"
