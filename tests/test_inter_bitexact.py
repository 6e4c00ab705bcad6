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
    "notmvp",          # CDF chaining, no temporal MVP
    "warp",            # warped motion + OBMC + temporal MVP
    "obmc",            # overlapped MC incl. small-chroma skip rule
    "compound",        # compound refs, masked/dist-wtd/interintra
    "bframes",         # forward/backward refs, show_existing_frame
    "small_mvp",       # temporal MVP on a small frame
    "tile0",           # multi-tile inter
    "t160x128",        # geometry edge + intra edge upsample clamp
    "interbd10",       # 10-bit inter
    "grain",           # film grain synthesis
    "grain10",         # film grain at 10-bit
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
