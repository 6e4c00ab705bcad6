"""Mid-GOP checkpoint/resume [SURVEY §5.4].

Decode state = native header-level state (per-slot CDFs, seg maps,
motion fields, order hints) + pixel DPB.  Saving at an arbitrary
temporal-unit boundary inside a GOP and restoring into a FRESH decoder
must continue the decode byte-identically — CDF forward adaptation and
temporal MVP make this the strictest state-completeness check there is.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from av1dec_tpu.api import Decoder  # noqa: E402
from av1dec_tpu.config import DecoderConfig  # noqa: E402
from av1dec_tpu.container import read_temporal_units  # noqa: E402

CFG = DecoderConfig(use_spec_kernels=True)


def _stream(name):
    import gen_inter_battery as gb
    return gb.gen_case(name, gb.CASES[name], "/tmp/inter_battery")


@pytest.mark.parametrize("name,cut", [("long128", 7), ("long128", 3),
                                      ("bframes", 4), ("grain", 2)])
def test_checkpoint_resume_matches_straight_decode(name, cut, native_lib):
    path = _stream(name)
    tus = [tu for _, tu in read_temporal_units(path)]
    assert cut < len(tus)

    dec = Decoder(CFG)
    straight = []
    for tu in tus:
        straight += dec.decode(tu)
    dec.close()

    dec1 = Decoder(CFG)
    part1 = []
    for tu in tus[:cut]:
        part1 += dec1.decode(tu)
    blob = dec1.save_state()
    dec1.close()

    dec2 = Decoder(CFG)
    dec2.load_state(blob)
    part2 = []
    for tu in tus[cut:]:
        part2 += dec2.decode(tu)
    dec2.close()

    got = part1 + part2
    assert len(got) == len(straight) > 0
    assert [f.md5() for f in got] == [f.md5() for f in straight]


def test_checkpoint_rejects_garbage(native_lib):
    dec = Decoder(CFG)
    with pytest.raises(Exception):
        dec.load_state(b"\x00" * 64)
    dec.close()
