"""Vectorized schedule builder == scalar reference, field-exact.

build_schedule_fast (numpy assembly + native ASAP level DP) is the
production scheduler; build_schedule_ref is the obviously-correct
scalar model.  Every stream of the spec-case matrix must produce
byte-identical schedules (levels, packed fields, slot maps).
"""
import numpy as np
import pytest

import aomffi
from av1dec_tpu.bindings import NativeParser
from av1dec_tpu.pipeline import wavefront as wf
from av1dec_tpu.pipeline.recon import FrameRecon
from conftest import SPEC_CASES


@pytest.mark.parametrize("name", sorted(SPEC_CASES))
def test_fast_schedule_equals_ref(name, spec_stream, native_lib):
    p = NativeParser()
    checked = 0
    for _, d in aomffi.read_ivf(spec_stream(name)):
        for hdr, plans in p.parse_tu(d, with_plans=True):
            if plans is None:
                continue
            fr = FrameRecon(p.seq, hdr, plans)
            ref = wf.build_schedule_ref(p.seq, hdr, plans, fr._filter_type)
            fast = wf.build_schedule_fast(p.seq, hdr, plans)
            assert (ref is None) == (fast is None)
            if ref is None:
                continue
            assert ref.n_levels == fast.n_levels
            assert sorted(ref.classes) == sorted(fast.classes)
            for k in ref.classes:
                a, b = ref.classes[k], fast.classes[k]
                assert (a.levels_sorted == b.levels_sorted).all(), k
                for f in wf._SCALAR_FIELDS:
                    assert (a.packed[f] == b.packed[f]).all(), (k, f)
            assert ref.res_count == fast.res_count
            assert {k: list(v) for k, v in ref.res_recs.items()} == \
                {k: list(v) for k, v in fast.res_recs.items()}
            assert set(ref.pal_preds) == set(fast.pal_preds)
            for k in ref.pal_preds:
                for pa, pb in zip(ref.pal_preds[k], fast.pal_preds[k]):
                    assert (np.asarray(pa) == np.asarray(pb)).all()
            checked += 1
    assert checked > 0
