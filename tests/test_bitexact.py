"""End-to-end bit-exactness: native entropy decode + spec recon +
filter chain vs the libaom oracle, over small streams covering the
feature matrix (SURVEY.md §4 conformance tier).  The stream matrix
lives in conftest.SPEC_CASES so other modules (wavefront/device tiers)
parametrize over the same static name list."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from conftest import SPEC_CASES


@pytest.mark.parametrize("name", sorted(SPEC_CASES))
def test_stream_bitexact(name, spec_stream):
    import check_streams
    path = spec_stream(name)
    results = check_streams.check(path, verbose=False)
    assert results, "no frames decoded"
    for fi, (bad, tot) in enumerate(results):
        assert bad == 0, f"{name} frame {fi}: {bad}/{tot} mismatched"
