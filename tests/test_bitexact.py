"""End-to-end bit-exactness: native entropy decode + spec recon +
filter chain vs the libaom oracle, over small streams covering the
feature matrix (SURVEY.md §4 conformance tier)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


CASES = {
    # name -> (w, h, frames, cq, kwargs)
    "base":    dict(w=64, h=64, n=1, cq=8),
    "odd":     dict(w=67, h=45, n=1, cq=8),
    "hi_q":    dict(w=96, h=64, n=1, cq=55),       # deblock active
    "cdef":    dict(w=96, h=96, n=1, cq=55,
                    extra=[("enable-cdef", "1")]),
    "lr":      dict(w=128, h=96, n=1, cq=45, cpu=3, noise=25,
                    extra=[("enable-restoration", "1")]),
    "bd10":    dict(w=64, h=64, n=1, cq=30, bit_depth=10),
    "mono":    dict(w=64, h=64, n=1, cq=30, mono=True),
    "i444":    dict(w=64, h=64, n=1, cq=30, subsampling=(0, 0)),
    "lossless": dict(w=64, h=48, n=1, cq=0, extra=[("lossless", "1")]),
    "multi":   dict(w=96, h=64, n=2, cq=30),
    "tiles":   dict(w=256, h=192, n=1, cq=50,
                    extra=[("tile-columns", "1"), ("tile-rows", "1"),
                           ("enable-cdef", "1"),
                           ("enable-restoration", "1")]),
    "rect64":  dict(w=32, h=64, n=1, cq=50, noise=8),
}


def _gen(name, spec, tmp_path_factory):
    import aomffi
    path = os.path.join("/tmp/pytest_streams", name + ".ivf")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(hash(name) % 2**32)
    w, h = spec["w"], spec["h"]
    bd = spec.get("bit_depth", 8)
    ss = spec.get("subsampling", (1, 1))
    mono = spec.get("mono", False)
    noise = spec.get("noise", 12)
    opts = [("enable-cdef", "0"), ("enable-restoration", "0"),
            ("cq-level", str(spec["cq"]))] + spec.get("extra", [])
    # later options win in aom's option parser? ensure explicit ones last
    enc = aomffi.AomEncoder(w, h, bit_depth=bd, subsampling=ss,
                            cpu_used=spec.get("cpu", 6), kf_max_dist=1,
                            lag=0, options=opts, monochrome=mono,
                            end_usage=3)
    hi = 1 << bd
    dt = np.uint16 if bd > 8 else np.uint8
    yy, xx = np.mgrid[:h, :w]
    pkts = []
    for i in range(spec["n"]):
        y = (hi // 2 + (hi // 4) * np.sin(xx / 9.0) * np.cos(yy / 11.0) +
             rng.normal(0, noise * hi / 256, (h, w))).clip(0, hi - 1) \
            .astype(dt)
        if mono:
            u = v = None
        else:
            sx, sy = ss
            cw, ch = (w + sx) >> sx, (h + sy) >> sy
            u = (hi // 2 + rng.normal(0, 10 * hi / 256, (ch, cw))) \
                .clip(0, hi - 1).astype(dt)
            v = (hi // 2 + rng.normal(0, 10 * hi / 256, (ch, cw))) \
                .clip(0, hi - 1).astype(dt)
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    enc.close()
    aomffi.write_ivf(path, pkts, w, h)
    return path


@pytest.mark.parametrize("name", sorted(CASES))
def test_stream_bitexact(name, tmp_path_factory):
    import check_streams
    path = _gen(name, CASES[name], tmp_path_factory)
    results = check_streams.check(path, verbose=False)
    assert results, "no frames decoded"
    for fi, (bad, tot) in enumerate(results):
        assert bad == 0, f"{name} frame {fi}: {bad}/{tot} mismatched"
