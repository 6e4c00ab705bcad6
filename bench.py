"""Benchmark: decode throughput on a 1080p intra stream.

Prints ONE JSON line:
  {"metric": "fps_1080p_intra", "value": N, "unit": "frames/s",
   "vs_baseline": N}
vs_baseline is the ratio against libaom's decoder on the same stream
(the local C-reference stand-in; BASELINE.md).  Decode output is
verified bit-exact against the oracle before timing counts.
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

STREAM = "/tmp/av1dec_bench_1080p.ivf"
W, H, FRAMES = 1920, 1080, 2


def ensure_stream():
    if os.path.exists(STREAM):
        return
    import numpy as np
    import aomffi
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[:H, :W]
    y = (110 + 70 * np.sin(xx / 17.0) * np.cos(yy / 23.0) +
         rng.normal(0, 12, (H, W))).clip(0, 255).astype(np.uint8)
    u = (128 + 40 * np.sin(xx[:H // 2, :W // 2] / 13.0) +
         rng.normal(0, 8, (H // 2, W // 2))).clip(0, 255).astype(np.uint8)
    v = (128 + 40 * np.cos(yy[:H // 2, :W // 2] / 15.0) +
         rng.normal(0, 8, (H // 2, W // 2))).clip(0, 255).astype(np.uint8)
    enc = aomffi.AomEncoder(W, H, cpu_used=6, kf_max_dist=1, lag=0,
                            options=[("cq-level", "40")], end_usage=3)
    pkts = []
    for i in range(FRAMES):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    enc.close()
    aomffi.write_ivf(STREAM, pkts, W, H)


def main():
    import numpy as np
    import aomffi
    from av1dec_tpu.bindings import NativeParser
    from av1dec_tpu.pipeline.recon import FrameRecon

    ensure_stream()
    datas = [d for _, d in aomffi.read_ivf(STREAM)]
    oracle = aomffi.oracle_decode_ivf(STREAM)

    # --- verification pass (untimed)
    bad = 0
    p = NativeParser()
    for fi, d in enumerate(datas):
        for hdr, plans in p.parse_tu(d, with_plans=True):
            planes = FrameRecon(p.seq, hdr, plans).run()
            refp = [x.astype(np.int64) for x in
                    (oracle[fi].y, oracle[fi].u, oracle[fi].v)
                    if x is not None]
            bad += sum(int((m[:r.shape[0], :r.shape[1]] != r).sum())
                       for m, r in zip(planes, refp))

    # --- timed decode pass (entropy front-half + pixel back-half)
    t0 = time.time()
    n = 0
    p = NativeParser()
    for d in datas:
        for hdr, plans in p.parse_tu(d, with_plans=True):
            FrameRecon(p.seq, hdr, plans).run()
            n += 1
    mine = n / (time.time() - t0)

    # --- baseline: libaom decoder on the same stream
    dec = aomffi.AomDecoder()
    t0 = time.time()
    cnt = 0
    for d in datas:
        cnt += len(dec.decode(d))
    cnt += len(dec.decode(None))
    base = cnt / (time.time() - t0)

    value = 0.0 if bad else round(mine, 4)
    print(json.dumps({
        "metric": "fps_1080p_intra",
        "value": value,
        "unit": "frames/s",
        "vs_baseline": round(value / base, 4) if base else 0.0,
    }))


if __name__ == "__main__":
    main()
