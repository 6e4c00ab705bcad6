"""Quick bit-exactness check of spec-model recon vs the libaom oracle."""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import numpy as np  # noqa: E402
import aomffi  # noqa: E402
from av1dec_tpu.bindings import NativeParser  # noqa: E402
from av1dec_tpu.pipeline.recon import FrameRecon  # noqa: E402


def check(path, verbose=True):
    oracle_frames = aomffi.oracle_decode_ivf(path)
    p = NativeParser()
    results = []
    fi = 0
    for _, data in aomffi.read_ivf(path):
        for hdr, plans in p.parse_tu(data, with_plans=True):
            oracle = oracle_frames[fi]
            refp = [x for x in (oracle.y, oracle.u, oracle.v)
                    if x is not None]
            planes = FrameRecon(p.seq, hdr, plans).run()
            bad = sum(int((m[: r.shape[0], : r.shape[1]] !=
                           r.astype(np.int64)).sum())
                      for m, r in zip(planes, refp))
            tot = sum(r.size for r in refp)
            results.append((bad, tot))
            if verbose:
                print(f"  frame {fi}: {bad}/{tot}")
            fi += 1
    return results


if __name__ == "__main__":
    for path in sys.argv[1:]:
        print(path)
        check(path)
