"""Whole-stream bit-exactness check: Decoder API vs the libaom oracle.

Usage: python tools/check_decode.py a.ivf b.ivf ...
Prints per-frame mismatch counts and a per-stream PASS/FAIL verdict.
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import numpy as np  # noqa: E402
import aomffi  # noqa: E402
from av1dec_tpu.api import decode_ivf  # noqa: E402
from av1dec_tpu.config import DecoderConfig  # noqa: E402

# correctness oracle runs: NumPy spec pipeline (no device compiles)
_CFG = DecoderConfig(use_spec_kernels=True)


def check(path, verbose=True):
    oracle_frames = aomffi.oracle_decode_ivf(path)
    ours = decode_ivf(path, config=_CFG)
    ok = True
    if len(ours) != len(oracle_frames):
        print(f"  FRAME COUNT: ours {len(ours)} vs oracle "
              f"{len(oracle_frames)}")
        ok = False
    for fi, (mine, oracle) in enumerate(zip(ours, oracle_frames)):
        refp = [x for x in (oracle.y, oracle.u, oracle.v) if x is not None]
        bad = 0
        tot = 0
        for m, r in zip(mine.planes, refp):
            m = np.asarray(m)[: r.shape[0], : r.shape[1]]
            bad += int((m != r.astype(np.int64)).sum())
            tot += r.size
        if verbose or bad:
            print(f"  frame {fi}: {bad}/{tot}")
        ok = ok and bad == 0
    return ok


if __name__ == "__main__":
    verbose = "-q" not in sys.argv
    fails = []
    for path in sys.argv[1:]:
        if path == "-q":
            continue
        print(path, flush=True)
        try:
            ok = check(path, verbose)
        except Exception as e:  # noqa: BLE001
            print(f"  ERROR: {type(e).__name__}: {e}")
            ok = False
        print(f"  -> {'PASS' if ok else 'FAIL'}", flush=True)
        if not ok:
            fails.append(path)
    print("FAILS:", fails if fails else "none")
    sys.exit(1 if fails else 0)
