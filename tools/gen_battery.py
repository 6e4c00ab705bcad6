"""Generate a battery of intra test streams with libaom and check
bit-exactness of the native parse + spec recon against the oracle.

Usage: python tools/gen_battery.py [outdir] [--only NAME]
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import numpy as np  # noqa: E402
import aomffi  # noqa: E402


def _noise(rng, h, w, lo=0, hi=256):
    """Smooth-ish test content: blurred noise + gradients (compressible
    but non-trivial)."""
    a = rng.integers(lo, hi, (h // 4 + 2, w // 4 + 2)).astype(np.float32)
    big = np.kron(a, np.ones((4, 4), np.float32))[:h, :w]
    yy, xx = np.mgrid[:h, :w]
    g = (xx * 0.3 + yy * 0.2)
    return np.clip(big * 0.7 + g % (hi - lo) + lo * 0.3, lo, hi - 1)


def make_frames(w, h, n, bit_depth=8, subsampling=(1, 1), mono=False,
                seed=7):
    rng = np.random.default_rng(seed)
    hi = 1 << bit_depth
    dt = np.uint16 if bit_depth > 8 else np.uint8
    sx, sy = subsampling
    cw, ch = (w + sx) >> sx, (h + sy) >> sy
    out = []
    for i in range(n):
        y = _noise(rng, h, w, 0, hi).astype(dt)
        if mono:
            out.append((y, None, None))
        else:
            u = _noise(rng, ch, cw, hi // 4, 3 * hi // 4).astype(dt)
            v = _noise(rng, ch, cw, hi // 4, 3 * hi // 4).astype(dt)
            out.append((y, u, v))
    return out


BASE_OPTS = [("enable-cdef", "0"), ("enable-restoration", "0")]

# name -> dict(w, h, frames, enc kwargs, extra options)
CASES = {
    "odd67x45":   dict(w=67, h=45, n=1, cq=8),
    "odd120x90":  dict(w=120, h=90, n=1, cq=8),
    "tiny36x20":  dict(w=36, h=20, n=1, cq=8),
    "big256x192": dict(w=256, h=192, n=1, cq=10),
    "multi3":     dict(w=96, h=64, n=3, cq=8),
    "mono":       dict(w=64, h=64, n=1, cq=8, mono=True),
    "i444":       dict(w=64, h=64, n=1, cq=8, subsampling=(0, 0)),
    "i422":       dict(w=64, h=64, n=1, cq=8, subsampling=(1, 0)),
    "bd10":       dict(w=64, h=64, n=1, cq=8, bit_depth=10),
    "bd12":       dict(w=64, h=64, n=1, cq=8, bit_depth=12),
    "lossless":   dict(w=64, h=48, n=1, cq=0,
                       extra=[("lossless", "1")]),
    "oddchroma":  dict(w=65, h=33, n=1, cq=8),
    "q100":       dict(w=96, h=64, n=1, cq=40),
    "q200":       dict(w=96, h=64, n=1, cq=55),
    "q255":       dict(w=128, h=128, n=1, cq=63),
    "q_sharp":    dict(w=96, h=96, n=1, cq=55,
                       extra=[("sharpness", "4")]),
    "q_dlf":      dict(w=128, h=96, n=1, cq=55,
                       extra=[("deltaq-mode", "1"), ("delta-lf-mode", "1")]),
    "bd10_q":     dict(w=96, h=96, n=1, cq=55, bit_depth=10),
    "big_q":      dict(w=320, h=240, n=2, cq=50),
    "mono_q":     dict(w=96, h=96, n=1, cq=55, mono=True),
    "i444_q":     dict(w=96, h=96, n=1, cq=55, subsampling=(0, 0)),
    "cdef":       dict(w=128, h=96, n=1, cq=55,
                       extra=[("enable-cdef", "1")]),
    "cdef_big":   dict(w=320, h=240, n=1, cq=60,
                       extra=[("enable-cdef", "1")]),
    "cdef_444":   dict(w=96, h=96, n=1, cq=55, subsampling=(0, 0),
                       extra=[("enable-cdef", "1")]),
    "cdef_bd10":  dict(w=96, h=96, n=1, cq=55, bit_depth=10,
                       extra=[("enable-cdef", "1")]),
    "cdef_mono":  dict(w=96, h=96, n=1, cq=58, mono=True,
                       extra=[("enable-cdef", "1")]),
    "lr":         dict(w=192, h=128, n=1, cq=50,
                       extra=[("enable-restoration", "1")]),
    "lr_cdef":    dict(w=192, h=160, n=1, cq=58,
                       extra=[("enable-restoration", "1"),
                              ("enable-cdef", "1")]),
    "lr_bd10":    dict(w=128, h=96, n=1, cq=50, bit_depth=10,
                       extra=[("enable-restoration", "1")]),
    "lr_444":     dict(w=128, h=96, n=1, cq=50, subsampling=(0, 0),
                       extra=[("enable-restoration", "1")]),
    "qm":         dict(w=128, h=96, n=1, cq=40,
                       extra=[("enable-qm", "1"), ("qm-min", "0"),
                              ("qm-max", "4")]),
    "qm_strong":  dict(w=128, h=128, n=1, cq=55,
                       extra=[("enable-qm", "1"), ("qm-min", "0"),
                              ("qm-max", "0")]),
    "qm_444":     dict(w=96, h=96, n=1, cq=40, subsampling=(0, 0),
                       extra=[("enable-qm", "1"), ("qm-min", "2"),
                              ("qm-max", "6")]),
    "qm_bd10":    dict(w=96, h=96, n=1, cq=40, bit_depth=10,
                       extra=[("enable-qm", "1"), ("qm-min", "0"),
                              ("qm-max", "4")]),
}


def gen_case(name, spec, outdir):
    w, h = spec["w"], spec["h"]
    bd = spec.get("bit_depth", 8)
    ss = spec.get("subsampling", (1, 1))
    mono = spec.get("mono", False)
    opts = BASE_OPTS + [("cq-level", str(spec.get("cq", 8)))] + \
        spec.get("extra", [])
    enc = aomffi.AomEncoder(w, h, bit_depth=bd, subsampling=ss,
                            cpu_used=6, kf_max_dist=1, lag=0,
                            options=opts, monochrome=mono, end_usage=3)
    frames = make_frames(w, h, spec["n"], bit_depth=bd, subsampling=ss,
                         mono=mono)
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        pkts += enc.encode(y, u, v, pts=i)
    pkts += enc.flush()
    enc.close()
    path = os.path.join(outdir, name + ".ivf")
    aomffi.write_ivf(path, pkts, w, h)
    return path


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 and not \
        sys.argv[1].startswith("--") else "/tmp/battery"
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    os.makedirs(outdir, exist_ok=True)
    import check_streams
    n_ok = n_fail = 0
    for name, spec in CASES.items():
        if only and name != only:
            continue
        path = os.path.join(outdir, name + ".ivf")
        if not os.path.exists(path):
            try:
                gen_case(name, spec, outdir)
            except Exception as e:
                print(f"{name}: ENCODE FAILED: {e}")
                n_fail += 1
                continue
        try:
            results = check_streams.check(path, verbose=False)
            bad = sum(b for b, _ in results)
            tot = sum(t for _, t in results)
            status = "OK " if bad == 0 else "FAIL"
            print(f"{name}: {status} {bad}/{tot} over {len(results)} frames")
            n_ok += bad == 0
            n_fail += bad != 0
        except Exception as e:
            print(f"{name}: DECODE FAILED: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")


if __name__ == "__main__":
    main()
