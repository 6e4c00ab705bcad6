"""Generate the inter-frame conformance battery into /tmp/inter_battery.

Reproducible generator for the streams exercised by
tests/test_inter_bitexact.py and `tools/check_decode.py`.  Content is
moving synthetic texture ((x+y+5t)%256 + stripes + noise) so motion
compensation, MV prediction, and the filter chain are all exercised.

Usage: python tools/gen_inter_battery.py [outdir] [--only NAME]
"""
import os
import struct
import sys
import zlib

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import numpy as np          # noqa: E402
import aomffi               # noqa: E402


def synth(w, h, t, rng, bd=8):
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx + yy + 5 * t) % 256).astype(np.int64)
    y[(yy // 16 + t) % 8 == 0] = 200
    y += rng.integers(-8, 8, y.shape)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    u = ((xx[:ch, :cw] // 2 + 16 * t) % 256).astype(np.int64)
    v = ((yy[:ch, :cw] // 2 + 128) % 256).astype(np.int64)
    sh = bd - 8
    dt = np.uint16 if bd > 8 else np.uint8
    return (np.clip(y, 0, 255).astype(dt) << sh,
            np.clip(u, 0, 255).astype(dt) << sh,
            np.clip(v, 0, 255).astype(dt) << sh)


def synth_screen(w, h, t, rng, bd=8):
    """Screen-like content: repeated 'glyph' tiles on flat background
    (drives palette + intra block copy on keyframes)."""
    glyphs = []
    g_rng = np.random.default_rng(99)
    for _ in range(8):
        g = np.zeros((12, 8), np.int64)
        g[g_rng.random((12, 8)) > 0.55] = 235
        glyphs.append(g)
    y = np.full((h, w), 28, np.int64)
    for r in range(2, h - 14, 16):
        for c in range(4, w - 10, 10):
            y[r:r + 12, c:c + 8] = glyphs[((r // 16) * 7 + c // 10 + t)
                                          % 8]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    u = np.full((ch, cw), 128, np.int64)
    v = np.full((ch, cw), 120, np.int64)
    sh = bd - 8
    dt = np.uint16 if bd > 8 else np.uint8
    return (np.clip(y, 0, 255).astype(dt) << sh,
            np.clip(u, 0, 255).astype(dt) << sh,
            np.clip(v, 0, 255).astype(dt) << sh)


_NOFEAT = [("enable-warped-motion", "0"), ("enable-obmc", "0"),
           ("enable-ref-frame-mvs", "0")]

# name -> spec. error_resilient streams force primary_ref_frame=NONE so
# every frame uses default CDFs (decodable standalone); the rest chain
# CDFs/refs frame to frame.
CASES = {
    "lowdelay":   dict(w=128, h=96, n=6, cpu=6),
    "threads1":   dict(w=128, h=96, n=6, cpu=3),
    "bframes":    dict(w=128, h=96, n=8, cpu=6, lag=8),
    "warp":       dict(w=192, h=128, n=6, cpu=3,
                       extra=[("enable-warped-motion", "1")]),
    "warponly":   dict(w=192, h=128, n=6, cpu=3,
                       extra=[("enable-warped-motion", "1"),
                              ("enable-obmc", "0"),
                              ("enable-ref-frame-mvs", "0")]),
    "obmc":       dict(w=192, h=128, n=6, cpu=3,
                       extra=[("enable-obmc", "1")]),
    "obmconly":   dict(w=192, h=128, n=6, cpu=3,
                       extra=[("enable-obmc", "1"),
                              ("enable-warped-motion", "0"),
                              ("enable-ref-frame-mvs", "0")]),
    "compound":   dict(w=128, h=96, n=8, cpu=3, lag=8,
                       extra=[("enable-dist-wtd-comp", "1"),
                              ("enable-masked-comp", "1"),
                              ("enable-interintra-comp", "1")]),
    "interbd10":  dict(w=128, h=96, n=4, cpu=6, bd=10),
    "intermono":  dict(w=128, h=96, n=4, cpu=6, mono=True),
    "switchable": dict(w=128, h=96, n=6, cpu=3,
                       extra=[("min-gf-interval", "4")]),
    "notmvp":     dict(w=192, h=128, n=6, cpu=3, extra=_NOFEAT),
    "neither":    dict(w=192, h=128, n=6, cpu=3,
                       extra=[("enable-warped-motion", "0"),
                              ("enable-obmc", "0")]),
    "aq0":        dict(w=192, h=128, n=6, cpu=3,
                       extra=[("aq-mode", "0")]),
    "aq0b":       dict(w=192, h=128, n=6, cpu=3,
                       extra=[("aq-mode", "0")] + _NOFEAT[:2]),
    "mrf3":       dict(w=192, h=128, n=6, cpu=3,
                       extra=_NOFEAT + [("max-reference-frames", "3")]),
    "mrf4":       dict(w=192, h=128, n=6, cpu=3,
                       extra=_NOFEAT + [("max-reference-frames", "4")]),
    "mrf5":       dict(w=192, h=128, n=6, cpu=3,
                       extra=_NOFEAT + [("max-reference-frames", "5")]),
    "small_mvp":  dict(w=64, h=64, n=4, cpu=3),
    "tile0":      dict(w=192, h=128, n=6, cpu=3,
                       extra=[("tile-columns", "1")] + _NOFEAT),
    # geometry sweep (exercise edge SBs / partial blocks)
    "t152x128":   dict(w=152, h=128, n=4, cpu=3, extra=_NOFEAT),
    "t160x128":   dict(w=160, h=128, n=4, cpu=3, extra=_NOFEAT),
    "t160x96":    dict(w=160, h=96, n=4, cpu=3, extra=_NOFEAT),
    "t192x64":    dict(w=192, h=64, n=4, cpu=3, extra=_NOFEAT),
    "t192x96":    dict(w=192, h=96, n=4, cpu=3, extra=_NOFEAT),
    "w136":       dict(w=136, h=128, n=4, cpu=3, extra=_NOFEAT),
    "w144":       dict(w=144, h=128, n=4, cpu=3, extra=_NOFEAT),
    "g128x128":   dict(w=128, h=128, n=4, cpu=3),
    "g160x128":   dict(w=160, h=128, n=4, cpu=3),
    "g192x96":    dict(w=192, h=96, n=4, cpu=3),
    "g256x128":   dict(w=256, h=128, n=4, cpu=3),
    "long128":    dict(w=128, h=96, n=16, cpu=6),
    "wrap128":    dict(w=128, h=96, n=10, cpu=3),
    # film grain synthesis (denoise-noise-level writes grain params)
    "grain":      dict(w=128, h=96, n=4, cpu=6,
                       extra=[("denoise-noise-level", "25"),
                              ("denoise-block-size", "32")]),
    "grain10":    dict(w=128, h=96, n=4, cpu=6, bd=10,
                       extra=[("denoise-noise-level", "18"),
                              ("denoise-block-size", "32")]),
    # error-resilient (default CDFs every frame; also disables ref-mvs)
    "err_resilient": dict(w=192, h=128, n=6, cpu=3, er=True),
    "er_nofilt":  dict(w=192, h=128, n=6, cpu=3, er=True,
                       extra=[("enable-cdef", "0"),
                              ("enable-restoration", "0")]),
    "er_small":   dict(w=64, h=64, n=4, cpu=3, er=True),
    # scaled references: inter frames coded at 2/3 size vs full-size KF
    "scaledref":  dict(w=192, h=128, n=4, cpu=3, resize_denom=12),
    "scaledref2": dict(w=192, h=128, n=6, cpu=6, resize_denom=16),
    # superres on inter frames (horizontal upscale in the ref loop)
    "sres_inter": dict(w=192, h=128, n=4, cpu=6, superres_denom=12),
    # quantizer matrices on inter frames
    "qm_inter":   dict(w=192, h=128, n=4, cpu=6,
                       extra=[("enable-qm", "1"), ("qm-min", "0"),
                              ("qm-max", "4")]),
    # screen content: palette + intrabc on the keyframe
    "screen":     dict(w=256, h=128, n=3, cpu=6, screen=True,
                       extra=[("tune-content", "screen"),
                              ("enable-intrabc", "1")]),
}


def _er_hook():
    """Return a context manager forcing g_error_resilient=1 in the
    encoder config (no public -aom option exposes it)."""
    import contextlib
    import ctypes as C

    @contextlib.contextmanager
    def hook():
        abi = aomffi.abi()
        real_init = aomffi._lib.aom_codec_enc_init_ver

        def patched(ctx, iface, cfg, flags, ver):
            struct.pack_into("<I", cfg, abi.cfg_timebase_den + 4, 1)
            return real_init(ctx, iface, cfg, flags, ver)

        aomffi._lib.aom_codec_enc_init_ver = patched
        try:
            yield
        finally:
            aomffi._lib.aom_codec_enc_init_ver = real_init

    return hook()


def gen_case(name, spec, outdir):
    path = os.path.join(outdir, name + ".ivf")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(zlib.crc32(name.encode()) & 0xFFFF)
    bd = spec.get("bd", 8)
    w, h, n = spec["w"], spec["h"], spec["n"]
    import contextlib
    ctx = _er_hook() if spec.get("er") else contextlib.nullcontext()
    with ctx:
        enc = aomffi.AomEncoder(
            w, h, bit_depth=bd, cpu_used=spec.get("cpu", 6),
            bitrate_kbps=300, kf_max_dist=9999, lag=spec.get("lag", 0),
            options=spec.get("extra", []),
            monochrome=spec.get("mono", False),
            superres_denom=spec.get("superres_denom"),
            resize_denom=spec.get("resize_denom"))
    pkts = []
    for t in range(n):
        if spec.get("screen"):
            y, u, v = synth_screen(w, h, t, rng, bd)
        else:
            y, u, v = synth(w, h, t, rng, bd)
        if spec.get("mono"):
            u = v = None
        pkts += enc.encode(y, u, v, pts=t)
    pkts += enc.flush()
    enc.close()
    aomffi.write_ivf(path, pkts, w, h)
    return path


def main():
    outdir = "/tmp/inter_battery"
    only = None
    args = sys.argv[1:]
    if args and not args[0].startswith("--"):
        outdir = args.pop(0)
    if "--only" in args:
        only = args[args.index("--only") + 1]
    os.makedirs(outdir, exist_ok=True)
    for name, spec in CASES.items():
        if only and name != only:
            continue
        try:
            print(gen_case(name, spec, outdir))
        except Exception as e:
            print(f"{name}: ENCODE FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
