"""CLI smoke + MD5-vs-oracle test."""
import hashlib
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_md5_matches_oracle():
    import gen_inter_battery as gb
    import aomffi
    import numpy as np

    path = gb.gen_case("err_resilient", gb.CASES["err_resilient"],
                       "/tmp/inter_battery")
    md5 = hashlib.md5()
    for fr in aomffi.oracle_decode_ivf(path):
        for p in (fr.y, fr.u, fr.v):
            if p is not None:
                md5.update(np.asarray(p).astype(np.uint8).tobytes())
    expected = md5.hexdigest()

    out = subprocess.run(
        [sys.executable, "-m", "av1dec_tpu", path, "--md5"],
        capture_output=True, text=True, cwd=_REPO, timeout=300)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().splitlines()[-1] == expected


def test_cli_gop_workers_matches_serial():
    """--gop-workers N produces byte-identical output to serial CLI."""
    import gen_inter_battery as gb
    path = gb.gen_case("err_resilient", gb.CASES["err_resilient"],
                       "/tmp/inter_battery")
    outs = []
    for extra in ([], ["--gop-workers", "2"]):
        r = subprocess.run(
            [sys.executable, "-m", "av1dec_tpu", path, "--md5",
             "--device", "off"] + extra,
            capture_output=True, text=True, cwd=_REPO, timeout=300)
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout.strip().splitlines()[-1])
    assert outs[0] == outs[1]
