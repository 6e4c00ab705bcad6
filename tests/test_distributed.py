"""Multi-host distribution [SURVEY §2.5]: two REAL processes join a
jax.distributed cluster, see one global device namespace, and decode
disjoint GOP shards of one stream whose union equals a serial decode
byte for byte.  (Cross-process collectives are attempted and reported;
GOP data-parallelism itself needs none — that is the point of
keyframe sharding.)"""
import hashlib
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from av1dec_tpu.api import decode_file
from av1dec_tpu.config import DecoderConfig

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gop_stream():
    from test_gop_parallel import _gop_stream as g
    return g()


def test_two_process_gop_sharding():
    path = _gop_stream()
    port = 12787
    outs = [f"/tmp/dist_worker_{i}.json" for i in range(2)]
    for o in outs:
        if os.path.exists(o):
            os.remove(o)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(_REPO, "tools", "dist_worker.py"),
         f"localhost:{port}", "2", str(i), path, outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    for p in procs:
        try:
            p.wait(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
    for i, p in enumerate(procs):
        assert p.returncode == 0, p.stderr.read().decode()[-2000:]
    res = [json.load(open(o)) for o in outs]

    # one global namespace: 2 processes x 2 local devices = 4 global
    for i, r in enumerate(res):
        assert r["process_count"] == 2
        assert r["process_id"] == i
        assert r["global_devices"] == 4
        assert r["local_devices"] == 2
        if r["collective_ok"]:
            # psum of per-process ids over 4 devices = 0+0+1+1
            assert r["psum"] == 2

    # GOP shards are disjoint, cover the stream, and match serial decode
    serial = decode_file(path, DecoderConfig(use_spec_kernels=True))
    serial_md5 = [f.md5() for f in serial]
    gops = {}
    for r in res:
        for gi, md5s in r["gops"].items():
            assert gi not in gops, "overlapping GOP assignment"
            gops[int(gi)] = md5s
    merged = []
    for gi in sorted(gops):
        merged += gops[gi]
    assert merged == serial_md5
