"""GOP/keyframe sharding: keyframe-delimited GOPs decode independently
in worker processes, output identical to serial decode
[SURVEY §2.4 "GOP/keyframe sharding"]."""
import numpy as np

from av1dec_tpu import container
from av1dec_tpu.api import decode_file
from av1dec_tpu.config import DecoderConfig

CFG = DecoderConfig(use_spec_kernels=True)


def _gop_stream(tmp_path_factory=None):
    import aomffi
    from conftest import _synth_frame
    path = "/tmp/pytest_streams/gops.ivf"
    import os
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        rng = np.random.default_rng(9)
        enc = aomffi.AomEncoder(128, 96, cpu_used=9, kf_max_dist=4,
                                lag=0, bitrate_kbps=300)
        pkts = []
        for t in range(12):
            pkts += enc.encode(*_synth_frame(128, 96, t, rng), pts=t)
        pkts += enc.flush()
        enc.close()
        aomffi.write_ivf(path, pkts, 128, 96)
    return path


def test_keyframe_index():
    path = _gop_stream()
    assert container.index_keyframes(path) == [0, 4, 8]


def test_gop_parallel_matches_serial():
    path = _gop_stream()
    a = decode_file(path, CFG)
    b = container.decode_gops_parallel(path, workers=2)
    assert len(a) == len(b) == 12
    assert [x.md5() for x in a] == [y.md5() for y in b]


def test_gop_parallel_elastic_recovery(monkeypatch, tmp_path):
    """A worker process dying mid-decode must not lose its GOP: the
    GOP is reassigned and the output still equals serial decode
    [SURVEY §5.3 failure detection / elastic recovery]."""
    import glob
    import os
    path = _gop_stream()
    for f in glob.glob("/tmp/av1dec_killed_gop_*"):
        os.remove(f)
    # kill the worker handling the GOP that starts at TU 4, once
    monkeypatch.setenv("AV1DEC_TEST_KILL_GOP", "4")
    a = decode_file(path, CFG)
    b = container.decode_gops_parallel(path, workers=2)
    assert [x.md5() for x in a] == [y.md5() for y in b]
    # the kill really happened (marker created by the dying worker)
    assert glob.glob("/tmp/av1dec_killed_gop_4_*")
