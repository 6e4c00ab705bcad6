"""Corrupt/truncated-stream tolerance (SURVEY §5.3 failure tier).

The decoder must reject damaged temporal units with a clean error (no
crash, no sanitizer finding — the native battery also runs under
ASan/TSan) and keep working on subsequent good input.
"""
import numpy as np
import pytest

from av1dec_tpu import container
from av1dec_tpu.api import Decoder
from av1dec_tpu.config import DecoderConfig

CFG = DecoderConfig(use_spec_kernels=True)


def _tus(spec_stream, name="multi"):
    return [d for _, d in container.read_ivf(spec_stream(name))]


def test_truncated_tu_raises_cleanly(spec_stream):
    tus = _tus(spec_stream)
    dec = Decoder(CFG)
    for cut in (1, len(tus[0]) // 3, len(tus[0]) - 1):
        with pytest.raises(ValueError):
            dec.decode(tus[0][:cut])
    dec.close()


def test_corrupt_payload_no_crash(spec_stream):
    """Bit-flipped tile payloads must never crash: either a clean error
    or a (wrong-pixel) decode, deterministically."""
    tus = _tus(spec_stream)
    rng = np.random.default_rng(11)
    for trial in range(20):
        data = bytearray(tus[0])
        for _ in range(3):
            i = int(rng.integers(16, len(data)))  # skip seq header area
            data[i] ^= 1 << int(rng.integers(8))
        dec = Decoder(CFG)
        try:
            dec.decode(bytes(data))
        except (ValueError, AssertionError):
            pass  # clean rejection is fine
        finally:
            dec.close()


def test_decoder_recovers_after_error(spec_stream):
    """A failed TU must not poison the decoder: the next KEY frame
    decodes bit-exactly."""
    import aomffi
    path = spec_stream("multi")
    tus = _tus(spec_stream)
    oracle = aomffi.oracle_decode_ivf(path)
    dec = Decoder(CFG)
    with pytest.raises(ValueError):
        dec.decode(tus[0][: len(tus[0]) // 2])
    frames = dec.decode(tus[0])  # KEY frame: resets all state
    assert frames
    ref = oracle[0].y.astype(np.int64)
    got = np.asarray(frames[0].planes[0])[:ref.shape[0], :ref.shape[1]]
    assert (got == ref).all()
    dec.close()


def test_garbage_input(spec_stream):
    dec = Decoder(CFG)
    with pytest.raises(ValueError):
        dec.decode(b"\xff" * 100)
    dec.close()
