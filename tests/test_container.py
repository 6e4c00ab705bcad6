"""Container formats + metadata OBUs + operating-point plumbing.

Annex-B demux [SPEC Annex B], raw-OBU input, metadata OBU parse
[SPEC §5.8.4] surfaced on OutputFrame, and the layer-filter API.
"""
import numpy as np
import pytest

from av1dec_tpu import container
from av1dec_tpu.api import Decoder, decode_file
from av1dec_tpu.config import DecoderConfig

CFG = DecoderConfig(use_spec_kernels=True)


def test_annexb_round_trip(spec_stream):
    src = spec_stream("multi")
    tus = [d for _, d in container.read_ivf(src)]
    path = "/tmp/pytest_streams/multi.annexb"
    container.write_annexb(path, tus)
    assert container.detect_format(path) == "annexb"
    a = decode_file(src, CFG)
    b = decode_file(path, CFG)
    assert len(a) == len(b) > 0
    assert [x.md5() for x in a] == [y.md5() for y in b]


def test_raw_obu_stream(spec_stream):
    src = spec_stream("base")
    tus = [d for _, d in container.read_ivf(src)]
    path = "/tmp/pytest_streams/base.obu"
    with open(path, "wb") as f:
        for tu in tus:
            f.write(tu)
    assert container.detect_format(path) == "obu"
    a = decode_file(src, CFG)
    b = decode_file(path, CFG)
    assert [x.md5() for x in a] == [y.md5() for y in b]


def test_metadata_obu_surfaced(spec_stream):
    """Inject HDR CLL + MDCV metadata OBUs into a TU; they must appear
    on the emitted OutputFrame."""
    src = spec_stream("base")
    tus = [d for _, d in container.read_ivf(src)]

    def obu_metadata(payload):
        return bytes([5 << 3 | 0x02]) + container.leb128(len(payload)) \
            + payload

    cll = obu_metadata(container.leb128(1) +
                       (1000).to_bytes(2, "big") + (300).to_bytes(2, "big"))
    mdcv_body = b"".join(v.to_bytes(2, "big")
                         for v in (100, 200, 300, 400, 500, 600, 700, 800))
    mdcv = obu_metadata(container.leb128(2) + mdcv_body +
                        (12345).to_bytes(4, "big") + (67).to_bytes(4, "big"))
    dec = Decoder(CFG)
    frames = dec.decode(cll + mdcv + tus[0])
    dec.close()
    assert frames
    md = frames[0].metadata
    assert md["have_cll"] == 1 and md["max_cll"] == 1000 \
        and md["max_fall"] == 300
    assert md["have_mdcv"] == 1
    assert md["primaries"][:2] == [100, 200]
    assert md["max_luminance"] == 12345 and md["min_luminance"] == 67


def test_operating_point_config(spec_stream):
    """operating_point selection plumbs through (single-op streams:
    op 0 and an out-of-range op decode identically)."""
    src = spec_stream("base")
    a = decode_file(src, DecoderConfig(use_spec_kernels=True,
                                       operating_point=0))
    b = decode_file(src, DecoderConfig(use_spec_kernels=True,
                                       operating_point=3))
    assert [x.md5() for x in a] == [y.md5() for y in b]


def test_truncated_annexb_raises_valueerror(spec_stream):
    """File-level demux fails as cleanly as TU-level decode."""
    src = spec_stream("multi")
    tus = [d for _, d in container.read_ivf(src)]
    path = "/tmp/pytest_streams/multi_trunc.annexb"
    container.write_annexb(path, tus)
    data = open(path, "rb").read()
    for cut in (len(data) // 3, len(data) - 2):
        with open(path + ".cut", "wb") as f:
            f.write(data[:cut])
        with pytest.raises(ValueError):
            list(container.read_temporal_units(path + ".cut"))


def test_index_keyframes_skips_seq_header_and_forward_keys(tmp_path):
    """index_keyframes must key off FRAME/FRAME_HEADER OBUs (type 3/6),
    not a repeated SEQUENCE_HEADER (type 1), and must require the
    show_frame bit (a forward keyframe is not a safe split point)."""
    def obu(typ, payload):
        return bytes([typ << 3 | 0x02]) + container.leb128(len(payload)) \
            + payload

    td = obu(2, b"")
    # sequence header whose first payload byte would parse as
    # frame_type=KEY/show_frame=1 if misread as a frame header
    seq_hdr = obu(1, bytes([0x10, 0x00, 0x00]))
    key_shown = obu(6, bytes([0x10]))       # 0,00,1 -> KEY shown
    key_fwd = obu(6, bytes([0x00]))         # 0,00,0 -> KEY, not shown
    inter = obu(6, bytes([0x30]))           # 0,01,1 -> INTER shown
    tus = [td + seq_hdr + key_shown,        # 0: real keyframe
           td + seq_hdr + inter,            # 1: repeated seq hdr + inter
           td + key_fwd,                    # 2: forward keyframe
           td + key_shown]                  # 3: real keyframe
    path = "/tmp/pytest_streams/kf_index.ivf"
    import struct
    with open(path, "wb") as f:
        f.write(b"DKIF" + struct.pack("<HH4sHHIIII", 0, 32, b"AV01",
                                      64, 64, 30, 1, len(tus), 0))
        for i, tu in enumerate(tus):
            f.write(struct.pack("<IQ", len(tu), i) + tu)
    assert container.index_keyframes(path) == [0, 3]
