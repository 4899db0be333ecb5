"""CRAM 3.1 name-tokeniser (tok3, block method 8) tests.

Structural fixtures are hand-assembled per the serialisation documented in
io/tok3.py (decoder exercised on bytes the encoder never produced), plus
round-trips over realistic read-name shapes and the container-level e2e in
test_cram.py (3.1 writer compresses RN with tok3).
"""

import struct

import pytest

from portello_tpu.io import rans_nx16, tok3


def blob(names):
    return b"".join(n + b"\x00" for n in names)


# ---------------------------------------------------------------------------
# hand-assembled structural fixtures
# ---------------------------------------------------------------------------

def _stream_frag(desc, payload):
    comp = rans_nx16.encode(payload, use_cat=True)
    return bytes([desc]) + rans_nx16.write_uint7(len(comp)) + comp


def test_hand_built_single_name():
    """"r7": DIFF(0) at pos 0; STRING "r" at pos 1 (DIGITS 7 at pos 2 via
    MATCHless literal); END at pos 3 — assembled without the encoder."""
    raw = blob([b"r7"])
    body = b""
    body += _stream_frag(0x80 | tok3.T_TYPE, bytes([tok3.T_DIFF]))
    body += _stream_frag(tok3.T_DIFF, struct.pack("<I", 0))
    body += _stream_frag(0x80 | tok3.T_TYPE, bytes([tok3.T_STRING]))
    body += _stream_frag(tok3.T_STRING, b"r\x00")
    body += _stream_frag(0x80 | tok3.T_TYPE, bytes([tok3.T_DIGITS]))
    body += _stream_frag(tok3.T_DIGITS, struct.pack("<I", 7))
    body += _stream_frag(0x80 | tok3.T_TYPE, bytes([tok3.T_END]))
    enc = struct.pack("<II", len(raw), 1) + b"\x00" + body
    assert tok3.decode(enc) == raw


def test_hand_built_match_delta_dup():
    """Three names exercising MATCH, DELTA and DUP against name 0."""
    raw = blob([b"x1", b"x3", b"x3"])
    body = b""
    body += _stream_frag(
        0x80 | tok3.T_TYPE, bytes([tok3.T_DIFF, tok3.T_DIFF, tok3.T_DUP])
    )
    body += _stream_frag(tok3.T_DIFF, struct.pack("<II", 0, 0))
    body += _stream_frag(tok3.T_DUP, struct.pack("<I", 0))
    body += _stream_frag(
        0x80 | tok3.T_TYPE, bytes([tok3.T_STRING, tok3.T_MATCH])
    )
    body += _stream_frag(tok3.T_STRING, b"x\x00")
    body += _stream_frag(
        0x80 | tok3.T_TYPE, bytes([tok3.T_DIGITS, tok3.T_DELTA])
    )
    body += _stream_frag(tok3.T_DIGITS, struct.pack("<I", 1))
    body += _stream_frag(tok3.T_DELTA, bytes([2]))
    body += _stream_frag(0x80 | tok3.T_TYPE, bytes([tok3.T_END, tok3.T_END]))
    enc = struct.pack("<II", len(raw), 3) + b"\x00" + body
    assert tok3.decode(enc) == raw


def test_hand_built_duplicate_stream_descriptor():
    """Bit 6 descriptors share bytes with an earlier (pos, type) stream."""
    raw = blob([b"a", b"b"])
    body = b""
    body += _stream_frag(
        0x80 | tok3.T_TYPE, bytes([tok3.T_DIFF, tok3.T_DIFF])
    )
    body += _stream_frag(tok3.T_DIFF, struct.pack("<II", 0, 0))
    body += _stream_frag(0x80 | tok3.T_TYPE, bytes([tok3.T_CHAR] * 2))
    body += _stream_frag(tok3.T_CHAR, b"ab")
    # END stream at pos 2 duplicates the TYPE stream at... build literal
    body += _stream_frag(0x80 | tok3.T_TYPE, bytes([tok3.T_END] * 2))
    enc = struct.pack("<II", len(raw), 2) + b"\x00" + body
    assert tok3.decode(enc) == raw


def test_arith_variant_round_trip():
    """flags bit 0 routes token streams through the adaptive arithmetic
    coder (io/arith_nx16) instead of rANS Nx16."""
    names = [f"movie/read{i}/ccs".encode() for i in range(400)]
    raw = blob(names)
    enc = tok3.encode(raw, use_arith=True)
    assert enc[8] == 1
    assert tok3.decode(enc) == raw
    assert len(enc) < len(raw) // 5


def test_decode_rejects_length_mismatch():
    enc = bytearray(tok3.encode(blob([b"q1"])))
    struct.pack_into("<I", enc, 0, 999)
    with pytest.raises(tok3.Tok3Error):
        tok3.decode(bytes(enc))


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "names",
    [
        [],
        [b"read1"],
        [b"m64012_190920_173625/18/ccs", b"m64012_190920_173625/19/ccs",
         b"m64012_190920_173625/19/ccs", b"m64012_190920_173625/103/ccs"],
        [f"SRR123.{i}".encode() for i in range(500)],
        [f"chr{i % 5}:read_{i:06d}/1".encode() for i in range(300)],
        [b"", b"a", b"", b"0007", b"0008", b"x-1-y", b"x-2-y"],
        [b"99999999999999999999", b"018446744073709551616"],
        [b"\x01\x7f!@#$%^&*()"],
    ],
)
def test_round_trip(names):
    raw = blob(names)
    assert tok3.decode(tok3.encode(raw)) == raw


def test_compression_beats_raw_on_serial_names():
    raw = blob([f"movie/read{i}/ccs".encode() for i in range(2000)])
    enc = tok3.encode(raw)
    assert len(enc) < len(raw) // 10


def test_encode_requires_terminator():
    with pytest.raises(tok3.Tok3Error):
        tok3.encode(b"no-terminator")
