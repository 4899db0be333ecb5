"""fqzcomp quality codec (CRAM 3.1 method 7) tests: round-trips over the
flag surface, the double-RLE table codec, and container-layer dispatch
(interop caveat documented in io/fqzcomp.py)."""

import random
import struct
import zlib

import pytest

from portello_tpu.io import fqzcomp as fq


def _mkquals(rng, n_recs, minl=50, maxl=200, alpha=8):
    lens, out = [], bytearray()
    base = [rng.randrange(0, 60) for _ in range(alpha)]
    for _ in range(n_recs):
        ln = rng.randrange(minl, maxl)
        lens.append(ln)
        q = rng.choice(base)
        for _ in range(ln):
            if rng.random() >= 0.8:
                q = rng.choice(base)
            out.append(q)
    return bytes(out), lens


@pytest.mark.parametrize(
    "kwargs",
    [dict(), dict(use_qmap=False), dict(use_dedup=True)],
)
def test_round_trip(kwargs):
    rng = random.Random(42)
    quals, lens = _mkquals(rng, 60)
    enc = fq.encode(quals, lens, **kwargs)
    assert fq.decode(enc, n_out=len(quals)) == quals
    assert len(enc) < len(quals) // 2  # adaptive model really compresses


def test_dedup_collapses_identical_records():
    quals = bytes([30] * 100) * 8
    enc = fq.encode(quals, [100] * 8, use_dedup=True)
    assert fq.decode(enc, n_out=len(quals)) == quals
    assert len(enc) < 60


def test_rev_flags_round_trip():
    rng = random.Random(7)
    quals, lens = _mkquals(rng, 20)
    rev = [i % 2 == 0 for i in range(len(lens))]
    enc = fq.encode(quals, lens, rev=rev)
    exp = bytearray()
    p = 0
    for ln, r in zip(lens, rev):
        rec = quals[p : p + ln]
        p += ln
        exp += rec[::-1] if r else rec
    assert fq.decode(enc, n_out=len(quals)) == bytes(exp)


def test_wide_alphabet_no_qmap():
    rng = random.Random(3)
    quals = bytes(rng.randrange(0, 94) for _ in range(3000))
    enc = fq.encode(quals, [1000, 1000, 1000])
    assert fq.decode(enc, n_out=3000) == quals


def test_table_array_codec():
    """The double-RLE table codec round-trips spec-shaped tables."""
    tabs = [
        [min(p >> 4, 63) for p in range(1024)],  # position buckets
        [0] * 256,                               # all one value
        list(range(256)),                        # identity (runs of 1)
        [min(i, 47) for i in range(256)],
    ]
    for tab in tabs:
        blob = fq._write_array(tab, len(tab))
        got, off = fq._read_array(blob, 0, len(tab))
        assert got == tab
        assert off == len(blob)


def test_bad_version_rejected():
    with pytest.raises(fq.FqzError, match="version"):
        fq.decode(b"\x04\x00", n_out=1)


def test_framing_overrun_rejected():
    """A declared record length past n_out must error, not overrun."""
    enc = fq.encode(bytes([20] * 50), [50])
    with pytest.raises(fq.FqzError):
        fq.decode(enc, n_out=30)


def test_cram_block_dispatch():
    from portello_tpu.io import cram

    quals = bytes([30, 31, 32, 33] * 50)
    comp = fq.encode(quals, [100, 100])
    blk = bytearray([cram.FQZCOMP, cram.EXTERNAL_T])
    blk += cram.write_itf8(12)
    blk += cram.write_itf8(len(comp))
    blk += cram.write_itf8(len(quals))
    blk += comp
    blk += struct.pack("<I", zlib.crc32(bytes(blk)) & 0xFFFFFFFF)
    got, _ = cram.read_block(bytes(blk), 0)
    assert got.data == quals
    assert got.method == cram.FQZCOMP
