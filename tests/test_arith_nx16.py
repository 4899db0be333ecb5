"""Adaptive arithmetic codec (CRAM 3.1 method 6) tests: structural
fixtures + round-trips over every mode (see io/arith_nx16.py for the
interop caveat — no htslib in-image)."""

import random

import pytest

from portello_tpu.io import arith_nx16 as ar


def _corpus():
    random.seed(20260819)
    return [
        b"",
        b"A",
        b"ab",
        b"ACGT" * 100 + b"N",
        bytes(random.randrange(256) for _ in range(2001)),
        bytes(random.choices(b"ACGTN", weights=[40, 30, 20, 9, 1], k=3007)),
        b"\x00" * 500 + b"xyz" + b"\xff" * 300,
        bytes([7]) * 1000,
        bytes(range(256)),
    ]


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(order=1),
        dict(use_pack=True),
        dict(order=1, use_pack=True),
        dict(use_rle=True),
        dict(order=1, use_rle=True),  # ORDER1 conditions the literal model
        dict(use_rle=True, use_pack=True),
        dict(use_cat=True),
        dict(use_ext=True),
        dict(stripe=4),
        dict(stripe=2, order=1),
        dict(nosz=True),
    ],
)
def test_round_trip_modes(kwargs):
    for raw in _corpus():
        enc = ar.encode(raw, **kwargs)
        n_out = len(raw) if kwargs.get("nosz") else None
        assert ar.decode(enc, n_out=n_out) == raw


def test_cat_stream_hand_built():
    # flags CAT(0x20), uint7 len 3, raw payload
    assert ar.decode(b"\x20\x03abc") == b"abc"


def test_nosz_cat_hand_built():
    assert ar.decode(b"\x30abcd", n_out=4) == b"abcd"


def test_ext_stream_hand_built():
    import bz2

    payload = bz2.compress(b"hello world")
    assert ar.decode(b"\x04\x0b" + payload) == b"hello world"


def test_pack_cat_hand_built():
    # PACK|CAT with a 2-symbol alphabet: 1 bit per value, little bit order
    stream = b"\xa0\x06\x02XY\x01\x2a"  # 0b00101010 -> X Y X Y X Y? (LSB first)
    # bits of 0x2a LSB-first: 0,1,0,1,0,1 -> X Y X Y X Y
    assert ar.decode(stream) == b"XYXYXY"


def test_compression_on_skewed_data():
    random.seed(1)
    d = bytes(random.choices(b"ACGT", weights=[40, 30, 20, 10], k=5000))
    assert len(ar.encode(d)) < len(d) // 3
    assert len(ar.encode(d, order=1)) < len(d) // 3


def test_model_adapts_deterministically():
    """Same input twice -> identical streams (the adaptive schedule is
    deterministic: +16 on use, halve above 2^15)."""
    d = bytes(random.Random(3).choices(range(64), k=4000))
    assert ar.encode(d) == ar.encode(d)


def test_cram_block_dispatch(tmp_path):
    """A hand-built CRAM block with method 6 decodes through the container
    layer."""
    from portello_tpu.io import cram

    data = b"quality-ish payload " * 20
    comp = ar.encode(data, order=1)
    blk = bytearray([cram.ARITH, cram.EXTERNAL_T])
    blk += cram.write_itf8(12)
    blk += cram.write_itf8(len(comp))
    blk += cram.write_itf8(len(data))
    blk += comp
    import zlib

    blk += __import__("struct").pack(
        "<I", zlib.crc32(bytes(blk)) & 0xFFFFFFFF
    )
    got, _ = cram.read_block(bytes(blk), 0)
    assert got.data == data
    assert got.method == cram.ARITH
