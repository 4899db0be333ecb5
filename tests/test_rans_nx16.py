"""rANS Nx16 (CRAM 3.1 method 5) codec tests.

Two tiers, mirroring the BAI/CSI spec-fixture discipline
(tests/test_index_spec_fixtures.py): hand-assembled byte streams worked out
from hts-specs/CRAMcodecs by hand (decoding bytes this repo's encoder never
produced), then encoder/decoder round-trips across every transform
combination and awkward sizes (n % 4 != 0, n < N, runs, tiny alphabets).
"""

import random

import pytest

from portello_tpu.io import rans_nx16 as rn


# ---------------------------------------------------------------------------
# hand-assembled spec fixtures
# ---------------------------------------------------------------------------

class TestSpecFixtures:
    def test_uint7_spec_values(self):
        # big-endian base-128: 4096 = 0x20<<7 | 0 -> A0 00
        assert rn.write_uint7(0) == b"\x00"
        assert rn.write_uint7(127) == b"\x7f"
        assert rn.write_uint7(128) == b"\x81\x00"
        assert rn.write_uint7(4096) == b"\xa0\x00"
        for v in (0, 1, 127, 128, 255, 4096, 99999):
            got, off = rn.read_uint7(rn.write_uint7(v), 0)
            assert (got, off) == (v, len(rn.write_uint7(v)))

    def test_cat_stream_hand_built(self):
        # flags CAT(0x20), uint7 len 3, raw payload
        assert rn.decode(b"\x20\x03abc") == b"abc"

    def test_nosz_cat_stream(self):
        # flags CAT|NOSZ: no length field, external length
        assert rn.decode(b"\x30abcd", n_out=4) == b"abcd"

    def test_order0_single_symbol_hand_built(self):
        # 'A' x 5.  F[65] = 4096 (the whole 12-bit range): the decode step
        # r = 4096*(r>>12) + (r&4095) - 0 is the identity, so the four
        # states stay at their 2^15 initial value and there is no payload.
        # Alphabet RLE: [65][0]; freq uint7(4096) = A0 00.
        stream = (
            b"\x00"              # flags: order-0, 4-way
            b"\x05"              # uncompressed length 5
            b"\x41\x00"          # alphabet {65}
            b"\xa0\x00"          # F[65] = 4096
            + b"\x00\x80\x00\x00" * 4  # states: 32768 LE x4
        )
        assert rn.decode(stream) == b"AAAAA"

    def test_order0_two_symbol_hand_built(self):
        # "ab" with F[a]=F[b]=2048, worked by hand from the spec:
        # encode reverse: 'b' via state1: R=(32768//2048)<<12 + 0 + 2048
        # = 67584; 'a' via state0: R=65536.  No renormalisation output.
        stream = (
            b"\x00"              # flags
            b"\x02"              # length 2
            b"\x61\x62\x00\x00"  # alphabet {97, 98}: sym, next(+1), run 0, end
            b"\x90\x00"          # F[97] = 2048
            b"\x90\x00"          # F[98] = 2048
            b"\x00\x00\x01\x00"  # state0 = 65536
            b"\x00\x08\x01\x00"  # state1 = 67584
            b"\x00\x80\x00\x00"  # state2 = 32768
            b"\x00\x80\x00\x00"  # state3 = 32768
        )
        assert rn.decode(stream) == b"ab"

    def test_alphabet_rle_run_byte(self):
        # alphabet {10,11,12,13,20}: 10, next=11 (=10+1 so run byte 2
        # covers 12 and 13), then 20, then terminator 0
        buf = bytes([10, 11, 2, 20, 0])
        A, off = rn._read_alphabet(buf, 0)
        assert A == [10, 11, 12, 13, 20]
        assert off == len(buf)
        assert rn._write_alphabet(A) == buf

    def test_pack_2bit_hand_built(self):
        # PACK|CAT: map {65,67,71,84}, 6 values, 2 bits each, little bit
        # order within byte: ACGTAC -> idx 0,1,2,3,0,1
        # byte0 = 0|1<<2|2<<4|3<<6 = 0xE4, byte1 = 0|1<<2 = 0x04
        stream = (
            b"\xa0"          # flags PACK|CAT
            b"\x06"          # unpacked length 6
            b"\x04ACGT"      # pack meta: 4 symbols
            b"\x02"          # packed length 2
            b"\xe4\x04"      # packed payload (CAT)
        )
        assert rn.decode(stream) == b"ACGTAC"

    def test_pack_zero_bits_hand_built(self):
        # single-symbol pack: zero bits per value, empty payload
        stream = b"\xa0\x07\x01Q\x00"
        assert rn.decode(stream) == b"QQQQQQQ"

    def test_rle_hand_built(self):
        # RLE|CAT: "AAAABCC" -> runs on A and C; literals "ABC";
        # meta: [2 syms][A][C] + run lengths uint7(3), uint7(1)
        meta = bytes([2, ord("A"), ord("C"), 3, 1])
        stream = (
            b"\x60"                        # flags RLE|CAT
            b"\x07"                        # expanded length 7
            + rn.write_uint7((len(meta) << 1) | 1)  # raw meta, len 5
            + b"\x03"                      # literal stream length 3
            + meta
            + b"ABC"                       # literal payload (CAT)
        )
        assert rn.decode(stream) == b"AAAABCC"

    def test_stripe_hand_built(self):
        # STRIPE of 2 over "aXbYcZ": substream0 "abc", substream1 "XYZ",
        # each encoded as CAT
        s0 = b"\x20\x03abc"
        s1 = b"\x20\x03XYZ"
        stream = (
            b"\x08"          # flags STRIPE
            b"\x06"          # total length 6
            b"\x02"          # 2 stripes
            + rn.write_uint7(len(s0))
            + rn.write_uint7(len(s1))
            + s0 + s1
        )
        assert rn.decode(stream) == b"aXbYcZ"


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------

def _corpus():
    random.seed(20260818)
    return [
        b"",
        b"A",
        b"ab",
        b"ACGT" * 3 + b"N",                       # n % 4 = 1
        b"ACGTACGTACGT" * 64,
        bytes(random.randrange(256) for _ in range(1001)),
        bytes(random.choices(b"ACGTN", weights=[40, 30, 20, 9, 1], k=3007)),
        b"\x00" * 500 + b"xyz" + b"\xff" * 77,    # heavy runs
        bytes(random.choices(range(3), k=257)),   # 3-symbol alphabet
        bytes([5]) * 10000,                       # single symbol
        bytes(range(256)) * 2,                    # full alphabet
    ]


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("n32", [False, True])
@pytest.mark.parametrize("use_pack", [False, True])
@pytest.mark.parametrize("use_rle", [False, True])
def test_round_trip_modes(order, n32, use_pack, use_rle):
    for raw in _corpus():
        enc = rn.encode(
            raw, order=order, n32=n32, use_pack=use_pack, use_rle=use_rle
        )
        assert rn.decode(enc) == raw


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(use_cat=True),
        dict(nosz=True),
        dict(stripe=4),
        dict(stripe=2, n32=True),
        dict(stripe=4, order=1),
        dict(order=1, comp_table=True),  # order-0-compressed freq table
    ],
)
def test_round_trip_special_modes(kwargs):
    for raw in _corpus():
        enc = rn.encode(raw, **kwargs)
        n_out = len(raw) if kwargs.get("nosz") else None
        assert rn.decode(enc, n_out=n_out) == raw


def test_order1_fragment_tail_sizes():
    """Order-1 splits into N fragments of floor(len/N) with the tail on the
    last state — every residue class must survive (the 4x8 round-2 bug
    class)."""
    random.seed(3)
    base = bytes(random.choices(b"acgtACGTN-", k=4 * 37))
    for extra in range(9):
        raw = base + bytes(random.choices(b"acgt", k=extra))
        for n32 in (False, True):
            enc = rn.encode(raw, order=1, n32=n32)
            assert rn.decode(enc) == raw


def test_truncated_stream_raises():
    enc = rn.encode(b"hello world, hello world", order=1)
    with pytest.raises(Exception):
        rn.decode(enc[: len(enc) // 2])


def test_cat_truncation_detected():
    with pytest.raises(rn.RansNx16Error):
        rn.decode(b"\x20\x05ab")
