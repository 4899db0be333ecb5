"""Liftover oracle conformance tests.

Vectors ported from the reference's liftover unit tests
(reference src/liftover_read_alignment.rs:225-449).
"""

from portello_tpu.ops import cigar as cg
from portello_tpu.ops.blockmap import BlockMap, build_block_map
from portello_tpu.ops.liftover import liftover_read_alignment


def C(s):
    return cg.from_string(s)


def lift(map_cigar, map_pos, read_cigar, read_pos):
    bm = (
        build_block_map(map_pos, C(map_cigar), False)
        if map_cigar is not None
        else BlockMap()
    )
    return liftover_read_alignment(bm, read_pos, C(read_cigar))


def test_basic():
    read_cigar = "10M10D10M10I10M10S"

    # Case 1: ref1 doesn't map to ref2
    assert lift(None, 0, read_cigar, 10) is None

    # Case 2: simple exact match
    pos, out = lift("100M", 1000, read_cigar, 10)
    assert pos == 1010
    assert cg.to_string(out) == read_cigar

    # Case 3: ref1 has dels vs ref2
    pos, out = lift("10M1D5M1D5M1D5M1D10M1D15M1D50M", 1000, read_cigar, 10)
    assert pos == 1011
    assert cg.to_string(out) == "5M1D5M12D5M1D5M10I10M10S"

    # Case 4: ref1 has ins vs ref2
    pos, out = lift("5M10I10M5I5M5I3M5I1M5I46M", 1000, read_cigar, 10)
    assert pos == 1005
    assert cg.to_string(out) == "5S5M5D5M15I3M5I1M11S"


def test_leading_clip():
    read_cigar = "10M10D10M10I10M10S"

    pos, out = lift("30S70M", 1000, read_cigar, 0)
    assert pos == 1000
    assert cg.to_string(out) == "30S10M10S"

    pos, out = lift("10S90M", 1000, read_cigar, 5)
    assert pos == 1000
    assert cg.to_string(out) == "5S5M10D10M10I10M10S"

    # deletion spanning the alignment start
    pos, out = lift("20S90M", 1000, "10M10D10M", 5)
    assert pos == 1005
    assert cg.to_string(out) == "10S10M"


def test_trailing_clip():
    pos, out = lift("70M30S", 1000, "10M10D10M", 45)
    assert pos == 1045
    assert cg.to_string(out) == "10M10D5M5S"

    # insertion on the clip boundary
    pos, out = lift("70M30S", 1000, "10M10I10M", 60)
    assert pos == 1060
    assert cg.to_string(out) == "10M20S"

    # deletion spanning the clip boundary
    pos, out = lift("70M30S", 1000, "10M10D10M", 55)
    assert pos == 1055
    assert cg.to_string(out) == "10M10S"


def test_hard_clip_passthrough():
    pos, out = lift("100M", 1000, "5H10M5H", 10)
    assert pos == 1010
    assert cg.to_string(out) == "5H10M5H"


def test_read_length_preserved_under_liftover():
    # The liftover must preserve total read length (the invariant the reference
    # panics on, read_alignment_scanner.rs:204-229).
    cases = [
        ("10M1D5M1D5M1D5M1D10M1D15M1D50M", 1000, "10M10D10M10I10M10S", 10),
        ("5M10I10M5I5M5I3M5I1M5I46M", 1000, "10M10D10M10I10M10S", 10),
        ("30S70M", 1000, "10M10D10M10I10M10S", 0),
        ("70M30S", 1000, "10M10I10M", 60),
    ]
    for map_cigar, map_pos, read_cigar, read_pos in cases:
        res = lift(map_cigar, map_pos, read_cigar, read_pos)
        assert res is not None
        _, out = res
        assert cg.get_cigar_read_offset(out, False) == cg.get_cigar_read_offset(
            C(read_cigar), False
        )
