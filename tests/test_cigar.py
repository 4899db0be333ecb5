"""CIGAR core conformance tests.

Vectors ported from the reference's in-file unit tests
(reference lib/rust-vc-utils/src/bam_utils/cigar/mod.rs:329-563).
"""

import numpy as np
import pytest

from portello_tpu.ops import cigar as cg


def C(s):
    return cg.from_string(s)


def test_from_to_string_roundtrip():
    s = "5H5S5M5D5I5=5N5X5S"
    c = C(s)
    assert cg.to_string(c) == s
    assert cg.to_string(cg.EMPTY) == "*"
    assert len(C("*")) == 0
    assert len(C("")) == 0


def test_from_string_codes():
    c = C("1M2I3D4N5S6H7P8=9X")
    assert list(c[:, 0]) == [cg.M, cg.I, cg.D, cg.N, cg.S, cg.H, cg.P, cg.EQ, cg.X]
    assert list(c[:, 1]) == [1, 2, 3, 4, 5, 6, 7, 8, 9]


def test_from_string_malformed():
    with pytest.raises(ValueError):
        C("5")
    with pytest.raises(ValueError):
        C("M")
    with pytest.raises(ValueError):
        C("5M3")


def test_update_ref_and_read_pos_walk():
    # reference cigar/mod.rs:345-363 (ref starts at 100, read at 0)
    c = C("5H5S5M5D5I5=5N5X5S")
    ref_starts, read_starts = cg.op_start_positions(c, 100, ignore_hard_clip=False)
    ref_ends = ref_starts + cg.ref_lens(c)
    read_ends = read_starts + cg.read_lens(c, False)
    assert list(ref_ends) == [100, 100, 105, 110, 110, 115, 120, 125, 125]
    assert list(read_ends) == [5, 10, 15, 15, 20, 25, 25, 30, 35]


def test_update_read_pos_ignore_hard_clip():
    # reference cigar/mod.rs:366-380
    c = C("5H5S5M5D5I5=5N5X5S")
    _, read_starts = cg.op_start_positions(c, 0, ignore_hard_clip=True)
    read_ends = read_starts + cg.read_lens(c, True)
    assert list(read_ends) == [0, 5, 10, 10, 15, 20, 20, 25, 30]


def test_get_read_clip_positions():
    # reference cigar/mod.rs:383-391
    c = C("10H10S10M10S10H")
    assert cg.get_read_clip_positions(c, True) == (10, 20, 30)
    assert cg.get_read_clip_positions(c, False) == (20, 30, 50)


def test_get_read_clip_positions_interior_clip():
    # The reference's left_clip flag counts interior clips as right clip.
    c = C("5S5M5S5M5S")
    assert cg.get_read_clip_positions(c, False) == (5, 15, 25)


def test_get_read_hard_clip_positions():
    # reference cigar/mod.rs:394-398
    c = C("10H10S10M10S10H")
    assert cg.get_read_hard_clip_positions(c) == (10, 40, 50)


def test_is_hard_clipped():
    # reference cigar/mod.rs:401-407
    assert cg.is_hard_clipped(C("10H10S10M10S10H"))
    assert not cg.is_hard_clipped(C("10S10M10S"))


def test_compress_cigar():
    # reference cigar/mod.rs:410-444
    c = C("1H1H1S1S1M1M1X")
    c = np.concatenate([c, cg.cigar((cg.X, 0)), C("1X1=1=1I1I1D1D1M1M")])
    out = cg.compress_cigar(c)
    assert cg.to_string(out) == "2H2S2M2X2=2I2D2M"


def test_compress_cigar_zero_only():
    out = cg.compress_cigar(cg.cigar((cg.M, 0), (cg.D, 0)))
    assert len(out) == 0


def test_cigar_edge_insertion_to_softclip():
    # reference cigar/mod.rs:447-475
    c = C("1H1S1I1M1I1M1I1S")
    out = cg.cigar_edge_insertion_to_softclip(c)
    assert cg.to_string(out) == "1H1S1S1M1I1M1S1S"


def test_clean_up_cigar_edge_indels():
    # reference cigar/mod.rs:478-513
    c = C("1H1S1I2D1M1I1D1M1I1D1S")
    out, shift = cg.clean_up_cigar_edge_indels(c)
    assert shift == 2
    expected = [
        (cg.H, 1), (cg.S, 1), (cg.S, 1), (cg.S, 0), (cg.M, 1), (cg.I, 1),
        (cg.D, 1), (cg.M, 1), (cg.S, 1), (cg.S, 0), (cg.S, 1),
    ]
    assert [tuple(x) for x in out] == expected


def test_clean_up_cigar_edge_indels_no_match():
    # No alignment match: all indels are edge indels; only leading dels shift.
    c = C("2D3I")
    out, shift = cg.clean_up_cigar_edge_indels(c)
    assert shift == 2
    assert [tuple(x) for x in out] == [(cg.S, 0), (cg.S, 3)]


def test_has_aligned_segments():
    # reference cigar/mod.rs:516-523
    assert not cg.has_aligned_segments(C("2H2S"))
    assert cg.has_aligned_segments(C("2M"))
    assert cg.has_aligned_segments(C("2S2=2S"))
    assert cg.has_aligned_segments(C("2S2X2S"))


def test_strip_leading_trailing_clip():
    # reference cigar/mod.rs:526-563
    c = C("2H2S2M2I2M2S2H")
    assert cg.to_string(cg.strip_leading_clip(c)) == "2M2I2M2S2H"
    assert cg.to_string(cg.strip_trailing_clip(c)) == "2H2S2M2I2M"


def test_offsets():
    c = C("5H5S5M5D5I5=5N5X5S")
    assert cg.get_cigar_ref_offset(c) == 25
    assert cg.get_cigar_read_offset(c, False) == 35
    assert cg.get_cigar_read_offset(c, True) == 30
    assert cg.get_cigar_ref_and_read_offset(c, False) == (25, 35)


def test_strip_trailing_clip_retain_semantics():
    """Reference retain semantics (cigar/mod.rs:315-327): every clip AFTER
    the first non-clip drops (interior included, runs not merged); an
    all-clip cigar is returned unchanged."""
    got = cg.strip_trailing_clip(cg.from_string("10S5M2S5M3S"))
    assert cg.to_string(got) == "10S5M5M"
    assert cg.to_string(cg.strip_trailing_clip(cg.from_string("5S3H"))) == "5S3H"
    assert cg.to_string(cg.strip_trailing_clip(cg.from_string("5M2S"))) == "5M"


def test_compress_cigar_pad_quirk():
    """Reference compress_cigar's if-let arm omits Pad, so an adjacent-Pad
    run keeps only its first length (cigar/mod.rs:210-215)."""
    got = cg.compress_cigar(cg.cigar((cg.M, 5), (cg.P, 3), (cg.P, 4), (cg.M, 2)))
    assert cg.to_string(got) == "5M3P2M"
    # non-Pad runs still sum
    got = cg.compress_cigar(cg.cigar((cg.I, 3), (cg.I, 4)))
    assert cg.to_string(got) == "7I"
