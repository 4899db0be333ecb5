"""Indel shifting + homology conformance tests
(vectors from reference shift_indels/mod.rs:8-174 and indel_breakend_homology.rs:75-148)."""

from portello_tpu.ops import cigar as cg
from portello_tpu.ops.homology import get_indel_breakend_homology_info
from portello_tpu.ops.seq import from_bytes
from portello_tpu.ops.shift import left_shift_indels, right_shift_indels


def lshift(ref_pos, cigar_str, ref_seq, read_seq):
    pos, out = left_shift_indels(
        ref_pos, cg.from_string(cigar_str), from_bytes(ref_seq), from_bytes(read_seq)
    )
    return pos, cg.to_string(out)


def rshift(ref_pos, cigar_str, ref_seq, read_seq):
    pos, out = right_shift_indels(
        ref_pos, cg.from_string(cigar_str), from_bytes(ref_seq), from_bytes(read_seq)
    )
    return pos, cg.to_string(out)


def test_shift_alignment_match():
    assert lshift(2, "6M", b"XXABCCDEXX", b"ABCCDE") == (2, "6M")
    assert rshift(2, "6M", b"XXABCCDEXX", b"ABCCDE") == (2, "6M")


def test_shift_alignment_softclip():
    assert lshift(4, "2S2M2S", b"XXABCCDEXX", b"ABCCDE") == (4, "2S2M2S")
    assert rshift(4, "2S2M2S", b"XXABCCDEXX", b"ABCCDE") == (4, "2S2M2S")


def test_shift_alignment_ins():
    assert lshift(2, "3M1I2M", b"XXABCDEXX", b"ABCCDE") == (2, "2M1I3M")
    assert rshift(2, "2M1I3M", b"XXABCDEXX", b"ABCCDE") == (2, "3M1I2M")


def test_shift_alignment_ins_to_edge():
    assert lshift(4, "1M1I2M", b"XXABCDEXX", b"CCDE") == (4, "1S3M")
    assert rshift(4, "2M1I1M", b"XXABCDEXX", b"CDEE") == (4, "3M1S")


def test_shift_alignment_del():
    assert lshift(2, "3M1D2M", b"XXABCCDEXX", b"ABCDE") == (2, "2M1D3M")
    assert rshift(2, "2M1D3M", b"XXABCCDEXX", b"ABCDE") == (2, "3M1D2M")


def test_shift_alignment_del_on_interrupted_hpol():
    assert lshift(2, "3M3D2M", b"XXABBCBBBAXX", b"ABBBA") == (2, "1M3D4M")
    assert rshift(2, "1M3D4M", b"XXABBCBBBAXX", b"ABBBA") == (2, "3M3D2M")


def test_shift_alignment_del_to_edge():
    assert lshift(4, "1M1D2M", b"XXABCCDEXX", b"CDE") == (5, "3M")
    assert rshift(4, "2M1D1M", b"XXABCDEEXX", b"CDE") == (4, "3M")


def test_shift_alignment_multi_indel():
    assert lshift(2, "3M1I2M1D1M", b"XXABCDEEFXX", b"ABCCDEF") == (2, "2M1I2M1D2M")
    assert rshift(2, "2M1I2M1D2M", b"XXABCDEEFXX", b"ABCCDEF") == (2, "3M1I2M1D1M")


def test_shift_alignment_indel_cluster():
    assert lshift(2, "4M2D2I1M", b"XXABBBABFXX", b"ABBBBBF") == (2, "3M2I2D2M")
    assert rshift(2, "3M2D2I2M", b"XXABBBABFXX", b"ABBBBBF") == (2, "4M2I2D1M")


def test_homology_range():
    seq1 = from_bytes(b"ABCDDABC")
    seq2 = from_bytes(b"ABCDDDABC")

    # left shifted
    (lo, hi), seq = get_indel_breakend_homology_info(seq2, (3, 4), seq1, (3, 3))
    assert (lo, hi) == (0, 2) and bytes(seq) == b"DD"
    (lo, hi), seq = get_indel_breakend_homology_info(seq1, (3, 3), seq2, (3, 4))
    assert (lo, hi) == (0, 2) and bytes(seq) == b"DD"

    # right shifted
    (lo, hi), seq = get_indel_breakend_homology_info(seq2, (5, 6), seq1, (5, 5))
    assert (lo, hi) == (-2, 0) and bytes(seq) == b"DD"
    (lo, hi), seq = get_indel_breakend_homology_info(seq1, (5, 5), seq2, (5, 6))
    assert (lo, hi) == (-2, 0) and bytes(seq) == b"DD"


def test_homology_range_edges():
    # bump into left edge
    (lo, hi), seq = get_indel_breakend_homology_info(
        from_bytes(b"DDDDDDABC"), (3, 4), from_bytes(b"DDDDABC"), (2, 2)
    )
    assert (lo, hi) == (-2, 2) and bytes(seq) == b"DDDD"
    # bump into right edge
    (lo, hi), seq = get_indel_breakend_homology_info(
        from_bytes(b"ABCDDDDDD"), (3, 4), from_bytes(b"ABCDDDD"), (3, 3)
    )
    assert (lo, hi) == (0, 4) and bytes(seq) == b"DDDD"
