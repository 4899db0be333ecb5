"""Indel simplification conformance tests
(vectors from reference src/simplify_alignment_indels.rs:158-254)."""

from portello_tpu.ops import cigar as cg
from portello_tpu.ops.seq import from_bytes
from portello_tpu.ops.simplify import simplify_alignment_indels


def simp(ref_pos, cigar_str, ref_seq, read_seq):
    pos, out = simplify_alignment_indels(
        ref_pos, cg.from_string(cigar_str), from_bytes(ref_seq), from_bytes(read_seq)
    )
    return pos, cg.to_string(out)


def test_boring_match():
    assert simp(2, "6M", b"XXABCCDEXX", b"ABCCDE") == (2, "6M")


def test_boring_ins():
    assert simp(2, "2M1I3M", b"XXABCDEXX", b"ABCCDE") == (2, "2M1I3M")


def test_boring_del():
    assert simp(2, "2M1D3M", b"XXABCCDEXX", b"ABCDE") == (2, "2M1D3M")


def test_boring_indel():
    # D2 I2 cluster becomes canonical nImD order
    assert simp(2, "2M2D2I3M", b"XXABCCCDEXX", b"ABBBCDE") == (2, "2M2I2D3M")


def test_simple_consolidation_right_first():
    # choice of left or right merge: right side must win
    assert simp(2, "3M1I2D2M", b"XXABCCCDEXX", b"ABCCDE") == (2, "3M1D3M")


def test_left_side_consolidation():
    assert simp(2, "3M3D3I1M", b"XXABCCCDEXX", b"ABCCXXE") == (2, "4M2I2D1M")


def test_snp_preference():
    # 1D+1I residue collapses to 1M without sequence inspection, then merges
    assert simp(2, "3M1D1I2M", b"XXABCCCDEXX", b"ABCQDE") == (2, "6M")


def test_leading_edge_cluster_shifts_pos():
    # A cluster at the alignment edge goes through clean_up_cigar_edge_indels:
    # leading Del removed with pos shift, leading Ins becomes soft clip.
    pos, out = simp(2, "2D4M", b"XXABCCDEXX", b"CCDE")
    assert (pos, out) == (4, "4M")
