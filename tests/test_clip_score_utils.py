"""Clipping / scoring / utility conformance tests
(vectors from reference clip_alignment.rs:183-252, score_alignment.rs:167-190,
int_range.rs:163-237, util.rs:157-225, genome_segment.rs:173-283, seq_util.rs)."""

import pytest

from portello_tpu.ops import cigar as cg
from portello_tpu.ops.clip import clip_alignment_read_edges, clip_alignment_ref_edges
from portello_tpu.ops.score import (
    AlignMatchError,
    get_edit_distance,
    get_edit_distance_no_align_match,
    get_gap_compressed_identity,
    get_gap_compressed_identity_no_align_match,
)
from portello_tpu.ops.seq import from_bytes, rev_comp, to_bytes
from portello_tpu.utils import (
    ChromList,
    GenomeSegment,
    IntRange,
    get_region_segments,
    get_region_segments_with_offset,
    parse_samtools_region_string,
)
from portello_tpu.utils.int_range import (
    get_int_range_dir_distance,
    get_int_range_distance,
    get_recip_overlap,
)
from portello_tpu.utils.misc import MeanTracker, array_segmenter, downsample_vector, drop_true


def C(s):
    return cg.from_string(s)


def test_clip_alignment_ref_edges():
    out, shift = clip_alignment_ref_edges(C("3S15M"), 5, 2)
    assert cg.to_string(out) == "8S8M2S" and shift == 5

    out, shift = clip_alignment_ref_edges(C("3S2M3D13M"), 5, 2)
    assert cg.to_string(out) == "5S11M2S" and shift == 5


def test_clip_alignment_read_edges():
    out, shift = clip_alignment_read_edges(C("3S15M"), 5, 2)
    assert cg.to_string(out) == "5S11M2S" and shift == 2

    out, shift = clip_alignment_read_edges(C("3S2M3D13M"), 5, 2)
    assert cg.to_string(out) == "5S11M2S" and shift == 5

    out, shift = clip_alignment_read_edges(C("3S3I12M"), 5, 2)
    assert cg.to_string(out) == "6S10M2S" and shift == 0


def test_edit_distance():
    ref_seq = from_bytes(b"ACGTACGTACGT")
    read_seq = from_bytes(b"GTAATCTTAC")
    c = C("4M2I4M")
    assert get_edit_distance(2, c, read_seq, ref_seq) == 4


def test_gap_compressed_identity():
    ref_seq = from_bytes(b"ACGTACGTACGT")
    read_seq = from_bytes(b"GTAATCTTAC")
    c = C("4M2I4M")
    assert get_gap_compressed_identity(2, c, read_seq, ref_seq) == pytest.approx(6.0 / 9.0)


def test_no_align_match_variants():
    assert get_edit_distance_no_align_match(C("4=1X2I3=")) == 3
    assert get_gap_compressed_identity_no_align_match(C("6=1I2=")) == pytest.approx(8 / 9)
    with pytest.raises(AlignMatchError):
        get_edit_distance_no_align_match(C("4M"))
    with pytest.raises(AlignMatchError):
        get_gap_compressed_identity_no_align_match(C("4M"))


def test_rev_comp():
    assert to_bytes(rev_comp(b"NNATGCG")) == b"CGCATNN"
    assert to_bytes(rev_comp(b"acgt")) == b"acgt"
    assert to_bytes(rev_comp(b"AXGT")) == b"ACNT"


def test_int_range():
    r1 = IntRange(1, 4)
    r2 = IntRange(6, 8)
    r3 = IntRange(8, 9)
    r4 = IntRange(7, 9)
    assert get_int_range_distance(r1, r2) == 2
    assert get_int_range_distance(r2, r1) == 2
    assert get_int_range_distance(r2, r3) == 0
    assert get_int_range_dir_distance(r1, r2) == (True, 2)
    assert get_int_range_dir_distance(r2, r1) == (False, 2)
    assert get_int_range_dir_distance(r2, r4) == (True, 0)

    r = IntRange(1000, 2000)
    assert get_recip_overlap(r, IntRange(0, 1000)) == pytest.approx(0.0)
    assert get_recip_overlap(r, IntRange(500, 1500)) == pytest.approx(0.5)
    assert get_recip_overlap(r, IntRange(1000, 2000)) == pytest.approx(1.0)
    assert get_recip_overlap(r, IntRange(1500, 2000)) == pytest.approx(0.5)

    rr = IntRange(1000, 2000)
    rr.reverse(10_000)
    assert rr == IntRange(8000, 9000)
    assert IntRange(1000, 2000).get_reverse_range(10_000) == rr


def test_region_segments():
    assert get_region_segments(100, 200) == [(0, 100)]
    assert get_region_segments(100, 49) == [(0, 34), (34, 67), (67, 100)]
    assert get_region_segments_with_offset(10, 100, 200) == [(10, 110)]
    assert get_region_segments_with_offset(10, 100, 49) == [(10, 44), (44, 77), (77, 110)]


def test_misc_utils():
    t = MeanTracker()
    t.insert(2.0)
    t.insert(4.0)
    assert t.mean() == pytest.approx(3.0)
    t2 = MeanTracker()
    t2.insert(6.0)
    t.merge(t2)
    assert t.mean() == pytest.approx(4.0)

    v = list(range(1, 14))
    for i in range(15):
        assert len(downsample_vector(v, i)) == min(i, 13)

    ranges = list(array_segmenter([0, 1, 2, -1, 4, 5, 6, 7, 8, 9], lambda x: x < 0))
    assert ranges[0] == range(0, 3) and ranges[1] == range(4, 10)

    assert drop_true([1, 2, 3, 4, 5], [True, False, False, True, False]) == [2, 3, 5]


def test_samtools_region_string():
    cl = ChromList.from_pairs([("chr1", 10000), ("chr2", 10000), ("chr3", 10000)])
    assert parse_samtools_region_string(cl, "chr2:1000-2000") == (1, 999, 2000)
    assert parse_samtools_region_string(cl, "chr2:1,000-2,000") == (1, 999, 2000)
    assert parse_samtools_region_string(cl, "chr2:1,000") == (1, 999, 10000)
    assert parse_samtools_region_string(cl, "chr2") == (1, 0, 10000)

    hla = ChromList.from_pairs([("HLA-DRB1*10:01:01", 10000)])
    assert parse_samtools_region_string(hla, "HLA-DRB1*10:01:01:1000-2000") == (0, 999, 2000)
    assert parse_samtools_region_string(hla, "HLA-DRB1*10:01:01") == (0, 0, 10000)


def test_genome_segment():
    cl = ChromList.from_pairs([("chr1", 100), ("chr2", 100)])
    seg = GenomeSegment(1, IntRange.from_int(10))
    assert seg.to_region_str(cl) == "chr2:11-11"
    assert GenomeSegment(0, IntRange(1, 20)) < GenomeSegment(1, IntRange(1, 2))
    s = GenomeSegment(0, IntRange(5, 10))
    assert s.expand_by(cl, 10) == (5, 10)
    assert s.range == IntRange(0, 20)
