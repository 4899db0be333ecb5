"""Failure-mode parity (SURVEY.md section 3.5): the reference's hard-panic
input contracts must fail loudly here too."""

import numpy as np
import pytest

from portello_tpu.io.bam import FSUPPLEMENTARY, BamHeader, BamRecord, BamWriter
from portello_tpu.io.index_build import build_bai
from portello_tpu.ops import cigar as cg
from portello_tpu.pipeline.contig_scan import scan_contig_bam
from portello_tpu.pipeline.split_read import (
    get_seq_order_read_split_segments,
    parse_sa_segment,
)
from portello_tpu.utils.chrom_list import ChromList


def make_header(n=2):
    return BamHeader.from_refs([(f"chr{i+1}", 100000) for i in range(n)])


def chrom_list(header):
    return ChromList.from_pairs(header.refs)


def test_malformed_sa_tag():
    # (reference sa_tag_parser.rs:27-31 assert)
    with pytest.raises(ValueError, match="Unexpected segment in bam SA tag"):
        parse_sa_segment("chr1,100,+,10M")


def test_unaligned_sa_segment():
    # (reference split_read.rs:107-110 panic)
    header = make_header()
    rec = BamRecord.from_sam(
        header,
        "q\t0\tchr1\t100\t60\t5M5S\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\t"
        "SA:Z:chr2,50,+,10S,60,0;",
    )
    with pytest.raises(ValueError, match="unaligned"):
        get_seq_order_read_split_segments(chrom_list(header), rec)


def test_sa_unknown_chrom():
    # (reference split_read.rs:116-125 panic)
    header = make_header()
    rec = BamRecord.from_sam(
        header,
        "q\t0\tchr1\t100\t60\t5M5S\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\t"
        "SA:Z:chrMISSING,50,+,5S5M,60,0;",
    )
    with pytest.raises(ValueError, match="not found in the input reference"):
        get_seq_order_read_split_segments(chrom_list(header), rec)


def test_sa_inconsistent_read_size():
    # (reference split_read.rs:113 assert)
    header = make_header()
    rec = BamRecord.from_sam(
        header,
        "q\t0\tchr1\t100\t60\t5M5S\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\t"
        "SA:Z:chr2,50,+,3S5M,60,0;",
    )
    with pytest.raises(ValueError, match="Inconsistent split read sizes"):
        get_seq_order_read_split_segments(chrom_list(header), rec)


def _write_contig_bam(tmp_path, records, header):
    path = str(tmp_path / "asm.bam")
    records.sort(key=lambda r: (r.tid, r.pos))
    with BamWriter(path, header) as w:
        for r in records:
            w.write(r)
    build_bai(path)
    return path


def test_duplicate_supplementary_key(tmp_path):
    # (reference contig_alignment_scanner/mod.rs:168-182 panic)
    header = make_header()
    seq = np.full(100, ord("A"), np.uint8)
    prim = BamRecord(
        qname=b"ctg", flag=0, tid=0, pos=10, mapq=60,
        cigar=cg.cigar((cg.EQ, 50), (cg.S, 50)), seq=seq,
        qual=np.full(100, 40, np.uint8),
    )
    prim.push_tag(b"SA", b"Z", "chr2,21,+,50S50=,60,0;")
    supp1 = BamRecord(
        qname=b"ctg", flag=FSUPPLEMENTARY, tid=1, pos=20, mapq=60,
        cigar=cg.cigar((cg.S, 50), (cg.EQ, 50)), seq=seq,
        qual=np.full(100, 40, np.uint8),
    )
    supp2 = BamRecord(
        qname=b"ctg", flag=FSUPPLEMENTARY, tid=1, pos=20, mapq=60,
        cigar=cg.cigar((cg.S, 50), (cg.EQ, 50)), seq=seq,
        qual=np.full(100, 40, np.uint8),
    )
    path = _write_contig_bam(tmp_path, [prim, supp1, supp2], header)
    cl = chrom_list(header)
    contigs = ChromList.from_pairs([("ctg", 100)])
    with pytest.raises(ValueError, match="uniquely identify split read"):
        scan_contig_bam(path, cl, contigs, None)


def test_missing_supplementary_wgs(tmp_path):
    # (reference contig_alignment_scanner/mod.rs:396-435 panic in WGS mode)
    header = make_header()
    seq = np.full(100, ord("A"), np.uint8)
    prim = BamRecord(
        qname=b"ctg", flag=0, tid=0, pos=10, mapq=60,
        cigar=cg.cigar((cg.EQ, 50), (cg.S, 50)), seq=seq,
        qual=np.full(100, 40, np.uint8),
    )
    prim.push_tag(b"SA", b"Z", "chr2,21,+,50S50=,60,0;")
    path = _write_contig_bam(tmp_path, [prim], header)
    cl = chrom_list(header)
    contigs = ChromList.from_pairs([("ctg", 100)])
    with pytest.raises(ValueError, match="supplementary alignment record"):
        scan_contig_bam(path, cl, contigs, None)
    # target-region mode tolerates it (mod.rs:399-413)
    from portello_tpu.utils.genome_segment import GenomeSegment
    from portello_tpu.utils.int_range import IntRange

    region = GenomeSegment(0, IntRange(0, 1000))
    result = scan_contig_bam(path, cl, contigs, region)
    assert len(result) == 1


def test_repeat_trim_requires_eqx(tmp_path):
    # overlapping M-cigar split contigs must fail GCI scoring
    # (reference contig_repeated_match_trimmer.rs:41-48 panic)
    header = make_header()
    seq = np.full(100, ord("A"), np.uint8)
    # two segments overlapping in contig coords 40..60
    prim = BamRecord(
        qname=b"ctg", flag=0, tid=0, pos=10, mapq=60,
        cigar=cg.cigar((cg.M, 60), (cg.S, 40)), seq=seq,
        qual=np.full(100, 40, np.uint8),
    )
    prim.push_tag(b"SA", b"Z", "chr2,21,+,40S60M,60,0;")
    supp = BamRecord(
        qname=b"ctg", flag=FSUPPLEMENTARY, tid=1, pos=20, mapq=60,
        cigar=cg.cigar((cg.S, 40), (cg.M, 60)), seq=seq,
        qual=np.full(100, 40, np.uint8),
    )
    path = _write_contig_bam(tmp_path, [prim, supp], header)
    cl = chrom_list(header)
    contigs = ChromList.from_pairs([("ctg", 100)])
    with pytest.raises(ValueError, match="gap-compressed identity"):
        scan_contig_bam(path, cl, contigs, None)


def test_reference_consistency_exit(tmp_path):
    # chrom name/length mismatch between BAM header and FASTA -> exit DATAERR
    # (reference main.rs:56-59)
    from portello_tpu.io.fasta import write_fasta
    from portello_tpu.logger import setup_logger
    from portello_tpu.main import get_chrom_array

    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, [("chr1", b"ACGT" * 10)])
    cl = ChromList.from_pairs([("chr1", 40), ("chr2", 99)])
    with pytest.raises(SystemExit) as e:
        get_chrom_array(fasta, cl, setup_logger())
    assert e.value.code == 65  # EX_DATAERR

    cl2 = ChromList.from_pairs([("chr1", 41)])  # wrong length
    with pytest.raises(SystemExit):
        get_chrom_array(fasta, cl2, setup_logger())


def test_lifted_length_invariant():
    # (reference read_alignment_scanner.rs:204-229 panic)
    from portello_tpu.ops.blockmap import build_block_map
    from portello_tpu.pipeline.read_scan import (
        get_liftover_alignment_for_read_and_contig_segment,
    )
    from portello_tpu.pipeline.contig_scan import ContigMappingSegmentInfo
    from portello_tpu.pipeline.split_read import SeqOrderSplitReadSegment

    header = make_header()
    # read whose cigar read-length (10) disagrees with its seq length (8)
    rec = BamRecord(
        qname=b"bad", flag=0, tid=0, pos=0, mapq=60,
        cigar=cg.cigar((cg.M, 10)),
        seq=np.full(8, ord("A"), np.uint8), qual=np.full(8, 30, np.uint8),
    )
    seg = SeqOrderSplitReadSegment(0, 10, 0, 0, True, cg.cigar((cg.M, 10)), 60, True)
    contig_seg = SeqOrderSplitReadSegment(
        0, 100, 0, 0, True, cg.cigar((cg.EQ, 100)), 60, True
    )
    info = ContigMappingSegmentInfo(
        contig_seg, build_block_map(0, cg.cigar((cg.EQ, 100)), False)
    )
    reference = [np.full(1000, ord("A"), np.uint8)]
    contigs = ChromList.from_pairs([("ctg", 100)])
    with pytest.raises(AssertionError, match="Failed to remap"):
        get_liftover_alignment_for_read_and_contig_segment(
            reference, contigs, rec, seg, 0, info, None
        )


def test_placed_unmapped_record_errors(tmp_path):
    """Placed-unmapped (FUNMAP with a valid tid) records fail the scan on
    both feeds — the reference's assert (read_alignment_scanner.rs:396);
    only the unplaced section passes through (:537-559)."""
    import numpy as np

    from portello_tpu.io.bam import (
        BamReader, BamRecord, BamWriter, FUNMAP,
    )
    from portello_tpu.io.index_build import build_bai
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(21))
    src = str(tmp_path / "read_to_asm.bam")
    bad = str(tmp_path / "read_to_asm_bad.bam")
    with BamReader(src) as r:
        recs = list(r)
        header = r.header
    placed = BamRecord(
        qname=b"placed_unmapped", flag=FUNMAP, tid=0, pos=100, mapq=0,
        seq=np.frombuffer(b"ACGT", np.uint8).copy(),
        qual=np.full(4, 30, np.uint8),
    )
    with BamWriter(bad, header) as w:
        w.write(placed)
        for rec in recs:
            w.write(rec)
    build_bai(bad)

    import pytest

    from portello_tpu.main import main

    for feed in ("python", "native"):
        with pytest.raises(SystemExit):
            main([
                "--assembly-to-ref", str(tmp_path / "asm_to_ref.bam"),
                "--read-to-assembly", bad,
                "--remapped-read-output", str(tmp_path / f"r_{feed}.bam"),
                "--unassembled-read-output", str(tmp_path / f"u_{feed}.bam"),
                "--ref", str(tmp_path / "ref.fa"),
                "--device", "cpu" if feed == "native" else "host",
                "--feed", feed,
            ])


def test_sa_split_terminator_semantics():
    """Rust split_terminator parity (sa_tag_parser.rs): ONE trailing empty
    field/segment is tolerated; interior empties and out-of-range MAPQ are
    hard errors."""
    from portello_tpu.pipeline.split_read import parse_sa_aux_val

    # trailing ';' and trailing ',' both fine
    segs = parse_sa_aux_val("chr1,100,+,10M,60,0;")
    assert len(segs) == 1 and segs[0].mapq == 60
    segs = parse_sa_aux_val("chr1,100,+,10M,60,0,;")
    assert len(segs) == 1

    # doubled ';' leaves an interior empty segment -> panic parity
    with pytest.raises(ValueError, match="Unexpected segment"):
        parse_sa_aux_val("chr1,100,+,10M,60,0;;chr2,5,-,10M,60,0;")
    # double trailing comma -> 7 fields after one terminator drop
    with pytest.raises(ValueError, match="Unexpected segment"):
        parse_sa_aux_val("chr1,100,+,10M,60,0,,;")
    # MAPQ is u8 in the reference
    with pytest.raises(ValueError, match="Unexpected segment"):
        parse_sa_aux_val("chr1,100,+,10M,300,0;")
