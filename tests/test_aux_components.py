"""Tests for auxiliary/parity components: progress, containers, prob, basemod."""

import numpy as np
import pytest

from portello_tpu.auxlib.basemod import (
    CpGMethSkippedBaseMode,
    CpgMethInfo,
    decode_cpg_meth_info,
    decode_ml,
)
from portello_tpu.io.bam import BamHeader, BamRecord
from portello_tpu.utils.containers import RingBuffer, SparseWindowSum
from portello_tpu.utils.prob import log_sum_exp, normalize_ln_distro
from portello_tpu.utils.progress import ProgressReporter


def test_progress_reporter():
    p = ProgressReporter(1000, "Processed", "kb", force_periodic=True, interval_s=9999)
    p.inc(100)
    p.inc(250)
    assert p.count == 350
    assert "350/1000" in p._message()
    p.clear()


def test_ring_buffer():
    rb = RingBuffer(3)
    for i in range(5):
        rb.push(i)
    assert len(rb) == 3
    assert rb.to_list() == [2, 3, 4]
    assert rb[0] == 2 and rb[2] == 4
    with pytest.raises(IndexError):
        rb[3]


def test_sparse_window_sum():
    w = SparseWindowSum(5)
    w.add(0)
    w.add(2)
    w.add(4, 3)
    assert w.sum() == 5
    w.advance(2)  # drops pos 0..1
    assert w.sum() == 4
    w.add(6)
    assert w.sum() == 5
    w.advance(100)
    assert w.sum() == 0


def test_prob_utils():
    vals = np.log([0.1, 0.2, 0.7])
    assert log_sum_exp(vals) == pytest.approx(0.0)
    out, max_i = normalize_ln_distro(np.array([0.0, 0.0]))
    assert out == pytest.approx([0.5, 0.5])
    assert max_i == 0  # first-max, like the reference (prob_util.rs:24-31)
    probs, mi = normalize_ln_distro(np.log([0.1, 0.7, 0.2]))
    assert mi == 1
    assert probs == pytest.approx([0.1, 0.7, 0.2])
    empty, none_i = normalize_ln_distro(np.array([]))
    assert none_i is None and len(empty) == 0
    assert log_sum_exp(np.array([])) == float("-inf")


def make_header():
    return BamHeader.from_refs([("chr1", 10_000_000)])


def test_decode_ml():
    # basemod.rs test values
    assert decode_ml(0) == pytest.approx(1.0 / 512)
    assert decode_ml(255) == pytest.approx(255 / 256 + 1 / 512)


def test_basemod_missing_tags():
    header = make_header()
    rec = BamRecord.from_sam(
        header, "q\t4\t*\t0\t255\t*\t*\t0\t0\tACGCCGTA\tIIIIIIII"
    )
    assert decode_cpg_meth_info(rec) == 1


def test_basemod_fwd():
    header = make_header()
    # seq ACGCCGTA: C's at 1,3,4; CpG contexts: pos1 (CG), pos4 (CG)
    rec = BamRecord.from_sam(
        header,
        "q\t0\tchr1\t100\t60\t8M\t*\t0\t0\tACGCCGTA\tIIIIIIII\t"
        "MM:Z:C+m,0,1;\tML:B:C,200,100",
    )
    info = decode_cpg_meth_info(rec)
    assert isinstance(info, CpgMethInfo)
    # offsets 0,1: first C (pos1), then skip one C (pos3) -> pos4
    assert set(info.pos_prob) == {1, 4}
    assert info.pos_prob[1] == pytest.approx(decode_ml(200))
    assert info.pos_prob[4] == pytest.approx(decode_ml(100))


def test_basemod_skip_mode_and_non_cpg():
    header = make_header()
    rec = BamRecord.from_sam(
        header,
        "q\t0\tchr1\t100\t60\t8M\t*\t0\t0\tACGCCGTA\tIIIIIIII\t"
        "MM:Z:C+m?,0,0,0;\tML:B:C,10,20,30",
    )
    info = decode_cpg_meth_info(rec)
    assert isinstance(info, CpgMethInfo)
    assert info.skip_mode == CpGMethSkippedBaseMode.UNKNOWN
    # C at pos3 is not CpG (next base C) -> filtered
    assert set(info.pos_prob) == {1, 4}


def test_basemod_reverse_strand():
    header = make_header()
    # stored seq TACGGCGT; sequencing orientation = revcomp = ACGCCGTA
    rec = BamRecord.from_sam(
        header,
        "q\t16\tchr1\t100\t60\t8M\t*\t0\t0\tTACGGCGT\tIIIIIIII\t"
        "MM:Z:C+m,0,1;\tML:B:C,200,100",
    )
    info = decode_cpg_meth_info(rec)
    assert isinstance(info, CpgMethInfo)
    # sequencing-order C's at 1 and 4 (CpG) -> flipped to fwd-strand C index:
    # read_len - (i+1) - 1 = 8-2-1=5 and 8-5-1=2
    assert set(info.pos_prob) == {5, 2}


def test_basemod_no_c_mod():
    header = make_header()
    rec = BamRecord.from_sam(
        header,
        "q\t0\tchr1\t100\t60\t8M\t*\t0\t0\tACGCCGTA\tIIIIIIII\t"
        "MM:Z:A+a,0;\tML:B:C,5",
    )
    assert decode_cpg_meth_info(rec) == 3


def test_get_float_tag():
    """Typed float aux getter (reference bam_utils/aux/mod.rs:25-103)."""
    import pytest

    from portello_tpu.io.bam import BamFormatError, BamRecord

    rec = BamRecord(qname=b"r1")
    rec.push_tag(b"XF", b"f", 2.5)
    rec.push_tag(b"XI", b"i", 7)
    assert rec.get_float_tag(b"XF") == 2.5
    assert rec.get_float_tag(b"ZZ") is None
    with pytest.raises(BamFormatError):
        rec.get_float_tag(b"XI")


def test_float_tag_roundtrip_through_bam():
    import numpy as np

    from portello_tpu.io.bam import BamHeader, BamRecord

    rec = BamRecord(
        qname=b"r2", flag=0, tid=0, pos=5, mapq=60,
        seq=np.frombuffer(b"ACGT", np.uint8).copy(),
        qual=np.full(4, 30, np.uint8),
    )
    rec.push_tag(b"XF", b"f", 1.5)
    out = BamRecord.decode(rec.encode())
    assert out.get_float_tag(b"XF") == 1.5


def test_colinear_join_gap_config():
    """--max-join-gap overrides the reference's hard-coded 1000 (joiner.rs:37)."""
    from portello_tpu.pipeline.contig_scan import _are_segments_joinable
    from portello_tpu.pipeline.split_read import SeqOrderSplitReadSegment
    from portello_tpu.ops import cigar as cg

    def seg(pos):
        return SeqOrderSplitReadSegment(
            seq_order_read_start=0, seq_order_read_end=100, chrom_index=0,
            pos=pos, is_fwd_strand=True, cigar=cg.cigar((cg.M, 100)),
            mapq=60, from_primary_bam_record=True,
        )

    a, b = seg(0), seg(100 + 500)
    assert _are_segments_joinable(a, b, 1000)
    assert not _are_segments_joinable(a, b, 100)


def test_contig_index_cache_roundtrip(tmp_path):
    """--contig-index: written on first run, loaded on the second (skipping
    the contig scan), byte-identical output; parameter mismatch is an error
    (the phase-1 index is the natural cross-run cache/broadcast artifact,
    SURVEY.md section 5)."""
    import numpy as np
    import pytest

    from portello_tpu.io.bam import BamReader
    from portello_tpu.main import main
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(83))
    idx = tmp_path / "phase1.ptidx"

    def run(tag, extra=()):
        out = tmp_path / f"rem_{tag}.bam"
        main([
            "--assembly-to-ref", str(tmp_path / "asm_to_ref.bam"),
            "--read-to-assembly", str(tmp_path / "read_to_asm.bam"),
            "--remapped-read-output", str(out),
            "--unassembled-read-output", str(tmp_path / f"un_{tag}.bam"),
            "--ref", str(tmp_path / "ref.fa"), "--device", "host",
            *extra,
        ])
        with BamReader(str(out)) as r:
            return sorted(rec.to_sam(r.header) for rec in r)

    plain = run("plain")
    saved = run("save", ("--contig-index", str(idx)))
    assert idx.exists()
    loaded = run("load", ("--contig-index", str(idx)))
    assert plain == saved == loaded

    # parameter mismatch must refuse the cached index
    with pytest.raises(SystemExit):
        run("bad", ("--contig-index", str(idx), "--max-join-gap", "5"))
