"""CRAM index (.crai) build, parse, fetch, and CLI enforcement.

The reference opens every alignment input through bam::IndexedReader and
errors when the index is absent (cli.rs:147-163) — for CRAM that index is a
.crai — and serves region fetches from it (read_alignment_scanner.rs:383).
"""

import numpy as np
import pytest

from portello_tpu.io import cram
from portello_tpu.io.bam import BamReader
from portello_tpu.io.crai import CraiIndex
from portello_tpu.io.index_build import build_crai
from portello_tpu.testutil.simulate import make_scenario


def _bam_to_cram(bam_path, cram_path, **kw):
    with BamReader(str(bam_path)) as r:
        recs = list(r)
        header = r.header
    with cram.CramWriter(str(cram_path), header, **kw) as w:
        for rec in recs:
            w.write(rec)
    return header, recs


def test_writer_emits_crai_and_fetch_matches_bam(tmp_path):
    """CramWriter writes a .crai alongside; CramReader.fetch through it
    returns exactly BamReader.fetch's records (htslib overlap semantics)."""
    make_scenario(str(tmp_path), rng=np.random.default_rng(7))
    bam = tmp_path / "read_to_asm.bam"
    crm = tmp_path / "read_to_asm.cram"
    _bam_to_cram(bam, crm, records_per_slice=16)
    assert (tmp_path / "read_to_asm.cram.crai").exists()

    idx = CraiIndex.load(str(crm))
    assert idx.entries, "index should have slice entries"

    from portello_tpu.io.index_build import build_bai

    build_bai(str(bam))
    with BamReader(str(bam)) as br, cram.CramReader(str(crm)) as cr:
        n_ref = len(br.header.refs)
        for tid in range(n_ref):
            for beg, end in ((0, 10**9), (1000, 5000), (0, 1)):
                want = [r.to_sam(br.header) for r in br.fetch(tid, beg, end)]
                got = [r.to_sam(br.header) for r in cr.fetch(tid, beg, end)]
                assert got == want, (tid, beg, end)


def test_build_crai_matches_writer_index(tmp_path):
    """build_crai on a file written WITHOUT an index reproduces the writer's
    own entries (container offsets, landmarks, spans)."""
    make_scenario(str(tmp_path), rng=np.random.default_rng(8))
    bam = tmp_path / "read_to_asm.bam"
    with_idx = tmp_path / "a.cram"
    no_idx = tmp_path / "b.cram"
    _bam_to_cram(bam, with_idx, records_per_slice=8)
    _bam_to_cram(bam, no_idx, records_per_slice=8, write_index=False)
    assert not (tmp_path / "b.cram.crai").exists()
    built = build_crai(str(no_idx))
    assert built == str(no_idx) + ".crai"
    a = CraiIndex.load(str(with_idx)).entries
    b = CraiIndex.load(str(no_idx)).entries
    assert a == b


def test_multiref_container_entries_and_fetch(tmp_path):
    """A multi-reference slice (seq_id -2) indexes as one line per contained
    reference, and fetch on each tid still returns the right records."""
    make_scenario(str(tmp_path), rng=np.random.default_rng(9))
    bam = tmp_path / "read_to_asm.bam"
    crm = tmp_path / "multi.cram"
    # one giant slice -> every tid (and trailing unmapped) in one container
    _bam_to_cram(bam, crm, records_per_slice=10**6)
    idx = CraiIndex.load(str(crm))
    seq_ids = sorted({e.seq_id for e in idx.entries})
    assert len(seq_ids) > 1, "expected a multi-ref container"
    # rebuild from bytes and compare (exercises the multi-ref decode path)
    _bam_to_cram(bam, tmp_path / "multi2.cram", records_per_slice=10**6,
                 write_index=False)
    build_crai(str(tmp_path / "multi2.cram"))
    assert CraiIndex.load(str(tmp_path / "multi2.cram")).entries == [
        type(e)(e.seq_id, e.start, e.span, e.container_offset,
                e.slice_offset, e.slice_size)
        for e in idx.entries
    ]
    with BamReader(str(bam)) as br:
        from portello_tpu.io.index_build import build_bai

        build_bai(str(bam))
        with cram.CramReader(str(crm)) as cr:
            for tid in range(len(br.header.refs)):
                want = [r.to_sam(br.header) for r in br.fetch(tid, 0, 10**9)]
                got = [r.to_sam(br.header) for r in cr.fetch(tid, 0, 10**9)]
                assert got == want


def test_fetch_unmapped_returns_unplaced_section(tmp_path):
    make_scenario(str(tmp_path), rng=np.random.default_rng(10))
    bam = tmp_path / "read_to_asm.bam"
    crm = tmp_path / "u.cram"
    header, recs = _bam_to_cram(bam, crm, records_per_slice=16)
    want = sorted(
        r.qname for r in recs if r.is_unmapped() and r.tid < 0
    )
    with cram.CramReader(str(crm)) as cr:
        got = sorted(r.qname for r in cr.fetch_unmapped())
    assert got == want and len(want) > 0


def test_cli_rejects_unindexed_cram(tmp_path):
    """Reference parity: an unindexed CRAM input fails validation with the
    'Failed to open input alignment file' error (cli.rs:147-163)."""
    from portello_tpu.main import main

    make_scenario(str(tmp_path), rng=np.random.default_rng(11))
    crm = tmp_path / "read_to_asm.cram"
    _bam_to_cram(tmp_path / "read_to_asm.bam", crm, write_index=False)
    with pytest.raises(SystemExit, match="Failed to open input alignment"):
        main([
            "--assembly-to-ref", str(tmp_path / "asm_to_ref.bam"),
            "--read-to-assembly", str(crm),
            "--remapped-read-output", str(tmp_path / "rem.bam"),
            "--unassembled-read-output", str(tmp_path / "un.bam"),
            "--ref", str(tmp_path / "ref.fa"),
            "--device", "host",
        ])


def test_target_region_cram_seeks_and_matches_bam(tmp_path, monkeypatch):
    """--target-region on CRAM input serves reads by .crai slice seek: the
    run touches only the indexed containers (bytes-read counter stays well
    under the file size) and its outputs equal the BAM target-region run."""
    from portello_tpu.io import aln_input
    from portello_tpu.main import main

    make_scenario(str(tmp_path), rng=np.random.default_rng(12))
    crm = tmp_path / "read_to_asm.cram"
    _bam_to_cram(tmp_path / "read_to_asm.bam", crm, records_per_slice=8)

    # capture the phase-2 CramReader instance to read its byte counter
    readers = []
    real_open = aln_input.open_alignment_input

    def spy_open(path, reference=None):
        r = real_open(path, reference=reference)
        if str(path).endswith(".cram"):
            readers.append(r)
        return r

    monkeypatch.setattr(aln_input, "open_alignment_input", spy_open)
    # target the first chromosome's head: phase 1 then keeps only contigs
    # overlapping it
    with BamReader(str(tmp_path / "asm_to_ref.bam")) as r:
        chrom = r.header.refs[0][0]

    def run(tag, r2a):
        out = tmp_path / f"rem_{tag}.bam"
        un = tmp_path / f"un_{tag}.bam"
        main([
            "--assembly-to-ref", str(tmp_path / "asm_to_ref.bam"),
            "--read-to-assembly", str(r2a),
            "--remapped-read-output", str(out),
            "--unassembled-read-output", str(un),
            "--ref", str(tmp_path / "ref.fa"),
            "--device", "host", "--feed", "python",
            "--target-region", f"{chrom}:1-2000",
        ])
        return out, un

    out_b, un_b = run("bam", tmp_path / "read_to_asm.bam")
    out_c, un_c = run("cram", crm)

    def recs_sam(path, zero_unmapped_mapq=False):
        with BamReader(str(path)) as r:
            out = []
            for rec in r:
                if zero_unmapped_mapq and rec.is_unmapped():
                    rec.mapq = 0
                out.append(rec.to_sam(r.header))
        return sorted(out)

    assert recs_sam(out_b) == recs_sam(out_c)
    assert recs_sam(un_b, True) == recs_sam(un_c, True)

    # the phase-2 reader (the last CRAM reader opened) must have seeked,
    # not full-scanned: well under the total file bytes
    file_size = crm.stat().st_size
    phase2 = readers[-1]
    assert 0 < phase2.bytes_read < file_size * 0.9, (
        phase2.bytes_read, file_size,
    )


def test_index_tool_builds_crai(tmp_path, capsys):
    """`portello-tpu index` on a CRAM input builds the .crai (samtools index
    parity for the CRAM container format)."""
    from portello_tpu.tools.index import main as index_main

    make_scenario(str(tmp_path), rng=np.random.default_rng(13))
    crm = tmp_path / "t.cram"
    _bam_to_cram(tmp_path / "read_to_asm.bam", crm, write_index=False)
    index_main([str(crm)])
    assert (tmp_path / "t.cram.crai").exists()
    assert CraiIndex.load(str(crm)).entries
