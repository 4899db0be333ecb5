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


def test_target_region_cram_full_scans_and_matches_bam(tmp_path):
    """--target-region must NOT narrow the CRAM scan by contig: a read's
    primary can live on a filtered-out contig while an SA split segment maps
    onto a surviving one (the reference scans every contig,
    read_alignment_scanner.rs:638).  This test plants exactly such a
    cross-contig split read and asserts the CRAM target-region output equals
    the BAM target-region output."""
    from portello_tpu.io.bam import FSUPPLEMENTARY, BamRecord, BamWriter
    from portello_tpu.io.index_build import build_bai
    from portello_tpu.main import main
    from portello_tpu.ops import cigar as cg
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(12))
    bam = tmp_path / "read_to_asm.bam"
    with BamReader(str(bam)) as r:
        recs = list(r)
        header = r.header

    # contig forward sequences + their ref spans, from the asm records
    with BamReader(str(tmp_path / "asm_to_ref.bam")) as r:
        asm_header = r.header
        asm = {rec.qname.decode(): rec for rec in r if not rec.is_supplementary()}
    from portello_tpu.ops.seq import rev_comp

    c1 = asm["ctg1"]
    c2 = asm["ctg2"]
    c1_seq = c1.seq if not c1.is_reverse() else rev_comp(c1.seq)
    c2_seq = c2.seq if not c2.is_reverse() else rev_comp(c2.seq)

    # cross-contig split read: primary on ctg1, SA split onto ctg2
    half = 120
    p1, p2 = 40, 60
    sseq = np.concatenate([c1_seq[p1 : p1 + half], c2_seq[p2 : p2 + half]])
    cig_a = cg.cigar((cg.M, half), (cg.S, half))
    cig_b = cg.cigar((cg.S, half), (cg.M, half))
    sa_a = f"ctg1,{p1 + 1},+,{cg.to_string(cig_a)},60,0;"
    sa_b = f"ctg2,{p2 + 1},+,{cg.to_string(cig_b)},60,0;"
    prim = BamRecord(
        qname=b"xsplit", flag=0, tid=0, pos=p1, mapq=60, cigar=cig_a,
        seq=sseq, qual=np.full(2 * half, 30, np.uint8),
    )
    prim.push_tag(b"SA", b"Z", sa_b)
    supp = BamRecord(
        qname=b"xsplit", flag=FSUPPLEMENTARY, tid=1, pos=p2, mapq=60,
        cigar=cig_b, seq=sseq, qual=np.full(2 * half, 30, np.uint8),
    )
    supp.push_tag(b"SA", b"Z", sa_a)
    recs2 = sorted(
        [r for r in recs if not r.is_unmapped()] + [prim, supp],
        key=lambda r: (r.tid, r.pos),
    ) + [r for r in recs if r.is_unmapped()]
    bam2 = tmp_path / "read_to_asm_x.bam"
    with BamWriter(str(bam2), header) as w:
        for rec in recs2:
            w.write(rec)
    build_bai(str(bam2))
    crm = tmp_path / "read_to_asm_x.cram"
    _bam_to_cram(bam2, crm, records_per_slice=8)

    # region covering ctg2's ref span but NOT ctg1's
    c2_chrom = asm_header.refs[c2.tid][0]
    c2_lo = c2.pos
    c2_hi = c2.pos + int(cg.get_cigar_ref_offset(c2.cigar))
    region = f"{c2_chrom}:{c2_lo + 1}-{c2_hi}"
    assert not (c1.tid == c2.tid and c1.pos < c2_hi and
                c1.pos + int(cg.get_cigar_ref_offset(c1.cigar)) > c2_lo), (
        "scenario assumption: ctg1 must not overlap the region")

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
            "--target-region", region,
        ])
        return out, un

    out_b, un_b = run("bam", bam2)
    out_c, un_c = run("cram", crm)

    def recs_sam(path, zero_unmapped_mapq=False):
        with BamReader(str(path)) as r:
            out = []
            for rec in r:
                if zero_unmapped_mapq and rec.is_unmapped():
                    rec.mapq = 0
                out.append(rec.to_sam(r.header))
        return sorted(out)

    sams_b = recs_sam(out_b)
    # the cross-contig split's ctg2 segment must be lifted despite its
    # primary sitting on the non-targeted ctg1
    assert any(s.startswith("xsplit\t") for s in sams_b), sams_b[:3]
    assert recs_sam(out_c) == sams_b
    assert recs_sam(un_c, True) == recs_sam(un_b, True)


def test_shard_cram_seeks_by_crai(tmp_path, monkeypatch):
    """Contig-shard runs DO narrow the CRAM scan (ownership is keyed on the
    primary's tid, exactly the filter the scan applies): the shard's
    phase-2 reader must seek, not full-scan (bytes-read counter)."""
    from portello_tpu.io import aln_input
    from portello_tpu.main import main

    make_scenario(str(tmp_path), rng=np.random.default_rng(12))
    crm = tmp_path / "read_to_asm.cram"
    _bam_to_cram(tmp_path / "read_to_asm.bam", crm, records_per_slice=4)

    readers = []
    real_open = aln_input.open_alignment_input

    def spy_open(path, reference=None):
        r = real_open(path, reference=reference)
        if str(path).endswith(".cram"):
            readers.append(r)
        return r

    monkeypatch.setattr(aln_input, "open_alignment_input", spy_open)
    main([
        "--assembly-to-ref", str(tmp_path / "asm_to_ref.bam"),
        "--read-to-assembly", str(crm),
        "--remapped-read-output", str(tmp_path / "rem.bam"),
        "--unassembled-read-output", str(tmp_path / "un.bam"),
        "--ref", str(tmp_path / "ref.fa"),
        "--device", "host", "--feed", "python",
        "--num-hosts", "2", "--host-id", "1",
    ])
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


def test_fetch_many_matches_per_tid_fetch_and_decodes_once(tmp_path):
    """fetch_many == concatenated per-tid fetches (order preserved), with
    each container decoded at most once even when multi-ref containers are
    shared between requested tids."""
    make_scenario(str(tmp_path), rng=np.random.default_rng(14))
    crm = tmp_path / "m.cram"
    # large slices force multi-ref containers shared across contigs
    _bam_to_cram(tmp_path / "read_to_asm.bam", crm, records_per_slice=64)

    with BamReader(str(tmp_path / "read_to_asm.bam")) as r:
        n_ref = len(r.header.refs)
        lens = [ln for _, ln in r.header.refs]
        header = r.header
    ranges = [(t, lens[t]) for t in range(n_ref)]

    with cram.CramReader(str(crm)) as cr:
        per_tid = []
        for t, e in ranges:
            per_tid += [rec.to_sam(header) for rec in cr.fetch(t, 0, e)]
    with cram.CramReader(str(crm)) as cr:
        decodes = []
        real = cr._iter_container_at

        def spy(off):
            decodes.append(off)
            return real(off)

        cr._iter_container_at = spy
        many = [rec.to_sam(header) for rec in cr.fetch_many(ranges)]
    assert sorted(many) == sorted(per_tid)
    assert len(decodes) == len(set(decodes)), "container decoded twice"


def test_crai_parse_rejects_malformed(tmp_path):
    import gzip

    bad_lines = [
        b"1\t2\t3\t4\t5\n",           # 5 columns
        b"1\t2\t3\t4\t5\t6\t7\n",     # 7 columns
        b"a\t2\t3\t4\t5\t6\n",        # non-int
    ]
    for raw in bad_lines:
        p = tmp_path / "x.crai"
        p.write_bytes(gzip.compress(raw))
        with pytest.raises(ValueError):
            CraiIndex.load(str(tmp_path / "x"))  # stemless candidate probe
        p.unlink()


def test_crai_candidate_stays_in_directory(tmp_path):
    """A dotted DIRECTORY name must not make the fallback candidate escape
    the file's directory (os.path.splitext, not rsplit)."""
    d = tmp_path / "data.v2"
    d.mkdir()
    f = d / "reads"  # extensionless file
    f.write_bytes(b"CRAM")
    # a decoy index OUTSIDE the directory that rsplit would have found
    (tmp_path / "data.crai").write_bytes(b"decoy")
    with pytest.raises(FileNotFoundError):
        CraiIndex.load(str(f))
