"""Device engine bucket-spill and host-fallback exactness.

Constructs reads that (a) fit only the spill bucket, (b) saturate the
simplify/shift compare windows (long homopolymer indels), and (c) exceed all
buckets — the engine must transparently finish them on the exact host path
with output identical to the pure-host pipeline."""

import numpy as np
import pytest

from portello_tpu.io.bam import FREVERSE, BamHeader, BamRecord, BamWriter, BamReader
from portello_tpu.io.fasta import write_fasta
from portello_tpu.io.index_build import build_bai
from portello_tpu.main import main
from portello_tpu.ops import cigar as cg
from portello_tpu.ops.seq import rev_comp
from portello_tpu.testutil.simulate import rand_seq

jax = pytest.importorskip("jax")


def build_inputs(tmp):
    rng = np.random.default_rng(3)
    # reference chromosome with a long homopolymer stretch
    chrom = np.concatenate(
        [rand_seq(rng, 4000), np.full(300, ord("A"), np.uint8), rand_seq(rng, 4000)]
    )
    ref_header = BamHeader.from_refs([("chr1", len(chrom))])

    # ctg_fwd covers the chromosome exactly; ctg_rev maps reverse
    ctg_fwd = chrom.copy()
    ctg_rev_seq = rev_comp(chrom)  # contig's own sequence
    contigs = [("ctg_fwd", ctg_fwd, False), ("ctg_rev", ctg_rev_seq, True)]
    contig_records = []
    for name, seq, is_rev in contigs:
        stored = rev_comp(seq) if is_rev else seq
        rec = BamRecord(
            qname=name.encode(), flag=FREVERSE if is_rev else 0, tid=0, pos=0,
            mapq=60, cigar=cg.cigar((cg.EQ, len(chrom))), seq=stored,
            qual=np.full(len(chrom), 40, np.uint8),
        )
        contig_records.append(rec)
    contig_bam = str(tmp / "asm.bam")
    with BamWriter(contig_bam, ref_header) as w:
        for r in contig_records:
            w.write(r)
    build_bai(contig_bam)

    contig_header = BamHeader.from_refs([(n, len(chrom)) for n, _, _ in contigs])
    reads = []

    def add_read(qname, tid, pos, cigar, seq):
        reads.append(
            BamRecord(
                qname=qname.encode(), flag=0, tid=tid, pos=pos, mapq=50,
                cigar=cigar, seq=seq,
                qual=np.full(len(seq), 30, np.uint8),
            )
        )

    contig_seqs = {0: ctg_fwd, 1: ctg_rev_seq}

    # (a) spill bucket: > 256 cigar ops (alternating 1M1I x 200)
    pos = 100
    ops = []
    seq_parts = []
    cp = pos
    rng2 = np.random.default_rng(4)
    for _ in range(300):
        ops.append((cg.M, 1))
        seq_parts.append(contig_seqs[0][cp : cp + 1])
        cp += 1
        ops.append((cg.I, 1))
        seq_parts.append(rand_seq(rng2, 1))
    ops.append((cg.M, 50))
    seq_parts.append(contig_seqs[0][cp : cp + 50])
    add_read("spill_bucket", 0, pos, np.array(ops, np.int64), np.concatenate(seq_parts))

    # (b) window saturation: deletion inside the 300bp homopolymer on the
    # REVERSE contig (forces left-shift homology > window=48)
    # homopolymer occupies chrom[4000:4300] -> on rev contig coords also a run
    rev_hp_start = len(chrom) - 4300
    p0 = rev_hp_start - 100
    ln1, dln, ln2 = 150, 100, 150
    seq_b = np.concatenate(
        [
            contig_seqs[1][p0 : p0 + ln1],
            contig_seqs[1][p0 + ln1 + dln : p0 + ln1 + dln + ln2],
        ]
    )
    add_read(
        "window_saturate", 1, p0,
        cg.cigar((cg.M, ln1), (cg.D, dln), (cg.M, ln2)), seq_b,
    )

    # (c) beyond all buckets: > 1024 ops
    pos = 200
    ops = []
    seq_parts = []
    cp = pos
    for _ in range(1100):
        ops.append((cg.M, 2))
        seq_parts.append(contig_seqs[0][cp : cp + 2])
        cp += 2
        ops.append((cg.D, 1))
        cp += 1
    add_read("all_host", 0, pos, cg.compress_cigar(np.array(ops, np.int64)),
             np.concatenate(seq_parts))

    # (d) mixed-cluster budget: 60 adjacent I+D clusters exceeds the mm
    # path's static mixed-compaction budget (max_clusters // 4) in both the
    # spill (40) and HiFi (24) buckets -> per-read fallback flag
    pos = 1000
    ops = []
    seq_parts = []
    cp = pos
    rng3 = np.random.default_rng(5)
    for _ in range(60):
        ops.append((cg.M, 5))
        seq_parts.append(contig_seqs[0][cp : cp + 5])
        cp += 5
        ops.append((cg.I, 2))
        seq_parts.append(rand_seq(rng3, 2))
        ops.append((cg.D, 2))
        cp += 2
    ops.append((cg.M, 50))
    seq_parts.append(contig_seqs[0][cp : cp + 50])
    add_read(
        "many_mixed", 0, pos, np.array(ops, np.int64), np.concatenate(seq_parts)
    )

    # plus a plain read on each contig
    add_read("plain_fwd", 0, 500, cg.cigar((cg.M, 400)), contig_seqs[0][500:900])
    add_read("plain_rev", 1, 700, cg.cigar((cg.M, 400)), contig_seqs[1][700:1100])

    reads.sort(key=lambda r: (r.tid, r.pos))
    read_bam = str(tmp / "reads.bam")
    with BamWriter(read_bam, contig_header) as w:
        for r in reads:
            w.write(r)
    build_bai(read_bam)

    fasta = str(tmp / "ref.fa")
    write_fasta(fasta, [("chr1", chrom.tobytes())])
    return contig_bam, read_bam, fasta


def content(path):
    with BamReader(path) as r:
        return sorted(rec.encode() for rec in r)


def test_fallback_paths_exact(tmp_path):
    contig_bam, read_bam, fasta = build_inputs(tmp_path)

    def run(tag, device):
        r = str(tmp_path / f"r_{tag}.bam")
        main(
            [
                "--assembly-to-ref", contig_bam,
                "--read-to-assembly", read_bam,
                "--remapped-read-output", r,
                "--unassembled-read-output", str(tmp_path / f"u_{tag}.bam"),
                "--ref", fasta,
                "--device", device,
            ]
        )
        return r

    r_host = run("host", "host")
    r_dev = run("dev", "cpu")
    assert content(r_dev) == content(r_host)

    with BamReader(r_host) as r:
        by_name = {rec.qname.decode(): rec for rec in r if not rec.is_supplementary()}
    assert set(by_name) >= {
        "spill_bucket", "window_saturate", "all_host", "plain_fwd", "plain_rev"
    }
    assert by_name["plain_fwd"].pos == 500
    # reverse contig: read at rev-contig pos 700 -> fwd chrom pos
    assert by_name["plain_rev"].tid == 0
    assert by_name["plain_rev"].is_reverse()


def test_fallback_paths_actually_exercised(tmp_path):
    """The constructed reads must really hit the spill bucket and host
    fallback counters (else the test above proves nothing)."""
    from portello_tpu.io.fasta import get_genome_ref_from_fasta
    from portello_tpu.models.pipeline_model import DeviceEngine
    from portello_tpu.pipeline.contig_scan import scan_contig_bam
    from portello_tpu.pipeline.read_scan import scan_and_remap_reads
    from portello_tpu.utils.chrom_list import ChromList

    contig_bam, read_bam, fasta = build_inputs(tmp_path)
    ref_chrom_list = ChromList.from_bam_filename(contig_bam)
    contig_list = ChromList.from_bam_filename(read_bam)
    genome = get_genome_ref_from_fasta(fasta)
    reference = [genome.chroms[c.label] for c in ref_chrom_list.data]
    info = scan_contig_bam(contig_bam, ref_chrom_list, contig_list, None)
    # device-shift routing: this test pins the rev-path fallback counters
    # (host-shift routing never saturates the device homology window)
    engine = DeviceEngine(
        reference, contig_list, info, batch_size=16, host_shift=False
    )
    scan_and_remap_reads(
        read_bam, str(tmp_path / "rs.bam"), str(tmp_path / "us.bam"),
        reference, ref_chrom_list, info, False, engine=engine,
    )
    # all_host exceeds every bucket; window_saturate falls back after the
    # device flags its saturated homology window
    assert engine.stats["host_items"] >= 2
    assert engine.stats["fallback_items"] >= 1
    assert engine.stats["device_items"] >= 3


def test_mixed_cluster_budget_overflow(tmp_path):
    """mm mode: a read with more mixed indel clusters than the static
    compaction budget must set the fallback flag and finish on the exact
    host path (simplify_kernel mixed compaction)."""
    from portello_tpu.io.fasta import get_genome_ref_from_fasta
    from portello_tpu.models.pipeline_model import DeviceEngine
    from portello_tpu.pipeline.contig_scan import scan_contig_bam
    from portello_tpu.pipeline.read_scan import scan_and_remap_reads
    from portello_tpu.utils.chrom_list import ChromList

    contig_bam, read_bam, fasta = build_inputs(tmp_path)
    ref_chrom_list = ChromList.from_bam_filename(contig_bam)
    contig_list = ChromList.from_bam_filename(read_bam)
    genome = get_genome_ref_from_fasta(fasta)
    reference = [genome.chroms[c.label] for c in ref_chrom_list.data]
    info = scan_contig_bam(contig_bam, ref_chrom_list, contig_list, None)
    engine = DeviceEngine(
        reference, contig_list, info, batch_size=16, use_mm=True,
        host_shift=False,
    )
    scan_and_remap_reads(
        read_bam, str(tmp_path / "rsm.bam"), str(tmp_path / "usm.bam"),
        reference, ref_chrom_list, info, False, engine=engine,
    )
    # many_mixed overflows the budget on top of the other fallback reads
    assert engine.stats["fallback_items"] >= 2
    # exactness: identical to the pure-host oracle path
    scan_and_remap_reads(
        read_bam, str(tmp_path / "rsh.bam"), str(tmp_path / "ush.bam"),
        reference, ref_chrom_list, info, False, engine=None,
    )
    assert content(str(tmp_path / "rsm.bam")) == content(str(tmp_path / "rsh.bam"))
