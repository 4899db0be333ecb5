"""Profile phase 1 (contig scan) on a many-contig scenario and A/B the
threaded scan (VERDICT r2 #5: the reference fans phase 1 over rayon,
contig_alignment_scanner/mod.rs:243-283; ours was single-threaded Python).

Usage: python scripts/profile_phase1.py [n_contigs] [contig_len] [threads]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from portello_tpu.io.bam import BamHeader, BamRecord, BamWriter
from portello_tpu.io.index_build import build_bai
from portello_tpu.ops import cigar as cg
from portello_tpu.ops.seq import rev_comp
from portello_tpu.testutil.simulate import apply_edits, rand_seq
from portello_tpu.utils.chrom_list import ChromList


def build(tmpdir, n_contigs=200, contig_len=60000, rng=None):
    rng = rng or np.random.default_rng(7)
    chrom_len = n_contigs * (contig_len + 1000) + 10000
    chrom = rand_seq(rng, chrom_len)
    header = BamHeader.from_refs([("chr1", chrom_len)])
    recs = []
    pos = 500
    for i in range(n_contigs):
        seg = chrom[pos : pos + contig_len]
        seq, cig = apply_edits(seg, rng, 0.001, 0.0005)
        rev = i % 3 == 2
        recs.append(
            BamRecord(
                qname=f"ctg{i:05d}".encode(),
                flag=16 if rev else 0,
                tid=0,
                pos=pos,
                mapq=60,
                cigar=cig,
                seq=seq if not rev else rev_comp(seq),
                qual=np.full(len(seq), 40, np.uint8),
            )
        )
        pos += contig_len + 1000
    bam = os.path.join(tmpdir, "many_asm.bam")
    with BamWriter(bam, header) as w:
        for r in recs:
            w.write(r)
    build_bai(bam)
    contig_list = ChromList.from_pairs(
        [(r.qname.decode(), int(cg.get_cigar_read_offset(r.cigar, False))) for r in recs]
    )
    ref_list = ChromList.from_pairs([("chr1", chrom_len)])
    return bam, ref_list, contig_list


def main():
    n_contigs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    contig_len = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    tmpdir = f"/tmp/phase1_prof_{n_contigs}_{contig_len}"
    bam = os.path.join(tmpdir, "many_asm.bam")
    if os.path.exists(bam):
        import pickle

        with open(os.path.join(tmpdir, "lists.pkl"), "rb") as f:
            ref_list, contig_list = pickle.load(f)
        print(f"reusing cached scenario in {tmpdir}")
    else:
        os.makedirs(tmpdir, exist_ok=True)
        print(f"building scenario: {n_contigs} contigs x {contig_len} bp")
        bam, ref_list, contig_list = build(tmpdir, n_contigs, contig_len)
        import pickle

        with open(os.path.join(tmpdir, "lists.pkl"), "wb") as f:
            pickle.dump((ref_list, contig_list), f)
    sz = os.path.getsize(bam) / 1e6
    print(f"contig BAM: {sz:.1f} MB")

    from portello_tpu.pipeline.contig_scan import scan_contig_bam

    kw = {}
    import inspect

    if "thread_count" in inspect.signature(scan_contig_bam).parameters:
        kw["thread_count"] = threads

    if os.environ.get("PHASE1_CPROFILE") == "1":
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        scan_contig_bam(bam, ref_list, contig_list, None)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
        return

    import pickle

    results = {}
    # interleaved A/B (A,B,A,B): cross-run absolutes swing; report best-of-2
    times: dict = {"1 thread": [], f"{threads} threads": []}
    for _ in range(2):
        for tag, k in [("1 thread", {}), (f"{threads} threads", kw)]:
            t0 = time.perf_counter()
            r = scan_contig_bam(bam, ref_list, contig_list, None, **k)
            times[tag].append(time.perf_counter() - t0)
            results[tag] = r
    for tag, ts in times.items():
        n_segs = sum(
            len(i.ordered_contig_segment_info) for i in results[tag]
        )
        print(f"{tag}: best {min(ts):.2f}s of {[round(t, 2) for t in ts]}"
              f"  ({n_segs} segments)")
    blobs = {t: pickle.dumps(r) for t, r in results.items()}
    vals = list(blobs.values())
    print("results identical:", all(v == vals[0] for v in vals))


if __name__ == "__main__":
    main()
