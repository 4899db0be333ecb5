"""Feed-only profile: drive the native scanner (ptscan) with NO jax in the
process, answering every batch with trivial results, so the producer-side
phase split (read / prepare / fill) and the finisher encode/write legs are
measured without XLA thread contention.

Modes (arg 2):
  unmapped  - mapped=0 rows: finisher encodes unmapped pass-through records
              (cheapest finish; isolates producer costs)
  fallback  - fallback=1 rows: full native exact compute (the ALL_HOST leg)

Usage: python scripts/profile_feed.py [threads] [mode] [n_reads] [read_len]
"""

import ctypes
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    threads = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mode = sys.argv[2] if len(sys.argv) > 2 else "unmapped"
    n_reads = int(sys.argv[3]) if len(sys.argv) > 3 else 4800
    read_len = int(sys.argv[4]) if len(sys.argv) > 4 else 18000

    import portello_tpu.pipeline.native_feed as nf
    from portello_tpu.io.fasta import get_genome_ref_from_fasta
    from portello_tpu.pipeline.contig_scan import scan_contig_bam
    from portello_tpu.pipeline.read_scan import get_alignment_file_header
    from portello_tpu.testutil.simulate import make_scenario
    from portello_tpu.utils.chrom_list import ChromList

    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, "..", ".bench_cache", f"e2e_{n_reads}_{read_len}")
    if not os.path.isdir(cache):
        os.makedirs(cache, exist_ok=True)
        print(f"generating scenario in {cache}")
        make_scenario(
            cache, rng=np.random.default_rng(99),
            n_reads_per_contig=max(n_reads // 3, 1), read_len=read_len,
            chrom_len=max(8 * read_len, 200000),
        )

    class Scn:
        contig_bam = os.path.join(cache, "asm_to_ref.bam")
        read_bam = os.path.join(cache, "read_to_asm.bam")
        ref_fasta = os.path.join(cache, "ref.fa")

    scn = Scn()
    lib = nf.get_lib()
    if lib is None:
        raise SystemExit(f"ptscan unavailable: {nf.build_error()}")

    ref_cl = ChromList.from_bam_filename(scn.contig_bam)
    asm_cl = ChromList.from_bam_filename(scn.read_bam)
    genome = get_genome_ref_from_fasta(scn.ref_fasta)
    reference = [genome.chroms[c.label] for c in ref_cl.data]
    info = scan_contig_bam(scn.contig_bam, ref_cl, asm_cl, None,
                           thread_count=threads)

    from portello_tpu.models.pipeline_model import DEFAULT_BUCKETS

    buckets = list(DEFAULT_BUCKETS)
    batch_size = 512
    header = get_alignment_file_header(ref_cl, "profile_feed").encode()
    max_out = max(b.resolved_max_out() for b in buckets)
    fb_codes = np.zeros((batch_size, max_out), np.int32)
    fb_lens = np.zeros((batch_size, max_out), np.int32)
    fb_n = np.zeros(batch_size, np.int32)
    fb_pos = np.zeros(batch_size, np.int32)
    fb_mapped = np.zeros(batch_size, np.uint8)
    fb_fb = np.full(batch_size, 1 if mode == "fallback" else 0, np.uint8)
    fb_rl = np.zeros(batch_size, np.int64)
    i64p, i32p, u8p = nf.i64p, nf.i32p, nf.u8p

    for rep in range(3):
        work = tempfile.mkdtemp(prefix="feedprof_")
        out_r = os.path.join(work, "r.bam")
        out_u = os.path.join(work, "u.bam")
        t0 = time.perf_counter()
        h, _keep = nf.create_scanner(
            lib, scn.read_bam, out_r, out_u, header, reference, ref_cl,
            asm_cl, info, buckets, batch_size, False, None, threads,
            resident=os.environ.get("PTPU_RESIDENT") == "1",
        )
        desc = nf._BatchDesc()

        def post():
            rc2 = lib.ptscan_post_results(
                h, i32p(fb_codes), i32p(fb_lens), i32p(fb_n), i32p(fb_pos),
                u8p(fb_mapped), u8p(fb_fb), i64p(fb_rl),
                ctypes.c_longlong(max_out),
            )
            if rc2 < 0:
                raise SystemExit(lib.ptscan_error(h).decode())

        pending = 0
        while True:
            rc = lib.ptscan_next_batch(h, ctypes.byref(desc))
            if rc < 0:
                raise SystemExit(lib.ptscan_error(h).decode())
            if rc == 0:
                break
            if rc == 2:
                post()
                pending -= 1
                continue
            pending += 1
            if pending >= 2:
                post()
                pending -= 1
        while pending > 0:
            post()
            pending -= 1
        if lib.ptscan_finish(h) < 0:
            raise SystemExit(lib.ptscan_error(h).decode())
        stats = (ctypes.c_longlong * 6)()
        lib.ptscan_stats(h, stats)
        timing = (ctypes.c_longlong * 9)()
        lib.ptscan_timing(h, timing)
        prep5 = (ctypes.c_longlong * 5)()
        if hasattr(lib, "ptscan_prep_timing"):
            lib.ptscan_prep_timing(prep5)
        lib.ptscan_destroy(h)
        wall = time.perf_counter() - t0
        names = ("read", "prepare", "fill", "drain", "post", "shift",
                 "finish_enc", "fin_encode", "fin_write")
        n = int(stats[0])
        t = dict(zip(names, (v / 1e9 for v in timing)))
        producer = t["read"] + t["prepare"] + t["fill"] + t["drain"]
        cap = n / max(producer, t["finish_enc"]) if n else 0.0
        print(
            f"[{mode} t={threads} rep={rep}] n={n} wall={wall:.2f}s "
            f"cap={cap / 1000:.1f}k/s | "
            + " ".join(f"{k} {v:.3f}" for k, v in t.items() if v > 0.0005)
        )
        pnames = ("parse", "seq", "sa", "items", "rc")
        # cumulative across reps (process-global counters): print deltas
        prev = getattr(main, "_prep_prev", [0] * 5)
        cur = [int(v) for v in prep5]
        main._prep_prev = cur
        print("  prep CPU split: " + " ".join(
            f"{k} {(c - p) / 1e9:.3f}" for k, p, c in zip(pnames, prev, cur)
        ))
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
