"""Race-detection harness for the native runtime (SURVEY.md section 5: the
reference ships none; safety there rests on rustc alone).

Drives ptscan's FULL threaded machinery — parallel BGZF readahead, chunked
parallel record prep, parallel batch fill, FIFO drain with parallel record
finishing/encode, pool-threaded BGZF writer — with NO jax in the process:
every emitted batch is answered with fallback=1 rows, routing all compute
through the native exact path (ptcore).  Run under an instrumented build to
get a jax-noise-free ThreadSanitizer signal:

    python scripts/tsan_native.py --build-tsan
    LD_PRELOAD=/usr/lib/x86_64-linux-gnu/libtsan.so.2 \
      TSAN_OPTIONS="halt_on_error=0 exitcode=66 log_path=/tmp/tsan_native" \
      python scripts/tsan_native.py --so /tmp/ptscan_tsan.so

Any report is OURS (the only threads in the process are ptscan's).  The
driver also asserts the output equals the pure-Python host-oracle run, so it
doubles as a native-exact-path conformance check.  Findings 2026-08-18: the
full-process TSAN run (jax in-process) reports only uninstrumented-jaxlib
cross-boundary pairs; this jax-free harness runs CLEAN.
"""

import argparse
import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SRC = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "portello_tpu", "io",
    "native", "ptscan.cc",
)


def build_tsan(out_so: str) -> None:
    base = [
        "g++", "-O1", "-g", "-std=c++17", "-shared", "-fPIC",
        "-fsanitize=thread", SRC, "-o", out_so,
    ]
    proc = subprocess.run(base + ["-lz", "-ldeflate", "-lpthread"])
    if proc.returncode != 0:
        subprocess.run(
            base + ["-DPTIO_NO_LIBDEFLATE", "-lz", "-lpthread"], check=True
        )
    print(f"built {out_so}")


def run(so_path: str | None, threads: int, batch_size: int) -> None:
    import portello_tpu.pipeline.native_feed as nf
    from portello_tpu.io.fasta import get_genome_ref_from_fasta
    from portello_tpu.pipeline.contig_scan import scan_contig_bam
    from portello_tpu.pipeline.read_scan import (
        get_alignment_file_header,
        scan_and_remap_reads,
    )
    from portello_tpu.testutil.simulate import make_scenario
    from portello_tpu.utils.chrom_list import ChromList

    if so_path:
        # bind the prebuilt (instrumented) library directly — get_lib's
        # staleness check would silently rebuild the path WITHOUT
        # -fsanitize=thread, voiding the sanitizer run
        lib = nf.bind_lib(so_path)
    else:
        lib = nf.get_lib()
        if lib is None:
            raise SystemExit(f"ptscan unavailable: {nf.build_error()}")

    work = tempfile.mkdtemp(prefix="tsan_native_")
    scn = make_scenario(work, rng=np.random.default_rng(41),
                        n_reads_per_contig=80, read_len=600)
    ref_cl = ChromList.from_bam_filename(scn.contig_bam)
    asm_cl = ChromList.from_bam_filename(scn.read_bam)
    genome = get_genome_ref_from_fasta(scn.ref_fasta)
    reference = [genome.chroms[c.label] for c in ref_cl.data]
    info = scan_contig_bam(scn.contig_bam, ref_cl, asm_cl, None)

    from portello_tpu.models.batch import BucketConfig

    buckets = [BucketConfig(max_ops=128, max_blocks=48, max_seq=4096,
                            max_clusters=64, window=24)]
    header = get_alignment_file_header(ref_cl, "tsan_native").encode()
    out_r = os.path.join(work, "native.bam")
    out_u = os.path.join(work, "native_un.bam")
    # shared ABI owner: the same marshalling path production uses
    h, _keepalive = nf.create_scanner(
        lib, scn.read_bam, out_r, out_u, header, reference, ref_cl,
        asm_cl, info, buckets, batch_size, False, None, threads,
    )
    i64p, i32p, u8p = nf.i64p, nf.i32p, nf.u8p

    desc = nf._BatchDesc()
    max_out = buckets[0].resolved_max_out()
    fb_codes = np.zeros((batch_size, max_out), np.int32)
    fb_lens = np.zeros((batch_size, max_out), np.int32)
    fb_n = np.zeros(batch_size, np.int32)
    fb_pos = np.zeros(batch_size, np.int32)
    fb_mapped = np.zeros(batch_size, np.uint8)
    fb_fb = np.ones(batch_size, np.uint8)  # all-fallback -> native exact path
    fb_rl = np.zeros(batch_size, np.int64)

    def post():
        rc2 = lib.ptscan_post_results(
            h, i32p(fb_codes), i32p(fb_lens), i32p(fb_n), i32p(fb_pos),
            u8p(fb_mapped), u8p(fb_fb), i64p(fb_rl),
            ctypes.c_longlong(max_out),
        )
        if rc2 < 0:
            raise SystemExit(lib.ptscan_error(h).decode())

    n_batches = 0
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
        n_batches += 1
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
    lib.ptscan_destroy(h)
    print(f"batches={n_batches} primary={stats[0]} fallback={stats[3]}")

    # conformance: all-fallback native output must equal the host oracle
    py_r = os.path.join(work, "py.bam")
    py_u = os.path.join(work, "py_un.bam")
    scan_and_remap_reads(
        scn.read_bam, py_r, py_u, reference, ref_cl, info, False,
        cmdline="tsan_native",
    )
    from portello_tpu.io.bam import BamReader

    def recs(p):
        with BamReader(p) as r:
            return sorted(x.to_sam(r.header) for x in r)

    assert recs(out_r) == recs(py_r), "native exact path diverged from oracle"
    assert recs(out_u) == recs(py_u)
    print(f"conformance OK ({len(recs(out_r))} records); workdir {work}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--build-tsan", action="store_true")
    p.add_argument("--so", default=None)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=64)
    a = p.parse_args()
    if a.build_tsan:
        build_tsan("/tmp/ptscan_tsan.so")
    else:
        run(a.so, a.threads, a.batch_size)
