"""Combination soak: one randomized scenario driven through every production
surface, record-compared against the host-oracle baseline.

Legs: host oracle (python walk), host + native phase-1, cpu-device native
feed at 1/4 threads, python feed with PTPU_MM=1, --local-workers 2 (BAM and
CRAM), CRAM 2.1 / 3.0 / 3.1 / 3.1-archive inputs, and --target-region on
BAM + CRAM 3.1 (the .crai slice-seek path).  BAM-input legs must be
record-identical to the baseline; CRAM legs identical modulo the documented
=/X -> M collapse (io/cram.py) and unmapped-MAPQ normalization.

Usage: python scripts/soak_combo.py [n_reads] [read_len] [seed]
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def content(path, zero_unmapped_mapq=False, collapse_eqx=False):
    from portello_tpu.io.bam import BamReader
    from portello_tpu.ops import cigar as cg

    out = []
    with BamReader(path) as r:
        for rec in r:
            if zero_unmapped_mapq and rec.is_unmapped():
                rec.mapq = 0
            if collapse_eqx and len(rec.cigar):
                c = rec.cigar.copy()
                c[:, 0] = np.where(
                    (c[:, 0] == cg.EQ) | (c[:, 0] == cg.X), cg.M, c[:, 0]
                )
                rec.cigar = c
            out.append(rec.to_sam(r.header))
    return sorted(out)


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2400
    read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 2026

    from portello_tpu.io.bam import BamReader
    from portello_tpu.io.cram import CramWriter
    from portello_tpu.testutil.simulate import make_scenario

    d = tempfile.mkdtemp(prefix="soak_")
    print(f"scenario dir: {d}")
    make_scenario(
        d, rng=np.random.default_rng(seed),
        n_reads_per_contig=max(n_reads // 3, 1), read_len=read_len,
        chrom_len=max(8 * read_len, 300000),
        read_snp_rate=0.004, read_indel_rate=0.002,
    )
    crams = {}
    with BamReader(os.path.join(d, "read_to_asm.bam")) as r:
        recs = list(r)
        header = r.header
    for tag, kw in (
        ("21", dict(version=(2, 1))),
        ("30", dict(version=(3, 0))),
        ("31", dict(version=(3, 1))),
        ("arch", dict(version=(3, 1), profile="archive")),
    ):
        path = os.path.join(d, f"read_to_asm_{tag}.cram")
        with CramWriter(path, header, **kw) as w:
            for rec in recs:
                w.write(rec)
        crams[tag] = path

    chrom = None
    with BamReader(os.path.join(d, "asm_to_ref.bam")) as r:
        chrom = r.header.refs[0][0]
    region = f"{chrom}:1-{6 * read_len}"

    def run(tag, r2a, extra, env=None):
        out = os.path.join(d, f"rem_{tag}.bam")
        un = os.path.join(d, f"un_{tag}.bam")
        cmd = [
            sys.executable, "-m", "portello_tpu.main",
            "--assembly-to-ref", os.path.join(d, "asm_to_ref.bam"),
            "--read-to-assembly", r2a,
            "--remapped-read-output", out,
            "--unassembled-read-output", un,
            "--ref", os.path.join(d, "ref.fa"),
            *extra,
        ]
        e = dict(os.environ)
        e.update(env or {})
        p = subprocess.run(cmd, env=e, capture_output=True, text=True)
        if p.returncode != 0:
            print(p.stdout[-2000:])
            print(p.stderr[-2000:])
            raise SystemExit(f"leg {tag} failed rc={p.returncode}")
        return out, un

    bam = os.path.join(d, "read_to_asm.bam")
    legs = {}
    legs["baseline"] = run(
        "baseline", bam, ["--device", "host"], {"PTPU_P1_NATIVE": "0"}
    )
    legs["host-natp1"] = run("host-natp1", bam, ["--device", "host"])
    legs["native-t1"] = run(
        "native-t1", bam,
        ["--device", "cpu", "--feed", "native", "--threads", "1",
         "--batch-size", "64"],
    )
    legs["native-t4"] = run(
        "native-t4", bam,
        ["--device", "cpu", "--feed", "native", "--threads", "4"],
    )
    legs["python-mm"] = run(
        "python-mm", bam,
        ["--device", "cpu", "--feed", "python"], {"PTPU_MM": "1"},
    )
    legs["native-res"] = run(
        "native-res", bam,
        ["--device", "cpu", "--feed", "native", "--threads", "4"],
        {"PTPU_RESIDENT": "1"},
    )
    legs["workers2"] = run(
        "workers2", bam, ["--device", "host", "--local-workers", "2"]
    )
    legs["workers2-cram"] = run(
        "workers2-cram", crams["31"],
        ["--device", "host", "--local-workers", "2"],
    )
    for tag in ("21", "30", "31", "arch"):
        legs[f"cram-{tag}"] = run(
            f"cram-{tag}", crams[tag],
            ["--device", "cpu", "--feed", "native"],
        )
    legs["region-bam"] = run(
        "region-bam", bam, ["--device", "host", "--target-region", region],
        {"PTPU_P1_NATIVE": "0"},
    )
    legs["region-bam-nat"] = run(
        "region-bam-nat", bam,
        ["--device", "cpu", "--feed", "native", "--target-region", region],
    )
    legs["region-cram"] = run(
        "region-cram", crams["31"],
        ["--device", "cpu", "--feed", "native", "--target-region", region],
    )

    base = legs["baseline"]
    base_rem = content(base[0])
    base_un = content(base[1], zero_unmapped_mapq=True)
    base_rem_cx = content(base[0], collapse_eqx=True)
    failures = []
    for tag, (out, un) in legs.items():
        if tag == "baseline" or tag.startswith("region"):
            continue
        is_cram = "cram" in tag
        got_rem = content(out, collapse_eqx=is_cram)
        got_un = content(un, zero_unmapped_mapq=True)
        want_rem = base_rem_cx if is_cram else base_rem
        ok = got_rem == want_rem and got_un == base_un
        print(f"{tag:16s} rem={len(got_rem)} un={len(got_un)} "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            failures.append(tag)
    # region legs compare among themselves (different universe than full runs)
    reg_base = content(legs["region-bam"][0])
    for tag in ("region-bam-nat", "region-cram"):
        is_cram = "cram" in tag
        got = content(legs[tag][0], collapse_eqx=is_cram)
        want = content(legs["region-bam"][0], collapse_eqx=is_cram)
        ok = got == want
        print(f"{tag:16s} rem={len(got)} {'OK' if ok else 'MISMATCH'}")
        if not ok:
            failures.append(tag)
    print(f"region reads: {len(reg_base)} of {len(base_rem)}")
    if failures:
        raise SystemExit(f"SOAK FAILURES: {failures}")
    print("SOAK PASSED")


if __name__ == "__main__":
    main()
