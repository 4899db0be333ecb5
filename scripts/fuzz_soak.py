"""Extended randomized differential-fuzz soak over the compute surfaces.

The in-suite fuzz tests pin a handful of seeds (CI must be deterministic);
this driver reuses the SAME test bodies with a stream of fresh seeds for as
long as requested, so idle machine time turns into conformance evidence:

  - tests/test_fuzz_conformance.py::test_fuzz_hostile_rates_fwd_and_rev —
    hostile edit rates through fwd_batch/rev_batch (mm + gather forms,
    fused rev chain) vs the exact oracle, overflow->fallback contract;
  - tests/test_resident.py::test_fwd_batch_resident_equals_table — the
    production resident graph vs the table graph, bit-identical;
  - tests/test_liftover_kernel.py::test_fuzz_against_oracle and
    tests/test_seq_kernels.py fuzzes rerun as whole functions (their inner
    RNG draws are already broad) for extra rounds.

Any assertion failure prints the seed so the case can be pinned into the
suite.  Usage: python scripts/fuzz_soak.py [minutes] (default 10).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import test_fuzz_conformance as tfc  # noqa: E402
import test_resident as tres  # noqa: E402

from portello_tpu.io import arith_nx16, fqzcomp, rans_nx16, tok3  # noqa: E402


def codec_round(seed: int) -> None:
    """Fresh-seed encode->decode round-trips over every CRAM 3.1 codec
    (the suite's codec tests pin fixed seeds; this sweeps new inputs)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 4000))
    # skewed alphabet exercises the frequency tables harder than uniform
    alpha = rng.integers(2, 40)
    data = rng.integers(0, alpha, size=n).astype(np.uint8).tobytes()
    for order in (0, 1):
        assert rans_nx16.decode(rans_nx16.encode(data, order=order)) == data
        assert arith_nx16.decode(arith_nx16.encode(data, order=order)) == data
    quals = rng.integers(0, 45, size=n).astype(np.uint8).tobytes()
    lens = []
    left = n
    while left > 0:
        take = int(min(left, rng.integers(1, 400)))
        lens.append(take)
        left -= take
    assert fqzcomp.decode(fqzcomp.encode(quals, lens), n_out=n) == quals
    names = b"".join(
        f"read{int(rng.integers(0, 10**6))}/{int(rng.integers(1, 3))}\x00"
        .encode()
        for _ in range(int(rng.integers(1, 200)))
    )
    assert tok3.decode(tok3.encode(names)) == names


def scenario_round(seed: int) -> None:
    """Fresh-seed END-TO-END equality: a random simulated scenario through
    the full CLI on the production native feed (pool threads, readahead,
    resident fill, host-shift routing, finisher, writers) vs the no-JAX
    exact host path — record-identical outputs required.  This is the
    suite's conformance pattern (tests/test_native_feed.py) re-run on data
    the suite has never seen."""
    import shutil
    import tempfile

    from portello_tpu.io.bam import BamReader
    from portello_tpu.main import main
    from portello_tpu.testutil.simulate import make_scenario

    rng = np.random.default_rng(seed)
    work = tempfile.mkdtemp(prefix="fuzz_scn_")
    try:
        make_scenario(
            work, rng=rng,
            n_reads_per_contig=int(rng.integers(10, 80)),
            read_len=int(rng.integers(150, 2500)),
            read_snp_rate=float(rng.uniform(0.0005, 0.02)),
            read_indel_rate=float(rng.uniform(0.0005, 0.02)),
        )

        def run(tag, device, feed):
            out = os.path.join(work, f"rem_{tag}.bam")
            un = os.path.join(work, f"un_{tag}.bam")
            main([
                "--assembly-to-ref", os.path.join(work, "asm_to_ref.bam"),
                "--read-to-assembly", os.path.join(work, "read_to_asm.bam"),
                "--remapped-read-output", out,
                "--unassembled-read-output", un,
                "--ref", os.path.join(work, "ref.fa"),
                "--device", device, "--feed", feed,
                "--batch-size", str(int(rng.integers(16, 65))),
                "--threads", str(int(rng.integers(1, 5))),
            ])
            return out, un

        def recs(p):
            with BamReader(p) as r:
                return sorted(x.to_sam(r.header) for x in r)

        out_n, un_n = run("native", "cpu", "native")
        out_h, un_h = run("host", "host", "python")
        assert recs(out_n) == recs(out_h), "native feed diverged from oracle"
        assert recs(un_n) == recs(un_h)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    scenarios = "--scenario" in sys.argv
    minutes = float(argv[0]) if argv else 10.0
    deadline = time.time() + minutes * 60
    master = np.random.default_rng(int(time.time()) % (2**31))
    rounds = 0
    t0 = time.time()
    while time.time() < deadline:
        seed = int(master.integers(0, 2**31 - 1))
        try:
            if scenarios:
                scenario_round(seed)
            else:
                tfc.test_fuzz_hostile_rates_fwd_and_rev(seed)
                tres.test_fwd_batch_resident_equals_table(seed)
                codec_round(seed)
        except AssertionError:
            print(f"FUZZ FAILURE at seed={seed}", flush=True)
            raise
        rounds += 1
        if rounds % 5 == 0:
            print(
                f"[fuzz_soak] {rounds} seed-rounds clean "
                f"({time.time() - t0:.0f}s)", flush=True,
            )
    kind = "scenario" if scenarios else "kernel/codec"
    print(f"FUZZ SOAK CLEAN: {rounds} fresh-seed {kind} rounds over "
          f"{time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
