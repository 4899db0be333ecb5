"""Benchmark: lifted reads/sec/chip for the batched liftover pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload: HiFi-realistic synthetic batches (default 18 kb reads, ~0.25%
read-to-contig error, ~1.2/kb contig-to-ref variants) through the full device
pipeline — left-shift (reverse-contig half) + liftover + indel simplification —
at the production bucket shape.

Measurement: sustained on-chip batch time via **in-jit repetition** (a
``fori_loop`` re-running the pipeline with a data-dependence chain), because
in this environment every dispatch crosses an axon relay whose RTT is large
and erratic; per-call wall timing measures the tunnel, not the chip.  The
host->device transfer + dispatch overhead of a real single call is reported
separately as ``dispatch_overhead_ms`` (on directly-attached production TPUs
this is microseconds-scale).

Baseline note: the reference (Rust portello) publishes no numbers and no Rust
toolchain exists in this image (BASELINE.md), so ``vs_baseline`` compares the
chip's FORWARD-workload rate against the native C++ reference-exact inner
loop on identical fwd work items (like-for-like); the headline ``value`` is
the 50/50 fwd+rev mix, whose rev half has no native counterpart measured.

Env knobs: PTPU_BENCH_BATCH (default 512), PTPU_BENCH_REPS (40),
PTPU_BENCH_READLEN (18000), PTPU_BENCH_CPU (force cpu backend).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def fast_item_arrays(rng, b, bcfg, read_len, rev, read_rate=0.0025, contig_rate=0.0012):
    """Vectorized synthetic work items (shape-realistic; content random).

    Kernel cost is data-independent given shapes (fixed scan lengths, fixed
    compare windows), so random window content is timing-faithful.
    """
    from portello_tpu.kernels.cigar_kernels import INT32_MAX, PAD
    from portello_tpu.ops import cigar as cg
    from portello_tpu.ops.blockmap import build_block_map

    margin = 64
    span = read_len + 2 * margin

    def sample_cigar(length, rate, max_events):
        n_ev = min(max(int(rng.poisson(length * rate)), 1), max_events)
        cuts = np.sort(rng.integers(1, length, size=n_ev))
        runs = np.diff(np.concatenate([[0], cuts, [length]]))
        runs = runs[runs > 0]
        codes = np.empty(2 * len(runs) - 1, dtype=np.int64)
        lens_ = np.empty_like(codes)
        codes[0::2] = cg.M
        lens_[0::2] = runs
        ev = rng.integers(0, 2, size=len(runs) - 1)
        codes[1::2] = np.where(ev == 0, cg.I, cg.D)
        lens_[1::2] = rng.integers(1, 4, size=len(runs) - 1)
        return np.stack([codes, lens_], axis=1)

    ops = np.full((b, bcfg.max_ops), PAD, np.int32)
    lens = np.zeros((b, bcfg.max_ops), np.int32)
    n_ops = np.zeros(b, np.int32)
    pos = np.full(b, margin // 2, np.int32)
    bk = np.full((b, bcfg.max_blocks), INT32_MAX, np.int32)
    bv = np.full((b, bcfg.max_blocks), -1, np.int32)
    nb = np.zeros(b, np.int32)
    ref_base = np.zeros(b, np.int32)
    ref_win = rng.integers(65, 85, size=(b, bcfg.max_seq), dtype=np.uint8)
    read_seq = rng.integers(65, 85, size=(b, bcfg.max_seq), dtype=np.uint8)
    win_base = np.zeros(b, np.int32)
    contig_win = (
        rng.integers(65, 85, size=(b, bcfg.max_seq), dtype=np.uint8) if rev else None
    )
    for i in range(b):
        # events cap just under the block budget (blocks ~ events + 1):
        # the old max_blocks//2-2 cap censored ~half the Poisson mass
        ccig = sample_cigar(span, contig_rate, bcfg.max_blocks - 2)
        bm = build_block_map(0, ccig, False)
        k = min(len(bm), bcfg.max_blocks)
        bk[i, :k] = bm.keys[:k]
        bv[i, :k] = bm.vals[:k]
        nb[i] = k
        rcig = sample_cigar(read_len, read_rate, bcfg.max_ops // 2 - 2)
        n = min(len(rcig), bcfg.max_ops)
        ops[i, :n] = rcig[:n, 0]
        lens[i, :n] = rcig[:n, 1]
        n_ops[i] = n
    if rev:
        return (
            ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
            ref_win, ref_base, read_seq,
        )
    return ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq


def resident_timing_args(items_fwd, rng, table_mb):
    """Resident-form timing args paired to table-form fwd items: a
    ``table_mb`` synthetic superblock reference table (content-random —
    kernel cost is data-independent given shapes) with window origins
    scattered across it, plus the packed read rows.  Timing-faithful to the
    production dispatch (native_feed resident mode); bit-equality of the two
    formulations is enforced separately by tests/test_resident.py and the
    native-feed resident CLI tests."""
    from portello_tpu.kernels.resident import SB, pack_seq_rows

    ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = items_fwd
    b = len(n_ops)
    nsb = table_mb * (1 << 20) // SB
    words = rng.integers(0, 2**32, size=(nsb, SB // 4), dtype=np.uint32)
    g_sb = rng.integers(2, nsb - 4096, size=b, dtype=np.int64).astype(np.int32)
    g_off = rng.integers(0, SB, size=b, dtype=np.int32)
    packed = pack_seq_rows(np.asarray(read_seq))
    return (
        np.asarray(ops), np.asarray(lens), np.asarray(n_ops), np.asarray(pos),
        np.asarray(bk), np.asarray(bv), np.asarray(nb), g_sb, g_off,
        np.asarray(ref_base), packed,
    ), words


_PROTOCOLS_USED: set[str] = set()


def sustained_batch_time(single_fn, args, reps, pos_index,
                         already_batched=False):
    """True per-batch device time via in-jit repetition.

    Protocol (dictated by this environment's relay semantics):
    - the repetition loop lives inside one jit (``fori_loop``) so one dispatch
      covers N executions;
    - an anti-hoist chain perturbs one integer input per iteration AND the
      loop carry sums EVERY output (otherwise XLA hoists or dead-code-
      eliminates iteration bodies);
    - completion is observed by FETCHING the scalar result to host
      (block_until_ready does not reliably wait through the axon relay);
    - the fixed dispatch/RTT cost cancels by differencing two rep counts.

    Records which protocol produced each number in ``_PROTOCOLS_USED``
    ("differenced" | "undifferenced-fallback") so the bench JSON is
    self-describing (VERDICT r2 #8).
    """
    import jax
    import jax.numpy as jnp

    vf = single_fn if already_batched else jax.vmap(single_fn)

    def make(n):
        def run(*a):
            def body(i, acc):
                a2 = list(a)
                a2[pos_index] = a2[pos_index] + (acc & 1).astype(a2[pos_index].dtype)
                out = vf(*a2)
                total = jnp.int32(0)
                for leaf in jax.tree_util.tree_leaves(out):
                    total = total + jnp.sum(leaf).astype(jnp.int32)
                return total

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return jax.jit(run)

    lo, hi = max(reps // 4, 1), max(reps, 2)
    f_lo, f_hi = make(lo), make(hi)
    int(f_lo(*args))  # compile
    int(f_hi(*args))
    for attempt in range(3):
        # INTERLEAVED lo/hi pairs (A,B,A,B): the differencing assumes both
        # rep counts see the same relay/clock state, and block-ordered
        # min-of-3s can invert under the documented +-30-50% drift
        t_los, t_his = [], []
        for _ in range(3):
            t_los.append(_fetch_time(f_lo, args))
            t_his.append(_fetch_time(f_hi, args))
        t_lo, t_hi = min(t_los), min(t_his)
        if t_hi > t_lo:
            _PROTOCOLS_USED.add("differenced")
            return (t_hi - t_lo) / (hi - lo)
        sys.stderr.write(
            f"[bench] rep-differencing inverted (t_lo={t_lo:.4f} >= "
            f"t_hi={t_hi:.4f}); retry {attempt + 1}\n"
        )
    # persistent inversion: fall back to the undifferenced hi-rep time — a
    # CONSERVATIVE overestimate of batch time (it still contains the fixed
    # dispatch cost, spread over hi reps), never an absurd inflation, and
    # the bench completes instead of crashing under extreme relay drift
    sys.stderr.write(
        "[bench] WARNING: differencing stayed inverted; reporting the "
        "conservative undifferenced hi-rep time\n"
    )
    _PROTOCOLS_USED.add("undifferenced-fallback")
    return t_hi / hi


def _fetch_time(f, args):
    t0 = time.perf_counter()
    int(f(*args))
    return time.perf_counter() - t0


def host_oracle_time(items_fwd, n_sample):
    """Single-thread exact host path on the same work items (reads/sec)."""
    from portello_tpu.ops.blockmap import BlockMap
    from portello_tpu.ops.liftover import liftover_read_alignment
    from portello_tpu.ops.simplify import simplify_alignment_indels

    ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = items_fwd
    t0 = time.perf_counter()
    for i in range(n_sample):
        n = int(n_ops[i])
        cig = np.stack([ops[i, :n], lens[i, :n]], axis=1).astype(np.int64)
        k = int(nb[i])
        bm = BlockMap(bk[i, :k].astype(np.int64), bv[i, :k].astype(np.int64))
        lifted = liftover_read_alignment(bm, int(pos[i]), cig)
        if lifted is not None:
            p, c = lifted
            simplify_alignment_indels(p - int(ref_base[i]), c, ref_win[i], read_seq[i])
    return n_sample / (time.perf_counter() - t0)


def native_baseline_time(items_fwd, max_out, n_threads):
    """Native (C++) reference-exact inner loop on the same work items
    (reads/sec).  This is the measured baseline proxy (BASELINE.md): no Rust
    toolchain exists in the image, so a compiled multithreaded implementation
    of the reference's per-read algorithm is the honest denominator.
    Returns None when the native core can't build."""
    from portello_tpu.ops import native_core

    if native_core.get_lib() is None:
        return None
    ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = items_fwd
    args = (ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq)
    native_core.lift_simplify_batch(*args, max_out, n_threads=n_threads)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        native_core.lift_simplify_batch(*args, max_out, n_threads=n_threads)
        best = min(best, time.perf_counter() - t0)
    return len(n_ops) / best


def native_mix_time_median5(items_fwd, rev_fwd_items, rev_shift_args, max_out):
    """PINNED vs_baseline denominator protocol (VERDICT r2 #3):
    median-of-5 SINGLE-THREAD runs of the native reference-exact work for the
    50/50 mix — lift+simplify on the fwd half, shift + lift+simplify on the
    rev half — scaled by hardware threads (idealized linear scaling, i.e. the
    most favorable credible all-cores figure for the baseline).  Single-thread
    median is stable on this contended 4-core box where threaded runs swing
    2x+ (BASELINE.md r2 table).  Returns (mix_reads_per_s_1t, n_threads)."""
    from portello_tpu.ops import native_core

    if native_core.get_lib() is None:
        return None, 0
    ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = items_fwd
    fwd_args = (ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq)
    s_ops, s_lens, s_rel_pos, contig_win, s_read_seq = rev_shift_args
    samples = []
    native_core.lift_simplify_batch(*fwd_args, max_out, n_threads=1)  # warm
    for _ in range(5):
        t0 = time.perf_counter()
        native_core.lift_simplify_batch(*fwd_args, max_out, n_threads=1)
        native_core.shift_batch(
            s_ops, s_lens, n_ops, s_rel_pos, contig_win, s_read_seq,
            ops.shape[1], n_threads=1,
        )
        native_core.lift_simplify_batch(*rev_fwd_items, max_out, n_threads=1)
        samples.append(time.perf_counter() - t0)
    t_med = sorted(samples)[2]
    n_reads = 2 * len(n_ops)
    return n_reads / t_med, max(native_core.hw_threads(), 1)


def _e2e_scenario_dir(n_reads, read_len):
    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, ".bench_cache", f"e2e_{n_reads}_{read_len}")
    if not os.path.isdir(cache):
        os.makedirs(cache, exist_ok=True)
        import numpy as np_

        from portello_tpu.testutil.simulate import make_scenario

        sys.stderr.write(f"[bench-e2e] generating scenario in {cache}\n")
        make_scenario(
            cache,
            rng=np_.random.default_rng(99),
            n_reads_per_contig=max(n_reads // 3, 1),
            read_len=read_len,
            chrom_len=max(8 * read_len, 200000),
        )
    return cache


def measure_e2e_fields(device="auto"):
    """One small end-to-end CLI run; returns product-level JSON fields.

    VERDICT r4 #3: the tracked headline was a kernel microbenchmark; the
    deployment story is min(feed, chip), so every BENCH_r*.json now carries
    the host feed capacity and an end-to-end CLI rate alongside the chip
    number.  Through the axon relay the e2e wall includes ~0.5 s RTT per
    device dispatch (production-irrelevant), so ``e2e_reads_per_s`` is a
    lower bound here; ``feed_reads_per_s`` is the busy-time capacity
    (n / max(producer, finisher)) and is relay-independent.
    """
    import shutil
    import tempfile

    n_reads = int(os.environ.get("PTPU_BENCH_E2E_READS", "1200"))
    read_len = int(os.environ.get("PTPU_BENCH_E2E_READLEN", "18000"))
    cache = _e2e_scenario_dir(n_reads, read_len)
    out = tempfile.mkdtemp()
    prev_timing = os.environ.get("PTPU_FEED_TIMING")
    os.environ["PTPU_FEED_TIMING"] = "1"
    from portello_tpu.main import main as cli_main

    t0 = time.perf_counter()
    cli_main([
        "--assembly-to-ref", os.path.join(cache, "asm_to_ref.bam"),
        "--read-to-assembly", os.path.join(cache, "read_to_asm.bam"),
        "--remapped-read-output", os.path.join(out, "remapped.bam"),
        "--unassembled-read-output", os.path.join(out, "unassembled.bam"),
        "--ref", os.path.join(cache, "ref.fa"),
        "--device", device, "--feed", "native",
        "--threads", str(os.cpu_count() or 4),
    ])
    wall = time.perf_counter() - t0
    if prev_timing is None:
        del os.environ["PTPU_FEED_TIMING"]
    else:
        os.environ["PTPU_FEED_TIMING"] = prev_timing
    shutil.rmtree(out, ignore_errors=True)
    import portello_tpu.pipeline.native_feed as nf

    stats = dict(getattr(nf, "_last_stats", {}))
    n_primary = stats.get("n_primary", n_reads)
    t_producer = sum(
        stats.get(f"t_native_{k}", 0.0) for k in ("read", "prepare", "fill", "drain")
    )
    t_finisher = stats.get("t_native_finish_enc", 0.0)
    t_cap = max(t_producer, t_finisher)
    return {
        "feed_reads_per_s": round(n_primary / t_cap, 1) if t_cap > 0 else None,
        "e2e_reads_per_s": round(n_primary / wall, 1),
        "e2e_wall_s": round(wall, 2),
        "e2e_n_primary": n_primary,
        "e2e_scenario": f"{n_reads}x{read_len//1000}kb",
        "feed_capacity_protocol": (
            "n_primary / max(producer busy, finisher busy), PTPU_FEED_TIMING "
            "split; e2e wall includes per-dispatch relay RTT in this "
            "environment (lower bound)"
        ),
        "e2e_t_producer_s": round(t_producer, 3),
        "e2e_t_finisher_s": round(t_finisher, 3),
        "e2e_t_device_s": round(stats.get("t_dev", 0.0), 3),
    }


def e2e_main():
    """End-to-end CLI benchmark (PTPU_BENCH_E2E=1): runs the full tool with
    the native feed on a cached simulated HiFi-like scenario and reports
    wall-clock reads/s plus the feed/device time split.

    On the axon relay every device dispatch pays a large RTT, so the TPU
    end-to-end number here is relay-bound; the feed-side throughput
    (prep+finish) is the production-relevant host-side capacity number
    (PERF.md).  Env: PTPU_BENCH_E2E_READS (default 1200),
    PTPU_BENCH_E2E_READLEN (default 18000), PTPU_BENCH_CPU.
    """
    import shutil
    import tempfile

    n_reads = int(os.environ.get("PTPU_BENCH_E2E_READS", "1200"))
    read_len = int(os.environ.get("PTPU_BENCH_E2E_READLEN", "18000"))
    cache = _e2e_scenario_dir(n_reads, read_len)
    out = tempfile.mkdtemp()
    os.environ["PTPU_FEED_TIMING"] = "1"
    device = "cpu" if os.environ.get("PTPU_BENCH_CPU") == "1" else "auto"
    from portello_tpu.main import main as cli_main

    def run_cli(threads=None):
        o = tempfile.mkdtemp()
        args = [
            "--assembly-to-ref", os.path.join(cache, "asm_to_ref.bam"),
            "--read-to-assembly", os.path.join(cache, "read_to_asm.bam"),
            "--remapped-read-output", os.path.join(o, "remapped.bam"),
            "--unassembled-read-output", os.path.join(o, "unassembled.bam"),
            "--ref", os.path.join(cache, "ref.fa"),
            "--device", device, "--feed", "native",
        ]
        if threads:
            args += ["--threads", str(threads)]
        t0 = time.perf_counter()
        cli_main(args)
        w = time.perf_counter() - t0
        shutil.rmtree(o, ignore_errors=True)
        import portello_tpu.pipeline.native_feed as nf

        return w, dict(getattr(nf, "_last_stats", {}))

    if os.environ.get("PTPU_BENCH_OFFLOAD") == "1":
        # Offload A/B (BASELINE.md): (a) native feed + exact host compute on
        # all cores, no device dispatches; (b) the production feed+device
        # path.  Same scenario, same process, interleaved A,B,A,B.
        ncpu = os.cpu_count() or 4
        walls_a, walls_b = [], []
        for _ in range(2):
            os.environ["PTPU_ALL_HOST"] = "1"
            walls_a.append(run_cli(threads=ncpu)[0])
            os.environ["PTPU_ALL_HOST"] = "0"
            walls_b.append(run_cli(threads=max(1, ncpu - 2))[0])
        del os.environ["PTPU_ALL_HOST"]
        wall_a, wall_b = min(walls_a), min(walls_b)
        print(
            json.dumps(
                {
                    "metric": f"offload A/B ({read_len//1000}kb, {n_reads} reads)",
                    "value": round(wall_a / wall_b, 3),
                    "unit": "no-chip wall / chip wall (same box)",
                    "vs_baseline": None,
                    "wall_allhost_s": round(wall_a, 2),
                    "wall_device_s": round(wall_b, 2),
                    "allhost_threads": ncpu,
                    "device_feed_threads": max(1, ncpu - 2),
                    "note": (
                        "A = native feed + exact host path on all cores "
                        "(PTPU_ALL_HOST=1); B = feed on ncpu-2 threads + "
                        "device; per-dispatch relay RTT inflates B here"
                    ),
                }
            )
        )
        return

    e2e_threads = int(
        os.environ.get("PTPU_BENCH_E2E_THREADS", str(os.cpu_count() or 4))
    )
    t0 = time.perf_counter()
    cli_main([
        "--assembly-to-ref", os.path.join(cache, "asm_to_ref.bam"),
        "--read-to-assembly", os.path.join(cache, "read_to_asm.bam"),
        "--remapped-read-output", os.path.join(out, "remapped.bam"),
        "--unassembled-read-output", os.path.join(out, "unassembled.bam"),
        "--ref", os.path.join(cache, "ref.fa"),
        "--device", device, "--feed", "native",
        "--threads", str(e2e_threads),
    ])
    wall = time.perf_counter() - t0
    import portello_tpu.pipeline.native_feed as nf

    stats = getattr(nf, "_last_stats", {})
    n_primary = stats.get("n_primary", n_reads)
    # Feed capacity under the async producer: the scan loop (read + prepare +
    # fill + drain handoff) and the finisher (encode + write) each run on
    # their own thread, so the feed's sustainable rate is bounded by the
    # slower of the two pipelines — NOT by time blocked in next_batch (which
    # only measures how often the producer failed to stay ahead).
    t_producer = sum(
        stats.get(f"t_native_{k}", 0.0) for k in ("read", "prepare", "fill", "drain")
    )
    t_finisher = stats.get("t_native_finish_enc", 0.0)
    t_cap = max(t_producer, t_finisher)
    feed_rps = n_primary / t_cap if t_cap > 0 else None
    shutil.rmtree(out, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": f"end-to-end CLI reads/sec ({read_len//1000}kb, native feed)",
                "value": round(n_primary / wall, 1),
                "unit": "reads/s",
                "vs_baseline": None,
                "wall_s": round(wall, 2),
                "n_primary": n_primary,
                "feed_reads_per_s": round(feed_rps, 1) if feed_rps else None,
                "feed_capacity_protocol": (
                    "n / max(producer scan-loop time, finisher encode+write "
                    "time); threads share cores with the device under "
                    "PTPU_BENCH_CPU, so the CPU number is a lower bound"
                ),
                "t_producer_s": round(t_producer, 3),
                "t_finisher_s": round(t_finisher, 3),
                "t_blocked_prep_s": round(stats.get("t_prep", 0.0), 3),
                "t_device_s": round(stats.get("t_dev", 0.0), 3),
                "note": (
                    "device time includes relay RTT per dispatch in this "
                    "environment; feed_reads_per_s is the host-side capacity"
                ),
            }
        )
    )


def _e2e_fields_subprocess():
    """Product-level fields (VERDICT r4 #3) via an ISOLATED child process.

    Must run BEFORE this process touches the device: only one TPU grant
    exists through the axon relay, so a child dispatching device work while
    the parent holds a live TPU client dies with FAILED_PRECONDITION (and
    an in-process leg after the chip runs once crashed the whole bench).
    A child that runs first — and can only lose its own fields — is the
    robust ordering.
    """
    import subprocess

    dev = "cpu" if os.environ.get("PTPU_BENCH_CPU") == "1" else "auto"
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import json, sys; sys.path.insert(0, sys.argv[1]); "
             "from bench import measure_e2e_fields; "
             "print('E2E_JSON ' + json.dumps(measure_e2e_fields(sys.argv[2])))",
             os.path.dirname(os.path.abspath(__file__)), dev],
            capture_output=True, text=True, timeout=900,
        )
        for line in p.stdout.splitlines():
            if line.startswith("E2E_JSON "):
                return json.loads(line[len("E2E_JSON "):])
        raise RuntimeError(
            f"e2e subprocess rc={p.returncode}: {p.stderr[-300:]}"
        )
    except Exception as e:  # pragma: no cover - diagnostic path
        sys.stderr.write(f"[bench] e2e leg failed: {e!r}\n")
        return {"e2e_error": repr(e)[:300]}


def main():
    batch = int(os.environ.get("PTPU_BENCH_BATCH", "512"))
    reps = int(os.environ.get("PTPU_BENCH_REPS", "40"))
    read_len = int(os.environ.get("PTPU_BENCH_READLEN", "18000"))

    # e2e/feed leg FIRST (see _e2e_fields_subprocess: the child needs the
    # sole TPU grant before this process claims it)
    e2e_fields = {}
    if os.environ.get("PTPU_BENCH_SKIP_E2E") != "1":
        e2e_fields = _e2e_fields_subprocess()

    import jax

    if os.environ.get("PTPU_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
        reps = min(reps, 3)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from portello_tpu.kernels.shift_kernel import (
        shift_stage_a_batch,
        shift_stage_b_batch,
    )
    from portello_tpu.models.pipeline_model import (
        _rev_ops_bound,
        fwd_batch,
    )
    from portello_tpu.testutil.batchgen import HIFI_BUCKET

    bcfg = HIFI_BUCKET
    mm = jax.default_backend() == "tpu"
    kw = dict(
        max_out=bcfg.resolved_max_out(),
        max_clusters=bcfg.max_clusters,
        window=bcfg.window,
        mm=mm,
        max_rows=bcfg.resolved_max_rows(),
    )
    rng = np.random.default_rng(2026)
    fwd_items = fast_item_arrays(rng, batch, bcfg, read_len, rev=False)
    rev_items = fast_item_arrays(rng, batch, bcfg, read_len, rev=True)

    device = jax.devices()[0]
    host_shift = os.environ.get("PTPU_HOST_SHIFT", "1") != "0"
    sys.stderr.write(
        f"[bench] device: {device}, batch={batch}, reps={reps}, "
        f"host_shift={host_shift}\n"
    )

    dev_fwd = tuple(jax.device_put(a, device) for a in fwd_items)

    # PRODUCTION graph selection: on the TPU mm path the feed dispatches the
    # resident formulation (HBM-resident superblock reference + packed read
    # rows — native_feed resident mode, round 5), so that is what the
    # headline times; the per-item-table graph is kept as a one-pass
    # diagnostic.  Table size via PTPU_BENCH_TABLE_MB (default 256).
    from portello_tpu.models.pipeline_model import fwd_batch_resident

    table_mb = int(os.environ.get("PTPU_BENCH_TABLE_MB", "256" if mm else "8"))
    rkw = {k: v for k, v in kw.items() if k != "mm"}
    if mm:
        res_fwd_np, words_np = resident_timing_args(fwd_items, rng, table_mb)
        dev_res_fwd = tuple(jax.device_put(a, device) for a in res_fwd_np)
        dev_words = jax.device_put(words_np, device)

    # ---- rev-item host shift (the PRODUCTION routing since round 3):
    # the reverse-contig left-shift runs on the host during prep
    # (ptcore_shift_batch in both feeds), so rev items dispatch the SAME
    # fwd graph as fwd items.  Build the shifted rev batch here with the
    # production native shifter and measure its host cost (median-of-5).
    from portello_tpu.ops import native_core

    (r_ops, r_lens, r_n_ops, r_pos, r_wb, r_cwin, r_bk, r_bv, r_nb,
     r_rwin, r_rbase, r_rseq) = rev_items
    rel_pos = (r_pos - r_wb).astype(np.int32)
    shift_args = (r_ops, r_lens, r_n_ops, rel_pos, r_cwin, r_rseq)
    have_native = native_core.get_lib() is not None
    host_shift_1t_rps = host_shift_nt_rps = None
    nthreads = max(native_core.hw_threads(), 1)
    if have_native:
        def _shift_median5(n_threads):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                native_core.shift_batch(
                    *shift_args, bcfg.max_ops, n_threads=n_threads
                )
                ts.append(time.perf_counter() - t0)
            return batch / sorted(ts)[2]

        sh_codes, sh_lens, sh_n, sh_pos = native_core.shift_batch(
            *shift_args, bcfg.max_ops, n_threads=nthreads
        )
        host_shift_1t_rps = _shift_median5(1)
        host_shift_nt_rps = _shift_median5(nthreads)
        # overflow rows (shifted runs > max_ops; host-fallback in
        # production) keep their unshifted cigar for shape-honest timing
        ov = sh_n < 0
        sh_codes[ov], sh_lens[ov] = r_ops[ov], r_lens[ov]
        sh_n[ov], sh_pos[ov] = r_n_ops[ov], rel_pos[ov]
    else:
        # pure-Python envs: fall back to the device stage-B shifter just to
        # BUILD the shifted cigars (timing below still times the fwd graph)
        dev_sa = tuple(
            jax.device_put(np.asarray(a), device)
            for a in (r_ops, r_lens, rel_pos, r_wb, r_cwin, r_rseq)
        )
        st = shift_stage_a_batch(
            *dev_sa, max_clusters=bcfg.max_clusters, window=bcfg.window, mm=mm
        )
        bound = _rev_ops_bound(bcfg.max_ops, kw["max_out"])
        c_, l_, n_, p_, _fb = shift_stage_b_batch(
            dev_sa[0], dev_sa[1], dev_sa[2], st,
            window=bcfg.window, max_out=bound, mm=mm,
        )
        sh_codes = np.asarray(c_)[:, : bcfg.max_ops]
        sh_lens = np.asarray(l_)[:, : bcfg.max_ops]
        sh_n, sh_pos = np.asarray(n_), np.asarray(p_)

    rev_fwd_items = (
        sh_codes, sh_lens, sh_n, sh_pos + r_wb,
        r_bk, r_bv, r_nb, r_rwin, r_rbase, r_rseq,
    )
    rev_fwd_args = tuple(
        jax.device_put(np.asarray(a), device) for a in rev_fwd_items
    )
    if mm:
        res_rev_np, _ = resident_timing_args(rev_fwd_items, rng, table_mb)
        dev_res_rev = tuple(jax.device_put(a, device) for a in res_rev_np)

    # ---- sustained per-batch chip times, interleaved passes (fwd, rev,
    # fwd, rev) with best-of per term: relay-side drift between calls swings
    # single draws +-30-50% (PERF.md); each pass is itself an in-jit
    # min-of-3.  Both legs time the PRODUCTION fwd batch graph (fwd_batch:
    # batch-compacted mixed-cluster windows on the mm path).
    #
    # The whole measurement repeats PTPU_BENCH_RUNS times (default 3 on TPU;
    # VERDICT r3 #6) and the headline is the MEDIAN run — single draws through
    # the relay swing +-13% (872/917/990k in round 3), which would bury the
    # ~10% effects the remaining optimizations produce.  ``value_runs`` in the
    # JSON carries every run so the spread is self-reported.
    n_runs = max(int(os.environ.get("PTPU_BENCH_RUNS", "3" if mm else "1")), 1)
    if mm:
        graph = "resident"

        def time_fwd_leg(r):
            return sustained_batch_time(
                lambda *a: fwd_batch_resident(*a[:-1], a[-1], **rkw),
                (*dev_res_fwd, dev_words), r, 3, already_batched=True,
            )

        def time_rev_leg(r):
            return sustained_batch_time(
                lambda *a: fwd_batch_resident(*a[:-1], a[-1], **rkw),
                (*dev_res_rev, dev_words), r, 3, already_batched=True,
            )
    else:
        graph = "table"

        def time_fwd_leg(r):
            return sustained_batch_time(
                lambda *a: fwd_batch(*a, **kw), dev_fwd, r, 3,
                already_batched=True,
            )

        def time_rev_leg(r):
            return sustained_batch_time(
                lambda *a: fwd_batch(*a, **kw), rev_fwd_args, r, 3,
                already_batched=True,
            )

    run_pairs = []  # (t_fwd, t_rev_fwd) per run
    for run_i in range(n_runs):
        t_fwd_passes, t_rev_passes = [], []
        n_passes = 2 if mm else 1
        for _ in range(n_passes):
            t_fwd_passes.append(time_fwd_leg(reps))
            t_rev_passes.append(time_rev_leg(reps))
        run_pairs.append((min(t_fwd_passes), min(t_rev_passes)))
        sys.stderr.write(
            f"[bench] run {run_i + 1}/{n_runs}: t_fwd="
            f"{run_pairs[-1][0]*1e3:.3f} ms t_rev_fwd="
            f"{run_pairs[-1][1]*1e3:.3f} ms\n"
        )

    # DIAGNOSTIC: the device-shift rev chain (the PTPU_HOST_SHIFT=0
    # routing), one pass — kept so round-over-round chain numbers stay
    # comparable and the alternate routing stays measured.
    from portello_tpu.models.pipeline_model import rev_batch

    if mm:
        dev_rev = tuple(
            jax.device_put(np.asarray(a), device) for a in rev_items
        )
        t_rev_devshift = sustained_batch_time(
            lambda *a: rev_batch(*a, **kw), dev_rev, reps, 3,
            already_batched=True,
        )
        # table-form fwd graph, one pass: round-over-round comparability
        # with the pre-round-5 headline (and the standing resident-vs-table
        # on-chip A/B, scripts/profile_resident.py)
        t_fwd_table = sustained_batch_time(
            lambda *a: fwd_batch(*a, **kw), dev_fwd, reps, 3,
            already_batched=True,
        )
    else:
        t_fwd_table = None
        # gather path (CPU smoke): the staged device-shift diagnostic is
        # omitted — rev_batch there is 3 separate dispatches, which the
        # in-jit repetition protocol cannot wrap
        t_rev_devshift = None

    # 50/50 fwd/rev mix under the selected routing, per run; headline =
    # the median run (ties to the lower mix time on even counts)
    def _mix_time(tf, tr):
        if host_shift:
            return 0.5 * tf + 0.5 * tr
        return 0.5 * tf + 0.5 * (
            t_rev_devshift if t_rev_devshift is not None else tr
        )

    if host_shift:
        mix_formula = "v3-host-shift: 0.5*t_fwd + 0.5*t_rev_fwd(shifted)"
    else:
        mix_formula = "v2-device-shift: 0.5*t_fwd + 0.5*t_rev_chain"
    run_mixes = [_mix_time(tf, tr) for tf, tr in run_pairs]
    value_runs = [round(batch / tm, 1) for tm in run_mixes]
    med_i = sorted(range(n_runs), key=lambda i: run_mixes[i])[(n_runs - 1) // 2]
    t_fwd, t_rev_fwd = run_pairs[med_i]
    t_mix = run_mixes[med_i]
    reads_per_s = batch / t_mix

    # real single-dispatch overhead (transfer + tunnel RTT) of the
    # PRODUCTION graph (host batch args, reference table already resident),
    # reported separately.  The FIRST standalone call traces+compiles the
    # graph's own executable (the sustained loops compile wrappers), so warm
    # it up and time the second call; np.asarray fetches to host because
    # block_until_ready does not reliably wait through the relay.
    if mm:
        def _prod_call():
            return fwd_batch_resident(*res_fwd_np, dev_words, **rkw)
    else:
        def _prod_call():
            return fwd_batch(*fwd_items, **kw)
    np.asarray(_prod_call()["n_out"])
    t0 = time.perf_counter()
    np.asarray(_prod_call()["n_out"])
    dispatch_overhead = time.perf_counter() - t0 - t_fwd

    host_rps = host_oracle_time(fwd_items, n_sample=min(24, batch))

    # ---- PINNED vs_baseline (VERDICT r2 #3): denominator = median-of-5
    # single-thread native reference-exact mix rate x hardware threads
    # (idealized linear scaling — the most favorable credible all-cores
    # figure for the baseline; threaded draws on this contended box swing
    # 2x+ and made r1/r2 vs_baseline unstable).  Numerator = the chip's
    # 50/50 mix rate.  Like-for-like: the native loop does the shift for
    # the rev half too; the chip number excludes the (host-side,
    # pipelined-overlapped) shift cost, which is reported separately as
    # host_shift_*_reads_per_s.
    native_mix_1t, _nt = native_mix_time_median5(
        fwd_items, tuple(np.asarray(a) for a in rev_fwd_args),
        (r_ops, r_lens, rel_pos, r_cwin, r_rseq), kw["max_out"],
    )
    native_1 = native_baseline_time(fwd_items, kw["max_out"], 1)
    native_n = native_baseline_time(fwd_items, kw["max_out"], nthreads)
    if native_mix_1t:
        baseline_rps = native_mix_1t * nthreads
        vs_baseline = reads_per_s / baseline_rps
        baseline_protocol = (
            f"median5-1t-native-mix x {nthreads} hw threads "
            "(pinned; BASELINE.md r3)"
        )
        note = (
            "baseline = native C++ reference-exact inner loop on the same "
            "50/50 mix (shift+lift+simplify; median-of-5 single-thread x "
            f"{nthreads} threads, idealized scaling — Rust reference not "
            "buildable in image, BASELINE.md); chip value is the production "
            "host-shift routing mix; sustained on-chip time via in-jit "
            "repetition"
        )
    else:
        baseline_rps = host_rps
        vs_baseline = (batch / t_fwd) / host_rps
        baseline_protocol = "python-host-oracle (native core unavailable)"
        note = (
            "baseline = exact single-thread Python host oracle (native core "
            "unavailable); sustained on-chip time via in-jit repetition"
        )

    protocol = (
        "differenced"
        if _PROTOCOLS_USED == {"differenced"}
        else "undifferenced-fallback"
        if "undifferenced-fallback" in _PROTOCOLS_USED
        else "unknown"
    )

    # ---- product-level fields (VERDICT r4 #3): feed capacity + a small
    # end-to-end CLI leg in the same record, every round.  A failure here
    # must not lose the chip numbers.
    print(
        json.dumps(
            {
                "metric": (
                    f"lifted reads/sec/chip ({read_len//1000}kb HiFi-like, "
                    "fwd+rev pipeline, sustained)"
                ),
                "value": round(reads_per_s, 1),
                "unit": "reads/s",
                "vs_baseline": round(vs_baseline, 2),
                "note": note,
                "protocol": protocol,
                "value_runs": value_runs,
                "n_runs": n_runs,
                "mix_formula": mix_formula,
                "baseline_protocol": baseline_protocol,
                "baseline_reads_per_s": round(baseline_rps, 1),
                "device": str(device),
                "batch": batch,
                "graph": graph,
                "resident_table_mb": table_mb if mm else None,
                "t_fwd_ms": round(t_fwd * 1e3, 3),
                "t_fwd_table_ms": (
                    round(t_fwd_table * 1e3, 3) if t_fwd_table is not None
                    else None
                ),
                "t_rev_fwd_ms": round(t_rev_fwd * 1e3, 3),
                "t_rev_devshift_chain_ms": (
                    round(t_rev_devshift * 1e3, 3)
                    if t_rev_devshift is not None else None
                ),
                "dispatch_overhead_ms": round(dispatch_overhead * 1e3, 1),
                "host_shift_1t_reads_per_s": (
                    round(host_shift_1t_rps, 1) if host_shift_1t_rps else None
                ),
                "host_shift_nt_reads_per_s": (
                    round(host_shift_nt_rps, 1) if host_shift_nt_rps else None
                ),
                "host_oracle_reads_per_s": round(host_rps, 1),
                "native_mix_1t_reads_per_s": (
                    round(native_mix_1t, 1) if native_mix_1t else None
                ),
                "native_1t_reads_per_s": round(native_1, 1) if native_1 else None,
                "native_nt_reads_per_s": round(native_n, 1) if native_n else None,
                "native_threads": nthreads,
                **e2e_fields,
            }
        )
    )


if __name__ == "__main__":
    if (
        os.environ.get("PTPU_BENCH_E2E") == "1"
        or os.environ.get("PTPU_BENCH_OFFLOAD") == "1"
    ):
        e2e_main()
    else:
        main()
