"""Property test backing the rev-path static width bound.

``pipeline_model._rev_ops_bound`` compresses the shifted cigar at exactly
``max_ops`` columns (the fwd graph's lane tile); reads whose shifted cigar
exceeds it are flagged to the exact host path.  The flag can only fire for
bucket-edge reads because the shifter can never grow the run count by more
than one: each indel cluster emits at most ``M I D`` where the input cluster
held at least one indel op plus its preceding match run, and edge cleanup +
compression only rewrite or merge ops in place (reference
shift_indels/cigar_indel_shifter.rs:10-165, cigar/mod.rs:265-291).  This
fuzzes that invariant on the host oracle; the device path is
conformance-equal to the oracle, so the bound transfers.
"""

import numpy as np

from portello_tpu.models.pipeline_model import _rev_ops_bound
from portello_tpu.ops import cigar as cg
from portello_tpu.ops.shift import left_shift_indels, right_shift_indels
from portello_tpu.testutil.simulate import rand_seq


def _random_alignment(rng):
    """Random CIGAR over a random reference with homology-rich stretches."""
    ref_len = int(rng.integers(400, 1200))
    # Mix random sequence with homopolymer / dinucleotide repeats so indels
    # really shift (pure random sequence has ~zero breakend homology).
    parts = []
    while sum(len(p) for p in parts) < ref_len:
        kind = rng.integers(0, 3)
        if kind == 0:
            parts.append(rand_seq(rng, int(rng.integers(20, 80))))
        elif kind == 1:
            parts.append(np.full(int(rng.integers(10, 60)),
                                 ord("ACGT"[rng.integers(0, 4)]), np.uint8))
        else:
            unit = rand_seq(rng, int(rng.integers(2, 4)))
            parts.append(np.tile(unit, int(rng.integers(5, 20))))
    ref = np.concatenate(parts)[:ref_len]

    pos = int(rng.integers(0, 100))
    ops = []
    read_parts = []
    rp = pos
    n_ops = int(rng.integers(3, 40))
    for i in range(n_ops):
        code = rng.choice([cg.M, cg.M, cg.I, cg.D])
        ln = int(rng.integers(1, 30))
        if code == cg.M:
            ln = min(ln, len(ref) - rp - 50)
            if ln <= 0:
                break
            ops.append((cg.M, ln))
            read_parts.append(ref[rp : rp + ln])
            rp += ln
        elif code == cg.I:
            ops.append((cg.I, ln))
            # insertions drawn from the local reference context half the
            # time (maximizes shiftable homology), random otherwise
            if rng.integers(0, 2) and rp + ln <= len(ref):
                read_parts.append(ref[rp : rp + ln])
            else:
                read_parts.append(rand_seq(rng, ln))
        else:
            ln = min(ln, len(ref) - rp - 50)
            if ln <= 0:
                break
            ops.append((cg.D, ln))
            rp += ln
    if not ops or not any(c == cg.M for c, _ in ops):
        ops.append((cg.M, 20))
        read_parts.append(ref[rp : rp + 20])
    cig = cg.compress_cigar(np.array(ops, np.int64))
    read = np.concatenate(read_parts) if read_parts else np.zeros(0, np.uint8)
    return pos, cig, ref, read


def test_shift_never_grows_runs_by_more_than_one():
    rng = np.random.default_rng(11)
    grew = 0
    for _ in range(400):
        pos, cig, ref, read = _random_alignment(rng)
        for shifter in (left_shift_indels, right_shift_indels):
            _, out = shifter(pos, cig, ref, read)
            assert len(out) <= len(cig) + 1, (
                f"shift grew {len(cig)} -> {len(out)} runs: "
                f"{cg.cigar_to_string(cig)} -> {cg.cigar_to_string(out)}"
            )
            if len(out) == len(cig) + 1:
                grew += 1
    # the +1 case must actually occur or the bound test is vacuous
    assert grew > 0


def test_rev_ops_bound_matches_fwd_tile():
    # The rev leg shares the fwd graph's shapes: the bound equals max_ops
    # (never exceeding max_out), so no op-wide tensor crosses the 128-lane
    # tile.  Reads whose shifted cigar exceeds it (possible only at the
    # bucket edge, per the +1 invariant above) are flagged to the host path.
    from portello_tpu.testutil.batchgen import HIFI_BUCKET

    for max_ops in (HIFI_BUCKET.max_ops, 256, 512):
        max_out = 2 * max_ops - 24
        b = _rev_ops_bound(max_ops, max_out)
        assert b == min(max_ops, max_out)


def test_rev_cap_spill_flags_and_control_stays_exact():
    """A rev item whose shift grows its run count past max_ops must raise the
    fallback flag (-> exact host path); a one-run-shorter control item must
    stay on device and match the oracle shift->lift->simplify composition."""
    import pytest

    jax = pytest.importorskip("jax")  # noqa: F841

    from portello_tpu.kernels.cigar_kernels import INT32_MAX, PAD
    from portello_tpu.models.batch import BucketConfig
    from portello_tpu.models.pipeline_model import rev_batch
    from portello_tpu.ops.blockmap import build_block_map
    from portello_tpu.ops.liftover import liftover_read_alignment
    from portello_tpu.ops.simplify import simplify_alignment_indels

    bcfg = BucketConfig(
        max_ops=8, max_blocks=8, max_seq=256, max_clusters=8, window=16
    )

    # Contig: strict ABAB... alternation (no indel homology) ending in
    # ...AABB; the read matches AAB and deletes the final B, which left-
    # shifts one step and SPLITS the trailing match: 3M1D -> 2M1D1M (+1 run).
    def contig(n_pairs):
        alt = np.frombuffer(b"AB" * 40, np.uint8)[: 2 * n_pairs + 6]
        return np.concatenate([alt, np.frombuffer(b"AABB", np.uint8),
                               np.frombuffer(b"ABABABAB", np.uint8)])

    def make_item(n_pairs):
        seq = contig(n_pairs)
        pos = 0
        ops, read_parts = [], []
        rp = pos
        for _ in range(n_pairs):
            ops.append((cg.M, 2))
            read_parts.append(seq[rp : rp + 2])
            rp += 2
            ops.append((cg.I, 1))
            read_parts.append(np.frombuffer(b"C", np.uint8))
        skip = len(seq) - 12 - rp  # land M3 on the AAB just before the last B
        ops[-2] = (cg.M, 2 + skip)
        read_parts[-2] = seq[rp - 2 : rp + skip]
        rp += skip
        ops.append((cg.M, 3))
        read_parts.append(seq[rp : rp + 3])
        ops.append((cg.D, 1))
        cig = np.array(ops, np.int64)
        return pos, cig, seq, np.concatenate(read_parts)

    items = [make_item(3), make_item(2)]  # 8 runs (== max_ops) and 6 runs
    # self-check the grow invariant on the oracle
    for j, (pos, cig, seq, read) in enumerate(items):
        _, shifted = left_shift_indels(pos, cig, seq, read)
        assert len(shifted) == len(cig) + 1
    assert len(items[0][1]) == bcfg.max_ops

    b = len(items)
    ops_a = np.full((b, bcfg.max_ops), PAD, np.int32)
    lens_a = np.zeros((b, bcfg.max_ops), np.int32)
    n_ops = np.zeros(b, np.int32)
    pos_a = np.zeros(b, np.int32)
    bk = np.full((b, bcfg.max_blocks), INT32_MAX, np.int32)
    bv = np.full((b, bcfg.max_blocks), -1, np.int32)
    nb = np.zeros(b, np.int32)
    ref_win = np.zeros((b, bcfg.max_seq), np.uint8)
    read_seq = np.zeros((b, bcfg.max_seq), np.uint8)
    contig_win = np.zeros((b, bcfg.max_seq), np.uint8)
    zeros = np.zeros(b, np.int32)
    for j, (pos, cig, seq, read) in enumerate(items):
        ops_a[j, : len(cig)] = cig[:, 0]
        lens_a[j, : len(cig)] = cig[:, 1]
        n_ops[j] = len(cig)
        pos_a[j] = pos
        bm = build_block_map(0, np.array([(cg.EQ, len(seq))], np.int64), False)
        bk[j, : len(bm)] = bm.keys
        bv[j, : len(bm)] = bm.vals
        nb[j] = len(bm)
        contig_win[j, : len(seq)] = seq
        ref_win[j, : len(seq)] = seq  # identity contig->ref map
        read_seq[j, : len(read)] = read

    kw = dict(max_out=bcfg.resolved_max_out(), max_clusters=bcfg.max_clusters,
              window=bcfg.window)
    for mm in (False, True):
        out = rev_batch(ops_a, lens_a, n_ops, pos_a, zeros, contig_win,
                        bk, bv, nb, ref_win, zeros, read_seq, mm=mm, **kw)
        fb = np.asarray(out["fallback"])
        assert fb[0], "bucket-edge grow must flag for host fallback"
        assert not fb[1], "control item must stay on device"
        # control item: device == oracle shift -> lift -> simplify
        pos, cig, seq, read = items[1]
        p1, shifted = left_shift_indels(pos, cig, seq, read)
        bmj = build_block_map(0, np.array([(cg.EQ, len(seq))], np.int64), False)
        p2, lifted = liftover_read_alignment(bmj, p1, shifted)
        p3, simp = simplify_alignment_indels(p2, lifted, seq, read)
        n1 = int(np.asarray(out["n_out"])[1])
        got = np.stack(
            [np.asarray(out["codes"])[1, :n1],
             np.asarray(out["lens"])[1, :n1]], axis=1,
        ).astype(np.int64)
        assert int(np.asarray(out["ref2_pos"])[1]) == p3
        assert cg.to_string(got) == cg.to_string(simp)
