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
