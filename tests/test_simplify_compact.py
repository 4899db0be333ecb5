"""Batch-compacted mixed-cluster simplify (simplify_batch_compact):
equality with the per-item kernel, and the two budget-spill flags.

Mixed clusters (both I and D in one cluster, simplify_alignment_indels.rs:54-92)
are the only case needing sequence windows; the compact form gathers just the
batch's mixed (item, cluster) pairs into global slots.  Items exceeding the
per-item slot count (MXI) or the global budget must raise the fallback flag
(-> exact host path) and must not perturb other items' outputs.
"""

import numpy as np
import pytest

from portello_tpu.ops import cigar as cg
from portello_tpu.ops.simplify import simplify_alignment_indels

jax = pytest.importorskip("jax")

from portello_tpu.kernels.simplify_kernel import (  # noqa: E402
    MXI,
    simplify_batch,
    simplify_batch_compact,
)

MAX_OPS = 48
MAX_CL = 24
WIN = 16
MAX_OUT = 96
MAX_SEQ = 512


def pad_batch(items):
    b = len(items)
    from portello_tpu.kernels.cigar_kernels import PAD

    codes = np.full((b, MAX_OPS), PAD, np.int32)
    lens = np.zeros((b, MAX_OPS), np.int32)
    pos = np.zeros(b, np.int32)
    refw = np.zeros((b, MAX_SEQ), np.uint8)
    readw = np.zeros((b, MAX_SEQ), np.uint8)
    for i, (cig, ref_pos, ref_seq, read_seq) in enumerate(items):
        codes[i, : len(cig)] = cig[:, 0]
        lens[i, : len(cig)] = cig[:, 1]
        pos[i] = ref_pos
        refw[i, : len(ref_seq)] = ref_seq
        readw[i, : len(read_seq)] = read_seq
    return codes, lens, pos, refw, readw


def run_both(items):
    codes, lens, pos, refw, readw = pad_batch(items)
    kw = dict(max_clusters=MAX_CL, window=WIN, max_out=MAX_OUT)
    per_item = simplify_batch(codes, lens, pos, refw, readw, mm=True, **kw)
    compact = simplify_batch_compact(codes, lens, pos, refw, readw, **kw)
    return [np.asarray(a) for a in per_item], [np.asarray(a) for a in compact]


def mixed_item(rng, n_mixed):
    """An alignment with exactly n_mixed 2D2I clusters separated by M runs,
    over sequences random enough that re-matching is partial (stays mixed)."""
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref_seq = rng.choice(alpha, size=200)
    ops = [(cg.M, 4)]
    for _ in range(n_mixed):
        ops += [(cg.D, 2), (cg.I, 2), (cg.M, 5)]
    cig = np.array(ops, dtype=np.int64)
    ref_pos = 3
    # read = ref match bases with random insertion content
    parts = []
    rp = ref_pos
    for code, ln in ops:
        if code == cg.M:
            parts.append(ref_seq[rp : rp + ln])
            rp += ln
        elif code == cg.D:
            rp += ln
        else:
            parts.append(rng.choice(alpha, size=ln))
    return cig, ref_pos, ref_seq, np.concatenate(parts)


def test_compact_equals_per_item_and_oracle():
    rng = np.random.default_rng(11)
    items = [mixed_item(rng, rng.integers(0, MXI + 1)) for _ in range(24)]
    per_item, compact = run_both(items)
    for a, b in zip(per_item, compact):
        np.testing.assert_array_equal(a, b)
    # and both match the oracle where no flag fired
    f_codes, f_lens, n_out, out_pos, fb = compact
    for i, (cig, pos, ref, read) in enumerate(items):
        if fb[i]:
            continue
        exp_pos, exp_cig = simplify_alignment_indels(pos, cig, ref, read)
        n = int(n_out[i])
        got = np.stack([f_codes[i, :n], f_lens[i, :n]], axis=1).astype(np.int64)
        assert int(out_pos[i]) == exp_pos
        assert cg.to_string(got) == cg.to_string(exp_cig)


def test_per_item_budget_overflow_flags_only_that_item():
    rng = np.random.default_rng(12)
    items = [
        mixed_item(rng, 1),
        mixed_item(rng, MXI + 1),  # exceeds per-item slots -> must flag
        mixed_item(rng, 1),
    ]
    _, compact = run_both(items)
    fb = compact[4]
    assert bool(fb[1])
    assert not bool(fb[0]) and not bool(fb[2])
    # neighbours still match the oracle exactly
    f_codes, f_lens, n_out, out_pos, _ = compact
    for i in (0, 2):
        cig, pos, ref, read = items[i]
        exp_pos, exp_cig = simplify_alignment_indels(pos, cig, ref, read)
        n = int(n_out[i])
        got = np.stack([f_codes[i, :n], f_lens[i, :n]], axis=1).astype(np.int64)
        assert (int(out_pos[i]), cg.to_string(got)) == (exp_pos, cg.to_string(exp_cig))


def test_global_budget_spill_flags_tail_items():
    """More batch-wide mixed pairs than global slots: the overflowing tail
    items flag for host fallback; every unflagged item stays oracle-exact."""
    rng = np.random.default_rng(13)
    b = 40  # b * MXI = 80 pairs > g_budget = min(GBUDGET=64, MXI*b=80)
    items = [mixed_item(rng, MXI) for _ in range(b)]
    _, compact = run_both(items)
    f_codes, f_lens, n_out, out_pos, fb = compact
    assert fb.any(), "expected a global-budget spill"
    assert not fb[:16].any(), "early items must not spill"
    for i in range(b):
        if fb[i]:
            continue
        cig, pos, ref, read = items[i]
        exp_pos, exp_cig = simplify_alignment_indels(pos, cig, ref, read)
        n = int(n_out[i])
        got = np.stack([f_codes[i, :n], f_lens[i, :n]], axis=1).astype(np.int64)
        assert (int(out_pos[i]), cg.to_string(got)) == (exp_pos, cg.to_string(exp_cig))
