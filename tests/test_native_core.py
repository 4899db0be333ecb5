"""Bit-equality of the native (C++) lift+simplify core against the Python
oracle, and multithreaded-vs-single-thread determinism.

The native core is the baseline proxy in bench.py (BASELINE.md) and a fast
host path, so its outputs must match portello_tpu.ops exactly.
"""

import numpy as np
import pytest

from portello_tpu.ops import native_core
from portello_tpu.ops.blockmap import BlockMap
from portello_tpu.ops.liftover import liftover_read_alignment
from portello_tpu.ops.simplify import simplify_alignment_indels


pytestmark = pytest.mark.skipif(
    native_core.get_lib() is None, reason="native core unavailable"
)


def _oracle(ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq, i):
    n = int(n_ops[i])
    cig = np.stack([ops[i, :n], lens[i, :n]], axis=1).astype(np.int64)
    k = int(nb[i])
    bm = BlockMap(bk[i, :k].astype(np.int64), bv[i, :k].astype(np.int64))
    lifted = liftover_read_alignment(bm, int(pos[i]), cig)
    if lifted is None:
        return None
    p, c = lifted
    rp, rc = simplify_alignment_indels(
        p - int(ref_base[i]), c, ref_win[i], read_seq[i]
    )
    return int(ref_base[i]) + rp, rc


def _batch(b=48, read_len=3000, seed=5):
    from portello_tpu.models.batch import BucketConfig
    from portello_tpu.testutil.batchgen import make_item_arrays

    bcfg = BucketConfig(
        max_ops=128, max_blocks=64, max_seq=4096, max_clusters=64, window=24
    )
    rng = np.random.default_rng(seed)
    args = make_item_arrays(
        rng, b, bcfg, read_len=read_len, read_error=0.01, contig_var_rate=0.004
    )
    return bcfg, args


@pytest.mark.parametrize("n_threads", [1, 4])
def test_native_matches_oracle(n_threads):
    bcfg, args = _batch()
    ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = args
    max_out = bcfg.resolved_max_out()
    oc, ol, on, op = native_core.lift_simplify_batch(
        ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq,
        max_out, n_threads=n_threads,
    )
    n_mapped = 0
    for i in range(len(n_ops)):
        want = _oracle(*args, i)
        if want is None:
            assert on[i] == -1, i
            continue
        n_mapped += 1
        wp, wc = want
        assert on[i] == len(wc), i
        assert op[i] == wp, i
        got = np.stack([oc[i, : on[i]], ol[i, : on[i]]], axis=1)
        assert np.array_equal(got, wc.astype(np.int32)), i
    assert n_mapped > 0


def test_native_unmapped_item():
    bcfg, args = _batch(b=4)
    ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = args
    # All-gap block map: liftover must report unmapped (-1).
    bv[0, :] = -1
    oc, ol, on, op = native_core.lift_simplify_batch(
        ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq,
        bcfg.resolved_max_out(),
    )
    assert on[0] == -1 and op[0] == -1


def test_native_shift_batch_matches_oracle():
    """ptcore_shift_batch (the rev-item host-shift prep step) must be
    bit-identical to ops/shift.left_shift_indels."""
    from portello_tpu.models.batch import BucketConfig
    from portello_tpu.ops.shift import left_shift_indels
    from portello_tpu.testutil.batchgen import make_item_arrays

    bcfg = BucketConfig(
        max_ops=128, max_blocks=64, max_seq=4096, max_clusters=64, window=24
    )
    rng = np.random.default_rng(7)
    (ops, lens, n_ops, pos, win_base, contig_win, _bk, _bv, _nb,
     _rw, _rb, read_seq) = make_item_arrays(
        rng, 48, bcfg, read_len=3000, read_error=0.01, rev=True
    )
    rel_pos = pos - win_base
    max_out = bcfg.max_ops + 8
    oc, ol, on, op = native_core.shift_batch(
        ops, lens, n_ops, rel_pos, contig_win, read_seq, max_out, n_threads=3
    )
    for i in range(len(n_ops)):
        n = int(n_ops[i])
        cig = np.stack([ops[i, :n], lens[i, :n]], axis=1).astype(np.int64)
        wp, wc = left_shift_indels(
            int(rel_pos[i]), cig, contig_win[i], read_seq[i]
        )
        assert on[i] == len(wc), i
        assert op[i] == wp, i
        got = np.stack([oc[i, : on[i]], ol[i, : on[i]]], axis=1)
        assert np.array_equal(got, wc.astype(np.int32)), i
