"""Left-shift device kernel with a NONZERO window base.

Production rev items always run with ``win_base = pos`` and a contig window
sliced at that offset (models/pipeline_model._prep_item), while the batch
generators use the base-0 convention — so the absolute-edge-limit arithmetic
(``max_left = win_base + bs``, indel_breakend_homology.rs:33) was only
exercised by ad-hoc review harnesses.  This pins it in-tree: windowed device
inputs vs the oracle on the FULL sequence, bit-exact or flagged.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from portello_tpu.kernels.cigar_kernels import PAD  # noqa: E402
from portello_tpu.kernels.shift_kernel import left_shift_batch  # noqa: E402
from portello_tpu.ops import cigar as cg  # noqa: E402
from portello_tpu.ops.shift import left_shift_indels  # noqa: E402
from portello_tpu.testutil.simulate import apply_edits, rand_seq  # noqa: E402

MAX_OPS, MAX_SEQ, MC, W, MAX_OUT = 64, 512, 24, 12, 96


@pytest.mark.parametrize("mm", [False, True])
def test_left_shift_nonzero_win_base_matches_oracle(mm):
    rng = np.random.default_rng(60601)
    B = 24
    ops = np.full((B, MAX_OPS), PAD, np.int32)
    lens = np.zeros((B, MAX_OPS), np.int32)
    rel_pos = np.zeros(B, np.int32)
    win_base = np.zeros(B, np.int32)
    ref_win = np.zeros((B, MAX_SEQ), np.uint8)
    read_seq = np.zeros((B, MAX_SEQ), np.uint8)
    expects = []
    for i in range(B):
        full = rand_seq(rng, 1200)
        wb = int(rng.integers(0, 600))           # absolute window base
        span = int(rng.integers(60, 250))
        rseq, rcig = apply_edits(
            full[wb : wb + span], rng, 0.01, 0.03, eqx=False
        )
        n = min(len(rcig), MAX_OPS)
        ops[i, :n] = rcig[:n, 0]
        lens[i, :n] = rcig[:n, 1]
        rel_pos[i] = 0                           # window starts at the item
        win_base[i] = wb
        w_len = min(MAX_SEQ, len(full) - wb)
        ref_win[i, :w_len] = full[wb : wb + w_len]
        read_seq[i, : len(rseq)] = rseq[: MAX_SEQ]
        # oracle on the FULL sequence at the ABSOLUTE position
        p, c = left_shift_indels(wb, rcig[:n].astype(np.int64), full, rseq)
        expects.append((p, c))

    codes_o, lens_o, n_out, pos_o, fb = left_shift_batch(
        ops, lens, rel_pos, win_base, ref_win, read_seq,
        max_clusters=MC, window=W, max_out=MAX_OUT, mm=mm,
    )
    fb = np.asarray(fb)
    exact = 0
    for i in range(B):
        if fb[i]:
            continue
        p, c = expects[i]
        n = int(np.asarray(n_out)[i])
        got = np.stack(
            [np.asarray(codes_o)[i, :n], np.asarray(lens_o)[i, :n]], axis=1
        ).astype(np.int64)
        # device position is window-relative; oracle absolute
        assert int(np.asarray(pos_o)[i]) + int(win_base[i]) == p, i
        assert np.array_equal(got, c), (i, cg.to_string(got), cg.to_string(c))
        exact += 1
    assert exact > 0, "every item fell back; test exercises nothing"
