"""Pallas kernel conformance (interpret mode on CPU) vs the XLA reference."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from portello_tpu.kernels.cluster_utils import match_run_left, match_run_right  # noqa: E402
from portello_tpu.kernels.pallas.match_run_pallas import (  # noqa: E402
    match_run_batch_pallas,
)

B, C, W, L = 8, 16, 16, 512


def make_case(rng):
    # Two mostly-equal sequences so runs of varied length occur.
    a = rng.integers(65, 68, size=(B, L), dtype=np.uint8)
    b = a.copy()
    muts = rng.integers(0, L, size=(B, 40))
    for i in range(B):
        b[i, muts[i]] = 60 + rng.integers(0, 4, size=40).astype(np.uint8)
    # keep windows inside the data so the XLA path's index clamping and the
    # pallas sentinel padding agree (the real callers guarantee this for all
    # lanes below `limit`)
    fwd_ia = rng.integers(0, L - W - 8, size=(B, C)).astype(np.int32)
    fwd_ib = rng.integers(0, L - W - 8, size=(B, C)).astype(np.int32)
    bwd_ia = rng.integers(W + 8, L, size=(B, C)).astype(np.int32)
    bwd_ib = rng.integers(W + 8, L, size=(B, C)).astype(np.int32)
    limit = rng.integers(0, W + 8, size=(B, C)).astype(np.int32)
    return a, b, (fwd_ia, fwd_ib), (bwd_ia, bwd_ib), limit


def pad(seq, sentinel):
    from portello_tpu.kernels.pallas.match_run_pallas import pad_for_match_run
    return np.asarray(pad_for_match_run(seq, W, sentinel))


def test_match_run_pallas_forward_matches_xla():
    rng = np.random.default_rng(0)
    a, b, (ia, ib), _, limit = make_case(rng)
    want = jax.vmap(lambda aa, bb, x, y, l: match_run_left(aa, x, bb, y, l, W)[0])(
        a, b, ia, ib, limit
    )
    got, _ = match_run_batch_pallas(
        pad(a, 0xFE), pad(b, 0xFD), ia + W, ib + W, limit,
        np.zeros((B, C), np.int32), window=W, interpret=True,
    )
    assert (np.asarray(got) == np.asarray(want)).all()


def test_match_run_pallas_backward_matches_xla():
    rng = np.random.default_rng(1)
    a, b, _, (ia, ib), limit = make_case(rng)
    # match_run_right compares ending at the given exclusive end indices
    want = jax.vmap(lambda aa, bb, x, y, l: match_run_right(aa, x, bb, y, l, W)[0])(
        a, b, ia, ib, limit
    )
    got, _ = match_run_batch_pallas(
        pad(a, 0xFE), pad(b, 0xFD), ia + W, ib + W, limit,
        np.ones((B, C), np.int32), window=W, interpret=True,
    )
    assert (np.asarray(got) == np.asarray(want)).all()


def test_match_run_pallas_edge_windows():
    """Windows at the very start/end of the data never clip (sentinel pad)."""
    a = np.full((B, L), 65, np.uint8)
    b = np.full((B, L), 65, np.uint8)
    ia = np.zeros((B, C), np.int32)
    ib = np.zeros((B, C), np.int32)
    limit = np.full((B, C), W + 4, np.int32)
    got, sat = match_run_batch_pallas(
        pad(a, 0xFE), pad(b, 0xFD), ia + W, ib + W, limit,
        np.zeros((B, C), np.int32), window=W, interpret=True,
    )
    # all-equal within the window -> saturated at W
    assert (np.asarray(got) == W).all()
    assert np.asarray(sat).all()
    # backward from index 0: no data before -> sentinels mismatch -> run 0
    got2, _ = match_run_batch_pallas(
        pad(a, 0xFE), pad(b, 0xFD), ia + W, ib + W, limit,
        np.ones((B, C), np.int32), window=W, interpret=True,
    )
    assert (np.asarray(got2) == 0).all()
