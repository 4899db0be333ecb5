"""Interpret-mode conformance for the Pallas window-match kernel.

The kernel is a measured-and-rejected alternative to the XLA one-hot
window fetch (PERF.md: the in-VMEM uint8->f32 table conversion costs more
than XLA's HBM materialization on v5e; the XLA form stays in production).
Kept as tested evidence with its exactness contract enforced here.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from portello_tpu.kernels.cluster_utils import _window_bytes_mm_t  # noqa: E402
from portello_tpu.kernels.pallas.window_match import (  # noqa: E402
    ROWS,
    pad_table,
    window_match_runs_batch,
)


def _expected(eq):
    """(W, C) equality matrix -> leading/trailing run lengths per column."""
    w = eq.shape[0]
    f = np.empty(eq.shape[1], np.int32)
    r = np.empty(eq.shape[1], np.int32)
    for c in range(eq.shape[1]):
        col = eq[:, c]
        f[c] = w if col.all() else int(np.argmax(~col))
        r[c] = w if col.all() else w - 1 - int(np.max(np.nonzero(~col)[0]))
    return f, r


def test_window_match_runs_vs_xla_fetch():
    rng = np.random.default_rng(31)
    L, W, C = 4096, 48, 16
    B = ROWS * 2
    seq_a = np.empty((B, L), np.uint8)
    seq_b = np.empty((B, L), np.uint8)
    ia = np.empty((B, C), np.int32)
    ib = np.empty((B, C), np.int32)
    for i in range(B):
        a = np.tile(rng.integers(65, 69, size=L // 8, dtype=np.uint8), 8)
        b = a.copy()
        b[rng.integers(0, L, 80)] = rng.integers(65, 69, size=80, dtype=np.uint8)
        seq_a[i], seq_b[i] = a, b
        # starts span the full legal domain, including the -window edge
        ia[i] = np.sort(rng.integers(-W, L, size=C)).astype(np.int32)
        ib[i] = np.clip(ia[i] + rng.integers(-4, 5, size=C), -W, L)

    at = jax.vmap(lambda s: pad_table(s, 0xFE))(jnp.asarray(seq_a))
    bt = jax.vmap(lambda s: pad_table(s, 0xFD))(jnp.asarray(seq_b))
    run_f, run_r = window_match_runs_batch(
        at, bt, jnp.asarray(ia), jnp.asarray(ib), window=W, interpret=True
    )

    for i in range(B):
        wa = np.asarray(
            _window_bytes_mm_t(jnp.asarray(seq_a[i]), jnp.asarray(ia[i]), W, 0xFE)
        )
        wb = np.asarray(
            _window_bytes_mm_t(jnp.asarray(seq_b[i]), jnp.asarray(ib[i]), W, 0xFD)
        )
        exp_f, exp_r = _expected(wa == wb)
        assert np.array_equal(np.asarray(run_f[i]), exp_f), f"item {i} fwd"
        assert np.array_equal(np.asarray(run_r[i]), exp_r), f"item {i} rev"
