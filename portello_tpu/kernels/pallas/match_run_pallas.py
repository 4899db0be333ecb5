"""Pallas TPU kernel for the bounded-window common-run computation.

Computes, per cluster c, the length of the leading all-equal run of
    seq_a[ia[c] + t] == seq_b[ib[c] + t]          (forward, rev=0)
    seq_a[ia[c] - 1 - t] == seq_b[ib[c] - 1 - t]  (backward, rev=1)
for t < min(limit[c], window) — the compare behind
``cluster_utils.match_run_left/right`` (reference greedy base loops,
simplify_alignment_indels.rs:54-85 and indel_breakend_homology.rs:33-47).

Contract: sequences are padded with ``window`` sentinel bytes on BOTH ends and
indices pre-offset by +window, so window loads never clip; out-of-data lanes
are masked by ``limit`` exactly as in the XLA path.

Design: one grid cell per read; both padded sequences live in VMEM for the
cell; each cluster does two W-byte VMEM dynamic-slice loads and a vectorized
first-mismatch reduction — no gathers, immune to the XLA gather-into-scan
fusion pathology (see shift_kernel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


ROWS = 8  # reads per grid cell (TPU sublane-divisibility requirement)


def _match_run_kernel(ia_ref, ib_ref, limit_ref, rev_ref, a_ref, b_ref, run_ref,
                      *, window: int):
    rows, c_total = ia_ref.shape
    t = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, c_total), 1)

    # Static row unroll: Mosaic requires provably-aligned dynamic sublane
    # indexing, so only the cluster loop is rolled.
    row_accs = []
    for r in range(rows):
        def body(c, acc, r=r):
            rev = rev_ref[r, c]
            ia = ia_ref[r, c]
            ib = ib_ref[r, c]
            limit = limit_ref[r, c]
            # Forward windows cover [i, i+W); backward windows cover [i-W, i)
            # and map lane w to logical step t = W-1-w (no data reversal —
            # unsupported in the TPU lowering).
            sa = jnp.where(rev > 0, ia - window, ia)
            sb = jnp.where(rev > 0, ib - window, ib)
            # Mosaic requires lane-aligned dynamic slices: load a 128-aligned
            # 2-lane-group superset and rotate the residual offset away.
            sa_al = pl.multiple_of((sa // 128) * 128, 128)
            sb_al = pl.multiple_of((sb // 128) * 128, 128)
            # int32 cast: Mosaic's rotate only supports 32-bit data
            wa_wide = a_ref[r, pl.ds(sa_al, 256)].reshape(1, 256).astype(jnp.int32)
            wb_wide = b_ref[r, pl.ds(sb_al, 256)].reshape(1, 256).astype(jnp.int32)
            wa_rot = pltpu.roll(wa_wide, -(sa - sa_al), axis=1)
            wb_rot = pltpu.roll(wb_wide, -(sb - sb_al), axis=1)
            eq = wa_rot[:, :window] == wb_rot[:, :window]
            t_logical = jnp.where(rev > 0, window - 1 - t, t)
            good = eq & (t_logical < limit)
            bad_pos = jnp.where(good, window, t_logical)
            run = jnp.minimum(jnp.min(bad_pos), limit)
            # Scalar stores / dynamic_update_slice are unsupported: accumulate
            # through a one-hot lane mask.
            return jnp.where(col_ids == c, run, acc)

        row_accs.append(
            jax.lax.fori_loop(0, c_total, body, jnp.zeros((1, c_total), jnp.int32))
        )
    run_ref[:, :] = jnp.concatenate(row_accs, axis=0)


@partial(jax.jit, static_argnames=("window", "interpret"))
def match_run_batch_pallas(seq_a_pad, seq_b_pad, ia, ib, limit, rev, *,
                           window: int, interpret: bool = False):
    """Batched window common-run via Pallas.

    seq_*_pad: (B, window + L + window) uint8, sentinel-padded; ia/ib: (B, C)
    int32, already offset by +window (forward: window start; backward:
    exclusive window end); limit/rev: (B, C).  Returns (run, saturated).
    """
    b, lp = seq_a_pad.shape
    c = ia.shape[1]
    if b % ROWS:
        raise ValueError(f"batch size {b} must be a multiple of {ROWS}")
    out = pl.pallas_call(
        partial(_match_run_kernel, window=window),
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.int32),
        grid=(b // ROWS,),
        in_specs=[
            # per-cluster scalars live in SMEM: VMEM scalar reads at dynamic
            # lane positions are not lowerable (Mosaic 128-alignment proof)
            pl.BlockSpec((ROWS, c), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, c), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, c), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, c), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, lp), lambda i: (i, 0)),
            pl.BlockSpec((ROWS, lp), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS, c), lambda i: (i, 0)),
        interpret=interpret,
    )(
        ia.astype(jnp.int32), ib.astype(jnp.int32), limit.astype(jnp.int32),
        rev.astype(jnp.int32), seq_a_pad, seq_b_pad,
    )
    saturated = (out >= window) & (limit > window)
    return out, saturated


ALIGN_SLACK = 256  # aligned superset-load width (2 lane groups)


def pad_for_match_run(seq, window: int, sentinel: int = 0xFE):
    """Pad a (B, L) uint8 batch: ``window`` sentinel bytes in front, ``window
    + ALIGN_SLACK`` behind (the kernel loads 128-aligned 256-byte supersets).

    Use DIFFERENT sentinels for the two sequences being compared so
    out-of-data lanes always mismatch.
    """
    b = seq.shape[0]
    front = jnp.full((b, window), sentinel, dtype=jnp.uint8)
    back = jnp.full((b, window + ALIGN_SLACK), sentinel, dtype=jnp.uint8)
    return jnp.concatenate([front, seq, back], axis=1)
