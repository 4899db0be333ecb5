"""Shared indel-cluster machinery for the sequence-dependent device kernels.

Both indel simplification (reference src/simplify_alignment_indels.rs:4-112) and
indel shifting (reference shift_indels/cigar_indel_shifter.rs:10-165) operate on
*clusters*: maximal runs of I/D ops.  This module provides the vectorized cluster
detection / per-cluster reductions, and the bounded-window base comparison that
replaces the reference's unbounded greedy base loops.  A window saturation sets a
per-read ``fallback`` flag; those reads are finished exactly on host by the
``portello_tpu.ops`` oracle.
"""

from __future__ import annotations

import jax.numpy as jnp

from portello_tpu.kernels.cigar_kernels import (
    D,
    I,
    PAD,
    consumes_read,
    consumes_ref,
)


def op_positions(codes, lens, ref_pos):
    """Per-op (ref_start, read_start) as exclusive prefix sums
    (vectorized update_ref_and_read_pos walk, cigar/mod.rs:70-78)."""
    rl = jnp.where(consumes_ref(codes), lens, 0)
    dl = jnp.where(consumes_read(codes), lens, 0)
    ref_starts = ref_pos + jnp.cumsum(rl) - rl
    read_starts = jnp.cumsum(dl) - dl
    return ref_starts, read_starts


def find_clusters(codes, lens, ref_pos, max_clusters: int):
    """Detect indel clusters and reduce their stats.

    Returns a dict of per-cluster arrays (length ``max_clusters``):
    ``ref_start``/``read_start`` (coords at cluster start), ``del_len``/
    ``ins_len`` sums, plus per-op ``cluster_id`` (-1 for non-indel ops),
    ``cluster_end`` (op is last of its cluster), ``n_clusters`` and an
    ``overflow`` flag when the cluster count exceeds the static bound.
    """
    n = codes.shape[0]
    valid = codes != PAD
    is_indel = ((codes == I) | (codes == D)) & valid
    prev_indel = jnp.concatenate([jnp.zeros(1, bool), is_indel[:-1]])
    next_indel = jnp.concatenate([is_indel[1:], jnp.zeros(1, bool)])
    cluster_start = is_indel & ~prev_indel
    cluster_end = is_indel & ~next_indel
    cid = jnp.where(is_indel, jnp.cumsum(cluster_start.astype(jnp.int32)) - 1, -1)
    n_clusters = jnp.sum(cluster_start.astype(jnp.int32))
    overflow = n_clusters > max_clusters

    ref_starts, read_starts = op_positions(codes, lens, ref_pos)
    safe_cid = jnp.where(is_indel, jnp.minimum(cid, max_clusters), max_clusters)
    start_writer = jnp.where(cluster_start, safe_cid, max_clusters)

    c_ref = jnp.zeros(max_clusters + 1, jnp.int32).at[start_writer].set(
        ref_starts.astype(jnp.int32))[:max_clusters]
    c_read = jnp.zeros(max_clusters + 1, jnp.int32).at[start_writer].set(
        read_starts.astype(jnp.int32))[:max_clusters]
    del_src = jnp.where((codes == D) & valid, lens, 0)
    ins_src = jnp.where((codes == I) & valid, lens, 0)
    c_del = jnp.zeros(max_clusters + 1, jnp.int32).at[safe_cid].add(del_src)[:max_clusters]
    c_ins = jnp.zeros(max_clusters + 1, jnp.int32).at[safe_cid].add(ins_src)[:max_clusters]

    return {
        "ref_start": c_ref,
        "read_start": c_read,
        "del_len": c_del,
        "ins_len": c_ins,
        "cluster_id": cid,
        "cluster_end": cluster_end,
        "n_clusters": n_clusters,
        "overflow": overflow,
    }


def match_run_left(seq_a, idx_a, seq_b, idx_b, limit, window: int):
    """Length of the forward common run: how many t in [0, limit) satisfy
    ``seq_a[idx_a + t] == seq_b[idx_b + t]``, scanning at most ``window`` steps.

    idx_* are (C,) int32 vectors (one per cluster); returns (run_len, saturated)
    where ``saturated`` means the window was exhausted while still matching with
    ``limit`` unreached (exact result unknown -> caller sets fallback).
    """
    t = jnp.arange(window, dtype=jnp.int32)[None, :]
    ia = jnp.clip(idx_a[:, None] + t, 0, seq_a.shape[0] - 1)
    ib = jnp.clip(idx_b[:, None] + t, 0, seq_b.shape[0] - 1)
    within = t < limit[:, None]
    eq = within & (seq_a[ia] == seq_b[ib])
    run = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1), axis=1)
    saturated = (run >= window) & (limit > window)
    return run, saturated


def match_run_right(seq_a, end_a, seq_b, end_b, limit, window: int):
    """Length of the backward common run: how many t in [0, limit) satisfy
    ``seq_a[end_a - 1 - t] == seq_b[end_b - 1 - t]`` (right-aligned suffix
    compare), scanning at most ``window`` steps."""
    t = jnp.arange(window, dtype=jnp.int32)[None, :]
    ia = jnp.clip(end_a[:, None] - 1 - t, 0, seq_a.shape[0] - 1)
    ib = jnp.clip(end_b[:, None] - 1 - t, 0, seq_b.shape[0] - 1)
    within = t < limit[:, None]
    eq = within & (seq_a[ia] == seq_b[ib])
    run = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1), axis=1)
    saturated = (run >= window) & (limit > window)
    return run, saturated
