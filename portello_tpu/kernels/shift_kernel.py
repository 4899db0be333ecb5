"""Batched indel left-shift kernel (for reads on reverse-mapped contigs).

TPU-native reformulation of left_shift_indels
(reference shift_indels/left_shift_indels.rs:17-39 + cigar_indel_shifter.rs:10-165):

- per-cluster homology lengths come from one bounded-window vectorized suffix
  compare (replacing get_indel_breakend_homology_info's base loop,
  indel_breakend_homology.rs:33-47);
- the builder's sequential match-block accounting (each cluster moves
  ``shift`` matched bases from before it to after it, so cluster i+1's budget
  depends on cluster i's shift) is a cheap min-plus recurrence, evaluated by a
  single ``lax.scan`` over ops with scalar state.

Coordinates: the cigar is already in contig-reverse orientation; ``ref_pos`` is
the alignment start relative to ``ref_win`` (a window of the reverse-complement
contig sequence), and ``win_base`` is the window's absolute offset on the
reversed contig (needed for the reference's absolute edge limit,
indel_breakend_homology.rs:33).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from portello_tpu.kernels.cigar_kernels import (
    D,
    I,
    M,
    PAD,
    cleanup_and_compress,
    is_align_match,
)
from portello_tpu.kernels.cluster_utils import find_clusters, match_run_right


def _left_shift_single(
    codes, lens, ref_pos, win_base, ref_win, read_seq,
    *, max_clusters, window, max_out,
):
    n = codes.shape[0]
    cl = find_clusters(codes, lens, ref_pos, max_clusters)
    dl = cl["del_len"]
    il = cl["ins_len"]
    bs = cl["ref_start"]       # window-relative
    rs = cl["read_start"]

    # Leftward homology run (indel_breakend_homology.rs:33-47): compare the
    # suffixes ending at the indel's ref/read end, limited by the absolute
    # distance to either sequence start.
    max_left = jnp.minimum(win_base + bs, rs)
    h_run, sat = match_run_right(ref_win, bs + dl, read_seq, rs + il, max_left, window)
    has_indel = (dl + il) > 0
    h_cap = jnp.minimum(h_run, max_left)

    valid = codes != PAD
    is_indel = ((codes == I) | (codes == D)) & valid
    is_m = is_align_match(codes) & valid
    is_other = valid & ~is_indel & ~is_m
    cend = cl["cluster_end"]
    cid = jnp.clip(cl["cluster_id"], 0, max_clusters - 1)

    # Sequential match-block recurrence (cigar_indel_shifter.rs:101-148):
    # pending = match run accumulated since the last flush; at each cluster end
    # shift s = min(homology cap, pending) splits the run around the indel.
    def step(carry, xs):
        pending, fallback = carry
        code, ln, m_op, indel_end, other, c = xs
        cap = h_cap[c]
        s = jnp.minimum(cap, pending)
        # homology window saturated AND the true budget could exceed it
        fb = sat[c] & has_indel[c] & (jnp.minimum(max_left[c], pending) > window)
        e_codes = jnp.where(
            indel_end,
            jnp.array([M, I, D], dtype=codes.dtype),
            jnp.where(
                other,
                jnp.array([M, 0, PAD], dtype=codes.dtype).at[1].set(code),
                jnp.full(3, PAD, dtype=codes.dtype),
            ),
        )
        e_lens = jnp.where(
            indel_end,
            jnp.stack([pending - s, il[c], dl[c]]),
            jnp.where(
                other,
                jnp.stack([pending, ln, jnp.int32(0)]),
                jnp.zeros(3, dtype=lens.dtype),
            ),
        )
        pending = jnp.where(
            indel_end, s, jnp.where(other, 0, pending + jnp.where(m_op, ln, 0))
        )
        fallback = fallback | (indel_end & fb)
        # The builder pushes only nonzero segments (cigar_indel_shifter.rs:87-99,
        # :133-137); zero-length M would wrongly stop the edge cleanup walk.
        # The "other" op itself (slot 1) is kept even when zero-length.
        drop = (e_lens == 0) & ~(other & (jnp.arange(3) == 1))
        e_codes = jnp.where(drop, PAD, e_codes)
        return (pending, fallback), (e_codes, e_lens)

    (pending, fallback), (e_codes, e_lens) = jax.lax.scan(
        step,
        (jnp.int32(0), jnp.bool_(False)),
        (codes, lens, is_m, cend, is_other, cid),
    )

    # Final flush of the trailing match run (cigar_indel_shifter.rs:155-160);
    # pushed only when nonzero.
    tail_code = jnp.where(pending > 0, M, PAD).astype(codes.dtype)
    flat_codes = jnp.concatenate([e_codes.reshape(-1), tail_code[None]])
    flat_lens = jnp.concatenate([e_lens.reshape(-1), pending[None]])

    f_codes, f_lens, n_out, shift, c_overflow = cleanup_and_compress(
        flat_codes, flat_lens, max_out
    )
    fallback = fallback | cl["overflow"] | c_overflow
    return f_codes, f_lens, n_out, ref_pos + shift, fallback


@partial(jax.jit, static_argnames=("max_clusters", "window", "max_out"))
def left_shift_batch(
    codes, lens, ref_pos, win_base, ref_win, read_seq,
    *, max_clusters, window, max_out,
):
    """Vectorized left_shift_indels over a batch.

    Returns (codes, lens, n_out, ref_pos, fallback).
    """
    return jax.vmap(
        lambda c, l, p, wb, rw, rq: _left_shift_single(
            c, l, p, wb, rw, rq,
            max_clusters=max_clusters, window=window, max_out=max_out,
        )
    )(codes, lens, ref_pos, win_base, ref_win, read_seq)
