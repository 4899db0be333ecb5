"""Batched indel left-shift kernel (for reads on reverse-mapped contigs).

TPU-native reformulation of left_shift_indels
(reference shift_indels/left_shift_indels.rs:17-39 + cigar_indel_shifter.rs:10-165):

- per-cluster homology lengths come from one bounded-window vectorized suffix
  compare (replacing get_indel_breakend_homology_info's base loop,
  indel_breakend_homology.rs:33-47);
- the builder's sequential match-block accounting — each cluster moves
  ``shift`` matched bases from before it to after it, so cluster i+1's budget
  depends on cluster i's shift — is a **min-plus affine recurrence**
  ``p' = min(b, a + p)``, which composes associatively:
  ``(a1,b1)∘(a2,b2) = (a1+a2, min(b2, a2+b1))``.  One
  ``jax.lax.associative_scan`` (log-depth, fully parallel) replaces the
  per-op sequential scan.  Per-op transforms: match op ``(len, +inf)``
  (accumulate), cluster end ``(0, homology_cap)`` (clamp), other op ``(0, 0)``
  (flush/reset), everything else identity.

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

_INF = jnp.int32(jnp.iinfo(jnp.int32).max // 2)


def _minplus_combine(x, y):
    """Compose affine-min transforms applied left-to-right: y after x."""
    ax, bx = x
    ay, by = y
    return ax + ay, jnp.minimum(by, ay + bx)


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
    cap_at_op = h_cap[cid]

    # Per-op min-plus transforms (see module docstring).
    a = jnp.where(is_m, lens, 0)
    b = jnp.where(cend, cap_at_op, jnp.where(is_other, 0, _INF))

    # Exclusive composite: pending BEFORE each op, starting from p0 = 0.
    a_ext = jnp.concatenate([jnp.zeros(1, jnp.int32), a.astype(jnp.int32)])
    b_ext = jnp.concatenate([_INF[None], b.astype(jnp.int32)])
    A, B = jax.lax.associative_scan(_minplus_combine, (a_ext, b_ext))
    pending_before = jnp.minimum(A[:n], B[:n])
    pending_final = jnp.minimum(A[n], B[n])

    # Emissions: at a cluster end, split the preceding match run around the
    # shifted indel (nImD order, cigar_indel_shifter.rs:140-147); at an
    # "other" op, flush the match run then copy the op.
    s = jnp.minimum(cap_at_op, pending_before)
    e_codes = jnp.stack(
        [
            jnp.where(cend | is_other, M, PAD),
            jnp.where(cend, I, jnp.where(is_other, codes, PAD)),
            jnp.where(cend, D, PAD),
        ],
        axis=1,
    )
    e_lens = jnp.stack(
        [
            jnp.where(cend, pending_before - s, jnp.where(is_other, pending_before, 0)),
            jnp.where(cend, il[cid], jnp.where(is_other, lens, 0)),
            jnp.where(cend, dl[cid], 0),
        ],
        axis=1,
    )
    # The builder pushes only nonzero segments (cigar_indel_shifter.rs:87-99,
    # :133-137); zero-length M would wrongly stop the edge cleanup walk.  The
    # "other" op itself (slot 1) is kept even when zero-length.
    keep_zero = is_other[:, None] & (jnp.arange(3) == 1)[None, :]
    e_codes = jnp.where((e_lens == 0) & ~keep_zero, PAD, e_codes)

    # Fallback: homology window saturated AND the true budget could exceed it.
    fb = cend & sat[cid] & has_indel[cid] & (
        jnp.minimum(max_left[cid], pending_before) > window
    )
    fallback = jnp.any(fb) | cl["overflow"]

    # Final flush of the trailing match run (cigar_indel_shifter.rs:155-160);
    # pushed only when nonzero.
    tail_code = jnp.where(pending_final > 0, M, PAD).astype(codes.dtype)
    flat_codes = jnp.concatenate([e_codes.reshape(-1), tail_code[None]])
    flat_lens = jnp.concatenate([e_lens.reshape(-1), pending_final[None]])

    f_codes, f_lens, n_out, shift, c_overflow = cleanup_and_compress(
        flat_codes, flat_lens, max_out
    )
    fallback = fallback | c_overflow
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
