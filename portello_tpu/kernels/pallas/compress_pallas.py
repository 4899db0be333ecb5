"""Pallas TPU kernel: fused clean_up_edge_indels + compress_cigar per item.

The XLA formulation of the finishing pair (cigar_kernels.cleanup_and_compress)
builds a (max_out, K) bf16 segment-sum mask in HBM per item — the two largest
mask materializations in the fwd graph (round-4 decomposition, PERF.md).
Here the whole pass runs per grid step with every intermediate in VMEM:

- edge cleanup: masked per-row reductions (first/last M position) + edits;
- previous-kept-code: the packed (idx<<4|code) running max as log-step
  ``pltpu.roll`` + max chains (the XLA kernel's exact formulation);
- run ids: log-step prefix sum;
- segment sums: per row, the (max_out, K) one-hot built in VMEM and
  contracted on the MXU against byte-plane columns (lens < 2^16 by the
  bucket contract, enforced by a defensive overflow flag) — bit-exact (each
  product <= 255 in bf16, per-run sums < 2^24 in the f32 accumulator).

ROWS=8 items share a grid step (Mosaic requires 8-divisible sublane blocks);
the vector passes run on all 8 rows at once, the mask/dot part is a static
row unroll (match_run_pallas pattern).

Outputs are bit-identical to cigar_kernels.cleanup_and_compress
(tests/test_pallas_compress.py: randomized + edge cases + overflow flags).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from portello_tpu.kernels.cigar_kernels import D, I, PAD, S, is_align_match

ROWS = 8


def _kernel(codes_ref, lens_ref, out_codes_ref, out_lens_ref, n_out_ref,
            shift_ref, ovf_ref, *, max_out: int, k: int):
    codes = codes_ref[:].astype(jnp.int32)      # (ROWS, K)
    lens = lens_ref[:].astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, k), 1)

    # ---- clean_up_edge_indels (all rows at once) ----
    valid = codes != PAD
    am = is_align_match(codes) & valid
    first = jnp.min(jnp.where(am, idx, jnp.int32(k)), axis=1, keepdims=True)
    last = jnp.max(jnp.where(am, idx, jnp.int32(-1)), axis=1, keepdims=True)
    lead = idx < first
    trail = idx > last
    edge = (lead | trail) & valid
    is_del = edge & (codes == D)
    is_ins = edge & (codes == I)
    shift = jnp.sum(
        jnp.where(lead & (codes == D) & valid, lens, 0), axis=1, keepdims=True
    )
    codes = jnp.where(is_del | is_ins, S, codes)
    lens = jnp.where(is_del, 0, lens)

    # ---- compress: run structure (lane rolls act per row) ----
    keep = (codes != PAD) & (lens != 0)
    packed = jnp.where(keep, (idx << 4) | codes, jnp.int32(-1))
    cm = packed
    s = 1
    while s < k:
        sh = jnp.where(idx >= s, pltpu.roll(cm, s, axis=1), jnp.int32(-1))
        cm = jnp.maximum(cm, sh)
        s *= 2
    prev = jnp.where(idx >= 1, pltpu.roll(cm, 1, axis=1), jnp.int32(-1))
    prev_code = jnp.where(prev >= 0, prev & 0xF, jnp.int32(-1))
    new_run = keep & (prev_code != codes)
    n_runs = jnp.sum(new_run.astype(jnp.int32), axis=1, keepdims=True)
    cs = new_run.astype(jnp.int32)
    s = 1
    while s < k:
        cs = cs + jnp.where(idx >= s, pltpu.roll(cs, s, axis=1), 0)
        s *= 2
    rid = cs - 1

    lens_kept = jnp.where(keep, lens, 0)
    # int32 throughout: Mosaic can only scalarize 32-bit elements
    plane_ovf = jnp.max(
        (keep & (lens_kept >= (1 << 16))).astype(jnp.int32),
        axis=1, keepdims=True,
    )
    code_gate = jnp.where(new_run, codes, 0)

    # ---- per-row segment sums on the MXU ----
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (max_out, k), 0)
    rv = jax.lax.broadcasted_iota(jnp.int32, (max_out, 1), 0)
    for r in range(ROWS):
        mask = ((rid[r : r + 1, :] == r_iota) & keep[r : r + 1, :]).astype(
            jnp.bfloat16
        )                                                   # (R, K)
        lk = lens_kept[r : r + 1, :]
        table = jnp.concatenate(
            [
                (lk & 0xFF).reshape(k, 1),
                ((lk >> 8) & 0xFF).reshape(k, 1),
                code_gate[r : r + 1, :].reshape(k, 1),
            ],
            axis=1,
        ).astype(jnp.bfloat16)                              # (K, 3)
        sums = jax.lax.dot_general(
            mask, table, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                                 # (R, 3)
        nr = n_runs[r, 0]
        out_valid = rv < jnp.minimum(nr, max_out)
        o_lens = jnp.where(out_valid, sums[:, 0:1] + (sums[:, 1:2] << 8), 0)
        o_codes = jnp.where(out_valid, sums[:, 2:3], PAD)
        out_codes_ref[r, :] = o_codes.reshape(1, max_out)[0, :]
        out_lens_ref[r, :] = o_lens.reshape(1, max_out)[0, :]
        n_out_ref[r, 0] = jnp.minimum(nr, max_out)
        shift_ref[r, 0] = shift[r, 0]
        ovf_ref[r, 0] = jnp.maximum(
            jnp.where(nr > max_out, jnp.int32(1), jnp.int32(0)),
            plane_ovf[r, 0],
        )


@functools.partial(jax.jit, static_argnames=("max_out", "interpret"))
def cleanup_and_compress_batch(codes, lens, max_out: int,
                               interpret: bool = False):
    """Batched fused cleanup+compress: (B, K) int32 in, bit-identical to
    vmapped cigar_kernels.cleanup_and_compress(mm=True); B % 8 == 0.

    Returns (out_codes (B, max_out), out_lens, n_out (B,), shift (B,),
    overflow (B,) bool)."""
    b, k = codes.shape
    if b % ROWS != 0:
        raise ValueError(f"batch {b} must be a multiple of {ROWS}")
    kern = functools.partial(_kernel, max_out=max_out, k=k)
    out_codes, out_lens, n_out, shift, ovf = pl.pallas_call(
        kern,
        grid=(b // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, k), lambda i: (i, 0)),
            pl.BlockSpec((ROWS, k), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, max_out), lambda i: (i, 0)),
            pl.BlockSpec((ROWS, max_out), lambda i: (i, 0)),
            pl.BlockSpec((ROWS, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, max_out), jnp.int32),
            jax.ShapeDtypeStruct((b, max_out), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(codes.astype(jnp.int32), lens.astype(jnp.int32))
    return (
        out_codes, out_lens, n_out[:, 0], shift[:, 0], ovf[:, 0] != 0
    )
