"""Pallas TPU kernel: windowed common-run compare without HBM mask traffic.

The XLA one-hot-matmul window fetch (cluster_utils._window_bytes_mm_t) is
bound by data movement that XLA materializes in HBM: the uint8->bf16
superblock table conversion (the dominant term — measured 3x the remaining
fetch cost, scripts/profile_fetch.py) plus the (C, nsb) one-hot masks.
Here the whole chain — convert, mask build, MXU dot, barrel realign,
compare, run reduction — happens in VMEM; HBM sees only the uint8 tables
and the (C,) outputs.

Per item: two padded byte tables (nsb, 128) for the compared sequences and
per-cluster window starts ia/ib (C, 1).  Outputs, per cluster, the leading
(``run_fwd``) and trailing (``run_rev``) all-equal run lengths of the
W-byte windows a[ia:ia+W] vs b[ib:ib+W] — the primitive behind
``match_run_left`` (leading) and ``match_run_right`` (trailing, with
start = end - W), reference simplify_alignment_indels.rs:54-85 and
indel_breakend_homology.rs:33-47.

Mosaic constraints honored (CLAUDE.md): no dynamic lane slices (mask
matmul + static-slice ladder instead), no scalar VMEM reads (per-cluster
values stay (C, 1) vectors), no rev/dynamic_update_slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

PAD_LO = 128          # front sentinel pad (starts can reach -window)
SB = 128              # superblock width (bytes)


def pad_table(seq, fill: int):
    """(L,) uint8 sequence -> (nsb, 128) uint8 superblock table.

    Layout contract consumed by the kernel: ``PAD_LO`` sentinel bytes in
    front, sentinel tail rounding the total to a multiple of 128 with at
    least 256 spare (the kernel reads superblocks sb and sb+1 for
    sb <= (L + PAD_LO) >> 7).  Different fills for the two compared
    sequences keep out-of-data lanes mismatching.
    """
    length = seq.shape[0]
    pad_hi = 256 + (-length) % SB
    padded = jnp.concatenate(
        [
            jnp.full(PAD_LO, fill, jnp.uint8),
            seq,
            jnp.full(pad_hi, fill, jnp.uint8),
        ]
    )
    return padded.reshape(-1, SB)


ROWS = 8  # items per grid cell (amortizes per-cell overhead)


def _window_match_kernel(ia_ref, ib_ref, a_ref, b_ref, fwd_ref, rev_ref,
                         *, window: int):
    rows, c, _ = ia_ref.shape
    nsb = a_ref.shape[1]

    def fetch(tab, idx):
        p = idx[:, :1] + PAD_LO                          # (C, 1)
        sb = jnp.clip(p >> 7, 0, nsb - 2)
        o = p - (sb << 7)                                # [0, 128)
        j = jax.lax.broadcasted_iota(jnp.int32, (c, nsb - 1), 1)
        # f32 operands: Mosaic has no uint8->bf16 cast, and exactness only
        # needs integers <= 255; the dots are tiny so f32 MXU rate is fine
        mask = (sb == j).astype(jnp.float32)
        tb = tab.astype(jnp.int32).astype(jnp.float32)   # VMEM convert
        lo = jnp.dot(mask, tb[:-1], preferred_element_type=jnp.float32)
        hi = jnp.dot(mask, tb[1:], preferred_element_type=jnp.float32)
        v = jnp.concatenate([lo, hi], axis=1).astype(jnp.int32)  # (C, 256)
        for bit in (64, 32, 16, 8, 4, 2, 1):
            need = window + bit - 1
            v = jnp.where((o & bit) != 0, v[:, bit : bit + need], v[:, :need])
        return v[:, :window]

    t = jax.lax.broadcasted_iota(jnp.int32, (c, window), 1)
    for r in range(rows):                                # static unroll
        wa = fetch(a_ref[r], ia_ref[r])
        wb = fetch(b_ref[r], ib_ref[r])
        eq = wa == wb                                    # (C, W)
        # leading run: first mismatch position (W if none)
        fwd_ref[r] = jnp.min(jnp.where(eq, window, t), axis=1, keepdims=True)
        # trailing run: W - 1 - last mismatch position (W if none)
        rev_ref[r] = window - 1 - jnp.max(
            jnp.where(eq, -1, t), axis=1, keepdims=True
        )


@partial(jax.jit, static_argnames=("window", "interpret"))
def window_match_runs_batch(a_tab, b_tab, ia, ib, *, window: int,
                            interpret: bool = False):
    """Batched window common-run kernel.

    a_tab/b_tab: (B, nsb, 128) uint8 from :func:`pad_table`; ia/ib: (B, C)
    int32 window starts into the UNPADDED sequences (>= -window, <= len).
    B must be a multiple of ROWS (callers pad).  Returns (run_fwd, run_rev),
    each (B, C) int32 in [0, window].
    """
    b, nsb, _ = a_tab.shape
    c = ia.shape[1]
    if b % ROWS:
        raise ValueError(f"batch {b} not a multiple of {ROWS}")
    fwd, rev = pl.pallas_call(
        partial(_window_match_kernel, window=window),
        out_shape=(
            jax.ShapeDtypeStruct((b, c, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, c, 1), jnp.int32),
        ),
        grid=(b // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, c, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((ROWS, c, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((ROWS, nsb, SB), lambda i: (i, 0, 0)),
            pl.BlockSpec((ROWS, nsb, SB), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((ROWS, c, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((ROWS, c, 1), lambda i: (i, 0, 0)),
        ),
        interpret=interpret,
    )(ia.astype(jnp.int32)[:, :, None], ib.astype(jnp.int32)[:, :, None],
      a_tab, b_tab)
    return fwd[:, :, 0], rev[:, :, 0]
