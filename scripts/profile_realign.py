"""Realign-variant shootout for the transposed window fetch.

The T fetch's cost is dominated by the 6-stage byte barrel (unaligned sublane
slices) and lane waste (C=48/96 of 128).  Variants measured at production
shapes (C lanes per call, W=48, L=24576):

- t_cur: current _window_bytes_mm_t (shared-mask two dots + byte barrel)
- t_pair: single pair-table dot (M=128) + same barrel
- t_pairmm: pair dot + matmul-shift barrel (banded {0,1} dot per stage
  instead of unaligned sublane slices)
- t_fuse2: both sequences in ONE block-diagonal dot + ONE barrel over
  concatenated lanes (halves barrel invocations)

All variants are checked bit-equal to the current fetch on the same inputs
before timing.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import sustained_batch_time  # noqa: E402
from portello_tpu.kernels.cluster_utils import _window_bytes_mm_t  # noqa: E402

B, C, W, L = 512, 96, 48, 24576
rng = np.random.default_rng(11)
seq = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
seq2 = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
start = np.sort(rng.integers(-W, L - 64, size=(B, C)).astype(np.int32), axis=1)
start2 = np.sort(rng.integers(-W, L - 64, size=(B, C)).astype(np.int32), axis=1)


def _table(seq, fill):
    length = seq.shape[0]
    pad_lo = 64
    pad_hi = 192 + (-length) % 64
    padded = jnp.concatenate(
        [
            jnp.full(pad_lo, fill, jnp.uint8),
            seq,
            jnp.full(pad_hi, fill, jnp.uint8),
        ]
    )
    return padded.reshape(-1, 64)


def _barrel(span, o, window):
    w = span
    for bit in (32, 16, 8, 4, 2, 1):
        need = window + bit - 1
        w = jnp.where(((o & bit) != 0)[None, :], w[bit : bit + need], w[:need])
    return w[:window]


def _pair_span(table, start, window):
    """(128, C) superblock-pair span via ONE dot on the (nsb-1, 128) pair
    table (rows 64.. of superblock k are rows 0..63 of k+1)."""
    nsb = table.shape[0]
    pair = jnp.concatenate([table[:-1], table[1:]], axis=1)  # (nsb-1, 128)
    p = start + 64
    sb = jnp.clip(p >> 6, 0, nsb - 2)
    o = p - (sb << 6)
    maskT = (
        jnp.arange(nsb - 1, dtype=jnp.int32)[:, None] == sb[None, :]
    ).astype(jnp.bfloat16)
    span = jax.lax.dot_general(
        pair.astype(jnp.bfloat16), maskT,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8)  # (128, C)
    return span, o


def t_pair(seq, start):
    span, o = _pair_span(_table(seq, 0xFE), start, W)
    return _barrel(span, o, W)


def _shift_mat(need_out, bit):
    m = np.zeros((need_out, need_out + bit), np.float32)
    m[np.arange(need_out), np.arange(need_out) + bit] = 1.0
    return jnp.asarray(m, jnp.bfloat16)


def _barrel_mm(span, o, window):
    sizes = [window]
    for bit in (1, 2, 4, 8, 16, 32):
        sizes.append(sizes[-1] + bit)
    # sizes = [48, 49, 51, 55, 63, 79, 111]
    w = span[: sizes[-1]].astype(jnp.bfloat16)
    for i, bit in enumerate((32, 16, 8, 4, 2, 1)):
        need = sizes[-2 - i]
        shifted = jax.lax.dot_general(
            _shift_mat(need, bit), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        w = jnp.where(((o & bit) != 0)[None, :], shifted, w[:need])
    return w[:window].astype(jnp.uint8)


def t_pairmm(seq, start):
    span, o = _pair_span(_table(seq, 0xFE), start, W)
    return _barrel_mm(span, o, W)


def t_fuse2(seq_a, sa, seq_b, sb_):
    ta = _table(seq_a, 0xFE)
    tb = _table(seq_b, 0xFD)
    na, nb = ta.shape[0], tb.shape[0]
    pair = jnp.concatenate(
        [
            jnp.concatenate([ta[:-1], ta[1:]], axis=1),
            jnp.concatenate([tb[:-1], tb[1:]], axis=1),
        ],
        axis=0,
    )  # (na-1 + nb-1, 128)
    pa = sa + 64
    pb = sb_ + 64
    ra = jnp.clip(pa >> 6, 0, na - 2)
    rb = jnp.clip(pb >> 6, 0, nb - 2)
    o = jnp.concatenate([pa - (ra << 6), pb - (rb << 6)])
    rows = jnp.concatenate([ra, rb + (na - 1)])
    k = pair.shape[0]
    maskT = (
        jnp.arange(k, dtype=jnp.int32)[:, None] == rows[None, :]
    ).astype(jnp.bfloat16)
    span = jax.lax.dot_general(
        pair.astype(jnp.bfloat16), maskT,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8)  # (128, 2C)
    w = _barrel(span, o, W)
    return w[:, :C], w[:, C:]


# -- correctness vs current fetch (small CPU-friendly check on device) -----
wa_ref = jax.jit(jax.vmap(lambda s, st: _window_bytes_mm_t(s, st, W, 0xFE)))(
    seq[:8], start[:8]
)
wb_ref = jax.jit(jax.vmap(lambda s, st: _window_bytes_mm_t(s, st, W, 0xFD)))(
    seq2[:8], start2[:8]
)
for name, fn in (("t_pair", t_pair), ("t_pairmm", t_pairmm)):
    got = jax.jit(jax.vmap(fn))(seq[:8], start[:8])
    assert np.array_equal(np.asarray(got), np.asarray(wa_ref)), name
ga, gb = jax.jit(jax.vmap(t_fuse2))(seq[:8], start[:8], seq2[:8], start2[:8])
assert np.array_equal(np.asarray(ga), np.asarray(wa_ref)), "t_fuse2 a"
assert np.array_equal(np.asarray(gb), np.asarray(wb_ref)), "t_fuse2 b"
print("equality checks passed", flush=True)


def t(name, fn, args, pos_index=0, reps=24):
    dev = tuple(jax.device_put(np.asarray(a)) for a in args)
    ms = sustained_batch_time(fn, dev, reps, pos_index) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)

t("t_cur x2 (two fetch calls)",
  lambda s1, st1, s2, st2: (
      _window_bytes_mm_t(s1, st1, W, 0xFE), _window_bytes_mm_t(s2, st2, W, 0xFD)
  ),
  (seq, start, seq2, start2), 1)
t("t_pair x2", lambda s1, st1, s2, st2: (t_pair(s1, st1), t_pair(s2, st2)),
  (seq, start, seq2, start2), 1)
t("t_pairmm x2", lambda s1, st1, s2, st2: (t_pairmm(s1, st1), t_pairmm(s2, st2)),
  (seq, start, seq2, start2), 1)
t("t_fuse2 (one call)", t_fuse2, (seq, start, seq2, start2), 1)
