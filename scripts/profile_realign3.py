"""Window-fetch dot variants: raise MXU utilization of the span dots.

Within-run comparisons at simplify's production shape (C=48 lanes per
sequence, K=387 superblocks, W=48); all variants bit-checked against the
current fetch before timing.

- cur:   2 calls x 2 dots (64, K) @ (K, 48)       [baseline]
- pairdot: 2 calls x 1 dot, pair table (K, 128) contracted on dim 0
- bstack: one einsum, both sequences stacked on a leading dim
          (batch 2x of (K,128)x(K,48) pair dots)
- fuse2: one block-diagonal dot (K=2K', N=96)     [recheck in-context]
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

B, C, W, L = 512, 48, 48, 24576
FA, FB = 0xFE, 0xFD
rng = np.random.default_rng(17)
seq_a = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
seq_b = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
sa = np.sort(rng.integers(-W, L - 64, size=(B, C)).astype(np.int32), axis=1)
sb = np.sort(rng.integers(-W, L - 64, size=(B, C)).astype(np.int32), axis=1)


def _pair_table(seq, fill):
    length = seq.shape[0]
    padded = jnp.concatenate(
        [jnp.full(64, fill, jnp.uint8), seq,
         jnp.full(192 + (-length) % 64, fill, jnp.uint8)]
    )
    table = padded.reshape(-1, 64)
    return jnp.concatenate([table[:-1], table[1:]], axis=1)  # (nsb-1, 128)


def _offsets(start, nsb1):
    p = start + 64
    r = jnp.clip(p >> 6, 0, nsb1 - 1)
    return r, p - (r << 6)


def _barrel(span, o, window):
    w = span
    for bit in (32, 16, 8, 4, 2, 1):
        need = window + bit - 1
        w = jnp.where(((o & bit) != 0)[None, :], w[bit : bit + need], w[:need])
    return w[:window]


def v_cur(qa, ra, qb, rb):
    return (
        _window_bytes_mm_t(qa, ra, W, FA),
        _window_bytes_mm_t(qb, rb, W, FB),
    )


def _pairdot_one(seq, start, fill):
    pair = _pair_table(seq, fill)
    nsb1 = pair.shape[0]
    r, o = _offsets(start, nsb1)
    mask = (
        jnp.arange(nsb1, dtype=jnp.int32)[:, None] == r[None, :]
    ).astype(jnp.bfloat16)
    span = jax.lax.dot_general(
        pair.astype(jnp.bfloat16), mask, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8)  # (128, C)
    return _barrel(span, o, W)


def v_pairdot(qa, ra, qb, rb):
    return _pairdot_one(qa, ra, FA), _pairdot_one(qb, rb, FB)


def v_bstack(qa, ra, qb, rb):
    pa = _pair_table(qa, FA)
    pb = _pair_table(qb, FB)
    nsb1 = pa.shape[0]
    rra, oa = _offsets(ra, nsb1)
    rrb, ob = _offsets(rb, nsb1)
    pair2 = jnp.stack([pa, pb]).astype(jnp.bfloat16)          # (2, K, 128)
    r2 = jnp.stack([rra, rrb])                                 # (2, C)
    mask2 = (
        jnp.arange(nsb1, dtype=jnp.int32)[None, :, None] == r2[:, None, :]
    ).astype(jnp.bfloat16)                                     # (2, K, C)
    span2 = jax.lax.dot_general(
        pair2, mask2, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8)                                        # (2, 128, C)
    wa = _barrel(span2[0], oa, W)
    wb = _barrel(span2[1], ob, W)
    return wa, wb


def v_fuse2(qa, ra, qb, rb):
    pa = _pair_table(qa, FA)
    pb = _pair_table(qb, FB)
    na, nb_ = pa.shape[0], pb.shape[0]
    rra, oa = _offsets(ra, na)
    rrb, ob = _offsets(rb, nb_)
    pair = jnp.concatenate([pa, pb], axis=0)
    rows = jnp.concatenate([rra, rrb + na])
    o = jnp.concatenate([oa, ob])
    mask = (
        jnp.arange(na + nb_, dtype=jnp.int32)[:, None] == rows[None, :]
    ).astype(jnp.bfloat16)
    span = jax.lax.dot_general(
        pair.astype(jnp.bfloat16), mask, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8)
    w = _barrel(span, o, W)
    return w[:, :C], w[:, C:]


# correctness
ref = jax.jit(jax.vmap(v_cur))(seq_a[:8], sa[:8], seq_b[:8], sb[:8])
for name, fn in (("pairdot", v_pairdot), ("bstack", v_bstack), ("fuse2", v_fuse2)):
    got = jax.jit(jax.vmap(fn))(seq_a[:8], sa[:8], seq_b[:8], sb[:8])
    for g, r_ in zip(got, ref):
        assert np.array_equal(np.asarray(g), np.asarray(r_)), name
print("equality checks passed", flush=True)


def t(name, fn, args, pos_index=0, reps=24):
    dev = tuple(jax.device_put(np.asarray(a)) for a in args)
    ms = sustained_batch_time(fn, dev, reps, pos_index) * 1e3
    print(f"{name:26s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)
t("cur (2x2 dots)", v_cur, (seq_a, sa, seq_b, sb), 1)
t("pairdot (2x1 dots)", v_pairdot, (seq_a, sa, seq_b, sb), 1)
t("bstack (1 batched dot)", v_bstack, (seq_a, sa, seq_b, sb), 1)
t("fuse2 (block-diag)", v_fuse2, (seq_a, sa, seq_b, sb), 1)
