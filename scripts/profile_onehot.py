"""Profile: one-hot-matmul gather + compare-count searchsorted vs the
current take_along_axis / searchsorted(sort) formulations, at the exact
shapes of the HIFI bucket fwd pipeline (B=512, max_ops=256, max_blocks=96,
U=608, n_compress=1216, max_out=456).

Uses the honest sustained protocol from bench.py (in-jit reps + fetch +
rep-count differencing) because naive wall timing lies through the relay.
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

B = 512
K_OPS, K_BLK = 256, 96
U = 2 * K_OPS + K_BLK          # 608
N_CMP = 2 * U                  # 1216 compress input
MAX_OUT = K_OPS + 2 * K_BLK + 8  # 456

rng = np.random.default_rng(7)

# op-expansion inputs: visits per op summing near U, interval offsets
visits = rng.integers(0, 4, size=(B, K_OPS)).astype(np.int32)
off = np.cumsum(visits, axis=1) - visits
op_table = rng.integers(0, 2**24, size=(B, K_OPS, 8)).astype(np.int32)
op_of = np.minimum(
    np.searchsorted(off[0] + visits[0], np.arange(U), side="right"), K_OPS - 1
).astype(np.int32)
op_of_b = np.broadcast_to(op_of, (B, U)).copy()

bkv = rng.integers(0, 2**28, size=(B, K_BLK, 2)).astype(np.int32)
this_idx = np.sort(rng.integers(0, K_BLK, size=(B, U)).astype(np.int32), axis=1)

bk = np.sort(rng.integers(0, 2**24, size=(B, K_BLK)).astype(np.int32), axis=1)
squery = np.sort(rng.integers(0, 2**24, size=(B, K_OPS)).astype(np.int32), axis=1)

prev_idx = np.sort(rng.integers(0, U, size=(B, U)).astype(np.int32), axis=1)
end2 = rng.integers(0, 2**28, size=(B, U)).astype(np.int32)

cs_runs = np.sort(rng.integers(0, MAX_OUT, size=(B, N_CMP)).astype(np.int32), axis=1)
cmp_table = rng.integers(0, 2**28, size=(B, N_CMP + 1, 2)).astype(np.int32)


def split8(t):
    """int32 (K, C) -> float32 (K, 4C) byte planes (exact in bf16 products)."""
    u = t.astype(jnp.uint32)
    return jnp.concatenate(
        [((u >> (8 * i)) & 0xFF).astype(jnp.float32) for i in range(4)], axis=1
    )


def join8(f, c):
    """float32 (R, 4C) byte planes -> int32 (R, C)."""
    u = f.astype(jnp.uint32)
    out = u[:, :c]
    for i in range(1, 4):
        out = out | (u[:, i * c : (i + 1) * c] << (8 * i))
    return out.astype(jnp.int32)


def mm_expand(mask_f32, table_i32):
    c = table_i32.shape[1]
    planes = split8(table_i32)
    out = jax.lax.dot(mask_f32, planes, precision=jax.lax.Precision.DEFAULT)
    return join8(out, c)


# --- variants (single-item fns, vmapped by the harness) ---

def base_gather_op(op_of, table):
    return jnp.take_along_axis(table, op_of[:, None], axis=0)


def mm_gather_op_interval(off, visits, table):
    r = jnp.arange(U, dtype=jnp.int32)[:, None]
    mask = ((r >= off[None, :]) & (r < (off + visits)[None, :])).astype(jnp.float32)
    return mm_expand(mask, table)


def base_gather_bkv(idx, bkv):
    both = jnp.take_along_axis(
        bkv, jnp.concatenate([idx, jnp.maximum(idx - 1, 0)])[:, None], axis=0
    )
    return both


def mm_gather_bkv(idx, bkv):
    k = jnp.arange(K_BLK, dtype=jnp.int32)[None, :]
    m_this = (idx[:, None] == k).astype(jnp.float32)
    m_last = (jnp.maximum(idx - 1, 0)[:, None] == k).astype(jnp.float32)
    return mm_expand(m_this, bkv), mm_expand(m_last, bkv)


def base_ss(bk, q):
    lo = jnp.searchsorted(bk, q, side="right", method="sort").astype(jnp.int32)
    hi = jnp.searchsorted(bk, q, side="left", method="sort").astype(jnp.int32)
    return lo, hi


def cnt_ss(bk, q):
    le = q[:, None] >= bk[None, :]
    lt = q[:, None] > bk[None, :]
    return (
        jnp.sum(le, axis=1, dtype=jnp.int32),
        jnp.sum(lt, axis=1, dtype=jnp.int32),
    )


def base_prev(idx, end2):
    return end2[idx]


def mm_prev(idx, end2):
    j = jnp.arange(U, dtype=jnp.int32)[None, :]
    mask = (idx[:, None] == j).astype(jnp.float32)
    return mm_expand(mask, end2[:, None])[:, 0]


def base_compress(cs, table):
    q = jnp.arange(1, MAX_OUT + 2, dtype=jnp.int32)
    sboth = jnp.searchsorted(cs, q, side="left", method="sort").astype(jnp.int32)
    starts, nxt = sboth[:-1], sboth[1:]
    tv = jnp.take_along_axis(table, jnp.concatenate([starts, nxt])[:, None], axis=0)
    return tv


def mm_compress(cs, table):
    q = jnp.arange(1, MAX_OUT + 2, dtype=jnp.int32)
    sboth = jnp.sum(q[:, None] > cs[None, :], axis=1, dtype=jnp.int32)
    starts, nxt = sboth[:-1], sboth[1:]
    j = jnp.arange(N_CMP + 1, dtype=jnp.int32)[None, :]
    mask = (jnp.concatenate([starts, nxt])[:, None] == j).astype(jnp.float32)
    return mm_expand(mask, table)


def t(name, fn, args, pos_index=0, reps=24):
    dev = tuple(jax.device_put(np.asarray(a)) for a in args)
    ms = sustained_batch_time(fn, dev, reps, pos_index) * 1e3
    print(f"{name:32s} {ms:9.3f} ms/batch", flush=True)
    return ms


print(f"device={jax.devices()[0]}", file=sys.stderr)

t("gather op   take_along", base_gather_op, (op_of_b, op_table))
t("gather op   onehot-mm", mm_gather_op_interval, (off, visits, op_table))
t("gather bkv  take_along", base_gather_bkv, (this_idx, bkv))
t("gather bkv  onehot-mm", mm_gather_bkv, (this_idx, bkv))
t("searchsorted sort x2", base_ss, (bk, squery))
t("searchsorted count x2", cnt_ss, (bk, squery))
t("prev gather take_along", base_prev, (prev_idx, end2))
t("prev gather onehot-mm", mm_prev, (prev_idx, end2))
t("compress    ss+gather", base_compress, (cs_runs, cmp_table))
t("compress    count+mm", mm_compress, (cs_runs, cmp_table))
