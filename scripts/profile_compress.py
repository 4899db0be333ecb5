"""compress formulations head-to-head at the production stream shapes.

- segsum: current mm form (one segment-sum matmul, mask (max_out, n))
- search: count_lt boundaries + adjacent-diff prefix-table one-hot lookup
          (mask (max_out+1, n+1))

Shapes: n=608 (lift emission), n=464 (simplify emission, old max_out) /
n=320 (new max_out=160), n=257 (shift stage B stream); max_out=160.
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
import portello_tpu.kernels.cigar_kernels as ck  # noqa: E402

B = 512
MAX_OUT = 160
rng = np.random.default_rng(31)


def compress_search(codes, lens, max_out):
    from portello_tpu.kernels.expand import count_lt, expand_mask, onehot_eq

    n = codes.shape[0]
    codes, lens = jax.lax.optimization_barrier((codes, lens))
    keep = (codes != ck.PAD) & (lens != 0)
    idx = jnp.arange(n, dtype=jnp.int32)
    packed = jnp.where(keep, (idx << 4) | codes.astype(jnp.int32), jnp.int32(-1))
    prev_packed = jnp.concatenate(
        [jnp.full(1, -1, jnp.int32), jax.lax.cummax(packed)[:-1]]
    )
    prev_code = jnp.where(prev_packed >= 0, prev_packed & 0xF, jnp.int32(-1))
    new_run = keep & (prev_code != codes.astype(jnp.int32))
    n_runs = jnp.sum(new_run.astype(jnp.int32))
    overflow = n_runs > max_out
    cs_runs = jnp.cumsum(new_run.astype(jnp.int32))
    r = jnp.arange(max_out, dtype=jnp.int32)
    boundary_q = jnp.arange(1, max_out + 2, dtype=jnp.int32)
    sboth = count_lt(cs_runs, boundary_q)
    ps = jnp.concatenate(
        [jnp.zeros(1, lens.dtype), jnp.cumsum(jnp.where(keep, lens, 0))]
    )
    out_valid = r < jnp.minimum(n_runs, max_out)
    table = jnp.stack(
        [ps.astype(jnp.int32),
         jnp.concatenate([codes.astype(jnp.int32), jnp.full(1, ck.PAD, jnp.int32)])],
        axis=1,
    )
    tv2 = expand_mask(onehot_eq(sboth, n + 1), table)
    out_lens = jnp.where(out_valid, tv2[1:, 0] - tv2[:-1, 0], 0)
    out_codes = jnp.where(out_valid, tv2[:-1, 1], ck.PAD)
    return out_codes, out_lens, jnp.minimum(n_runs, max_out), overflow


def make_stream(n):
    codes = rng.integers(0, 3, size=(B, n)).astype(np.int32)
    lens = rng.integers(0, 5, size=(B, n)).astype(np.int32)
    codes[lens == 0] = ck.PAD
    # keep run counts under max_out: zero out most rows
    codes[:, : n - 200] = ck.PAD
    lens[:, : n - 200] = 0
    return codes, lens


def t(name, fn, args, pos_index=0):
    dev = tuple(jax.device_put(np.asarray(a)) for a in args)
    ms = sustained_batch_time(fn, dev, pos_index=pos_index, reps=24) * 1e3
    print(f"{name:30s} {ms:8.3f} ms/batch", flush=True)


# equality check
c8, l8 = make_stream(464)
a = jax.jit(jax.vmap(lambda c, l: ck.compress(c, l, MAX_OUT, True)))(c8[:8], l8[:8])
b = jax.jit(jax.vmap(lambda c, l: compress_search(c, l, MAX_OUT)))(c8[:8], l8[:8])
for x, y in zip(a, b):
    assert np.array_equal(np.asarray(x), np.asarray(y))
print("equality ok", flush=True)

print(f"device={jax.devices()[0]}", file=sys.stderr)
for n in (608, 464, 320, 257):
    codes, lens = make_stream(n)
    t(f"segsum n={n}", lambda c, l: ck.compress(c, l, MAX_OUT, True), (codes, lens), 1)
    t(f"search n={n}", lambda c, l: compress_search(c, l, MAX_OUT), (codes, lens), 1)
