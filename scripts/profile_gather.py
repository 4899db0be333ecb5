"""Microbenchmark: window-gather strategies for the cluster compare kernels.

Compares per-(read, cluster) window extraction approaches on the device:
  fancy    - elementwise index gather (current kernels)
  dslice   - vmapped contiguous dynamic_slice per cluster
  dslice32 - dynamic_slice over an int32 view + byte unpack (aligned loads)
  onehot   - windows via one-hot matmul (MXU-friendly)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B = int(os.environ.get("PROF_BATCH", "512"))
C = 160   # clusters
W = 48    # window
L = 24576

rng = np.random.default_rng(0)
seqs = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
starts = rng.integers(0, L - 2 * W, size=(B, C), dtype=np.int32)


def bench(name, f, *a, iters=5):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:12s} {dt*1e3:9.2f} ms/batch")
    return np.asarray(out)


def fancy(seq, st):
    t = jnp.arange(W, dtype=jnp.int32)[None, :]
    ia = jnp.clip(st[:, None] + t, 0, L - 1)
    return seq[ia]


def dslice(seq, st):
    return jax.vmap(lambda s: jax.lax.dynamic_slice(seq, (s,), (W,)))(st)


def dslice32(seq, st):
    w32 = seq.view(jnp.int32) if hasattr(seq, "view") else seq
    words = jnp.asarray(seq).view(jnp.uint32)
    nw = W // 4 + 1

    def one(s):
        word_start = s // 4
        sl = jax.lax.dynamic_slice(words, (word_start,), (nw,))
        by = jnp.stack(
            [sl & 0xFF, (sl >> 8) & 0xFF, (sl >> 16) & 0xFF, (sl >> 24) & 0xFF],
            axis=1,
        ).reshape(-1).astype(jnp.uint8)
        return jax.lax.dynamic_slice(by, (s % 4,), (W,))

    return jax.vmap(one)(st)


f_fancy = jax.jit(jax.vmap(fancy))
f_dslice = jax.jit(jax.vmap(dslice))
f_dslice32 = jax.jit(jax.vmap(dslice32))

print(f"device={jax.devices()[0]} B={B} C={C} W={W}", file=sys.stderr)
o1 = bench("fancy", f_fancy, seqs, starts)
o2 = bench("dslice", f_dslice, seqs, starts)
o3 = bench("dslice32", f_dslice32, seqs, starts)
assert (o1 == o2).all() and (o1 == o3).all()
print("results identical")
