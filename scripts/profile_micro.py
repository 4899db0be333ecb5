"""Micro-timings of the primitive ops used by the cluster kernels."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B, N, C, W, L = 512, 1096, 256, 48, 24576
rng = np.random.default_rng(0)
codes = rng.integers(0, 9, size=(B, N)).astype(np.int32)
lens = rng.integers(0, 50, size=(B, N)).astype(np.int32)
seqs = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
starts = np.sort(rng.integers(0, L - W, size=(B, C)).astype(np.int32), axis=1)
q = np.arange(C, dtype=np.int32)


def bench(name, f, *a, iters=5):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms/batch")


print(f"device={jax.devices()[0]}", file=sys.stderr)

bench("cumsum (B,N)", jax.jit(lambda l: jnp.cumsum(l, axis=1)), lens)
bench("cummax (B,N)", jax.jit(jax.vmap(jax.lax.cummax)), lens)
bench("searchsorted scan (B,N)x(C)", jax.jit(jax.vmap(lambda a: jnp.searchsorted(a, q))), np.sort(lens, axis=1))
bench("searchsorted sort (B,N)x(C)", jax.jit(jax.vmap(lambda a: jnp.searchsorted(a, q, method="sort"))), np.sort(lens, axis=1))
bench("searchsorted cmpall (B,N)x(C)", jax.jit(jax.vmap(lambda a: jnp.searchsorted(a, q, method="compare_all"))), np.sort(lens, axis=1))
bench("gather (B,N)[(B,C)]", jax.jit(jax.vmap(lambda a, i: a[i])), lens, np.clip(starts, 0, N - 1))
bench("gather seq (B,L)[(B,C,W)] u8", jax.jit(jax.vmap(lambda s, st: s[jnp.clip(st[:, None] + jnp.arange(W), 0, L - 1)])), seqs, starts)
bench("gather seq i32 idx-compute", jax.jit(jax.vmap(lambda s, st: s[jnp.clip((st + 1)[:, None] + jnp.arange(W), 0, L - 1)])), seqs, starts)
bench("cumprod (B,C,W)", jax.jit(lambda x: jnp.cumprod(x, axis=-1)), rng.integers(0, 2, size=(B, C, W)).astype(np.int32))
bench("where+stack emission (B,N,4)", jax.jit(lambda c, l: jnp.stack([jnp.where(c > 4, c, 9)] * 4, axis=2).reshape(c.shape[0], -1)), codes, lens)
