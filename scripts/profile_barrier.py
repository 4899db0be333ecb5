"""Test: does an optimization_barrier between cluster stats and window
gathers fix the fused-gather slowdown?"""

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

from portello_tpu.kernels.cluster_utils import (  # noqa: E402
    find_clusters, match_run_left, match_run_right,
)

B, N, MC, WIN, L = 512, 456, 160, 48, 24576
rng = np.random.default_rng(0)
codes = rng.integers(0, 9, size=(B, N)).astype(np.int32)
lens_ = rng.integers(1, 50, size=(B, N)).astype(np.int32)
ref_win = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
read_seq = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
dev = jax.devices()[0]
args = [jax.device_put(x, dev) for x in (codes, lens_, np.zeros(B, np.int32), ref_win, read_seq)]

print(f"device={dev}", file=sys.stderr)


def bench(name, f, *a, iters=5):
    t0 = time.perf_counter()
    out = f(*a)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        jax.block_until_ready(out)
    print(f"{name:26s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms (compile {comp:.1f}s)", flush=True)


def runs(c, l, p, rw, rq, barrier):
    cl = find_clusters(c, l, p, MC)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    if barrier:
        dl, il, bs, rs = jax.lax.optimization_barrier((dl, il, bs, rs))
    m0 = jnp.minimum(dl, il)
    post, _ = match_run_right(rw, bs + dl, rq, rs + il, m0, WIN)
    m1 = jnp.minimum(dl - post, il - post)
    pre, _ = match_run_left(rw, bs, rq, rs, m1, WIN)
    return post + pre


bench("no barrier", jax.jit(jax.vmap(lambda *a: runs(*a, barrier=False))), *args)
bench("barrier", jax.jit(jax.vmap(lambda *a: runs(*a, barrier=True))), *args)
