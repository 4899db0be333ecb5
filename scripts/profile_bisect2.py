"""Decisive bisection: transfer cost vs compute cost in the simplify path."""

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

from portello_tpu.kernels.cluster_utils import match_run_left, match_run_right  # noqa: E402

B, N, C, W, L = 512, 1096, 256, 48, 24576
rng = np.random.default_rng(0)
codes = rng.integers(0, 9, size=(B, N)).astype(np.int32)
lens_ = rng.integers(0, 50, size=(B, N)).astype(np.int32)
ref_win = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
read_seq = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
bs = np.sort(rng.integers(0, 20000, size=(B, C)).astype(np.int32), axis=1)
dl = rng.integers(0, 5, size=(B, C)).astype(np.int32)
il = rng.integers(0, 5, size=(B, C)).astype(np.int32)
rs = np.sort(rng.integers(0, 20000, size=(B, C)).astype(np.int32), axis=1)


def bench(name, f, *a, iters=5):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms/batch")


print(f"device={jax.devices()[0]}", file=sys.stderr)

# 1. pure transfer of the big operands (trivial compute)
bench(
    "transfer-only (26MB)",
    jax.jit(lambda a, b, c, d: (a[0, 0] + b[0, 0], c[0, 0] + d[0, 0])),
    ref_win, read_seq, codes, lens_,
)

# 2. pre-commit arrays to device, then run match_runs (no host transfer)
dev = jax.devices()[0]
d_ref = jax.device_put(ref_win, dev)
d_read = jax.device_put(read_seq, dev)
d_bs, d_dl, d_il, d_rs = (jax.device_put(x, dev) for x in (bs, dl, il, rs))


def runs(rw, rq, bs_, dl_, il_, rs_):
    m0 = jnp.minimum(dl_, il_)
    post, s1 = match_run_right(rw, bs_ + dl_, rq, rs_ + il_, m0, W)
    m1 = jnp.minimum(dl_ - post, il_ - post)
    pre, s2 = match_run_left(rw, bs_, rq, rs_, m1, W)
    return post, pre, s1, s2


f_runs = jax.jit(jax.vmap(runs))
bench("match_runs (host args)", f_runs, ref_win, read_seq, bs, dl, il, rs)
bench("match_runs (device args)", f_runs, d_ref, d_read, d_bs, d_dl, d_il, d_rs)
