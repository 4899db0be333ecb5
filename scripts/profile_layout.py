"""Honest micro-profiling of layout/algorithm choices for the hot primitives:
cumsum axis, gather styles, searchsorted methods."""

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

B, N, C = 512, 1216, 456
REPS = int(os.environ.get("PROF_REPS", "64"))
rng = np.random.default_rng(0)
dev = jax.devices()[0]
x = jax.device_put(rng.integers(0, 50, size=(B, N)).astype(np.int32), dev)
xt = jax.device_put(rng.integers(0, 50, size=(N, B)).astype(np.int32), dev)
sorted_rows = jax.device_put(np.sort(rng.integers(0, 10000, size=(B, N)).astype(np.int32), axis=1), dev)
q = jax.device_put(np.sort(rng.integers(0, 10000, size=(B, C)).astype(np.int32), axis=1), dev)
idx = jax.device_put(rng.integers(0, N, size=(B, C)).astype(np.int32), dev)

print(f"device={dev} reps={REPS}", file=sys.stderr)


def timeit(name, fn, *args):
    def make(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                a2 = list(a)
                a2[0] = a2[0] + (acc & 1).astype(a2[0].dtype)
                out = fn(*a2)
                return jnp.sum(out).astype(jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return run

    lo, hi = max(REPS // 4, 1), REPS
    f_lo, f_hi = make(lo), make(hi)
    int(f_lo(*args)); int(f_hi(*args))
    t_lo = min((lambda t0=time.perf_counter(): (int(f_lo(*args)), time.perf_counter()-t0)[1])() for _ in range(3))
    t_hi = min((lambda t0=time.perf_counter(): (int(f_hi(*args)), time.perf_counter()-t0)[1])() for _ in range(3))
    per = max(t_hi - t_lo, 1e-9) / (hi - lo)
    print(f"{name:36s} {per*1e3:9.3f} ms", flush=True)


timeit("cumsum lanes (B,N) ax1", lambda a: jnp.cumsum(a, axis=1), x)
timeit("cumsum sublanes (N,B) ax0", lambda a: jnp.cumsum(a, axis=0), xt)
timeit("cummax lanes (B,N) ax1", lambda a: jax.vmap(jax.lax.cummax)(a), x)
timeit("cummax sublanes (N,B) ax0", lambda a: jax.lax.cummax(a, axis=0), xt)
timeit("gather rowwise (B,N)[(B,C)]", lambda a: jnp.take_along_axis(a, idx, axis=1), x)
timeit("searchsorted scan", lambda a: jax.vmap(lambda r, qq: jnp.searchsorted(r, qq))(a, q), sorted_rows)
timeit("searchsorted sort", lambda a: jax.vmap(lambda r, qq: jnp.searchsorted(r, qq, method='sort'))(a, q), sorted_rows)
timeit("elementwise 10x (B,N)", lambda a: ((a * 3 + 1) ^ (a >> 2)) + ((a * 5) & 127) * ((a + 7) % 13), x)
