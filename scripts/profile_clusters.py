"""A/B/C test of find_clusters implementations on device."""

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

from portello_tpu.kernels.cigar_kernels import D, I, PAD  # noqa: E402

B, N, MC = 512, 456, 160
rng = np.random.default_rng(0)
codes = rng.integers(0, 9, size=(B, N)).astype(np.int32)
lens_ = rng.integers(1, 50, size=(B, N)).astype(np.int32)
dev = jax.devices()[0]
d_codes = jax.device_put(codes, dev)
d_lens = jax.device_put(lens_, dev)

print(f"device={dev}", file=sys.stderr)


def bench(name, f, *a, iters=10):
    t0 = time.perf_counter()
    out = f(*a)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms (compile {comp:.1f}s)")
    return np.asarray(out[0]), np.asarray(out[1])


def common(c):
    valid = c != PAD
    is_indel = ((c == I) | (c == D)) & valid
    prev = jnp.concatenate([jnp.zeros(1, bool), is_indel[:-1]])
    cstart = is_indel & ~prev
    return valid, is_indel, cstart


def v_searchsorted(c, l, method):
    valid, is_indel, cstart = common(c)
    cs = jnp.cumsum(cstart.astype(jnp.int32))
    k = jnp.arange(MC, dtype=jnp.int32)
    starts = jnp.searchsorted(cs, k + 1, side="left", method=method).astype(jnp.int32)
    starts_next = jnp.searchsorted(cs, k + 2, side="left", method=method).astype(jnp.int32)
    n_clusters = cs[-1]
    cvalid = k < n_clusters
    del_src = jnp.where((c == D) & valid, l, 0)
    ins_src = jnp.where((c == I) & valid, l, 0)
    ps_del = jnp.concatenate([jnp.zeros(1, l.dtype), jnp.cumsum(del_src)])
    ps_ins = jnp.concatenate([jnp.zeros(1, l.dtype), jnp.cumsum(ins_src)])
    c_del = jnp.where(cvalid, ps_del[starts_next] - ps_del[starts], 0)
    c_ins = jnp.where(cvalid, ps_ins[starts_next] - ps_ins[starts], 0)
    return c_del, c_ins


def v_scatter(c, l):
    valid, is_indel, cstart = common(c)
    cid = jnp.where(is_indel, jnp.cumsum(cstart.astype(jnp.int32)) - 1, MC)
    safe = jnp.minimum(cid, MC)
    del_src = jnp.where((c == D) & valid, l, 0)
    ins_src = jnp.where((c == I) & valid, l, 0)
    c_del = jnp.zeros(MC + 1, jnp.int32).at[safe].add(del_src)[:MC]
    c_ins = jnp.zeros(MC + 1, jnp.int32).at[safe].add(ins_src)[:MC]
    return c_del, c_ins


o1 = bench("searchsorted scan", jax.jit(jax.vmap(lambda c, l: v_searchsorted(c, l, "scan"))), d_codes, d_lens)
o2 = bench("searchsorted compare_all", jax.jit(jax.vmap(lambda c, l: v_searchsorted(c, l, "compare_all"))), d_codes, d_lens)
o3 = bench("searchsorted sort", jax.jit(jax.vmap(lambda c, l: v_searchsorted(c, l, "sort"))), d_codes, d_lens)
o4 = bench("scatter add", jax.jit(jax.vmap(v_scatter)), d_codes, d_lens)
assert (o1[0] == o2[0]).all() and (o1[0] == o3[0]).all() and (o1[0] == o4[0]).all()
print("identical")
