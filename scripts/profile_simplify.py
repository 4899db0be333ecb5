"""Bisect the simplify kernel cost on device: time cumulative sub-stages."""

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

from bench import fast_item_arrays  # noqa: E402
from portello_tpu.kernels.cigar_kernels import (  # noqa: E402
    D, I, M, PAD, cleanup_and_compress,
)
from portello_tpu.kernels.cluster_utils import (  # noqa: E402
    find_clusters, match_run_left, match_run_right,
)
from portello_tpu.kernels.liftover_parallel import _liftover_parallel_single  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "512"))
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC = bcfg.max_clusters
WIN = bcfg.window
rng = np.random.default_rng(3)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = items

lp_cc = jax.jit(
    jax.vmap(lambda *a: cleanup_and_compress(*_liftover_parallel_single(*a)[:2], MAX_OUT))
)
lifted = lp_cc(ops, lens, n_ops, pos, bk, bv, nb)
l_codes = np.asarray(lifted[0])
l_lens = np.asarray(lifted[1])
zpos = np.zeros(B, np.int32)

print(f"device={jax.devices()[0]} B={B}", file=sys.stderr)


def bench(name, f, *a, iters=3):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:9.1f} ms/batch")


def s_clusters(c, l, p, rw, rq):
    cl = find_clusters(c, l, p, MC)
    return cl["del_len"], cl["ins_len"], cl["ref_start"]


def s_runs(c, l, p, rw, rq):
    cl = find_clusters(c, l, p, MC)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    m0 = jnp.minimum(dl, il)
    post, sat1 = match_run_right(rw, bs + dl, rq, rs + il, m0, WIN)
    m1 = jnp.minimum(dl - post, il - post)
    pre, sat2 = match_run_left(rw, bs, rq, rs, m1, WIN)
    return post, pre, sat1, sat2


def s_emit(c, l, p, rw, rq):
    from portello_tpu.kernels.simplify_kernel import _simplify_single
    return _simplify_single(c, l, p, rw, rq, max_clusters=MC, window=WIN, max_out=MAX_OUT)


bench("find_clusters", jax.jit(jax.vmap(s_clusters)), l_codes, l_lens, zpos, ref_win, read_seq)
bench("clusters+match_runs", jax.jit(jax.vmap(s_runs)), l_codes, l_lens, zpos, ref_win, read_seq)
bench("full simplify", jax.jit(jax.vmap(s_emit)), l_codes, l_lens, zpos, ref_win, read_seq)
