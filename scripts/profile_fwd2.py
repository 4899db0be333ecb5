"""Round-2 fwd-pipeline stage breakdown after the one-hot-mm refactor.

Times each stage of _fwd_item in isolation (mm=True) at the production
bucket shape with the honest sustained protocol.
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

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402
from portello_tpu.kernels.liftover_parallel import _liftover_parallel_single  # noqa: E402
from portello_tpu.kernels.cigar_kernels import cleanup_and_compress, cigar_read_len  # noqa: E402
from portello_tpu.kernels.cluster_utils import (  # noqa: E402
    find_clusters,
    match_run_left,
    match_run_right,
)
from portello_tpu.kernels.simplify_kernel import _simplify_single  # noqa: E402
from portello_tpu.models.pipeline_model import _fwd_item, _lift_core  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, W = bcfg.max_clusters, bcfg.window
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = [
    jax.device_put(np.asarray(a)) for a in items
]

REPS = 24


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:28s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)

# full fwd for reference
t("fwd total", lambda *a: _fwd_item(*a, max_out=MAX_OUT, max_clusters=MC, window=W, mm=True),
  (ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq), 3)

# liftover emission grid only
t("lift emit", lambda o, l, n, p, k, v, m: _liftover_parallel_single(o, l, n, p, k, v, m, True),
  (ops, lens, n_ops, pos, bk, bv, nb), 3)

# liftover + cleanup/compress
t("lift core", lambda o, l, n, p, k, v, m: _lift_core(o, l, n, p, k, v, m, max_out=MAX_OUT, mm=True),
  (ops, lens, n_ops, pos, bk, bv, nb), 3)

# precompute lifted cigars for the downstream stages
lift_b = jax.jit(jax.vmap(
    lambda o, l, n, p, k, v, m: _lift_core(o, l, n, p, k, v, m, max_out=MAX_OUT, mm=True)
))
l_codes, l_lens, l_n, l_pos, l_mapped, _ = lift_b(ops, lens, n_ops, pos, bk, bv, nb)
l_rel = l_pos - ref_base

# simplify on lifted
t("simplify", lambda c, l, p, rw, rq: _simplify_single(c, l, p, rw, rq, max_clusters=MC, window=W, max_out=MAX_OUT, mm=True),
  (l_codes, l_lens, l_rel, ref_win, read_seq), 2)

# find_clusters on lifted
t("find_clusters", lambda c, l, p: find_clusters(c, l, p, MC, True), (l_codes, l_lens, l_rel), 2)

# cluster windows (both match_run calls) on precomputed cluster stats
cl_b = jax.jit(jax.vmap(lambda c, l, p: find_clusters(c, l, p, MC, True)))
cl = cl_b(l_codes, l_lens, l_rel)
dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]


def windows(dl, il, bs, rs, rw, rq):
    m0 = jnp.minimum(dl, il)
    post, sat = match_run_right(rw, bs + dl, rq, rs + il, m0, W, True)
    m1 = jnp.minimum(dl - post, il - post)
    pre, sat2 = match_run_left(rw, bs, rq, rs, m1, W, True)
    return post, pre, sat, sat2


t("windows x2", windows, (dl, il, bs, rs, ref_win, read_seq), 2)

# compress alone on an emission-shaped stream
U = 2 * bcfg.max_ops + bcfg.max_blocks
em = rng.integers(0, 10, size=(B, 2 * U)).astype(np.int32)
eml = rng.integers(0, 5, size=(B, 2 * U)).astype(np.int32)
t("cleanup+compress (2U)", lambda c, l: cleanup_and_compress(c, l, MAX_OUT, True),
  (jax.device_put(em), jax.device_put(eml)), 1)
