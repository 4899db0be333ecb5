"""Isolate the 54ms op among the s2->s3 delta: cummin vs gather vs masks."""

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

from portello_tpu.kernels.cigar_kernels import D, I, PAD, is_align_match  # noqa: E402
from portello_tpu.kernels.cluster_utils import find_clusters, match_run_right  # noqa: E402
from portello_tpu.kernels.shift_kernel import _INF, _minplus_scan  # noqa: E402

B, N, MC, WIN, L = 512, 256, 160, 48, 24576
REPS = int(os.environ.get("PROF_REPS", "50"))
rng = np.random.default_rng(3)
dev = jax.devices()[0]
codes = rng.integers(0, 9, size=(B, N)).astype(np.int32)
lens_ = rng.integers(1, 50, size=(B, N)).astype(np.int32)
pos = np.full(B, 32, np.int32)
wb = np.zeros(B, np.int32)
cw = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
rq = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
args = tuple(jax.device_put(x, dev) for x in (codes, lens_, pos, wb, cw, rq))

print(f"device={dev} B={B} reps={REPS}", file=sys.stderr)


def bench(name, single_fn):
    vf = jax.vmap(single_fn)

    def run(*aa):
        def body(i, acc):
            a2 = list(aa)
            a2[2] = a2[2] + (acc & 1).astype(a2[2].dtype)
            out = vf(*a2)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.reshape(-1)[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    f = jax.jit(run)
    jax.block_until_ready(f(*args))
    t = min(
        (lambda t0=time.perf_counter(): (jax.block_until_ready(f(*args)), time.perf_counter() - t0)[1])()
        for _ in range(4)
    )
    print(f"{name:30s} {t/REPS*1e3:9.2f} ms/batch", flush=True)


def base(c, l, p, wb_, cw_, rq_):
    cl = find_clusters(c, l, p, MC)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    max_left = jnp.minimum(wb_ + bs, rs)
    h_run, sat = match_run_right(cw_, bs + dl, rq_, rs + il, max_left, WIN)
    h_cap = jnp.minimum(h_run, max_left)
    return cl, h_cap


def t_gather(c, l, p, wb_, cw_, rq_):
    cl, h_cap = base(c, l, p, wb_, cw_, rq_)
    cid = jnp.clip(cl["cluster_id"], 0, MC - 1)
    return h_cap[cid]


def t_masks_scan_nogather(c, l, p, wb_, cw_, rq_):
    cl, h_cap = base(c, l, p, wb_, cw_, rq_)
    valid = c != PAD
    is_indel = ((c == I) | (c == D)) & valid
    is_m = is_align_match(c) & valid
    is_other = valid & ~is_indel & ~is_m
    cend = cl["cluster_end"]
    a = jnp.where(is_m, l, 0)
    b = jnp.where(cend, 7, jnp.where(is_other, 0, _INF))  # constant cap
    a_ext = jnp.concatenate([jnp.zeros(1, jnp.int32), a.astype(jnp.int32)])
    b_ext = jnp.concatenate([jnp.zeros(1, jnp.int32), b.astype(jnp.int32)])
    return _minplus_scan(a_ext, b_ext)[:N]


def t_full(c, l, p, wb_, cw_, rq_):
    cl, h_cap = base(c, l, p, wb_, cw_, rq_)
    valid = c != PAD
    is_indel = ((c == I) | (c == D)) & valid
    is_m = is_align_match(c) & valid
    is_other = valid & ~is_indel & ~is_m
    cend = cl["cluster_end"]
    cid = jnp.clip(cl["cluster_id"], 0, MC - 1)
    cap_at_op = h_cap[cid]
    a = jnp.where(is_m, l, 0)
    b = jnp.where(cend, cap_at_op, jnp.where(is_other, 0, _INF))
    a_ext = jnp.concatenate([jnp.zeros(1, jnp.int32), a.astype(jnp.int32)])
    b_ext = jnp.concatenate([jnp.zeros(1, jnp.int32), b.astype(jnp.int32)])
    return _minplus_scan(a_ext, b_ext)[:N]


bench("gather h_cap[cid] only", t_gather)
bench("masks+scan, const cap", t_masks_scan_nogather)
bench("full (gather feeds scan)", t_full)
