"""Bisect the left-shift kernel on device with in-jit repetition."""

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

from bench import fast_item_arrays  # noqa: E402
from portello_tpu.kernels.cigar_kernels import (  # noqa: E402
    D, I, M, PAD, cleanup_and_compress, is_align_match,
)
from portello_tpu.kernels.cluster_utils import find_clusters, match_run_right  # noqa: E402
from portello_tpu.kernels.shift_kernel import _left_shift_single, _minplus_scan, _INF  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
REPS = int(os.environ.get("PROF_REPS", "50"))
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, WIN = bcfg.max_clusters, bcfg.window
rng = np.random.default_rng(3)
dev = jax.devices()[0]
ritems = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
(rops, rlens, rn_ops, rpos, rwin_base, rcontig_win, rbk, rbv, rnb,
 rref_win, rref_base, rread_seq) = [jax.device_put(x, dev) for x in ritems]
args = (rops, rlens, rpos, rwin_base, rcontig_win, rread_seq)

print(f"device={dev} B={B} reps={REPS}", file=sys.stderr)


def bench(name, single_fn, a):
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
    jax.block_until_ready(f(*a))
    t = min(
        (lambda t0=time.perf_counter(): (jax.block_until_ready(f(*a)), time.perf_counter() - t0)[1])()
        for _ in range(4)
    )
    print(f"{name:22s} {t/REPS*1e3:9.2f} ms/batch [total {t:.2f}s]", flush=True)


def s1(c, l, p, wb, cw, rq):
    cl = find_clusters(c, l, p, MC)
    return cl["del_len"] + cl["read_start"]


def s2(c, l, p, wb, cw, rq):
    cl = find_clusters(c, l, p, MC)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    max_left = jnp.minimum(wb + bs, rs)
    h_run, sat = match_run_right(cw, bs + dl, rq, rs + il, max_left, WIN)
    return h_run


def s3(c, l, p, wb, cw, rq):
    cl = find_clusters(c, l, p, MC)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    max_left = jnp.minimum(wb + bs, rs)
    h_run, sat = match_run_right(cw, bs + dl, rq, rs + il, max_left, WIN)
    h_cap = jnp.minimum(h_run, max_left)
    n = c.shape[0]
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
    return _minplus_scan(a_ext, b_ext)[:n]


bench("s1 clusters", s1, args)
bench("s2 +homology", s2, args)
bench("s3 +assoc_scan", s3, args)
bench("s4 full shift", lambda *a: _left_shift_single(
    *a, max_clusters=MC, window=WIN, max_out=MAX_OUT), args)


def s5_barrier(c, l, p, wb, cw, rq):
    """full shift with a barrier before the final cleanup/compress"""
    import portello_tpu.kernels.shift_kernel as sk
    orig = sk.cleanup_and_compress
    def barriered(fc, fl, mo, mm=False):
        fc, fl = jax.lax.optimization_barrier((fc, fl))
        return orig(fc, fl, mo, mm)
    sk.cleanup_and_compress = barriered
    try:
        return _left_shift_single(c, l, p, wb, cw, rq, max_clusters=MC, window=WIN, max_out=MAX_OUT)
    finally:
        sk.cleanup_and_compress = orig


bench("s5 shift+barrier", s5_barrier, args)
