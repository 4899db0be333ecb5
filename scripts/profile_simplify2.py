"""Fine bisection of _simplify_single with device-resident args."""

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
    D, I, M, PAD, cleanup_and_compress,
)
from portello_tpu.kernels.cluster_utils import (  # noqa: E402
    find_clusters, match_run_left, match_run_right,
)
from portello_tpu.kernels.liftover_parallel import _liftover_parallel_single  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, WIN = bcfg.max_clusters, bcfg.window
rng = np.random.default_rng(3)
dev = jax.devices()[0]
items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = items

lift = jax.jit(jax.vmap(lambda *a: cleanup_and_compress(*_liftover_parallel_single(*a)[:2], MAX_OUT)))
lifted = lift(*[np.asarray(x) for x in (ops, lens, n_ops, pos, bk, bv, nb)])
l_codes = jax.device_put(np.asarray(lifted[0]), dev)
l_lens = jax.device_put(np.asarray(lifted[1]), dev)
zpos = jax.device_put(np.zeros(B, np.int32), dev)
d_ref = jax.device_put(ref_win, dev)
d_read = jax.device_put(read_seq, dev)

print(f"device={dev} B={B}", file=sys.stderr)


def bench(name, f, *a, iters=5):
    t0 = time.perf_counter()
    out = f(*a)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms (compile {comp:.1f}s)")


def p1(c, l, p, rw, rq):
    return find_clusters(c, l, p, MC)["del_len"]


def p2(c, l, p, rw, rq):
    cl = find_clusters(c, l, p, MC)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    m0 = jnp.minimum(dl, il)
    post, _ = match_run_right(rw, bs + dl, rq, rs + il, m0, WIN)
    m1 = jnp.minimum(dl - post, il - post)
    pre, _ = match_run_left(rw, bs, rq, rs, m1, WIN)
    return post + pre


def p3(c, l, p, rw, rq):
    """clusters + runs + emission build (no final compress)."""
    # replicate _simplify_single up to the flatten
    cl = find_clusters(c, l, p, MC)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    cvalid = jnp.arange(MC, dtype=jnp.int32) < cl["n_clusters"]
    m0 = jnp.minimum(dl, il)
    post, _ = match_run_right(rw, bs + dl, rq, rs + il, m0, WIN)
    dl1, il1 = dl - post, il - post
    m1 = jnp.minimum(dl1, il1)
    pre, _ = match_run_left(rw, bs, rq, rs, m1, WIN)
    dl2, il2 = dl1 - pre, il1 - pre
    snp = (dl2 == 1) & (il2 == 1)
    post_f = post + snp.astype(post.dtype)
    dl2 = jnp.where(snp, 0, dl2)
    il2 = jnp.where(snp, 0, il2)
    pure = (dl == 0) | (il == 0)
    one_one = (dl == 1) & (il == 1)
    mixed = cvalid & ~pure & ~one_one
    c_codes = jnp.stack([
        jnp.where(mixed, M, PAD),
        jnp.where(mixed | pure, I, jnp.where(one_one, M, PAD)),
        jnp.full_like(dl, D),
        jnp.where(mixed, M, PAD),
    ], axis=1)
    c_lens = jnp.stack([
        jnp.where(mixed, pre, 0),
        jnp.where(mixed, il2, jnp.where(pure, il, jnp.where(one_one, 1, 0))),
        jnp.where(mixed, dl2, jnp.where(pure, dl, 0)),
        jnp.where(mixed, post_f, 0),
    ], axis=1)
    n = c.shape[0]
    valid = c != PAD
    is_indel = ((c == I) | (c == D)) & valid
    cend = cl["cluster_end"]
    cid = jnp.clip(cl["cluster_id"], 0, MC - 1)
    out_codes = jnp.full((n, 4), PAD, dtype=c.dtype)
    out_lens = jnp.zeros((n, 4), dtype=l.dtype)
    out_codes = out_codes.at[:, 0].set(jnp.where(valid & ~is_indel, c, PAD))
    out_lens = out_lens.at[:, 0].set(jnp.where(valid & ~is_indel, l, 0))
    out_codes = jnp.where(cend[:, None], c_codes[cid], out_codes)
    out_lens = jnp.where(cend[:, None], c_lens[cid], out_lens)
    return out_codes.reshape(-1), out_lens.reshape(-1)


def p4(c, l, p, rw, rq):
    fc, fl = p3(c, l, p, rw, rq)
    return cleanup_and_compress(fc, fl, MAX_OUT)


bench("p1 find_clusters", jax.jit(jax.vmap(p1)), l_codes, l_lens, zpos, d_ref, d_read)
bench("p2 +match_runs", jax.jit(jax.vmap(p2)), l_codes, l_lens, zpos, d_ref, d_read)
bench("p3 +emission", jax.jit(jax.vmap(p3)), l_codes, l_lens, zpos, d_ref, d_read)
bench("p4 +compress(full)", jax.jit(jax.vmap(p4)), l_codes, l_lens, zpos, d_ref, d_read)
