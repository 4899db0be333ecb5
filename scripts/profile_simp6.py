"""Decompose _simplify_single at the production shape (input width =
max_out = 232, mc = 96) by measuring cumulative prefixes of its graph:
clusters-only -> +mixed-compaction/window-compare -> full.  Differences
estimate per-phase cost (in-context caveats apply)."""

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
from portello_tpu.kernels.cigar_kernels import cleanup_and_compress  # noqa: E402
from portello_tpu.kernels.cluster_utils import (  # noqa: E402
    _window_bytes_mm_t, find_clusters,
)
from portello_tpu.kernels.expand import expand_sum  # noqa: E402
from portello_tpu.kernels.simplify_kernel import _simplify_single  # noqa: E402
from portello_tpu.models.pipeline_model import _lift_core  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, W = bcfg.max_clusters, bcfg.window
mm = jax.default_backend() == "tpu"
rng = np.random.default_rng(2026)
fwd_items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
(ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq) = [
    jax.device_put(np.asarray(a)) for a in fwd_items
]
lift_b = jax.jit(jax.vmap(
    lambda o, l, n, p, k, v, m: _lift_core(
        o, l, n, p, k, v, m, max_out=MAX_OUT, mm=mm,
        max_rows=bcfg.resolved_max_rows())
))
l_codes, l_lens, l_n, l_pos, l_mapped, _ = lift_b(ops, lens, n_ops, pos, bk, bv, nb)
l_rel = l_pos - ref_base

REPS = 24
print(f"device={jax.devices()[0]}", file=sys.stderr)


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/batch", flush=True)


def clusters_only(c, l, p):
    cl = find_clusters(c, l, p, MC, mm)
    return cl["ref_start"], cl["read_start"], cl["del_len"], cl["ins_len"], \
        cl["cluster_id"], cl["n_clusters"]


def through_windows(c, l, p, rw, rq):
    cl = find_clusters(c, l, p, MC, mm)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    cvalid = jnp.arange(MC, dtype=jnp.int32) < cl["n_clusters"]
    pure = (dl == 0) | (il == 0)
    one_one = (dl == 1) & (il == 1)
    mixed = cvalid & ~pure & ~one_one
    mx = max(8, MC // 16)
    rank = jnp.cumsum(mixed.astype(jnp.int32)) - 1
    j = jnp.arange(mx, dtype=jnp.int32)
    cmask = ((rank[None, :] == j[:, None]) & mixed[None, :]).astype(jnp.bfloat16)
    cv4 = expand_sum(cmask, jnp.stack([bs, rs, dl, il], axis=1).astype(jnp.int32))
    bsj, rsj, dlj, ilj = cv4[:, 0], cv4[:, 1], cv4[:, 2], cv4[:, 3]
    sa = jnp.concatenate([bsj + dlj - W, bsj])
    sb = jnp.concatenate([rsj + ilj - W, rsj])
    wa = _window_bytes_mm_t(rw, sa, W, 0xFE)
    wb = _window_bytes_mm_t(rq, sb, W, 0xFD)
    eq_r = wa[:, :mx] == wb[:, :mx]
    eq_l = wa[:, mx:] == wb[:, mx:]
    raw_r_j = jnp.sum(jax.lax.cumprod(eq_r.astype(jnp.int32), axis=0, reverse=True), axis=0)
    raw_l_j = jnp.sum(jnp.cumprod(eq_l.astype(jnp.int32), axis=0), axis=0)
    emask = ((rank[:, None] == j[None, :]) & mixed[:, None]).astype(jnp.bfloat16)
    back = expand_sum(emask, jnp.stack([raw_r_j, raw_l_j], axis=1))
    return back[:, 0], back[:, 1]


def compress_only(c, l):
    return cleanup_and_compress(c, l, MAX_OUT, mm)


SW = 184
for rnd in range(2):
    t("simplify full (232)",
      lambda c, l, p, rw, rq: _simplify_single(
          c, l, p, rw, rq, max_clusters=MC, window=W, max_out=MAX_OUT, mm=mm),
      (l_codes, l_lens, l_rel, ref_win, read_seq), 2)
    t("simplify full (sw=184)",
      lambda c, l, p, rw, rq: _simplify_single(
          c, l, p, rw, rq, max_clusters=MC, window=W, max_out=MAX_OUT, mm=mm),
      (l_codes[:, :SW], l_lens[:, :SW], l_rel, ref_win, read_seq), 2)
    t("clusters only", clusters_only, (l_codes, l_lens, l_rel), 2)
    t("clusters + windows", through_windows,
      (l_codes, l_lens, l_rel, ref_win, read_seq), 2)
    t("cleanup_and_compress (464 stream)", compress_only,
      (jnp.concatenate([l_codes, l_codes], axis=1),
       jnp.concatenate([l_lens, l_lens], axis=1)), 0)
