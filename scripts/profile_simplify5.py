"""Decompose the 0.76 ms clusters+compact+windows chunk of simplify."""

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
from portello_tpu.kernels.cluster_utils import (  # noqa: E402
    _window_bytes_mm_t, find_clusters,
)
from portello_tpu.models.pipeline_model import _lift_core  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, W = bcfg.max_clusters, bcfg.window
MX = max(8, MC // 4)
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = [
    jax.device_put(np.asarray(a)) for a in items
]
lift_b = jax.jit(jax.vmap(
    lambda o, l, n, p, k, v, m: _lift_core(o, l, n, p, k, v, m, max_out=MAX_OUT, mm=True)
))
l_codes, l_lens, l_n, l_pos, l_mapped, _ = lift_b(ops, lens, n_ops, pos, bk, bv, nb)
l_rel = l_pos - ref_base

REPS = 24


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:32s} {ms:8.3f} ms/batch", flush=True)


def clusters_only(c, l, p):
    return find_clusters(c, l, p, MC, True)


def compact_only(c, l, p):
    from portello_tpu.kernels.expand import expand_sum

    cl = find_clusters(c, l, p, MC, True)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    cvalid = jnp.arange(MC, dtype=jnp.int32) < cl["n_clusters"]
    mixed = cvalid & ~((dl == 0) | (il == 0)) & ~((dl == 1) & (il == 1))
    rank = jnp.cumsum(mixed.astype(jnp.int32)) - 1
    j = jnp.arange(MX, dtype=jnp.int32)
    cmask = ((rank[None, :] == j[:, None]) & mixed[None, :]).astype(jnp.bfloat16)
    cv4 = expand_sum(cmask, jnp.stack([bs, rs, dl, il], axis=1).astype(jnp.int32))
    return cv4


print(f"device={jax.devices()[0]}", file=sys.stderr)

t("find_clusters only", clusters_only, (l_codes, l_lens, l_rel), 2)
t("clusters+compact", compact_only, (l_codes, l_lens, l_rel), 2)

start48 = np.sort(rng.integers(0, 18000, size=(B, 2 * MX)).astype(np.int32), axis=1)
t("fetch pair C=48 standalone",
  lambda rw, rq, s: (
      _window_bytes_mm_t(rw, s, W, 0xFE), _window_bytes_mm_t(rq, s + 3, W, 0xFD)
  ),
  (ref_win, read_seq, jax.device_put(start48)), 2)

start96 = np.sort(rng.integers(0, 18000, size=(B, 2 * MC)).astype(np.int32), axis=1)
t("fetch pair C=192 standalone",
  lambda rw, rq, s: (
      _window_bytes_mm_t(rw, s, W, 0xFE), _window_bytes_mm_t(rq, s + 3, W, 0xFD)
  ),
  (ref_win, read_seq, jax.device_put(start96)), 2)
