"""Post-compaction simplify breakdown: where do the remaining ms live?

Times _simplify_single (mm) against variants with stages stubbed out:
- no-windows: raw_r/raw_l forced to zero (everything but the window stage)
- no-compress: emission built but cleanup_and_compress skipped
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
from portello_tpu.kernels.cluster_utils import _window_bytes_mm_t, find_clusters  # noqa: E402
from portello_tpu.kernels.simplify_kernel import _simplify_single  # noqa: E402
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


print(f"device={jax.devices()[0]}", file=sys.stderr)

t("simplify full",
  lambda c, l, p, rw, rq: _simplify_single(c, l, p, rw, rq, max_clusters=MC, window=W, max_out=MAX_OUT, mm=True),
  (l_codes, l_lens, l_rel, ref_win, read_seq), 2)


def windows_only(c, l, p, rw, rq):
    cl = find_clusters(c, l, p, MC, True)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    from portello_tpu.kernels.expand import expand_sum

    cvalid = jnp.arange(MC, dtype=jnp.int32) < cl["n_clusters"]
    pure = (dl == 0) | (il == 0)
    one_one = (dl == 1) & (il == 1)
    mixed = cvalid & ~pure & ~one_one
    rank = jnp.cumsum(mixed.astype(jnp.int32)) - 1
    j = jnp.arange(MX, dtype=jnp.int32)
    cmask = ((rank[None, :] == j[:, None]) & mixed[None, :]).astype(jnp.bfloat16)
    cv4 = expand_sum(cmask, jnp.stack([bs, rs, dl, il], axis=1).astype(jnp.int32))
    bsj, rsj, dlj, ilj = cv4[:, 0], cv4[:, 1], cv4[:, 2], cv4[:, 3]
    sa = jnp.concatenate([bsj + dlj - W, bsj])
    sb = jnp.concatenate([rsj + ilj - W, rsj])
    wa = _window_bytes_mm_t(rw, sa, W, 0xFE)
    wb = _window_bytes_mm_t(rq, sb, W, 0xFD)
    eq_r = wa[:, :MX] == wb[:, :MX]
    eq_l = wa[:, MX:] == wb[:, MX:]
    raw_r = jnp.sum(jax.lax.cumprod(eq_r.astype(jnp.int32), axis=0, reverse=True), axis=0)
    raw_l = jnp.sum(jnp.cumprod(eq_l.astype(jnp.int32), axis=0), axis=0)
    emask = ((rank[:, None] == j[None, :]) & mixed[:, None]).astype(jnp.bfloat16)
    back = expand_sum(emask, jnp.stack([raw_r, raw_l], axis=1))
    return back


t("clusters+compact+windows", windows_only, (l_codes, l_lens, l_rel, ref_win, read_seq), 2)

t("window fetch pair (2MX lanes)",
  lambda rw, rq, s: (
      _window_bytes_mm_t(rw, s, W, 0xFE), _window_bytes_mm_t(rq, s + 3, W, 0xFD)
  ),
  (ref_win, read_seq, jax.device_put(
      np.sort(rng.integers(0, 18000, size=(B, 2 * MX)).astype(np.int32), axis=1))), 2)

from portello_tpu.kernels.cigar_kernels import cleanup_and_compress  # noqa: E402

em = rng.integers(0, 10, size=(B, 2 * MAX_OUT)).astype(np.int32)
eml = rng.integers(0, 5, size=(B, 2 * MAX_OUT)).astype(np.int32)
t("cleanup+compress (2*max_out)", lambda c, l: cleanup_and_compress(c, l, MAX_OUT, True),
  (jax.device_put(em), jax.device_put(eml)), 1)
