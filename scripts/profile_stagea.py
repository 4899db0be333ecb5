"""Decompose shift stage A + re-measure simplify parts with the mask-LHS
fetch."""

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
    _window_bytes_mm_t, find_clusters, match_run_right,
)
from portello_tpu.kernels.shift_kernel import _shift_stage_a  # noqa: E402
from portello_tpu.kernels.simplify_kernel import _simplify_single  # noqa: E402
from portello_tpu.models.pipeline_model import _lift_core  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, W = bcfg.max_clusters, bcfg.window
rng = np.random.default_rng(2026)
rev_items = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
(ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
 ref_win, ref_base, read_seq) = [jax.device_put(np.asarray(a)) for a in rev_items]
rel_pos = pos - win_base

fwd_items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
(fops, flens, fn_ops, fpos, fbk, fbv, fnb, fref_win, fref_base, fread_seq) = [
    jax.device_put(np.asarray(a)) for a in fwd_items
]
lift_b = jax.jit(jax.vmap(
    lambda o, l, n, p, k, v, m: _lift_core(o, l, n, p, k, v, m, max_out=MAX_OUT, mm=True)
))
l_codes, l_lens, l_n, l_pos, l_mapped, _ = lift_b(fops, flens, fn_ops, fpos, fbk, fbv, fnb)
l_rel = l_pos - fref_base

REPS = 24


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)

t("stage A full",
  lambda c, l, p, wb, rw, rq: _shift_stage_a(
      c, l, p, wb, rw, rq, max_clusters=MC, window=W, mm=True),
  (ops, lens, rel_pos, win_base, contig_win, read_seq), 2)


def stage_a_to_homology(c, l, p, wb, rw, rq):
    cl = find_clusters(c, l, p, MC, True)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    max_left = jnp.minimum(wb + bs, rs)
    h_run, sat = match_run_right(rw, bs + dl, rq, rs + il, max_left, W, True)
    return h_run, sat


t("stage A clusters+homology",
  stage_a_to_homology,
  (ops, lens, rel_pos, win_base, contig_win, read_seq), 2)

start96 = np.sort(rng.integers(0, 18000, size=(B, MC)).astype(np.int32), axis=1)
limit96 = rng.integers(0, 64, size=(B, MC)).astype(np.int32)
t("match_run_right C=96 standalone",
  lambda s1, s2, st, lm: match_run_right(s1, st + 30, s2, st + 30, lm, W, True),
  (contig_win, read_seq, jax.device_put(start96), jax.device_put(limit96)), 2)

t("simplify full (new fetch)",
  lambda c, l, p, rw, rq: _simplify_single(
      c, l, p, rw, rq, max_clusters=MC, window=W, max_out=MAX_OUT, mm=True),
  (l_codes, l_lens, l_rel, fref_win, fread_seq), 2)

start48 = np.sort(rng.integers(0, 18000, size=(B, 48)).astype(np.int32), axis=1)
t("fetch pair C=48 (new form)",
  lambda rw, rq, s: (
      _window_bytes_mm_t(rw, s, W, 0xFE), _window_bytes_mm_t(rq, s + 3, W, 0xFD)
  ),
  (fref_win, fread_seq, jax.device_put(start48)), 2)
