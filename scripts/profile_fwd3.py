"""Decompose the current fwd leg: liftover grid vs cleanup/compress vs
simplify (isolated sub-stage timings — allocation guide only; decisions
need in-context A/Bs)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from portello_tpu.kernels.cigar_kernels import cleanup_and_compress  # noqa: E402
from portello_tpu.kernels.liftover_parallel import (  # noqa: E402
    _liftover_parallel_single,
)
from portello_tpu.kernels.simplify_kernel import _simplify_single  # noqa: E402
from portello_tpu.models.pipeline_model import _fwd_item, _lift_core  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
mm = jax.default_backend() == "tpu"
MAX_ROWS = bcfg.resolved_max_rows()
kw = dict(max_out=MAX_OUT, max_clusters=bcfg.max_clusters, window=bcfg.window,
          mm=mm, max_rows=MAX_ROWS)
rng = np.random.default_rng(2026)
fwd_items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
(ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq) = [
    jax.device_put(np.asarray(a)) for a in fwd_items
]

lift_b = jax.jit(jax.vmap(
    lambda o, l, n, p, k, v, m: _lift_core(o, l, n, p, k, v, m, max_out=MAX_OUT,
                                           mm=mm, max_rows=MAX_ROWS)
))
l_codes, l_lens, l_n, l_pos, l_mapped, _ = lift_b(ops, lens, n_ops, pos, bk, bv, nb)
l_rel = l_pos - ref_base

emit_b = jax.jit(jax.vmap(
    lambda o, l, n, p, k, v, m: _liftover_parallel_single(o, l, n, p, k, v, m, mm,
                                                          MAX_ROWS)
))
e_codes, e_lens, _r2, _ovf = emit_b(ops, lens, n_ops, pos, bk, bv, nb)

REPS = 24
print(f"device={jax.devices()[0]}", file=sys.stderr)


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/batch", flush=True)


for rnd in range(2):
    t("fwd full", lambda *a: _fwd_item(*a, **kw),
      (ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq), 3)
    t("lift_core (grid+compress)",
      lambda o, l, n, p, k, v, m: _lift_core(o, l, n, p, k, v, m,
                                             max_out=MAX_OUT, mm=mm,
                                             max_rows=MAX_ROWS),
      (ops, lens, n_ops, pos, bk, bv, nb), 3)
    t("liftover grid only",
      lambda o, l, n, p, k, v, m: _liftover_parallel_single(
          o, l, n, p, k, v, m, mm, MAX_ROWS),
      (ops, lens, n_ops, pos, bk, bv, nb), 3)
    t("cleanup_and_compress only",
      lambda c, l: cleanup_and_compress(c, l, MAX_OUT, mm),
      (e_codes, e_lens), 0)
    t("simplify only",
      lambda c, l, p, rw, rq: _simplify_single(
          c, l, p, rw, rq, max_clusters=bcfg.max_clusters, window=bcfg.window,
          max_out=MAX_OUT, mm=mm),
      (l_codes, l_lens, l_rel, ref_win, read_seq), 2)
