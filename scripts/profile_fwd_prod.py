"""In-context decomposition of the PRODUCTION fwd graph (fwd_batch: vmapped
lift core + batch-compacted simplify) — unlike profile_fwd3/profile_simp6,
every variant here jits the same batch-level pipeline production dispatches,
so the splits are the in-context numbers round 4 should trust:

  A  full fwd_batch (the production graph)
  B  lift-only   (vmap _lift_core + read_len; simplify removed)
  C  lift + simplify part1 (find_clusters + per-item mixed compaction)
  D  full minus the final cleanup/compress reassembly is not separable
     without code surgery; D instead re-times simplify_batch_compact alone
     on PRE-LIFTED device inputs (its standalone in-context cost).
"""

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
from portello_tpu.kernels.simplify_kernel import (  # noqa: E402
    _cluster_cases,
    simplify_batch_compact,
)
from portello_tpu.models.pipeline_model import (  # noqa: E402
    _lift_core,
    cigar_read_len,
    fwd_batch,
)
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, W = bcfg.max_clusters, bcfg.window
mm = jax.default_backend() == "tpu"
MAX_ROWS = bcfg.resolved_max_rows()
kw = dict(max_out=MAX_OUT, max_clusters=MC, window=W, mm=mm, max_rows=MAX_ROWS)
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
(ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq) = [
    jax.device_put(np.asarray(a)) for a in items
]
REPS = 24
print(f"device={jax.devices()[0]} mm={mm}", file=sys.stderr)


def t(name, fn, args):
    ms = sustained_batch_time(fn, args, REPS, 0, already_batched=True) * 1e3
    print(f"{name:44s} {ms:8.3f} ms/batch", flush=True)


def full(o, l, n, p, k, v, m, rw, rb, rs):
    return fwd_batch(o, l, n, p, k, v, m, rw, rb, rs, **kw)


def lift_only(o, l, n, p, k, v, m, rw, rb, rs):
    lc, ll, ln, rp, mapped, ov = jax.vmap(
        lambda a, b, c, d, e, f, g: _lift_core(
            a, b, c, d, e, f, g, max_out=MAX_OUT, mm=mm, max_rows=MAX_ROWS
        )
    )(o, l, n, p, k, v, m)
    rl = jax.vmap(cigar_read_len)(lc, ll)
    return lc, ll, ln, rp, mapped, ov, rl


def lift_part1(o, l, n, p, k, v, m, rw, rb, rs):
    lc, ll, ln, rp, mapped, ov = jax.vmap(
        lambda a, b, c, d, e, f, g: _lift_core(
            a, b, c, d, e, f, g, max_out=MAX_OUT, mm=mm, max_rows=MAX_ROWS
        )
    )(o, l, n, p, k, v, m)
    rl = jax.vmap(cigar_read_len)(lc, ll)

    def p1(c, le, pp):
        cl, cvalid, pure, one_one, mixed = _cluster_cases(c, le, pp, MC, True)
        return cl["n_clusters"], mixed.sum()

    ncl, nmix = jax.vmap(p1)(lc, ll, rp - rb)
    return ncl, nmix, rl, mapped


args = (ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq)
fullj = jax.jit(full)
liftj = jax.jit(lift_only)
p1j = jax.jit(lift_part1)

# pre-lifted inputs for the standalone simplify timing
lc, ll, ln, rp, _mapped, _ov = jax.jit(jax.vmap(
    lambda a, b, c, d, e, f, g: _lift_core(
        a, b, c, d, e, f, g, max_out=MAX_OUT, mm=mm, max_rows=MAX_ROWS
    )
))(ops, lens, n_ops, pos, bk, bv, nb)
lrel = jax.block_until_ready(rp - ref_base)


def simp_only(c, le, pp, rw, rs):
    return simplify_batch_compact(
        c, le, pp, rw, rs, max_clusters=MC, window=W, max_out=MAX_OUT
    )


simpj = jax.jit(simp_only)
sargs = (lc, ll, lrel, ref_win, read_seq)

for _pass in range(2):
    t("A full fwd_batch", fullj, args)
    t("B lift-only (in-context)", liftj, args)
    t("C lift + clusters part1", p1j, args)
    t("D simplify_batch_compact standalone", simpj, sargs)
