"""Fused vs staged rev chain, post-mm-formulation.

The stage A/B/fwd split exists because gather-built streams fused into the
prefix scans serialized (~7x, scripts/profile_isolate.py).  On the mm path
the gathers are gone (one-hot matmuls everywhere), so re-test whether one
XLA program for the whole rev chain (shift A + shift B + capped fwd leg with
batch-compacted simplify) still hits the pathology — a fused graph would cut
production dispatches 3 -> 1 per rev batch.

Interleaved same-run A/B (A, B, C, A, B, C): staged sum, fused-with-
barriers, fused-no-barriers.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp  # noqa: F401

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from portello_tpu.kernels.shift_kernel import (  # noqa: E402
    _shift_stage_a,
    _shift_stage_b,
    shift_stage_a_batch,
    shift_stage_b_batch,
)
from portello_tpu.models.pipeline_model import (  # noqa: E402
    _rev_ops_bound,
    fwd_batch,
)
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MM = jax.default_backend() == "tpu"
KW = dict(
    max_out=bcfg.resolved_max_out(),
    max_clusters=bcfg.max_clusters,
    window=bcfg.window,
    mm=MM,
    max_rows=bcfg.resolved_max_rows(),
)
BOUND = _rev_ops_bound(bcfg.max_ops, KW["max_out"])
rng = np.random.default_rng(2028)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
(ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
 ref_win, ref_base, read_seq) = [jax.device_put(np.asarray(a)) for a in items]
rel_pos = pos - win_base

REPS = 24


def rev_chain_onejit(barrier: bool):
    """One-program rev chain matching pipeline_model.rev_batch semantics."""

    def run(ops, lens, rel_pos, win_base, contig_win, read_seq,
            bk, bv, nb, ref_win, ref_base):
        st = jax.vmap(
            lambda c, l, p, wb, rw, rq: _shift_stage_a(
                c, l, p, wb, rw, rq,
                max_clusters=KW["max_clusters"], window=KW["window"], mm=MM,
            )
        )(ops, lens, rel_pos, win_base, contig_win, read_seq)
        if barrier:
            st = jax.lax.optimization_barrier(st)
        sh_codes, sh_lens, sh_n, sh_pos, sh_fb = jax.vmap(
            lambda c, l, p, s: _shift_stage_b(
                c, l, p, s, window=KW["window"], max_out=BOUND, mm=MM
            )
        )(ops, lens, rel_pos, st)
        if barrier:
            sh_codes, sh_lens, sh_n, sh_pos = jax.lax.optimization_barrier(
                (sh_codes, sh_lens, sh_n, sh_pos)
            )
        n = ops.shape[1]
        sh_fb = sh_fb | (sh_n > n)
        out = fwd_batch(
            sh_codes[:, :n], sh_lens[:, :n], sh_n, sh_pos + win_base,
            bk, bv, nb, ref_win, ref_base, read_seq, **KW,
        )
        out["fallback"] = out["fallback"] | sh_fb
        return out

    return run


CHAIN_ARGS = (ops, lens, rel_pos, win_base, contig_win, read_seq,
              bk, bv, nb, ref_win, ref_base)


def t(name, fn, args, pos_index):
    ms = sustained_batch_time(
        fn, args, REPS, pos_index, already_batched=True
    ) * 1e3
    print(f"{name:30s} {ms:8.3f} ms/batch", flush=True)
    return ms


def staged():
    ta = sustained_batch_time(
        lambda *a: jax.vmap(
            lambda c, l, p, wb, rw, rq: _shift_stage_a(
                c, l, p, wb, rw, rq,
                max_clusters=KW["max_clusters"], window=KW["window"], mm=MM,
            )
        )(*a),
        (ops, lens, rel_pos, win_base, contig_win, read_seq),
        REPS, 2, already_batched=True,
    )
    st = shift_stage_a_batch(
        ops, lens, rel_pos, win_base, contig_win, read_seq,
        max_clusters=KW["max_clusters"], window=KW["window"], mm=MM,
    )
    tb = sustained_batch_time(
        lambda c, l, p, s: jax.vmap(
            lambda c2, l2, p2, s2: _shift_stage_b(
                c2, l2, p2, s2, window=KW["window"], max_out=BOUND, mm=MM
            )
        )(c, l, p, s),
        (ops, lens, rel_pos, st), REPS, 0, already_batched=True,
    )
    sh_codes, sh_lens, sh_n, sh_pos, _fb = shift_stage_b_batch(
        ops, lens, rel_pos, st, window=KW["window"], max_out=BOUND, mm=MM
    )
    n = bcfg.max_ops
    tf = sustained_batch_time(
        lambda *a: fwd_batch(*a, **KW),
        (sh_codes[:, :n], sh_lens[:, :n], sh_n, sh_pos + win_base,
         bk, bv, nb, ref_win, ref_base, read_seq),
        REPS, 3, already_batched=True,
    )
    total = (ta + tb + tf) * 1e3
    print(
        f"{'staged (A+B+fwd)':30s} {total:8.3f} ms/batch "
        f"(a={ta * 1e3:.3f} b={tb * 1e3:.3f} f={tf * 1e3:.3f})",
        flush=True,
    )
    return total


for round_i in range(2):
    print(f"--- round {round_i} ---")
    staged()
    t("fused + barriers", rev_chain_onejit(True), CHAIN_ARGS, 2)
    t("fused no barriers", rev_chain_onejit(False), CHAIN_ARGS, 2)
