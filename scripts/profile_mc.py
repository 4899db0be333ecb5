"""Stage A cluster-budget clamp: max_clusters vs the PROVEN raw-cigar bound.

Stage A runs on the read's ORIGINAL cigar (<= max_ops ops), and a maximal
run of I/D ops needs a separator between runs, so n_clusters <= ceil(
max_ops / 2) = 64 for the HiFi bucket — the bucket's 96 (sized for the
WIDER lifted cigars simplify sees) provably over-allocates every per-cluster
tensor and mask in stage A.  Interleaved same-run A/B at C = 96 / 64 on
stage A alone and on the fused rev chain.
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
from portello_tpu.kernels.shift_kernel import _shift_stage_a, _shift_stage_b  # noqa: E402
from portello_tpu.models.pipeline_model import _rev_ops_bound, fwd_batch  # noqa: E402
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
rng = np.random.default_rng(2029)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
(ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
 ref_win, ref_base, read_seq) = [jax.device_put(np.asarray(a)) for a in items]
rel_pos = pos - win_base
REPS = 24


def stage_a_fn(mc):
    return lambda *a: jax.vmap(
        lambda c, l, p, wb, rw, rq: _shift_stage_a(
            c, l, p, wb, rw, rq, max_clusters=mc, window=KW["window"], mm=MM
        )
    )(*a)


def chain_fn(mc):
    def run(ops, lens, rel_pos, win_base, contig_win, read_seq,
            bk, bv, nb, ref_win, ref_base):
        st = jax.vmap(
            lambda c, l, p, wb, rw, rq: _shift_stage_a(
                c, l, p, wb, rw, rq, max_clusters=mc, window=KW["window"], mm=MM
            )
        )(ops, lens, rel_pos, win_base, contig_win, read_seq)
        sh_codes, sh_lens, sh_n, sh_pos, sh_fb = jax.vmap(
            lambda c, l, p, s: _shift_stage_b(
                c, l, p, s, window=KW["window"], max_out=BOUND, mm=MM
            )
        )(ops, lens, rel_pos, st)
        n = ops.shape[1]
        sh_fb = sh_fb | (sh_n > n)
        out = fwd_batch(
            sh_codes[:, :n], sh_lens[:, :n], sh_n, sh_pos + win_base,
            bk, bv, nb, ref_win, ref_base, read_seq, **KW,
        )
        out["fallback"] = out["fallback"] | sh_fb
        return out

    return run


A_ARGS = (ops, lens, rel_pos, win_base, contig_win, read_seq)
C_ARGS = (ops, lens, rel_pos, win_base, contig_win, read_seq,
          bk, bv, nb, ref_win, ref_base)


def t(name, fn, args, pos_index):
    ms = sustained_batch_time(fn, args, REPS, pos_index, already_batched=True) * 1e3
    print(f"{name:26s} {ms:8.3f} ms/batch", flush=True)


for r in range(2):
    print(f"--- round {r} ---")
    for mc in (96, 64):
        t(f"stage A  C={mc}", stage_a_fn(mc), A_ARGS, 2)
    for mc in (96, 64):
        t(f"rev chain C={mc}", chain_fn(mc), C_ARGS, 2)
