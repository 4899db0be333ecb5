"""Same-run batch-size scan on the POST-compaction kernels: the old verdict
("FLAT 256->2048, 2.3-2.7 us/read") predates the 50x kernel reductions; with
ms-scale graphs, fixed per-dispatch VPU overheads may now favor larger B.
Reports per-read us for each stage and the 50/50 mix at each B (512 repeated
last to expose drift)."""

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
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402
from portello_tpu.kernels.shift_kernel import (  # noqa: E402
    _shift_stage_a, _shift_stage_b, shift_stage_a_batch, shift_stage_b_batch,
)
from portello_tpu.models.pipeline_model import (  # noqa: E402
    _rev_ops_bound, fwd_batch,
)

bcfg = HIFI_BUCKET
KW = dict(
    max_out=bcfg.resolved_max_out(), max_clusters=bcfg.max_clusters,
    window=bcfg.window, mm=True, max_rows=bcfg.resolved_max_rows(),
)
print(f"device={jax.devices()[0]}", file=sys.stderr)


def run(b, reps):
    rng = np.random.default_rng(2026)
    fwd_items = tuple(
        jax.device_put(np.asarray(a))
        for a in fast_item_arrays(rng, b, bcfg, 18000, rev=False)
    )
    rev = fast_item_arrays(rng, b, bcfg, 18000, rev=True)
    shift_args = tuple(
        jax.device_put(np.asarray(a))
        for a in (rev[0], rev[1], rev[3] - rev[4], rev[4], rev[5], rev[11])
    )
    t_fwd = sustained_batch_time(
        lambda *a: fwd_batch(*a, **KW), fwd_items, reps, 3, already_batched=True
    )
    t_a = sustained_batch_time(
        lambda *a: _shift_stage_a(
            *a, max_clusters=bcfg.max_clusters, window=bcfg.window, mm=True),
        shift_args, reps, 2,
    )
    st = shift_stage_a_batch(
        *shift_args, max_clusters=bcfg.max_clusters, window=bcfg.window, mm=True
    )
    bound = _rev_ops_bound(bcfg.max_ops, KW["max_out"])
    t_b = sustained_batch_time(
        lambda c, l, p, s: _shift_stage_b(
            c, l, p, s, window=bcfg.window, max_out=bound, mm=True),
        (shift_args[0], shift_args[1], shift_args[2], st), reps, 0,
    )
    sh = shift_stage_b_batch(
        shift_args[0], shift_args[1], shift_args[2], st,
        window=bcfg.window, max_out=bound, mm=True,
    )
    rev_fwd_args = (
        sh[0], sh[1], sh[2], sh[3] + shift_args[3],
        *(jax.device_put(np.asarray(a)) for a in
          (rev[6], rev[7], rev[8], rev[9], rev[10], rev[11])),
    )
    kw_rev = dict(KW, max_rows=KW["max_rows"] + 8)
    t_rf = sustained_batch_time(
        lambda *a: fwd_batch(*a, **kw_rev), rev_fwd_args, reps, 3,
        already_batched=True,
    )
    mix = 0.5 * t_fwd + 0.5 * (t_a + t_b + t_rf)
    us = 1e6 / b
    print(
        f"B={b:5d}  fwd {t_fwd*us:6.3f}  stA {t_a*us:6.3f}  stB {t_b*us:6.3f}  "
        f"revfwd {t_rf*us:6.3f}  mix {mix*us:6.3f} us/read  "
        f"({b/mix:,.0f} reads/s)",
        flush=True,
    )


for b, reps in ((512, 24), (1024, 16), (2048, 8), (512, 24)):
    run(b, reps)
