"""Same-run A/B: shift stage B compress width 160 (old _rev_ops_bound,
crosses the 128-lane tile) vs 128 (= max_ops; spills flagged and host-
handled anyway since the rev fwd leg is max_ops-capped)."""

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
    _shift_stage_b, shift_stage_a_batch,
)

B = 512
bcfg = HIFI_BUCKET
rng = np.random.default_rng(2026)
rev = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
(ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
 ref_win, ref_base, read_seq) = [jax.device_put(np.asarray(a)) for a in rev]
rel_pos = pos - win_base
st = shift_stage_a_batch(
    ops, lens, rel_pos, win_base, contig_win, read_seq,
    max_clusters=bcfg.max_clusters, window=bcfg.window, mm=True,
)
REPS = 24


def t(name, bound):
    ms = sustained_batch_time(
        lambda c, l, p, s: _shift_stage_b(
            c, l, p, s, window=bcfg.window, max_out=bound, mm=True),
        (ops, lens, rel_pos, st), REPS, 0,
    ) * 1e3
    print(f"{name:28s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)
for bound in (160, 128, 160, 128):
    t(f"stage B bound={bound}", bound)
