"""Same-run interleaved A/B: rev-path fwd-leg width 160 (max_ops+32) vs
136 (max_ops+8).  tests/test_shift_run_bound.py proves the shifter grows
run counts by at most one, so max_ops+8 is still safely above the true
worst case (max_ops+1)."""

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
from portello_tpu.kernels.shift_kernel import (  # noqa: E402
    shift_stage_a_batch, shift_stage_b_batch,
)
from portello_tpu.models.pipeline_model import _fwd_item  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
mm = jax.default_backend() == "tpu"
kw = dict(max_out=MAX_OUT, max_clusters=bcfg.max_clusters, window=bcfg.window, mm=mm)
rng = np.random.default_rng(2026)
rev_items = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
dev = [jax.device_put(np.asarray(a)) for a in rev_items]
(ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
 ref_win, ref_base, read_seq) = dev
rel_pos = pos - win_base

st = shift_stage_a_batch(
    ops, lens, rel_pos, win_base, contig_win, read_seq,
    max_clusters=bcfg.max_clusters, window=bcfg.window, mm=mm,
)
sh_codes, sh_lens, sh_n, sh_pos, _fb = shift_stage_b_batch(
    ops, lens, rel_pos, st, window=bcfg.window, max_out=MAX_OUT, mm=mm
)

REPS = 24
print(f"device={jax.devices()[0]}", file=sys.stderr)


def leg(width):
    args = (sh_codes[:, :width], sh_lens[:, :width], sh_n, sh_pos + win_base,
            bk, bv, nb, ref_win, ref_base, read_seq)
    return sustained_batch_time(lambda *a: _fwd_item(*a, **kw), args, REPS, 3)


for rnd in range(3):
    for w in (160, 136, 132):
        ms = leg(w) * 1e3
        print(f"round {rnd} width {w:3d}: {ms:7.3f} ms/batch", flush=True)
