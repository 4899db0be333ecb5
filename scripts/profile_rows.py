"""Same-run interleaved A/Bs for the update-grid bounds:

  fwd leg:  max_rows None (U=304) vs 264
  rev leg:  width 160 (max_ops+32) vs 136 (max_ops+8), each at full rows
            vs max_rows 266

Decisions follow the in-context A/B rule (CLAUDE.md): interleave variants
in ONE run, trust only consistent ordering.
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
from portello_tpu.kernels.shift_kernel import (  # noqa: E402
    shift_stage_a_batch, shift_stage_b_batch,
)
from portello_tpu.models.pipeline_model import _fwd_item  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
mm = jax.default_backend() == "tpu"


def kw(max_rows=None):
    return dict(max_out=MAX_OUT, max_clusters=bcfg.max_clusters,
                window=bcfg.window, mm=mm, max_rows=max_rows)


rng = np.random.default_rng(2026)
fwd_items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
dev_fwd = tuple(jax.device_put(np.asarray(a)) for a in fwd_items)

rev_items = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
(ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
 ref_win, ref_base, read_seq) = [jax.device_put(np.asarray(a)) for a in rev_items]
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


def fwd_leg(max_rows):
    return sustained_batch_time(
        lambda *a: _fwd_item(*a, **kw(max_rows)), dev_fwd, REPS, 3) * 1e3


def rev_leg(width, max_rows):
    args = (sh_codes[:, :width], sh_lens[:, :width], sh_n, sh_pos + win_base,
            bk, bv, nb, ref_win, ref_base, read_seq)
    return sustained_batch_time(
        lambda *a: _fwd_item(*a, **kw(max_rows)), args, REPS, 3) * 1e3


for rnd in range(3):
    for mr in (None, 192, 176):
        print(f"round {rnd} fwd rows={mr or 304}: {fwd_leg(mr):7.3f} ms", flush=True)
    for w, mr in ((136, None), (136, 192)):
        print(f"round {rnd} rev w={w} rows={mr or 2*w+48}: "
              f"{rev_leg(w, mr):7.3f} ms", flush=True)
