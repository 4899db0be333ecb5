"""Same-run A/B: rev fwd leg at the old _rev_ops_bound width (160; ops axis
lane-pads 128->256) vs capped at exactly max_ops (128; shape-identical to the
fwd graph).  Measures the lane-tile padding cost of crossing 128."""

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
    shift_stage_a_batch, shift_stage_b_batch,
)
from portello_tpu.models.pipeline_model import (  # noqa: E402
    _rev_ops_bound, fwd_batch,
)

B = 512
bcfg = HIFI_BUCKET
KW = dict(
    max_out=bcfg.resolved_max_out(), max_clusters=bcfg.max_clusters,
    window=bcfg.window, mm=True, max_rows=bcfg.resolved_max_rows(),
)
rng = np.random.default_rng(2026)
rev = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
(ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
 ref_win, ref_base, read_seq) = [jax.device_put(np.asarray(a)) for a in rev]
rel_pos = pos - win_base

st = shift_stage_a_batch(
    ops, lens, rel_pos, win_base, contig_win, read_seq,
    max_clusters=bcfg.max_clusters, window=bcfg.window, mm=True,
)
bound = _rev_ops_bound(bcfg.max_ops, KW["max_out"])
sh_codes, sh_lens, sh_n, sh_pos, _ = shift_stage_b_batch(
    ops, lens, rel_pos, st, window=bcfg.window, max_out=bound, mm=True,
)
tail = (bk, bv, nb, ref_win, ref_base, read_seq)

wide_args = (sh_codes, sh_lens, sh_n, sh_pos + win_base, *tail)
cap_args = (
    sh_codes[:, : bcfg.max_ops], sh_lens[:, : bcfg.max_ops], sh_n,
    sh_pos + win_base, *tail,
)
KW_WIDE = dict(KW, max_rows=KW["max_rows"] + 8)
REPS = 24


def t(name, kw, args):
    ms = sustained_batch_time(
        lambda *a: fwd_batch(*a, **kw), args, REPS, 3, already_batched=True
    ) * 1e3
    print(f"{name:28s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)
for tag in ("wide", "cap", "wide", "cap"):
    if tag == "wide":
        t(f"rev fwd {bound}-wide", KW_WIDE, wide_args)
    else:
        t(f"rev fwd {bcfg.max_ops}-cap", KW, cap_args)
