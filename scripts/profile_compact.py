"""Same-run A/B: per-item mm fwd pipeline vs batch-compacted mixed-cluster
windows (simplify_batch_compact wired through fwd_batch).  Mixed clusters are
~0.05/read; the compact form converts only ~GBUDGET window rows per batch
instead of 2*B full-sequence tables."""

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
from portello_tpu.models.batch import BucketConfig  # noqa: E402
from portello_tpu.models.pipeline_model import _fwd_item, fwd_batch  # noqa: E402

B = 512
rng = np.random.default_rng(2026)
bcfg = BucketConfig(max_ops=128, max_blocks=48, max_seq=24576, max_clusters=96,
                    window=48)
MO = bcfg.resolved_max_out()
fwd_items = tuple(
    jax.device_put(np.asarray(a))
    for a in fast_item_arrays(rng, B, bcfg, 18000, rev=False)
)

REPS = 24


def t(name, fn, args, pos_index=0, batched=False):
    ms = sustained_batch_time(fn, args, REPS, pos_index,
                              already_batched=batched) * 1e3
    print(f"{name:28s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)


def peritem(*a):
    return _fwd_item(*a, max_out=MO, max_clusters=96, window=48, mm=True)


def compact(*a):
    return fwd_batch(*a, max_out=MO, max_clusters=96, window=48, mm=True)


for tag in ("A", "B", "A", "B"):
    if tag == "A":
        t("fwd per-item mm", peritem, fwd_items, 3)
    else:
        t("fwd compact mm", compact, fwd_items, 3, batched=True)
