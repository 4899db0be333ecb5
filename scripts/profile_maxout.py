"""Same-run A/B: fwd pipeline with max_out=160 vs 232 (cross-run bench
variance is +-15%, so only a within-run comparison can decide)."""

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
from portello_tpu.models.pipeline_model import _fwd_item  # noqa: E402
from portello_tpu.kernels.shift_kernel import _left_shift_single  # noqa: E402

B = 512
rng = np.random.default_rng(2026)
bcfg = BucketConfig(max_ops=128, max_blocks=48, max_seq=24576, max_clusters=96,
                    window=48)
fwd_items = tuple(
    jax.device_put(np.asarray(a))
    for a in fast_item_arrays(rng, B, bcfg, 18000, rev=False)
)

REPS = 24


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:28s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)
for mo in (232, 160, 232, 160):
    t(f"fwd max_out={mo}",
      lambda *a, mo=mo: _fwd_item(
          *a, max_out=mo, max_clusters=96, window=48, mm=True),
      fwd_items, 3)
