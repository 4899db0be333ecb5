"""Batch-size A/B: per-read fwd cost at B=256/512/1024/2048.

Per-op fixed overheads (launch, relayouts) amortize with B; HBM working set
grows linearly.  Find the sweet spot for the engine default."""

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
from portello_tpu.models.pipeline_model import _fwd_item  # noqa: E402

bcfg = HIFI_BUCKET
KW = dict(max_out=bcfg.resolved_max_out(), max_clusters=bcfg.max_clusters,
          window=bcfg.window, mm=True)
rng = np.random.default_rng(2026)

print(f"device={jax.devices()[0]}", file=sys.stderr)
for B in (256, 512, 1024, 2048):
    items = tuple(
        jax.device_put(np.asarray(a))
        for a in fast_item_arrays(rng, B, bcfg, 18000, rev=False)
    )
    reps = max(6, 24 * 512 // B)
    ms = sustained_batch_time(
        lambda *a: _fwd_item(*a, **KW), items, reps, 3
    ) * 1e3
    print(f"fwd B={B:5d}  {ms:8.3f} ms/batch  {ms/B*1000:7.2f} us/read",
          flush=True)
