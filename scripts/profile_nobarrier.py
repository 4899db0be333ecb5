"""A/B: the compress-entry optimization_barrier on the RESIDENT mm graph.

compress() puts a barrier in front of its prefix scans because GATHER-built
emission streams fused into the scans serialize (~7x, profile_isolate.py).
The mm/resident production graph builds its streams from matmuls + wheres —
no gathers — so the barrier there may be a pure fusion seam cost (it forces
the (B, 2*max_out) codes/lens intermediates to materialize).  Variant B
traces the SAME production graph with jax.lax.optimization_barrier patched
to identity during tracing (bit-identical outputs by construction; checked
on one batch).  sustained_batch_time retraces per call, so the patch wraps
every B timing call.

Usage: python scripts/profile_nobarrier.py [cpu]
"""

import contextlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import (  # noqa: E402
    fast_item_arrays,
    resident_timing_args,
    sustained_batch_time,
)
from portello_tpu.models.pipeline_model import fwd_batch_resident  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

cpu = jax.default_backend() == "cpu"
B = 64 if cpu else 512
bcfg = HIFI_BUCKET
kw = dict(
    max_out=bcfg.resolved_max_out(), max_clusters=bcfg.max_clusters,
    window=bcfg.window, max_rows=bcfg.resolved_max_rows(),
)
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, 2000 if cpu else 18000, rev=False)
res_np, words = resident_timing_args(items, rng, 8 if cpu else 256)
args = tuple(jax.device_put(a) for a in res_np) + (jax.device_put(words),)


def fA(*a):
    return fwd_batch_resident(*a, **kw)


def fB(*a):  # distinct identity so jit caches never collide with fA
    return fwd_batch_resident(*a, **kw)


@contextlib.contextmanager
def no_barrier():
    orig = jax.lax.optimization_barrier
    jax.lax.optimization_barrier = lambda x: x
    try:
        yield
    finally:
        jax.lax.optimization_barrier = orig


# value equality on one batch (barrier is semantically identity)
outA = jax.jit(fA)(*args)
with no_barrier():
    outB = jax.jit(fB).lower(*args).compile()(*args)
for k in outA:
    np.testing.assert_array_equal(np.asarray(outA[k]), np.asarray(outB[k]))
print("outputs bit-identical", flush=True)

REPS = 4 if cpu else 24
for _pass in range(4):
    a = sustained_batch_time(fA, args, REPS, 3, already_batched=True) * 1e3
    with no_barrier():
        b = sustained_batch_time(fB, args, REPS, 3, already_batched=True) * 1e3
    print(f"A barrier   {a:8.3f} ms/batch | B no-barrier {b:8.3f} ms/batch",
          flush=True)
