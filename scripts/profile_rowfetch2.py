"""Round-4 re-A/B of the compact-slot row fetch INSIDE the full production
fwd graph: onehot (default; converts the full (B, L) byte tables to bf16 dot
operands — ~50 MB/batch of HBM traffic) vs gather (jnp.take of G=64 rows).

profile_rowfetch.py measured these neutral in the round-2 context; the
round-4 decomposition (profile_fwd4.py) shows the window block is now the
largest fwd component, so re-rank in today's graph.  Variants interleaved
A,B,A,B per pass.
"""

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

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from portello_tpu.kernels import simplify_kernel  # noqa: E402
from portello_tpu.models import pipeline_model  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
mm = jax.default_backend() == "tpu"
kw = dict(
    max_out=bcfg.resolved_max_out(), max_clusters=bcfg.max_clusters,
    window=bcfg.window, mm=mm, max_rows=bcfg.resolved_max_rows(),
)
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
args = tuple(jax.device_put(np.asarray(a)) for a in items)
REPS = 24
print(f"device={jax.devices()[0]} mm={mm}", file=sys.stderr)

real_sbc = simplify_kernel.simplify_batch_compact


def make_variant(row_fetch):
    def sbc(*a, **k):
        k["row_fetch"] = row_fetch
        return real_sbc(*a, **k)

    def run(*a):
        old = pipeline_model.__dict__.get("simplify_batch_compact")
        simplify_kernel.simplify_batch_compact = sbc
        try:
            return pipeline_model.fwd_batch.__wrapped__(*a, **kw)
        finally:
            simplify_kernel.simplify_batch_compact = real_sbc
            _ = old

    return jax.jit(run)


variants = [
    ("onehot row fetch (prod)", make_variant("onehot")),
    ("gather row fetch", make_variant("gather")),
]

outs = [jax.tree_util.tree_map(np.asarray, v(*args)) for _, v in variants]
for k in outs[0]:
    assert np.array_equal(outs[0][k], outs[1][k]), k
print("variants bit-identical", file=sys.stderr)

for _pass in range(3):
    for name, v in variants:
        ms = sustained_batch_time(v, args, REPS, 3, already_batched=True) * 1e3
        print(f"{name:28s} {ms:8.3f} ms/batch", flush=True)
