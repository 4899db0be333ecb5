"""In-context A/B of the compress mm_form PER CALL SITE inside the
production fwd graph (round 4).

fwd_batch contains two cleanup_and_compress sites: the lift core's (352-wide
emit stream -> max_out) and the simplify reassembly's (2*max_out-wide
emission -> max_out).  Both default to segsum; the per-site in-context
ranking has only been measured for shift stage B (search won 4x there).
Variants: (lift_form, simplify_form) in {segsum, search}^2, interleaved.
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
from portello_tpu.kernels.cigar_kernels import cleanup_and_compress  # noqa: E402
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


def make_variant(lift_form, simp_form):
    def cc_lift(c, l, mo, mmf, mm_form="segsum"):
        return cleanup_and_compress(c, l, mo, mmf, mm_form=lift_form)

    def cc_simp(c, l, mo, mmf, mm_form="segsum"):
        return cleanup_and_compress(c, l, mo, mmf, mm_form=simp_form)

    def run(*a):
        old_l = pipeline_model.cleanup_and_compress
        old_s = simplify_kernel.cleanup_and_compress
        pipeline_model.cleanup_and_compress = cc_lift
        simplify_kernel.cleanup_and_compress = cc_simp
        try:
            return pipeline_model.fwd_batch.__wrapped__(*a, **kw)
        finally:
            pipeline_model.cleanup_and_compress = old_l
            simplify_kernel.cleanup_and_compress = old_s

    return jax.jit(run)


variants = [
    ("segsum/segsum (prod)", make_variant("segsum", "segsum")),
    ("search/segsum", make_variant("search", "segsum")),
    ("segsum/search", make_variant("segsum", "search")),
    ("search/search", make_variant("search", "search")),
]

# equality check (CPU or first pass): all variants bit-identical
outs = [jax.tree_util.tree_map(np.asarray, v(*args)) for _, v in variants]
for name, o in zip([n for n, _ in variants][1:], outs[1:]):
    for k in outs[0]:
        assert np.array_equal(outs[0][k], o[k]), (name, k)
print("all variants bit-identical", file=sys.stderr)

for _pass in range(2):
    for name, v in variants:
        ms = sustained_batch_time(v, args, REPS, 3, already_batched=True) * 1e3
        print(f"{name:24s} {ms:8.3f} ms/batch", flush=True)
