"""Noise-immune device timing: repeat the kernel N times inside one jit so a
single RPC round-trip covers N executions (the axon relay adds unstable
per-call latency that poisons naive timing).

An optimization_barrier threading a loop-carried value through the kernel's
inputs defeats CSE/LICM so every iteration really executes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays  # noqa: E402
from portello_tpu.models.pipeline_model import _fwd_item, _rev_item  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "512"))
REPS = int(os.environ.get("PROF_REPS", "20"))
bcfg = HIFI_BUCKET
kw = dict(
    max_out=bcfg.resolved_max_out(),
    max_clusters=bcfg.max_clusters,
    window=bcfg.window,
)
rng = np.random.default_rng(3)
dev = jax.devices()[0]
items = tuple(jax.device_put(a, dev) for a in fast_item_arrays(rng, B, bcfg, 18000, rev=False))
ritems = tuple(jax.device_put(a, dev) for a in fast_item_arrays(rng, B, bcfg, 18000, rev=True))

print(f"device={dev} B={B} reps-in-jit={REPS}", file=sys.stderr)


def repeat_in_jit(single_fn, args, reps):
    """jit(fori_loop(reps, vmapped fn)) with anti-CSE dependency threading."""
    vf = jax.vmap(single_fn)

    def run(*a):
        def body(i, acc):
            # Thread a genuinely unknown (to the compiler) value into one
            # input so the body can't be hoisted: acc>>31 is 0 at runtime for
            # our accumulators but not provably so.
            a2 = list(a)
            a2[3] = a2[3] + (acc & 1).astype(a2[3].dtype)  # data-dependent, unfoldable
            out = vf(*a2)
            # carry must consume EVERY output or XLA DCEs the iteration body
            total = jnp.int32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                total = total + jnp.sum(leaf).astype(jnp.int32)
            return total

        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    return jax.jit(run)


def bench(name, single_fn, args):
    fN = repeat_in_jit(single_fn, args, REPS)
    jax.block_until_ready(fN(*args))
    tN = min(_t(lambda: jax.block_until_ready(fN(*args))) for _ in range(4))
    per = tN / REPS
    print(
        f"{name:18s} {per*1e3:9.2f} ms/batch  {per/B*1e6:7.1f} us/read  "
        f"({B/per:,.0f} reads/s)  [total {tN:.2f}s/{REPS} reps]", flush=True,
    )


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


bench("fwd_item", lambda *a: _fwd_item(*a, **kw), items)
bench("rev_item", lambda *a: _rev_item(*a, **kw), ritems)
