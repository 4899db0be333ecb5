"""Does the sustained protocol hoist seq-table subgraphs out of the timing
loop?  A/B: perturb only pos (the r1-r4 protocol) vs ALSO perturbing the two
seq tables from the carry (keeps every seq-derived conversion in-loop, as
production dispatches pay it per batch).  A large gap = the bench has been
under-reporting production fwd cost and seq-side A/Bs were blind.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays  # noqa: E402
from portello_tpu.models.pipeline_model import fwd_batch  # noqa: E402
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


def make(n, perturb_seq):
    def run(*a):
        def body(i, acc):
            a2 = list(a)
            a2[3] = a2[3] + (acc & 1).astype(a2[3].dtype)
            if perturb_seq:
                d = (acc & 1).astype(jnp.uint8)
                a2[7] = a2[7] + d  # ref_win
                a2[9] = a2[9] + d  # read_seq
            out = fwd_batch(*a2, **kw)
            total = jnp.int32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                total = total + jnp.sum(leaf).astype(jnp.int32)
            return total

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return jax.jit(run)


def t(f):
    t0 = time.perf_counter()
    int(f(*args))
    return time.perf_counter() - t0


variants = {}
for tag, ps in (("pos-only", False), ("pos+seqs", True)):
    lo, hi = max(REPS // 4, 1), REPS
    f_lo, f_hi = make(lo, ps), make(hi, ps)
    int(f_lo(*args))
    int(f_hi(*args))
    variants[tag] = (lo, hi, f_lo, f_hi)

for _pass in range(3):
    for tag, (lo, hi, f_lo, f_hi) in variants.items():
        t_los, t_his = [], []
        for _ in range(3):
            t_los.append(t(f_lo))
            t_his.append(t(f_hi))
        ms = (min(t_his) - min(t_los)) / (hi - lo) * 1e3
        print(f"{tag:12s} {ms:8.3f} ms/batch", flush=True)
