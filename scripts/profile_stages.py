"""Honest stage bisection using the fetch-differencing protocol from bench."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from portello_tpu.kernels.cigar_kernels import cleanup_and_compress, clean_up_edge_indels, compress  # noqa: E402
from portello_tpu.kernels.cluster_utils import find_clusters, match_run_left, match_run_right  # noqa: E402
from portello_tpu.kernels.liftover_parallel import _liftover_parallel_single  # noqa: E402
from portello_tpu.kernels.simplify_kernel import _simplify_single  # noqa: E402
from portello_tpu.models.pipeline_model import _fwd_item  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "512"))
REPS = int(os.environ.get("PROF_REPS", "32"))
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, WIN = bcfg.max_clusters, bcfg.window
rng = np.random.default_rng(3)
dev = jax.devices()[0]
items = tuple(jax.device_put(a, dev) for a in fast_item_arrays(rng, B, bcfg, 18000, rev=False))
ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = items

print(f"device={dev} B={B} reps={REPS}", file=sys.stderr)


def show(name, fn, args, pos_index=2):
    t = sustained_batch_time(fn, args, REPS, pos_index)
    print(f"{name:30s} {t*1e3:9.2f} ms/batch  ({B/t:,.0f} items/s)", flush=True)


# liftover raw
show("lift_raw", lambda o, l, n, p, k, v, c: _liftover_parallel_single(o, l, n, p, k, v, c),
     (ops, lens, n_ops, pos, bk, bv, nb), pos_index=3)
# liftover + compress
show("lift+compress",
     lambda o, l, n, p, k, v, c: cleanup_and_compress(*_liftover_parallel_single(o, l, n, p, k, v, c)[:2], MAX_OUT),
     (ops, lens, n_ops, pos, bk, bv, nb), pos_index=3)

# lifted cigars for downstream stages
lift_cc = jax.jit(jax.vmap(lambda o, l, n, p, k, v, c: cleanup_and_compress(*_liftover_parallel_single(o, l, n, p, k, v, c)[:2], MAX_OUT)))
lifted = lift_cc(ops, lens, n_ops, pos, bk, bv, nb)
l_codes = jax.device_put(np.asarray(lifted[0]), dev)
l_lens = jax.device_put(np.asarray(lifted[1]), dev)
zpos = jax.device_put(np.zeros(B, np.int32), dev)

show("clusters", lambda c, l, p: find_clusters(c, l, p, MC), (l_codes, l_lens, zpos), pos_index=2)


def runs_stage(c, l, p, rw, rq):
    cl = find_clusters(c, l, p, MC)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    m0 = jnp.minimum(dl, il)
    post, _ = match_run_right(rw, bs + dl, rq, rs + il, m0, WIN)
    m1 = jnp.minimum(dl - post, il - post)
    pre, _ = match_run_left(rw, bs, rq, rs, m1, WIN)
    return post + pre


show("clusters+match_runs", runs_stage, (l_codes, l_lens, zpos, ref_win, read_seq), pos_index=2)

show("simplify_full",
     lambda c, l, p, rw, rq: _simplify_single(c, l, p, rw, rq, max_clusters=MC, window=WIN, max_out=MAX_OUT),
     (l_codes, l_lens, zpos, ref_win, read_seq), pos_index=2)

show("compress_alone", lambda c, l: compress(c, l, MAX_OUT), (l_codes, l_lens), pos_index=0)

show("fwd_full", lambda *a: _fwd_item(*a, max_out=MAX_OUT, max_clusters=MC, window=WIN),
     items, pos_index=3)
