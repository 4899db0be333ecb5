"""Clean bisection of the full fwd/rev pipeline with device-resident args."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays  # noqa: E402
from portello_tpu.kernels.cigar_kernels import cleanup_and_compress, cigar_read_len  # noqa: E402
from portello_tpu.kernels.liftover_parallel import _liftover_parallel_single  # noqa: E402
from portello_tpu.kernels.simplify_kernel import _simplify_single  # noqa: E402
from portello_tpu.kernels.shift_kernel import _left_shift_single  # noqa: E402
from portello_tpu.models.pipeline_model import _fwd_item, _rev_item  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "512"))
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
kw = dict(max_out=MAX_OUT, max_clusters=bcfg.max_clusters, window=bcfg.window)
rng = np.random.default_rng(3)
dev = jax.devices()[0]
items = tuple(jax.device_put(a, dev) for a in fast_item_arrays(rng, B, bcfg, 18000, rev=False))
ritems = tuple(jax.device_put(a, dev) for a in fast_item_arrays(rng, B, bcfg, 18000, rev=True))
ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = items

print(f"device={dev} B={B} (all args device-resident)", file=sys.stderr)


def bench(name, f, *a, iters=5):
    t0 = time.perf_counter()
    out = f(*a)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms/batch (compile {compile_s:.1f}s)")
    return out


lift_cc = jax.jit(jax.vmap(lambda *a: cleanup_and_compress(*_liftover_parallel_single(*a)[:2], MAX_OUT)))
lifted = bench("lift+compress", lift_cc, ops, lens, n_ops, pos, bk, bv, nb)
l_codes = jax.device_put(np.asarray(lifted[0]), dev)
l_lens = jax.device_put(np.asarray(lifted[1]), dev)
zpos = jax.device_put(np.zeros(B, np.int32), dev)

simp = jax.jit(jax.vmap(lambda c, l, p, rw, rq: _simplify_single(c, l, p, rw, rq, max_clusters=bcfg.max_clusters, window=bcfg.window, max_out=MAX_OUT)))
bench("simplify", simp, l_codes, l_lens, zpos, ref_win, read_seq)

shift = jax.jit(jax.vmap(lambda c, l, p, wb, cw, rq: _left_shift_single(c, l, p, wb, cw, rq, max_clusters=bcfg.max_clusters, window=bcfg.window, max_out=MAX_OUT)))
(rops, rlens, rn_ops, rpos, rwin_base, rcontig_win, rbk, rbv, rnb, rref_win, rref_base, rread_seq) = ritems
bench("left_shift", shift, rops, rlens, rpos, rwin_base, rcontig_win, rread_seq)

fwd = jax.jit(jax.vmap(lambda *a: _fwd_item(*a, **kw)))
bench("fwd_item full", fwd, *items)

rev = jax.jit(jax.vmap(lambda *a: _rev_item(*a, **kw)))
bench("rev_item full", rev, *ritems)
