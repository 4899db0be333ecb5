"""Stage-by-stage device profiling of the liftover pipeline.

Times each kernel stage and variant in one process so compile costs amortize
and comparisons share the device.  Usage:
    python scripts/profile_tpu.py [cpu]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays  # noqa: E402
from portello_tpu.kernels.cigar_kernels import PAD, cleanup_and_compress  # noqa: E402
from portello_tpu.kernels.liftover_kernel import _liftover_scan_single  # noqa: E402
from portello_tpu.kernels.liftover_parallel import _liftover_parallel_single  # noqa: E402
from portello_tpu.kernels.simplify_kernel import _simplify_single  # noqa: E402
from portello_tpu.kernels.shift_kernel import _left_shift_single  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "512"))
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
rng = np.random.default_rng(3)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = items
ritems = fast_item_arrays(rng, B, bcfg, 18000, rev=True)

print(f"device={jax.devices()[0]} B={B} bucket={bcfg}", file=sys.stderr)


def bench(name, f, *a, iters=3):
    t_c0 = time.perf_counter()
    out = f(*a)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.1f} ms/batch  {dt/B*1e6:8.0f} us/read  (compile {compile_s:.1f}s)")
    return out


# 1. liftover scan (v1) vs parallel (v2), raw emissions only
bench("lift_scan_raw", jax.jit(jax.vmap(_liftover_scan_single)), ops, lens, n_ops, pos, bk, bv, nb)
bench("lift_parallel_raw", jax.jit(jax.vmap(_liftover_parallel_single)), ops, lens, n_ops, pos, bk, bv, nb)

# 2. + cleanup/compress
lp_cc = jax.jit(
    jax.vmap(
        lambda *a: cleanup_and_compress(*_liftover_parallel_single(*a)[:2], MAX_OUT)
    )
)
lifted = bench("lift_parallel+compress", lp_cc, ops, lens, n_ops, pos, bk, bv, nb)
l_codes = np.asarray(lifted[0])
l_lens = np.asarray(lifted[1])

# 3. simplify alone on lifted cigars
simp = jax.jit(
    jax.vmap(
        lambda c, l, p, rw, rq: _simplify_single(
            c, l, p, rw, rq,
            max_clusters=bcfg.max_clusters, window=bcfg.window, max_out=MAX_OUT,
        )
    )
)
bench("simplify", simp, l_codes, l_lens, np.zeros(B, np.int32), ref_win, read_seq)

# 4. left shift alone (on the raw input cigars as the rev path does)
shift = jax.jit(
    jax.vmap(
        lambda c, l, p, wb, cw, rq: _left_shift_single(
            c, l, p, wb, cw, rq,
            max_clusters=bcfg.max_clusters, window=bcfg.window, max_out=MAX_OUT,
        )
    )
)
(rops, rlens, rn_ops, rpos, rwin_base, rcontig_win, rbk, rbv, rnb,
 rref_win, rref_base, rread_seq) = ritems
bench("left_shift", shift, rops, rlens, rpos - rwin_base, rwin_base, rcontig_win, rread_seq)

# 5. full pipelines
from portello_tpu.models.pipeline_model import fwd_batch, rev_batch  # noqa: E402

kw = dict(max_out=MAX_OUT, max_clusters=bcfg.max_clusters, window=bcfg.window)
bench("fwd_batch(full)", lambda *a: fwd_batch(*a, **kw), *items)
bench("rev_batch(full)", lambda *a: rev_batch(*a, **kw), *ritems)
