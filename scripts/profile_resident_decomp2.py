"""Finer decomposition of the round-5 resident production graph: where does
the ~0.48 ms that survives the window-fetch stub live?

  V1 emissions only             (liftover grid, no cleanup/compress)
  V0 lift incl cleanup+compress (_lift_core)
  V2 V0 + cluster part1         (cases + per-item MXI compaction)
  V3 V0 + part1 + global compaction + scatter + part2 (windows stubbed)
  V4 full resident graph

Deltas (same-pass): cleanup+compress = V0-V1, part1 = V2-V0,
compaction/scatter/part2 = V3-V2, window fetch+compare = V4-V3.

Usage: python scripts/profile_resident_decomp2.py [cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
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
from portello_tpu.kernels.liftover_parallel import (  # noqa: E402
    _liftover_parallel_single,
)
from portello_tpu.kernels.simplify_kernel import (  # noqa: E402
    MXI,
    _cluster_cases,
    _compact_core,
)
from portello_tpu.kernels.expand import expand_sum  # noqa: E402
from portello_tpu.models.pipeline_model import (  # noqa: E402
    _lift_core,
    cigar_read_len,
    fwd_batch_resident,
)
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

cpu = jax.default_backend() == "cpu"
B = 64 if cpu else 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, W = bcfg.max_clusters, bcfg.window
MAX_ROWS = bcfg.resolved_max_rows()
kw = dict(max_out=MAX_OUT, max_clusters=MC, window=W, max_rows=MAX_ROWS)
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, 2000 if cpu else 18000, rev=False)
res_np, words = resident_timing_args(items, rng, 8 if cpu else 256)
args = tuple(jax.device_put(a) for a in res_np) + (jax.device_put(words),)


def _lift_batch(o, l, n, p, k, v, m):
    return jax.vmap(
        lambda a, b_, c, d, e, f, g: _lift_core(
            a, b_, c, d, e, f, g, max_out=MAX_OUT, mm=True, max_rows=MAX_ROWS
        )
    )(o, l, n, p, k, v, m)


@jax.jit
def v1_emissions(o, l, n, p, k, v, m, g_sb, g_off, rb, rp_, w_):
    return jax.vmap(
        lambda a, b_, c, d, e, f, g: _liftover_parallel_single(
            a, b_, c, d, e, f, g, True, MAX_ROWS
        )
    )(o, l, n, p, k, v, m)


@jax.jit
def v0_lift(o, l, n, p, k, v, m, g_sb, g_off, rb, rp_, w_):
    lc, ll, ln, rp, mapped, ov = _lift_batch(o, l, n, p, k, v, m)
    return lc, ll, ln, rp, mapped, ov, jax.vmap(cigar_read_len)(lc, ll)


@jax.jit
def v2_part1(o, l, n, p, k, v, m, g_sb, g_off, rb, rp_, w_):
    lc, ll, ln, rp, mapped, ov = _lift_batch(o, l, n, p, k, v, m)
    rl = jax.vmap(cigar_read_len)(lc, ll)

    def part1(c, le, pp):
        cl, cvalid, pure, one_one, mixed = _cluster_cases(c, le, pp, MC, True)
        rank = jnp.cumsum(mixed.astype(jnp.int32)) - 1
        n_mix = jnp.sum(mixed.astype(jnp.int32))
        j = jnp.arange(MXI, dtype=jnp.int32)
        cmask = ((rank[None, :] == j[:, None]) & mixed[None, :]).astype(
            jnp.bfloat16
        )
        st4 = expand_sum(
            cmask,
            jnp.stack([cl["ref_start"], cl["read_start"], cl["del_len"],
                       cl["ins_len"]], axis=1).astype(jnp.int32),
        )
        return n_mix, st4

    n_mix, st4 = jax.vmap(part1)(lc, ll, rp - rb)
    return n_mix, st4, rl, mapped


@jax.jit
def v3_stub(o, l, n, p, k, v, m, g_sb, g_off, rb, rp_, w_):
    lc, ll, ln, rp, mapped, ov = _lift_batch(o, l, n, p, k, v, m)
    rl = jax.vmap(cigar_read_len)(lc, ll)

    def runs_stub(gst, gitem):
        anchor = gst[:, 0] + gst[:, 1] + gitem + rp_[0, 0]
        raw = (anchor % jnp.int32(W + 1)).astype(jnp.int32)
        return raw, raw

    s_codes, s_lens, s_n, s_pos_rel, s_fb = _compact_core(
        lc, ll, rp - rb, runs_stub,
        max_clusters=MC, window=W, max_out=MAX_OUT,
    )
    return s_codes, s_lens, s_n, s_pos_rel, s_fb, rl, mapped


@jax.jit
def v4_full(*a):
    return fwd_batch_resident(*a[:-1], a[-1], **kw)


REPS = 4 if cpu else 24
variants = [
    ("V1 emissions only", v1_emissions),
    ("V0 lift incl cleanup+compress", v0_lift),
    ("V2 V0 + part1", v2_part1),
    ("V3 + compaction/scatter (stub windows)", v3_stub),
    ("V4 full resident", v4_full),
]
for _pass in range(3):
    for name, f in variants:
        ms = sustained_batch_time(f, args, REPS, 3, already_batched=True) * 1e3
        print(f"{name:42s} {ms:8.3f} ms/batch", flush=True)
