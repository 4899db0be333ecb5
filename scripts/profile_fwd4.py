"""Round-4 fine-grained in-context decomposition of the production fwd graph.

Sub-variants isolate the two compress passes and the simplify sub-stages that
profile_fwd_prod.py's A-C difference lumps together:

  L0 lift-only incl. cleanup+compress      (profile_fwd_prod's B)
  L1 lift emissions only (no cleanup/compress)
  L2 emissions + edge cleanup (no compress)
  S1 lift + clusters part1                 (profile_fwd_prod's C)
  S2 lift + part1 + batch compaction + window fetch/compare (no part2)
  A  full fwd_batch
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

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from portello_tpu.kernels.cigar_kernels import (  # noqa: E402
    clean_up_edge_indels,
    cleanup_and_compress,
)
from portello_tpu.kernels.liftover_parallel import (  # noqa: E402
    _liftover_parallel_single,
)
from portello_tpu.kernels.simplify_kernel import (  # noqa: E402
    MXI,
    _cluster_cases,
    _g_budget,
)
from portello_tpu.models.pipeline_model import (  # noqa: E402
    _lift_core,
    cigar_read_len,
    fwd_batch,
)
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, W = bcfg.max_clusters, bcfg.window
mm = jax.default_backend() == "tpu"
MAX_ROWS = bcfg.resolved_max_rows()
kw = dict(max_out=MAX_OUT, max_clusters=MC, window=W, mm=mm, max_rows=MAX_ROWS)
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
args = tuple(jax.device_put(np.asarray(a)) for a in items)
REPS = 24
print(f"device={jax.devices()[0]} mm={mm} max_rows={MAX_ROWS} "
      f"max_out={MAX_OUT}", file=sys.stderr)


def t(name, fn, a):
    ms = sustained_batch_time(fn, a, REPS, 3, already_batched=True) * 1e3
    print(f"{name:52s} {ms:8.3f} ms/batch", flush=True)


def full(o, l, n, p, k, v, m, rw, rb, rs):
    return fwd_batch(o, l, n, p, k, v, m, rw, rb, rs, **kw)


def lift_only(o, l, n, p, k, v, m, rw, rb, rs):
    lc, ll, ln, rp, mapped, ov = jax.vmap(
        lambda a, b, c, d, e, f, g: _lift_core(
            a, b, c, d, e, f, g, max_out=MAX_OUT, mm=mm, max_rows=MAX_ROWS
        )
    )(o, l, n, p, k, v, m)
    rl = jax.vmap(cigar_read_len)(lc, ll)
    return lc, ll, ln, rp, mapped, ov, rl


def emissions_only(o, l, n, p, k, v, m, rw, rb, rs):
    ec, el, r2, ovf = jax.vmap(
        lambda a, b, c, d, e, f, g: _liftover_parallel_single(
            a, b, c, d, e, f, g, mm, MAX_ROWS
        )
    )(o, l, n, p, k, v, m)
    return ec, el, r2, ovf


def emissions_cleanup(o, l, n, p, k, v, m, rw, rb, rs):
    ec, el, r2, ovf = jax.vmap(
        lambda a, b, c, d, e, f, g: _liftover_parallel_single(
            a, b, c, d, e, f, g, mm, MAX_ROWS
        )
    )(o, l, n, p, k, v, m)
    cc, cl, sh = jax.vmap(clean_up_edge_indels)(ec, el)
    return cc, cl, sh, r2, ovf


def _lift_batch(o, l, n, p, k, v, m):
    return jax.vmap(
        lambda a, b, c, d, e, f, g: _lift_core(
            a, b, c, d, e, f, g, max_out=MAX_OUT, mm=mm, max_rows=MAX_ROWS
        )
    )(o, l, n, p, k, v, m)


def lift_part1(o, l, n, p, k, v, m, rw, rb, rs):
    lc, ll, ln, rp, mapped, ov = _lift_batch(o, l, n, p, k, v, m)
    rl = jax.vmap(cigar_read_len)(lc, ll)

    def p1(c, le, pp):
        cl, cvalid, pure, one_one, mixed = _cluster_cases(c, le, pp, MC, True)
        return cl["n_clusters"], mixed.sum()

    ncl, nmix = jax.vmap(p1)(lc, ll, rp - rb)
    return ncl, nmix, rl, mapped


def lift_windows(o, l, n, p, k, v, m, rw, rb, rs):
    """Everything through the compacted window compare (no part2/emission)."""
    from portello_tpu.kernels.cluster_utils import _window_bytes_mm_t
    from portello_tpu.kernels.expand import expand_bytes, expand_sum, onehot_eq

    lc, ll, ln, rp, mapped, ov = _lift_batch(o, l, n, p, k, v, m)
    rl = jax.vmap(cigar_read_len)(lc, ll)
    ref_pos = rp - rb
    g_budget = _g_budget(B)

    def part1(c, le, pp):
        cl, cvalid, pure, one_one, mixed = _cluster_cases(c, le, pp, MC, True)
        rank = jnp.cumsum(mixed.astype(jnp.int32)) - 1
        n_mix = jnp.sum(mixed.astype(jnp.int32))
        j = jnp.arange(MXI, dtype=jnp.int32)
        cmask = ((rank[None, :] == j[:, None]) & mixed[None, :]).astype(jnp.bfloat16)
        st4 = expand_sum(
            cmask,
            jnp.stack([cl["ref_start"], cl["read_start"], cl["del_len"],
                       cl["ins_len"]], axis=1).astype(jnp.int32),
        )
        return n_mix, st4

    n_mix, st4 = jax.vmap(part1)(lc, ll, ref_pos)
    flat_valid = (
        jnp.arange(MXI, dtype=jnp.int32)[None, :]
        < jnp.minimum(n_mix, MXI)[:, None]
    ).reshape(-1)
    flat_st = st4.reshape(B * MXI, 4)
    grank = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
    g = jnp.arange(g_budget, dtype=jnp.int32)
    gmask = ((grank[None, :] == g[:, None]) & flat_valid[None, :]).astype(jnp.bfloat16)
    gst = expand_sum(gmask, flat_st)
    item_ids = jnp.repeat(jnp.arange(B, dtype=jnp.int32), MXI)
    gitem = expand_sum(gmask, item_ids[:, None])[:, 0]
    sel = onehot_eq(gitem, B)
    rows_a = expand_bytes(sel, rw)
    rows_b = expand_bytes(sel, rs)
    bsg, rsg, dlg, ilg = gst[:, 0], gst[:, 1], gst[:, 2], gst[:, 3]
    wa = jax.vmap(lambda row, st: _window_bytes_mm_t(row, st, W, 0xFE))(
        rows_a, jnp.stack([bsg + dlg - W, bsg], axis=1))
    wb = jax.vmap(lambda row, st: _window_bytes_mm_t(row, st, W, 0xFD))(
        rows_b, jnp.stack([rsg + ilg - W, rsg], axis=1))
    eqg = (wa == wb).astype(jnp.int32)
    raw_r_g = jnp.sum(jax.lax.cumprod(eqg[:, :, 0], axis=1, reverse=True), axis=1)
    raw_l_g = jnp.sum(jnp.cumprod(eqg[:, :, 1], axis=1), axis=1)
    return raw_r_g, raw_l_g, rl, mapped


variants = [
    ("A  full fwd_batch", jax.jit(full)),
    ("L0 lift-only incl cleanup+compress", jax.jit(lift_only)),
    ("L1 lift emissions only", jax.jit(emissions_only)),
    ("L2 emissions + edge cleanup", jax.jit(emissions_cleanup)),
    ("S1 lift + clusters part1", jax.jit(lift_part1)),
    ("S2 lift + compaction + window compare", jax.jit(lift_windows)),
]

for _pass in range(2):
    for name, v in variants:
        t(name, v, args)
