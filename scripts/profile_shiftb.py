"""Shift stage B: segment-sum compress vs boundary-search compress.

BENCH_r02-era stage B read 0.15 ms with the boundary-search compress and
0.30 ms after the expand_sum switch (same bench run that improved fwd).
Isolate whether the compress formulation regressed stage B.
"""

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
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402
from portello_tpu.kernels.shift_kernel import (  # noqa: E402
    _shift_stage_b, shift_stage_a_batch,
)
import portello_tpu.kernels.cigar_kernels as ck  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, W = bcfg.max_clusters, bcfg.window
rng = np.random.default_rng(2027)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb, ref_win, ref_base, read_seq = [
    jax.device_put(np.asarray(a)) for a in items
]
rel_pos = pos - win_base
st = shift_stage_a_batch(
    ops, lens, rel_pos, win_base, contig_win, read_seq,
    max_clusters=MC, window=W, mm=True,
)
st = {k: jax.device_put(np.asarray(v)) for k, v in st.items()}

REPS = 24


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/batch", flush=True)


def compress_search(codes, lens, max_out):
    """Pre-expand_sum compress mm formulation (count_lt boundaries +
    adjacent-diff prefix-table lookups via one-hot matmul)."""
    from portello_tpu.kernels.expand import count_lt, expand_mask, onehot_eq

    n = codes.shape[0]
    codes, lens = jax.lax.optimization_barrier((codes, lens))
    keep = (codes != ck.PAD) & (lens != 0)
    idx = jnp.arange(n, dtype=jnp.int32)
    packed = jnp.where(keep, (idx << 4) | codes.astype(jnp.int32), jnp.int32(-1))
    prev_packed = jnp.concatenate(
        [jnp.full(1, -1, jnp.int32), jax.lax.cummax(packed)[:-1]]
    )
    prev_code = jnp.where(prev_packed >= 0, prev_packed & 0xF, jnp.int32(-1))
    new_run = keep & (prev_code != codes.astype(jnp.int32))
    n_runs = jnp.sum(new_run.astype(jnp.int32))
    overflow = n_runs > max_out
    cs_runs = jnp.cumsum(new_run.astype(jnp.int32))
    r = jnp.arange(max_out, dtype=jnp.int32)
    boundary_q = jnp.arange(1, max_out + 2, dtype=jnp.int32)
    sboth = count_lt(cs_runs, boundary_q)
    ps = jnp.concatenate(
        [jnp.zeros(1, lens.dtype), jnp.cumsum(jnp.where(keep, lens, 0))]
    )
    out_valid = r < jnp.minimum(n_runs, max_out)
    table = jnp.stack(
        [ps.astype(jnp.int32),
         jnp.concatenate([codes.astype(jnp.int32), jnp.full(1, ck.PAD, jnp.int32)])],
        axis=1,
    )
    tv2 = expand_mask(onehot_eq(sboth, n + 1), table)
    out_lens = jnp.where(out_valid, tv2[1:, 0] - tv2[:-1, 0], 0)
    out_codes = jnp.where(out_valid, tv2[:-1, 1], ck.PAD)
    return out_codes, out_lens, jnp.minimum(n_runs, max_out), overflow


def stage_b_with(codes, lens, p, st_, compress_fn):
    orig = ck.compress
    try:
        ck.compress = compress_fn
        return _shift_stage_b(codes, lens, p, st_, window=W, max_out=MAX_OUT, mm=True)
    finally:
        ck.compress = orig


print(f"device={jax.devices()[0]}", file=sys.stderr)

# sanity: equality of the two compress forms through stage B
a_out = jax.jit(jax.vmap(lambda c, l, p, s: _shift_stage_b(
    c, l, p, s, window=W, max_out=MAX_OUT, mm=True)))(
    ops[:8], lens[:8], rel_pos[:8], {k: v[:8] for k, v in st.items()})
b_out = jax.jit(jax.vmap(lambda c, l, p, s: stage_b_with(
    c, l, p, s, lambda cc, ll, mo, mm=False: compress_search(cc, ll, mo))))(
    ops[:8], lens[:8], rel_pos[:8], {k: v[:8] for k, v in st.items()})
for x, y in zip(a_out, b_out):
    assert np.array_equal(np.asarray(x), np.asarray(y))
print("equality ok", flush=True)

t("stage B (expand_sum compress)",
  lambda c, l, p, s: _shift_stage_b(c, l, p, s, window=W, max_out=MAX_OUT, mm=True),
  (ops, lens, rel_pos, st), 1)
t("stage B (search compress)",
  lambda c, l, p, s: stage_b_with(
      c, l, p, s, lambda cc, ll, mo, mm=False: compress_search(cc, ll, mo)),
  (ops, lens, rel_pos, st), 1)
