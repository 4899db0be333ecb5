"""In-context compress-form comparison for the fwd pipeline and stage B.

Isolated microbenchmarks say segsum > search at every shape; stage B in
context says the opposite (4x).  Decide per call site from IN-CONTEXT
timings: run _fwd_item and _shift_stage_b with ck.compress monkeypatched to
each formulation.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402
import portello_tpu.kernels.cigar_kernels as ck  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def compress_search(codes, lens, max_out):
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

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, W = bcfg.max_clusters, bcfg.window
KW = dict(max_out=MAX_OUT, max_clusters=MC, window=W, mm=True)
rng = np.random.default_rng(2026)
fwd_items = tuple(
    jax.device_put(np.asarray(a))
    for a in fast_item_arrays(rng, B, bcfg, 18000, rev=False)
)
rev_items = fast_item_arrays(rng, B, bcfg, 18000, rev=True)

REPS = 24


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/batch", flush=True)


def with_form(fn, form):
    orig = ck.compress

    def searchy(c, l, mo, mm=False):
        return compress_search(c, l, mo) if mm else orig(c, l, mo, mm)

    def wrapped(*a):
        ck.compress = searchy if form == "search" else orig
        try:
            return fn(*a)
        finally:
            ck.compress = orig

    return wrapped


print(f"device={jax.devices()[0]}", file=sys.stderr)

from portello_tpu.models.pipeline_model import _fwd_item  # noqa: E402
from portello_tpu.kernels.shift_kernel import (  # noqa: E402
    _shift_stage_b, shift_stage_a_batch,
)

t("fwd (segsum compress)", with_form(lambda *a: _fwd_item(*a, **KW), "segsum"),
  fwd_items, 3)
t("fwd (search compress)", with_form(lambda *a: _fwd_item(*a, **KW), "search"),
  fwd_items, 3)

ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb, ref_win, ref_base, read_seq = [
    jax.device_put(np.asarray(a)) for a in rev_items
]
rel_pos = pos - win_base
st = shift_stage_a_batch(
    ops, lens, rel_pos, win_base, contig_win, read_seq,
    max_clusters=MC, window=W, mm=True,
)
st = {k: jax.device_put(np.asarray(v)) for k, v in st.items()}
t("stage B (segsum compress)",
  with_form(lambda c, l, p, s: _shift_stage_b(
      c, l, p, s, window=W, max_out=MAX_OUT, mm=True), "segsum"),
  (ops, lens, rel_pos, st), 0)
t("stage B (search compress)",
  with_form(lambda c, l, p, s: _shift_stage_b(
      c, l, p, s, window=W, max_out=MAX_OUT, mm=True), "search"),
  (ops, lens, rel_pos, st), 0)
