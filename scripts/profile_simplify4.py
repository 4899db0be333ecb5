"""Why does the window fetch cost ~2x more inside simplify than standalone?

Hypothesis: the fetch's mask construction fuses with the mixed-compaction
producer chain (expand_sum outputs feeding sa/sb).  Variants:

- full: current _simplify_single (baseline)
- barrier: optimization_barrier between compaction outputs and the fetch
- nocompact: no mixed compaction — lane-major fetch over all max_clusters
  lanes (and no back-expansion / no budget fallback)
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
from portello_tpu.kernels.cigar_kernels import (  # noqa: E402
    D, I, M, PAD, cleanup_and_compress,
)
from portello_tpu.kernels.cluster_utils import (  # noqa: E402
    _window_bytes_mm_t, find_clusters,
)
from portello_tpu.kernels.simplify_kernel import _simplify_single  # noqa: E402
from portello_tpu.models.pipeline_model import _lift_core  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
MC, W = bcfg.max_clusters, bcfg.window
MX = max(8, MC // 4)
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq = [
    jax.device_put(np.asarray(a)) for a in items
]
lift_b = jax.jit(jax.vmap(
    lambda o, l, n, p, k, v, m: _lift_core(o, l, n, p, k, v, m, max_out=MAX_OUT, mm=True)
))
l_codes, l_lens, l_n, l_pos, l_mapped, _ = lift_b(ops, lens, n_ops, pos, bk, bv, nb)
l_rel = l_pos - ref_base

REPS = 24


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:32s} {ms:8.3f} ms/batch", flush=True)


def simplify_variant(c, l, p, rw, rq, *, compact, barrier):
    """_simplify_single's mm path with knobs (mirrors simplify_kernel)."""
    from portello_tpu.kernels.expand import expand_mask, expand_sum, onehot_eq

    n = c.shape[0]
    cl = find_clusters(c, l, p, MC, True)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    cvalid = jnp.arange(MC, dtype=jnp.int32) < cl["n_clusters"]
    pure = (dl == 0) | (il == 0)
    one_one = (dl == 1) & (il == 1)
    mixed = cvalid & ~pure & ~one_one
    m0 = jnp.minimum(dl, il)

    if compact:
        rank = jnp.cumsum(mixed.astype(jnp.int32)) - 1
        j = jnp.arange(MX, dtype=jnp.int32)
        cmask = ((rank[None, :] == j[:, None]) & mixed[None, :]).astype(jnp.bfloat16)
        cv4 = expand_sum(cmask, jnp.stack([bs, rs, dl, il], axis=1).astype(jnp.int32))
        bsj, rsj, dlj, ilj = cv4[:, 0], cv4[:, 1], cv4[:, 2], cv4[:, 3]
        sa = jnp.concatenate([bsj + dlj - W, bsj])
        sb = jnp.concatenate([rsj + ilj - W, rsj])
        if barrier:
            sa, sb = jax.lax.optimization_barrier((sa, sb))
        wa = _window_bytes_mm_t(rw, sa, W, 0xFE)
        wb = _window_bytes_mm_t(rq, sb, W, 0xFD)
        eq_r = wa[:, :MX] == wb[:, :MX]
        eq_l = wa[:, MX:] == wb[:, MX:]
        raw_r_j = jnp.sum(jax.lax.cumprod(eq_r.astype(jnp.int32), axis=0, reverse=True), axis=0)
        raw_l_j = jnp.sum(jnp.cumprod(eq_l.astype(jnp.int32), axis=0), axis=0)
        emask = ((rank[:, None] == j[None, :]) & mixed[:, None]).astype(jnp.bfloat16)
        back = expand_sum(emask, jnp.stack([raw_r_j, raw_l_j], axis=1))
        raw_r, raw_l = back[:, 0], back[:, 1]
    else:
        sa = jnp.concatenate([bs + dl - W, bs])
        sb = jnp.concatenate([rs + il - W, rs])
        if barrier:
            sa, sb = jax.lax.optimization_barrier((sa, sb))
        wa = _window_bytes_mm_t(rw, sa, W, 0xFE)
        wb = _window_bytes_mm_t(rq, sb, W, 0xFD)
        eq_r = wa[:, :MC] == wb[:, :MC]
        eq_l = wa[:, MC:] == wb[:, MC:]
        raw_r = jnp.sum(jax.lax.cumprod(eq_r.astype(jnp.int32), axis=0, reverse=True), axis=0)
        raw_l = jnp.sum(jnp.cumprod(eq_l.astype(jnp.int32), axis=0), axis=0)

    post = jnp.minimum(raw_r, m0)
    dl1 = dl - post
    il1 = il - post
    m1 = jnp.minimum(dl1, il1)
    pre = jnp.minimum(raw_l, m1)
    dl2 = dl1 - pre
    il2 = il1 - pre
    snp = (dl2 == 1) & (il2 == 1)
    post_f = post + snp.astype(post.dtype)
    dl2 = jnp.where(snp, 0, dl2)
    il2 = jnp.where(snp, 0, il2)

    c_codes = jnp.stack(
        [
            jnp.where(mixed, M, PAD),
            jnp.where(mixed | pure, I, jnp.where(one_one, M, PAD)),
            jnp.full_like(dl, D),
            jnp.where(mixed, M, PAD),
        ],
        axis=1,
    )
    c_lens = jnp.stack(
        [
            jnp.where(mixed, pre, 0),
            jnp.where(mixed, il2, jnp.where(pure, il, jnp.where(one_one, 1, 0))),
            jnp.where(mixed, dl2, jnp.where(pure, dl, 0)),
            jnp.where(mixed, post_f, 0),
        ],
        axis=1,
    )
    c_codes = jnp.where(cvalid[:, None], c_codes, PAD)
    c_lens = jnp.where(cvalid[:, None], c_lens, 0)
    c_codes = jnp.where(c_lens == 0, PAD, c_codes)

    valid = c != PAD
    is_indel = ((c == I) | (c == D)) & valid
    cend = cl["cluster_end"]
    cid = jnp.clip(cl["cluster_id"], 0, MC - 1)
    pre_end = is_indel & jnp.concatenate([cend[1:], jnp.zeros(1, bool)])
    prev_indel = jnp.concatenate([jnp.zeros(1, bool), is_indel[:-1]])
    single = cend & ~prev_indel
    c_packed = jnp.concatenate([c_codes.astype(jnp.int32), c_lens.astype(jnp.int32)], axis=1)
    cv = expand_mask(onehot_eq(cid, MC), c_packed)
    sel0_code = jnp.where(pre_end, cv[:, 0], jnp.where(single, cv[:, 1], cv[:, 2]))
    sel1_code = jnp.where(pre_end, cv[:, 1], jnp.where(single, cv[:, 2], cv[:, 3]))
    sel0_len = jnp.where(pre_end, cv[:, 4], jnp.where(single, cv[:, 5], cv[:, 6]))
    sel1_len = jnp.where(pre_end, cv[:, 5], jnp.where(single, cv[:, 6], cv[:, 7]))
    emit = pre_end | cend
    passthru = valid & ~is_indel
    out_codes = jnp.stack(
        [jnp.where(passthru, c, jnp.where(emit, sel0_code, PAD)),
         jnp.where(emit, sel1_code, PAD)], axis=1)
    out_lens = jnp.stack(
        [jnp.where(passthru, l, jnp.where(emit, sel0_len, 0)),
         jnp.where(emit, sel1_len, 0)], axis=1)
    return cleanup_and_compress(out_codes.reshape(-1), out_lens.reshape(-1), MAX_OUT, True)


print(f"device={jax.devices()[0]}", file=sys.stderr)

t("simplify current",
  lambda c, l, p, rw, rq: _simplify_single(c, l, p, rw, rq, max_clusters=MC, window=W, max_out=MAX_OUT, mm=True),
  (l_codes, l_lens, l_rel, ref_win, read_seq), 2)
t("variant compact (recheck)",
  lambda c, l, p, rw, rq: simplify_variant(c, l, p, rw, rq, compact=True, barrier=False),
  (l_codes, l_lens, l_rel, ref_win, read_seq), 2)
t("variant compact+barrier",
  lambda c, l, p, rw, rq: simplify_variant(c, l, p, rw, rq, compact=True, barrier=True),
  (l_codes, l_lens, l_rel, ref_win, read_seq), 2)
t("variant nocompact",
  lambda c, l, p, rw, rq: simplify_variant(c, l, p, rw, rq, compact=False, barrier=False),
  (l_codes, l_lens, l_rel, ref_win, read_seq), 2)
t("variant nocompact+barrier",
  lambda c, l, p, rw, rq: simplify_variant(c, l, p, rw, rq, compact=False, barrier=True),
  (l_codes, l_lens, l_rel, ref_win, read_seq), 2)
