"""Same-run A/B: stage A with the in-fetch table conversion vs a pre-built
batch-level bf16 superblock table (seq_to_sb_table + _window_bytes_mm_t_tb).
Isolated measurements said pre-converted tables are ~3x cheaper per fetch
pair; this checks the claim IN CONTEXT (PERF.md lesson: in-context can rank
opposite)."""

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
from portello_tpu.kernels.cigar_kernels import PAD, I, D  # noqa: E402
from portello_tpu.kernels.cluster_utils import (  # noqa: E402
    find_clusters, match_run_right,
)
from portello_tpu.kernels.expand import expand_mask, onehot_eq  # noqa: E402
from portello_tpu.kernels.shift_kernel import _shift_stage_a  # noqa: E402
from portello_tpu.kernels.cigar_kernels import is_align_match  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MC, W = bcfg.max_clusters, bcfg.window
rng = np.random.default_rng(2026)
rev = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
(ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
 ref_win, ref_base, read_seq) = [jax.device_put(np.asarray(a)) for a in rev]
rel_pos = pos - win_base

from portello_tpu.kernels.shift_kernel import _INF  # noqa: E402
REPS = 24


def seq_to_sb_table(seq, fill: int):
    """Pre-build the padded bf16 superblock table for
    :func:`_window_bytes_mm_t_tb` (one bulk uint8->bf16 convert — under vmap a
    single batched op — instead of a conversion inside every fetch's dot
    fusion).  Returns (nsb, 64) bf16."""
    length = seq.shape[0]
    pad_lo = 64
    pad_hi = 192 + (-length) % 64
    padded = jnp.concatenate(
        [
            jnp.full(pad_lo, fill, jnp.uint8),
            seq,
            jnp.full(pad_hi, fill, jnp.uint8),
        ]
    )
    return padded.reshape(padded.shape[0] // 64, 64).astype(jnp.bfloat16)


def _window_bytes_mm_t_tb(tb, start, window: int):
    """:func:`_window_bytes_mm_t` against a pre-built superblock table
    (:func:`seq_to_sb_table`); bit-identical output."""
    if window > 60:
        raise ValueError("window must be <= 60 for the 128-byte span")
    nsb = tb.shape[0]
    p = start + 64  # pad_lo
    sb = jnp.clip(p >> 6, 0, nsb - 2)
    o = p - (sb << 6)
    mask = (
        sb[:, None] == jnp.arange(nsb - 1, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    out_lo = jax.lax.dot(mask, tb[:-1], preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot(mask, tb[1:], preferred_element_type=jnp.float32)
    span = jnp.concatenate([out_lo, out_hi], axis=1).astype(jnp.uint8)
    w = span.T
    for bit in (32, 16, 8, 4, 2, 1):
        need = window + bit - 1
        w = jnp.where(((o & bit) != 0)[None, :], w[bit : bit + need], w[:need])
    return w[:window]


def stage_a_tb(codes, lens_, ref_pos, wb, rw, rq):
    """_shift_stage_a with the pre-built-table fetch (same math)."""
    cl = find_clusters(codes, lens_, ref_pos, MC, True)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    max_left = jnp.minimum(wb + bs, rs)
    ta = seq_to_sb_table(rw, 0xFE)
    tb_ = seq_to_sb_table(rq, 0xFD)
    i = jnp.arange(W, dtype=jnp.int32)[:, None]
    wa = _window_bytes_mm_t_tb(ta, bs + dl - W, W)
    wbt = _window_bytes_mm_t_tb(tb_, rs + il - W, W)
    eq = ((W - 1 - i) < max_left[None, :]) & (wa == wbt)
    h_run = jnp.sum(jax.lax.cumprod(eq.astype(jnp.int32), axis=0, reverse=True), axis=0)
    sat = (h_run >= W) & (max_left > W)
    has_indel = (dl + il) > 0
    h_cap = jnp.minimum(h_run, max_left)
    valid = codes != PAD
    is_indel = ((codes == I) | (codes == D)) & valid
    is_m = is_align_match(codes) & valid
    is_other = valid & ~is_indel & ~is_m
    cend = cl["cluster_end"]
    cid = jnp.clip(cl["cluster_id"], 0, MC - 1)
    c_table = jnp.stack(
        [
            h_cap.astype(jnp.int32),
            (sat & has_indel).astype(jnp.int32),
            max_left.astype(jnp.int32),
            il.astype(jnp.int32),
            dl.astype(jnp.int32),
        ],
        axis=1,
    )
    cv = expand_mask(onehot_eq(cid, MC), c_table)
    cap_at_op = cv[:, 0]
    a = jnp.where(is_m, lens_, 0)
    b = jnp.where(cend, cap_at_op, jnp.where(is_other, 0, _INF))
    return {
        "a": a, "b": b, "cend": cend, "is_other": is_other,
        "ins_at_op": cv[:, 3], "del_at_op": cv[:, 4],
        "cap_at_op": cap_at_op, "fb_sat": cv[:, 1] > 0, "ml_at_op": cv[:, 2],
        "overflow": cl["overflow"],
    }


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:28s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)

args = (ops, lens, rel_pos, win_base, contig_win, read_seq)

# equality check first (CPU or TPU both fine)
a_ref = jax.jit(jax.vmap(
    lambda *a: _shift_stage_a(*a, max_clusters=MC, window=W, mm=True)))(*args)
a_tb = jax.jit(jax.vmap(stage_a_tb))(*args)
for k in a_ref:
    np.testing.assert_array_equal(np.asarray(a_ref[k]), np.asarray(a_tb[k]))
print("equality ok", flush=True)

for tag in ("cur", "tb", "cur", "tb"):
    if tag == "cur":
        t("stage A current", lambda *a: _shift_stage_a(
            *a, max_clusters=MC, window=W, mm=True), args, 2)
    else:
        t("stage A pre-table", stage_a_tb, args, 2)
