"""Same-run A/B: stage A with in-graph pad-concat (current) vs PRE-PADDED
sequence buffers (pads + sentinels applied host-side; the fetch indexes the
padded row directly).  The device trace showed the pad-concat copies are
stage A's largest single cost (~0.25 ms/batch across both sequences)."""

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
from portello_tpu.kernels.cigar_kernels import PAD, I, D, is_align_match  # noqa: E402
from portello_tpu.kernels.cluster_utils import find_clusters  # noqa: E402
from portello_tpu.kernels.expand import expand_mask, onehot_eq  # noqa: E402
from portello_tpu.kernels.shift_kernel import _INF, _shift_stage_a  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MC, W = bcfg.max_clusters, bcfg.window
L = bcfg.max_seq
PAD_LO = 64
PAD_HI = 192 + (-L) % 64
rng = np.random.default_rng(2026)
rev = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
(ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
 ref_win, ref_base, read_seq) = [np.asarray(a) for a in rev]
rel_pos = pos - win_base


def prepad(seq2d, fill):
    out = np.full((seq2d.shape[0], PAD_LO + L + PAD_HI), fill, np.uint8)
    out[:, PAD_LO : PAD_LO + L] = seq2d
    return out


d_args = tuple(jax.device_put(a) for a in (ops, lens, rel_pos, win_base,
                                           contig_win, read_seq))
p_contig = jax.device_put(prepad(contig_win, 0xFE))
p_read = jax.device_put(prepad(read_seq, 0xFD))
dp_args = (d_args[0], d_args[1], d_args[2], d_args[3], p_contig, p_read)


def _fetch_padded(padded, start, window):
    """_window_bytes_mm_t against a pre-padded row (bit-identical)."""
    nsb = padded.shape[0] // 64
    table = padded.reshape(nsb, 64)
    p = start + PAD_LO
    sb = jnp.clip(p >> 6, 0, nsb - 2)
    o = p - (sb << 6)
    mask = (
        sb[:, None] == jnp.arange(nsb - 1, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    tb = table.astype(jnp.bfloat16)
    out_lo = jax.lax.dot(mask, tb[:-1], preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot(mask, tb[1:], preferred_element_type=jnp.float32)
    span = jnp.concatenate([out_lo, out_hi], axis=1).astype(jnp.uint8)
    w = span.T
    for bit in (32, 16, 8, 4, 2, 1):
        need = window + bit - 1
        w = jnp.where(((o & bit) != 0)[None, :], w[bit : bit + need], w[:need])
    return w[:window]


def stage_a_prepad(codes, lens_, ref_pos, wb, rw_p, rq_p):
    cl = find_clusters(codes, lens_, ref_pos, MC, True)
    dl, il, bs, rs = cl["del_len"], cl["ins_len"], cl["ref_start"], cl["read_start"]
    max_left = jnp.minimum(wb + bs, rs)
    i = jnp.arange(W, dtype=jnp.int32)[:, None]
    wa = _fetch_padded(rw_p, bs + dl - W, W)
    wbt = _fetch_padded(rq_p, rs + il - W, W)
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
        [h_cap.astype(jnp.int32), (sat & has_indel).astype(jnp.int32),
         max_left.astype(jnp.int32), il.astype(jnp.int32), dl.astype(jnp.int32)],
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


# equality
a_ref = jax.jit(jax.vmap(
    lambda *a: _shift_stage_a(*a, max_clusters=MC, window=W, mm=True)))(*d_args)
a_pp = jax.jit(jax.vmap(stage_a_prepad))(*dp_args)
for k in a_ref:
    np.testing.assert_array_equal(np.asarray(a_ref[k]), np.asarray(a_pp[k]))
print("equality ok", flush=True)

REPS = 24


def t(name, fn, args):
    ms = sustained_batch_time(fn, args, REPS, 2) * 1e3
    print(f"{name:28s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)
for tag in ("cur", "pp", "cur", "pp"):
    if tag == "cur":
        t("stage A concat-pad", lambda *a: _shift_stage_a(
            *a, max_clusters=MC, window=W, mm=True), d_args)
    else:
        t("stage A pre-padded", stage_a_prepad, dp_args)
