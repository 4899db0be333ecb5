"""Fetch table-prep variants: kill the whole-table bf16 transpose.

span_only (0.252) - mask+dot with prebuilt tables (0.026) suggests ~0.2 of
the T fetch is the per-call ``table.astype(bf16).T`` (a (389, 64) -> (64,
389) relayout of the whole padded sequence).  Variants:

- cur: current fetch (explicit whole-table transpose)
- nt: dot_general contracting table dim 0 (no explicit transpose)
- rm: mask-LHS dots producing (C, 64) row-major, then a TINY (C,128)
      span transpose before the sublane barrel
- ttin: transposed bf16 table passed as an INPUT (prep-cost lower bound)
- s128: 128-byte superblocks (half the mask, +1 barrel stage, M=128 dots)
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

from bench import sustained_batch_time  # noqa: E402
from portello_tpu.kernels.cluster_utils import _window_bytes_mm_t  # noqa: E402

B, C, W, L = 512, 48, 48, 24576
rng = np.random.default_rng(19)
seq = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
start = np.sort(rng.integers(-W, L - 64, size=(B, C)).astype(np.int32), axis=1)


def _padded(s, fill):
    length = s.shape[0]
    return jnp.concatenate(
        [jnp.full(64, fill, jnp.uint8), s,
         jnp.full(192 + (-length) % 64, fill, jnp.uint8)]
    )


def _barrel(span, o, window, bits=(32, 16, 8, 4, 2, 1)):
    w = span
    for bit in bits:
        need = window + bit - 1
        w = jnp.where(((o & bit) != 0)[None, :], w[bit : bit + need], w[:need])
    return w[:window]


def v_nt(s, st):
    table = _padded(s, 0xFE).reshape(-1, 64)
    nsb = table.shape[0]
    p = st + 64
    sb = jnp.clip(p >> 6, 0, nsb - 2)
    o = p - (sb << 6)
    maskT = (
        jnp.arange(nsb - 1, dtype=jnp.int32)[:, None] == sb[None, :]
    ).astype(jnp.bfloat16)
    tb = table.astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    out_lo = jax.lax.dot_general(tb[:-1], maskT, dn, preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot_general(tb[1:], maskT, dn, preferred_element_type=jnp.float32)
    span = jnp.concatenate([out_lo, out_hi], axis=0).astype(jnp.uint8)
    return _barrel(span, o, W)


def v_rm(s, st):
    table = _padded(s, 0xFE).reshape(-1, 64)
    nsb = table.shape[0]
    p = st + 64
    sb = jnp.clip(p >> 6, 0, nsb - 2)
    o = p - (sb << 6)
    mask = (
        sb[:, None] == jnp.arange(nsb - 1, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)  # (C, nsb-1)
    tb = table.astype(jnp.bfloat16)
    out_lo = jax.lax.dot(mask, tb[:-1], preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot(mask, tb[1:], preferred_element_type=jnp.float32)
    span = jnp.concatenate([out_lo, out_hi], axis=1).astype(jnp.uint8)  # (C, 128)
    return _barrel(span.T, o, W)


def v_ttin(tt, st):
    nsb = tt.shape[1]
    p = st + 64
    sb = jnp.clip(p >> 6, 0, nsb - 2)
    o = p - (sb << 6)
    maskT = (
        jnp.arange(nsb - 1, dtype=jnp.int32)[:, None] == sb[None, :]
    ).astype(jnp.bfloat16)
    out_lo = jax.lax.dot(tt[:, :-1], maskT, preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot(tt[:, 1:], maskT, preferred_element_type=jnp.float32)
    span = jnp.concatenate([out_lo, out_hi], axis=0).astype(jnp.uint8)
    return _barrel(span, o, W)


def v_s128(s, st):
    length = s.shape[0]
    padded = jnp.concatenate(
        [jnp.full(128, 0xFE, jnp.uint8), s,
         jnp.full(384 + (-length) % 128, 0xFE, jnp.uint8)]
    )
    table = padded.reshape(-1, 128)  # (nsb, 128)
    nsb = table.shape[0]
    p = st + 128
    sb = jnp.clip(p >> 7, 0, nsb - 2)
    o = p - (sb << 7)
    maskT = (
        jnp.arange(nsb - 1, dtype=jnp.int32)[:, None] == sb[None, :]
    ).astype(jnp.bfloat16)
    tt = table.astype(jnp.bfloat16).T  # (128, nsb)
    out_lo = jax.lax.dot(tt[:, :-1], maskT, preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot(tt[:, 1:], maskT, preferred_element_type=jnp.float32)
    span = jnp.concatenate([out_lo, out_hi], axis=0).astype(jnp.uint8)  # (256, C)
    return _barrel(span, o, W, bits=(64, 32, 16, 8, 4, 2, 1))


def make_tt(s):
    return _padded(jnp.asarray(s), 0xFE).reshape(-1, 64).astype(jnp.bfloat16).T


ref = jax.jit(jax.vmap(lambda s, st: _window_bytes_mm_t(s, st, W, 0xFE)))(
    seq[:8], start[:8]
)
tt8 = jax.jit(jax.vmap(make_tt))(seq[:8])
for name, fn, args in (
    ("nt", v_nt, (seq[:8], start[:8])),
    ("rm", v_rm, (seq[:8], start[:8])),
    ("ttin", v_ttin, (np.asarray(tt8), start[:8])),
    ("s128", v_s128, (seq[:8], start[:8])),
):
    got = jax.jit(jax.vmap(fn))(*[jnp.asarray(a) for a in args])
    assert np.array_equal(np.asarray(got), np.asarray(ref)), name
print("equality checks passed", flush=True)


def t(name, fn, args, pos_index=0, reps=24):
    dev = tuple(jax.device_put(np.asarray(a)) for a in args)
    ms = sustained_batch_time(fn, dev, reps, pos_index) * 1e3
    print(f"{name:26s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)
tt_full = np.asarray(jax.jit(jax.vmap(make_tt))(seq))
t("cur", lambda s, st: _window_bytes_mm_t(s, st, W, 0xFE), (seq, start), 1)
t("nt (no table transpose)", v_nt, (seq, start), 1)
t("rm (mask-LHS + tiny T)", v_rm, (seq, start), 1)
t("ttin (prep as input)", v_ttin, (tt_full, start), 1)
t("s128 superblocks", v_s128, (seq, start), 1)
