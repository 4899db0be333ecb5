"""Isolate the C-independent cost of _window_bytes_mm_t: sequence padding
concat + table bf16 conversion vs the mask/dot/barrel itself.

Variants (same-run interleave):
  A: current fetch pair at C=16 (production simplify shape)
  B: current fetch pair at C=96 (is the cost C-bound at all?)
  C: pre-padded sequences (concat hoisted out), C=16
  D: pre-padded AND pre-bf16 table, C=16 (conversion hoisted too)
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
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
W = HIFI_BUCKET.window
L = HIFI_BUCKET.max_seq
rng = np.random.default_rng(7)
seq_a = jax.device_put(rng.integers(65, 85, size=(B, L), dtype=np.uint8))
seq_b = jax.device_put(rng.integers(65, 85, size=(B, L), dtype=np.uint8))
starts16 = jax.device_put(
    np.sort(rng.integers(0, L - 256, size=(B, 16)).astype(np.int32), axis=1))
starts96 = jax.device_put(
    np.sort(rng.integers(0, L - 256, size=(B, 96)).astype(np.int32), axis=1))

PAD_LO, PAD_HI = 64, 192 + (-L) % 64


def prepad(seq, fill):
    b = seq.shape[0]
    return np.concatenate([
        np.full((b, PAD_LO), fill, np.uint8), np.asarray(seq),
        np.full((b, PAD_HI), fill, np.uint8)], axis=1)


pa = jax.device_put(prepad(seq_a, 0xFE))
pb = jax.device_put(prepad(seq_b, 0xFD))
pa_bf = jax.device_put(
    np.asarray(pa).reshape(B, -1, 64).astype(jnp.bfloat16))
pb_bf = jax.device_put(
    np.asarray(pb).reshape(B, -1, 64).astype(jnp.bfloat16))


def fetch_prepad(padded, start, window):
    """_window_bytes_mm_t on a pre-padded (Lp,) sequence (no concat)."""
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


def fetch_prebf(table_bf, start, window):
    """Pre-padded AND pre-bf16 (nsb, 64) table."""
    nsb = table_bf.shape[0]
    p = start + PAD_LO
    sb = jnp.clip(p >> 6, 0, nsb - 2)
    o = p - (sb << 6)
    mask = (
        sb[:, None] == jnp.arange(nsb - 1, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    out_lo = jax.lax.dot(mask, table_bf[:-1], preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot(mask, table_bf[1:], preferred_element_type=jnp.float32)
    span = jnp.concatenate([out_lo, out_hi], axis=1).astype(jnp.uint8)
    w = span.T
    for bit in (32, 16, 8, 4, 2, 1):
        need = window + bit - 1
        w = jnp.where(((o & bit) != 0)[None, :], w[bit : bit + need], w[:need])
    return w[:window]


def fetch_sliceconv(padded, start, window):
    """Per-slice converts: each bf16 convert has exactly ONE consumer dot
    (the shared-convert form's two sliced consumers force magnitude a
    materialized table)."""
    nsb = padded.shape[0] // 64
    table = padded.reshape(nsb, 64)
    p = start + PAD_LO
    sb = jnp.clip(p >> 6, 0, nsb - 2)
    o = p - (sb << 6)
    mask = (
        sb[:, None] == jnp.arange(nsb - 1, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    out_lo = jax.lax.dot(mask, table[:-1].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot(mask, table[1:].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    span = jnp.concatenate([out_lo, out_hi], axis=1).astype(jnp.uint8)
    w = span.T
    for bit in (32, 16, 8, 4, 2, 1):
        need = window + bit - 1
        w = jnp.where(((o & bit) != 0)[None, :], w[bit : bit + need], w[:need])
    return w[:window]


REPS = 24
print(f"device={jax.devices()[0]}", file=sys.stderr)


def t(name, fn, args, pos_index):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/batch", flush=True)


# equality sanity (one item)
ref = np.asarray(jax.vmap(lambda s, st: _window_bytes_mm_t(s, st, W, 0xFE))(
    seq_a[:4], starts16[:4]))
got = np.asarray(jax.vmap(lambda s, st: fetch_prepad(s, st, W))(
    pa[:4], starts16[:4]))
got2 = np.asarray(jax.vmap(lambda s, st: fetch_prebf(s, st, W))(
    pa_bf[:4], starts16[:4]))
got3 = np.asarray(jax.vmap(lambda s, st: fetch_sliceconv(s, st, W))(
    pa[:4], starts16[:4]))
assert np.array_equal(ref, got) and np.array_equal(ref, got2), "mismatch"
assert np.array_equal(ref, got3), "sliceconv mismatch"
print("prepad/prebf forms bit-identical", file=sys.stderr)

for rnd in range(3):
    t("A cur pair C=16",
      lambda sa, sb_, st: (_window_bytes_mm_t(sa, st, W, 0xFE),
                           _window_bytes_mm_t(sb_, st + 3, W, 0xFD)),
      (seq_a, seq_b, starts16), 2)
    t("B cur pair C=96",
      lambda sa, sb_, st: (_window_bytes_mm_t(sa, st, W, 0xFE),
                           _window_bytes_mm_t(sb_, st + 3, W, 0xFD)),
      (seq_a, seq_b, starts96), 2)
    t("C prepad pair C=16",
      lambda sa, sb_, st: (fetch_prepad(sa, st, W),
                           fetch_prepad(sb_, st + 3, W)),
      (pa, pb, starts16), 2)
    t("D prebf16 pair C=16",
      lambda sa, sb_, st: (fetch_prebf(sa, st, W),
                           fetch_prebf(sb_, st + 3, W)),
      (pa_bf, pb_bf, starts16), 2)
    t("E sliceconv pair C=16",
      lambda sa, sb_, st: (fetch_sliceconv(sa, st, W),
                           fetch_sliceconv(sb_, st + 3, W)),
      (pa, pb, starts16), 2)
    t("E96 sliceconv pair C=96",
      lambda sa, sb_, st: (fetch_sliceconv(sa, st, W),
                           fetch_sliceconv(sb_, st + 3, W)),
      (pa, pb, starts96), 2)
