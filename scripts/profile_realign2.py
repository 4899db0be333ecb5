"""Isolate the T-fetch's internals: span dot vs byte barrel at C=48.

Note the sustained protocol hoists seq-only subgraphs (table build) out of
the timing loop; variants below keep the perturbed `start` input on the
relevant path so each part is honestly timed.
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
rng = np.random.default_rng(13)
seq = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
seq2 = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
start = np.sort(rng.integers(0, 18000, size=(B, C)).astype(np.int32), axis=1)
span_in = rng.integers(0, 256, size=(B, 128, C), dtype=np.uint8)
o_in = (start % 64).astype(np.int32)


def t(name, fn, args, pos_index=0, reps=24):
    dev = tuple(jax.device_put(np.asarray(a)) for a in args)
    ms = sustained_batch_time(fn, dev, reps, pos_index) * 1e3
    print(f"{name:36s} {ms:8.3f} ms/batch", flush=True)


def span_only(s, st):
    length = s.shape[0]
    padded = jnp.concatenate(
        [jnp.full(64, 0xFE, jnp.uint8), s,
         jnp.full(192 + (-length) % 64, 0xFE, jnp.uint8)]
    )
    nsb = padded.shape[0] // 64
    table = padded.reshape(nsb, 64)
    p = st + 64
    sb = jnp.clip(p >> 6, 0, nsb - 2)
    maskT = (
        jnp.arange(nsb - 1, dtype=jnp.int32)[:, None] == sb[None, :]
    ).astype(jnp.bfloat16)
    tt = table.astype(jnp.bfloat16).T
    out_lo = jax.lax.dot(tt[:, :-1], maskT, preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot(tt[:, 1:], maskT, preferred_element_type=jnp.float32)
    return jnp.concatenate([out_lo, out_hi], axis=0).astype(jnp.uint8)


def barrel_only(span, o):
    w = span
    for bit in (32, 16, 8, 4, 2, 1):
        need = W + bit - 1
        w = jnp.where(((o & bit) != 0)[None, :], w[bit : bit + need], w[:need])
    return w[:W]


def barrel_coarse_only(span, o):
    """bits 32/16/8 only (8-aligned sublane slices) — timing probe."""
    w = span
    for bit in (32, 16, 8):
        need = W + bit - 1
        w = jnp.where(((o & bit) != 0)[None, :], w[bit : bit + need], w[:need])
    return w[:W]


def barrel_fine_only(span, o):
    """bits 4/2/1 only (unaligned sublane slices) — timing probe."""
    w = span
    for bit in (4, 2, 1):
        need = W + bit - 1
        w = jnp.where(((o & bit) != 0)[None, :], w[bit : bit + need], w[:need])
    return w[:W]


def barrel_lanes_only(span, o):
    """same selects but via a transposed (C, 128) layout: shifts on the LANE
    axis (span transposed per-item before/after) — timing probe."""
    w = span.T  # (C, 128)
    for bit in (32, 16, 8, 4, 2, 1):
        need = W + bit - 1
        w = jnp.where(((o & bit) != 0)[:, None], w[:, bit : bit + need], w[:, :need])
    return w[:, :W].T


print(f"device={jax.devices()[0]}", file=sys.stderr)

t("T fetch full C=48", lambda s, st: _window_bytes_mm_t(s, st, W, 0xFE), (seq, start), 1)
t("span only (2 dots + mask)", span_only, (seq, start), 1)
t("barrel only", barrel_only, (span_in, o_in), 1)
t("barrel coarse bits only", barrel_coarse_only, (span_in, o_in), 1)
t("barrel fine bits only", barrel_fine_only, (span_in, o_in), 1)
t("barrel via lane-axis shifts", barrel_lanes_only, (span_in, o_in), 1)
