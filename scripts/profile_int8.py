"""Validate + time int8 one-hot expansion matmuls vs the bf16 byte-plane form.

s8 x s8 -> s32 MXU products are exact; table bytes 0..255 are rebased to
value-128 (fits s8) and the rowsum needed to undo the rebase comes from an
appended all-ones column — exact in int32 for one-hot/zero-row masks.
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
from portello_tpu.kernels.expand import expand_mask, onehot_eq  # noqa: E402

B, R, K, C = 512, 608, 232, 8
rng = np.random.default_rng(11)
idx = rng.integers(-4, K + 4, size=(B, R)).astype(np.int32)  # incl. out-of-range
table = rng.integers(np.iinfo(np.int32).min, np.iinfo(np.int32).max,
                     size=(B, K, C), dtype=np.int32)
tbl_u8 = rng.integers(0, 256, size=(B, K, 64), dtype=np.uint8)


def onehot_s8(i, k):
    j = jnp.arange(k, dtype=jnp.int32)[None, :]
    return (i[:, None] == j).astype(jnp.int8)


def expand_mask_s8(i, tbl):
    k, c = tbl.shape
    u = tbl.astype(jnp.uint32)
    planes = jnp.concatenate(
        [((u >> (8 * p)) & 0xFF).astype(jnp.int32) - 128 for p in range(4)]
        + [jnp.full((k, 1), 1, jnp.int32)],
        axis=1,
    ).astype(jnp.int8)
    out = jax.lax.dot(
        onehot_s8(i, k), planes, preferred_element_type=jnp.int32
    )
    ones = out[:, -1:]
    v = out[:, :-1] + 128 * ones
    u4 = v.astype(jnp.uint32)
    res = u4[:, :c]
    for p in range(1, 4):
        res = res | (u4[:, p * c : (p + 1) * c] << (8 * p))
    return res.astype(jnp.int32)


def expand_bytes_s8(i, tbl_u8):
    k, c = tbl_u8.shape
    planes = jnp.concatenate(
        [tbl_u8.astype(jnp.int32) - 128, jnp.full((k, 1), 1, jnp.int32)], axis=1
    ).astype(jnp.int8)
    out = jax.lax.dot(onehot_s8(i, k), planes, preferred_element_type=jnp.int32)
    return (out[:, :-1] + 128 * out[:, -1:]).astype(jnp.uint8)


def ref_gather(i, tbl):
    safe = jnp.clip(i, 0, tbl.shape[0] - 1)
    v = jnp.take_along_axis(tbl, safe[:, None], axis=1) if tbl.ndim == 3 else None
    return v


print(f"device={jax.devices()[0]}", file=sys.stderr)

# correctness first (vmapped over B)
f_bf = jax.jit(jax.vmap(lambda i, t: expand_mask(onehot_eq(i, K), t)))
f_s8 = jax.jit(jax.vmap(expand_mask_s8))
a = np.asarray(f_bf(idx, table))
b = np.asarray(f_s8(idx, table))
print("expand_mask s8 == bf16:", bool((a == b).all()))

g_bf = jax.jit(jax.vmap(lambda i, t: jnp.einsum("rk,kc->rc", onehot_eq(i, K).astype(jnp.bfloat16), t.astype(jnp.bfloat16))))  # noqa: E501  (unused check placeholder)

fb_bf = jax.jit(jax.vmap(lambda i, t: __import__("portello_tpu.kernels.expand", fromlist=["expand_bytes"]).expand_bytes(onehot_eq(i, K), t)))
fb_s8 = jax.jit(jax.vmap(expand_bytes_s8))
ab = np.asarray(fb_bf(idx, tbl_u8))
bb = np.asarray(fb_s8(idx, tbl_u8))
print("expand_bytes s8 == bf16:", bool((ab == bb).all()))


def t(name, fn, args, pos_index=0):
    ms = sustained_batch_time(fn, args, 24, pos_index) * 1e3
    print(f"{name:28s} {ms:8.3f} ms/batch", flush=True)


t("expand_mask bf16 (608x232x8)", lambda i, tb: expand_mask(onehot_eq(i, K), tb), (idx, table), 0)
t("expand_mask s8   (608x232x8)", expand_mask_s8, (idx, table), 0)
t("expand_bytes bf16 (608x232x64)", lambda i, tb: __import__("portello_tpu.kernels.expand", fromlist=["expand_bytes"]).expand_bytes(onehot_eq(i, K), tb), (idx, tbl_u8), 0)
t("expand_bytes s8   (608x232x64)", expand_bytes_s8, (idx, tbl_u8), 0)
