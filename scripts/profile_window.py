"""Sub-part breakdown of the mm window fetch (kernels/cluster_utils.py)."""

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
from portello_tpu.kernels.cluster_utils import _window_bytes_mm, match_run_right  # noqa: E402
from portello_tpu.kernels.expand import expand_bytes, onehot_eq  # noqa: E402

B, C, W, L = 512, 160, 48, 24576
rng = np.random.default_rng(9)
seq = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
seq2 = rng.integers(65, 85, size=(B, L), dtype=np.uint8)
start = np.sort(rng.integers(0, L - 64, size=(B, C)).astype(np.int32), axis=1)
limit = rng.integers(0, 64, size=(B, C)).astype(np.int32)

NSB = (L + 64 + 192) // 64
sb = np.clip((start + 64) >> 6, 0, NSB - 2).astype(np.int32)
tbl2 = rng.integers(0, 256, size=(B, NSB - 1, 128), dtype=np.uint8)
span = rng.integers(0, 256, size=(B, C, 128), dtype=np.uint8)
o = (start & 63).astype(np.int32)


def t(name, fn, args, pos_index=0, reps=24):
    dev = tuple(jax.device_put(np.asarray(a)) for a in args)
    ms = sustained_batch_time(fn, dev, reps, pos_index) * 1e3
    print(f"{name:30s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)

t("match_run_right mm (1 call)",
  lambda s1, s2, st, lm: match_run_right(s1, st + 30, s2, st + 30, lm, W, True),
  (seq, seq2, start, limit), 2)

t("window fetch x1", lambda s, st: _window_bytes_mm(s, st, W, 0xFE), (seq, start), 1)

t("expand_bytes only", lambda m_sb, tb: expand_bytes(onehot_eq(m_sb, NSB - 1), tb),
  (sb, tbl2), 0)


def selects(span, o):
    w4 = W + 4
    s1 = span[:, 0:w4]
    k = (o >> 2)[:, None]
    for kk in range(1, 16):
        s1 = jnp.where(k == kk, span[:, 4 * kk : 4 * kk + w4], s1)
    out = s1[:, 0:W]
    j = (o & 3)[:, None]
    for jj in range(1, 4):
        out = jnp.where(j == jj, s1[:, jj : jj + W], out)
    return out


t("select ladders only", selects, (span, o), 1)


def table_build(s):
    padded = jnp.concatenate(
        [jnp.full(64, 0xFE, jnp.uint8), s, jnp.full(192, 0xFE, jnp.uint8)]
    )
    tb = padded.reshape(-1, 64)
    return jnp.concatenate([tb[:-1], tb[1:]], axis=1)


t("tbl2 build only", table_build, (seq,), 0)


def eqpart(wa, wb, lm):
    tt = jnp.arange(W, dtype=jnp.int32)[None, :]
    eq = (tt < lm[:, None]) & (wa[:, :W] == wb[:, :W])
    run = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1), axis=1)
    return run


t("eq+cumprod+sum only", eqpart, (span, span, limit), 2)


# variant: two matmuls against the raw 64-col table, no tbl2 concat
def fetch_2mm(s, st):
    padded = jnp.concatenate(
        [jnp.full(64, 0xFE, jnp.uint8), s, jnp.full(192, 0xFE, jnp.uint8)]
    )
    tb = padded.reshape(-1, 64)
    nsb = tb.shape[0]
    p = st + 64
    sb_ = jnp.clip(p >> 6, 0, nsb - 2)
    o_ = p - (sb_ << 6)
    lo = expand_bytes(onehot_eq(sb_, nsb), tb)
    hi = expand_bytes(onehot_eq(sb_ + 1, nsb), tb)
    span_ = jnp.concatenate([lo, hi], axis=1)
    w4 = W + 4
    s1 = span_[:, 0:w4]
    k = (o_ >> 2)[:, None]
    for kk in range(1, 16):
        s1 = jnp.where(k == kk, span_[:, 4 * kk : 4 * kk + w4], s1)
    out = s1[:, 0:W]
    j = (o_ & 3)[:, None]
    for jj in range(1, 4):
        out = jnp.where(j == jj, s1[:, jj : jj + W], out)
    return out


t("window fetch 2mm variant", fetch_2mm, (seq, start), 1)

# variant: one matmul, realign via second one-hot matmul over 64 offsets
def fetch_mm_mm(s, st):
    padded = jnp.concatenate(
        [jnp.full(64, 0xFE, jnp.uint8), s, jnp.full(192, 0xFE, jnp.uint8)]
    )
    tb = padded.reshape(-1, 64)
    tb2 = jnp.concatenate([tb[:-1], tb[1:]], axis=1)
    nsb = tb2.shape[0]
    p = st + 64
    sb_ = jnp.clip(p >> 6, 0, nsb - 1)
    o_ = p - (sb_ << 6)
    span_ = expand_bytes(onehot_eq(sb_, nsb), tb2).astype(jnp.bfloat16)  # (C,128)
    # shift matrix: out[c, t] = span[c, o_c + t] = sum_k 1[k == o_c] span[c, k+t]
    # build (64, 128, W) shift tensor once (static) - einsum over k and source
    shift = np.zeros((64, 128, W), dtype=np.float32)
    for kk in range(64):
        for tt2 in range(W):
            shift[kk, kk + tt2, tt2] = 1.0
    m = onehot_eq(o_, 64)  # (C, 64)
    sm = jnp.einsum("ck,kpt->cpt", m, jnp.asarray(shift, jnp.bfloat16),
                    preferred_element_type=jnp.bfloat16)  # (C,128,W)
    out = jnp.einsum("cp,cpt->ct", span_, sm, preferred_element_type=jnp.float32)
    return out.astype(jnp.uint8)


t("window fetch mm+shiftmm", fetch_mm_mm, (seq, start), 1)

from portello_tpu.kernels.cluster_utils import _window_bytes_mm_t  # noqa: E402

t("window fetch T x1", lambda s, st: _window_bytes_mm_t(s, st, W, 0xFE), (seq, start), 1)
t("match_run_right T (1 call)",
  lambda s1, s2, st, lm: match_run_right(s1, st + 30, s2, st + 30, lm, W, True),
  (seq, seq2, start, limit), 2)
