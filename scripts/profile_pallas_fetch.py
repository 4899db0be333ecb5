"""TPU A/B: Pallas window-match kernel vs the XLA one-hot-matmul fetch pair,
at the two production cluster counts (C=16 simplify, C=96 shift A).
Pad/reshape cost is inside the timed graph for both (production pays it)."""

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
from portello_tpu.kernels.pallas.window_match import (  # noqa: E402
    pad_table, window_match_runs_batch,
)
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
W = HIFI_BUCKET.window
L = HIFI_BUCKET.max_seq
INTERP = jax.default_backend() == "cpu"
rng = np.random.default_rng(7)
seq_a = jax.device_put(rng.integers(65, 85, size=(B, L), dtype=np.uint8))
seq_b = jax.device_put(rng.integers(65, 85, size=(B, L), dtype=np.uint8))
st16 = jax.device_put(
    np.sort(rng.integers(0, L - 256, size=(B, 16)).astype(np.int32), axis=1))
st96 = jax.device_put(
    np.sort(rng.integers(0, L - 256, size=(B, 96)).astype(np.int32), axis=1))

REPS = 24
print(f"device={jax.devices()[0]}", file=sys.stderr)


def t(name, fn, args, pos_index):
    ms = sustained_batch_time(fn, args, REPS, pos_index) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/batch", flush=True)


def xla_pair(sa, sb_, st):
    wa = _window_bytes_mm_t(sa, st, W, 0xFE)
    wb = _window_bytes_mm_t(sb_, st + 3, W, 0xFD)
    eq = (wa == wb).astype(jnp.int32)
    run_f = jnp.sum(jnp.cumprod(eq, axis=0), axis=0)
    run_r = jnp.sum(jax.lax.cumprod(eq, axis=0, reverse=True), axis=0)
    return run_f, run_r


def pallas_pair(sa, sb_, st):
    at = jax.vmap(lambda x: pad_table(x, 0xFE))(sa)
    bt = jax.vmap(lambda x: pad_table(x, 0xFD))(sb_)
    return window_match_runs_batch(at, bt, st, st + 3, window=W,
                                   interpret=INTERP)


# equality sanity (runs defined identically on random data)
f1, r1 = jax.vmap(xla_pair)(seq_a[:8], seq_b[:8], st16[:8])
f2, r2 = pallas_pair(seq_a[:8], seq_b[:8], st16[:8])
assert np.array_equal(np.asarray(f1), np.asarray(f2)), "fwd mismatch"
assert np.array_equal(np.asarray(r1), np.asarray(r2)), "rev mismatch"
print("pallas == xla on device", file=sys.stderr)

for rnd in range(3):
    t("XLA pair C=16", lambda a, b, s: xla_pair(a, b, s),
      (seq_a, seq_b, st16), 2)
    ms = sustained_batch_time(pallas_pair, (seq_a, seq_b, st16), REPS, 2,
                              already_batched=True) * 1e3
    print(f"{'Pallas pair C=16':34s} {ms:8.3f} ms/batch", flush=True)
    t("XLA pair C=96", lambda a, b, s: xla_pair(a, b, s),
      (seq_a, seq_b, st96), 2)
    ms = sustained_batch_time(pallas_pair, (seq_a, seq_b, st96), REPS, 2,
                              already_batched=True) * 1e3
    print(f"{'Pallas pair C=96':34s} {ms:8.3f} ms/batch", flush=True)
