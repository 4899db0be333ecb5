"""TPU A/B: the Pallas fused cleanup+compress vs the vmapped XLA form, at
the two fwd-graph call-site shapes (lift: K=352, simplify: K=464), standalone
sustained timing (same in-jit protocol).  Equality asserted first."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import sustained_batch_time  # noqa: E402
from portello_tpu.kernels.cigar_kernels import cleanup_and_compress  # noqa: E402
from portello_tpu.kernels.pallas.compress_pallas import (  # noqa: E402
    cleanup_and_compress_batch,
)

B = 512
MAX_OUT = 232
rng = np.random.default_rng(11)
print(f"device={jax.devices()[0]}", file=sys.stderr)

for K in (352, 464):
    codes = rng.integers(0, 10, size=(B, K)).astype(np.int32)
    lens = rng.integers(0, 24000, size=(B, K)).astype(np.int32)
    lens[rng.random((B, K)) < 0.3] = 0
    dc, dl = jax.device_put(codes), jax.device_put(lens)

    def xla_form(c, l):
        return jax.vmap(lambda a, b: cleanup_and_compress(a, b, MAX_OUT, True))(c, l)

    interp = jax.default_backend() != "tpu"

    def pls_form(c, l):
        return cleanup_and_compress_batch(c, l, MAX_OUT, interpret=interp)

    fx, fp = jax.jit(xla_form), jax.jit(pls_form)
    ox = jax.tree_util.tree_map(np.asarray, fx(dc, dl))
    op = jax.tree_util.tree_map(np.asarray, fp(dc, dl))
    for i, (a, b) in enumerate(zip(ox, op)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), (K, i)
    print(f"K={K}: bit-identical", file=sys.stderr)

    for _pass in range(3):
        for name, f in (("xla ", fx), ("plls", fp)):
            ms = sustained_batch_time(f, (dc, dl), 24, 1,
                                      already_batched=True) * 1e3
            print(f"K={K} {name} {ms:8.3f} ms/batch", flush=True)
