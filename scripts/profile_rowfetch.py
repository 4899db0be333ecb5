"""Same-run A/B: compact simplify's slot-row fetch as a contiguous-row
take (no whole-table uint8->bf16 conversion) vs the one-hot byte matmul
(converts the full (B, L) table twice per graph).  In-context: the full fwd
graph (lift -> compact simplify), mirroring fwd_batch's mm path."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402
from portello_tpu.kernels.cigar_kernels import cigar_read_len  # noqa: E402
from portello_tpu.kernels.simplify_kernel import simplify_batch_compact  # noqa: E402
from portello_tpu.models.pipeline_model import _lift_core  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MO = bcfg.resolved_max_out()
MR = bcfg.resolved_max_rows()
rng = np.random.default_rng(2026)
fwd_items = tuple(
    jax.device_put(np.asarray(a))
    for a in fast_item_arrays(rng, B, bcfg, 18000, rev=False)
)
REPS = 24


def make_fwd(row_fetch):
    def fwd(ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq):
        l_codes, l_lens, l_n, ref2_pos, mapped, overflow = jax.vmap(
            lambda o, l, n, p, k, v, m: _lift_core(
                o, l, n, p, k, v, m, max_out=MO, mm=True, max_rows=MR
            )
        )(ops, lens, n_ops, pos, bk, bv, nb)
        read_len = jax.vmap(cigar_read_len)(l_codes, l_lens)
        s = simplify_batch_compact(
            l_codes, l_lens, ref2_pos - ref_base, ref_win, read_seq,
            max_clusters=bcfg.max_clusters, window=bcfg.window, max_out=MO,
            row_fetch=row_fetch,
        )
        return (*s, mapped, read_len, overflow)
    return fwd


# equality first
a = jax.jit(make_fwd("gather"))(*fwd_items)
b = jax.jit(make_fwd("onehot"))(*fwd_items)
for x, y in zip(a, b):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
print("equality ok", flush=True)


def t(name, fn):
    ms = sustained_batch_time(fn, fwd_items, REPS, 3, already_batched=True) * 1e3
    print(f"{name:28s} {ms:8.3f} ms/batch", flush=True)


print(f"device={jax.devices()[0]}", file=sys.stderr)
for tag in ("onehot", "gather", "onehot", "gather"):
    t(f"fwd row_fetch={tag}", make_fwd(tag))
