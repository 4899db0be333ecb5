"""Device cost of the 4-bit seq unpack prepended to the production fwd graph
(packed H2D slots halve feed fill bytes + PCIe traffic; the chip pays one
nibble unpack per seq tensor).  A/B interleaved: ASCII graph vs unpack+graph.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from portello_tpu.models.pipeline_model import fwd_batch  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
mm = jax.default_backend() == "tpu"
kw = dict(
    max_out=bcfg.resolved_max_out(), max_clusters=bcfg.max_clusters,
    window=bcfg.window, mm=mm, max_rows=bcfg.resolved_max_rows(),
)
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
(ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq) = [
    np.asarray(a) for a in items
]


def pack(a):
    # BAM convention: first base in the high nibble (values here are ASCII;
    # for the timing A/B only the shapes matter)
    lo = a[:, 1::2] & 0xF
    hi = a[:, 0::2] & 0xF
    return ((hi << 4) | lo).astype(np.uint8)


ref_p, seq_p = pack(ref_win), pack(read_seq)
args_u = tuple(jax.device_put(a) for a in (
    ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq))
args_p = tuple(jax.device_put(a) for a in (
    ops, lens, n_ops, pos, bk, bv, nb, ref_p, ref_base, seq_p))


def unpack(p):
    hi = p >> 4
    lo = p & 0xF
    return jnp.stack([hi, lo], axis=-1).reshape(p.shape[0], -1)


def run_u(*a):
    return fwd_batch(*a, **kw)


def run_p(o, l, n, q, k, v, m, rp, rb, sp):
    return fwd_batch(o, l, n, q, k, v, m, unpack(rp), rb, unpack(sp), **kw)


REPS = 24
fu, fp = jax.jit(run_u), jax.jit(run_p)
for _pass in range(3):
    for name, f, a in (("ascii", fu, args_u), ("packed+unpack", fp, args_p)):
        ms = sustained_batch_time(f, a, REPS, 3, already_batched=True) * 1e3
        print(f"{name:16s} {ms:8.3f} ms/batch", flush=True)
