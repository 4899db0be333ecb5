"""In-context share of the resident window fetch+compare (VERDICT r4 #1b
closure evidence): A = full production resident graph; B = identical graph
with the G-slot window fetch+compare (simplify_kernel runs_fn: superblock
gather + barrel realign + packed widen + cumprod runs) replaced by a stub of
the same output shape.  A - B bounds what ANY reformulation of that block —
including a batch-level Pallas kernel — could save in context.

Usage: python scripts/profile_resident_decomp.py [cpu]
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

from functools import partial  # noqa: E402

from bench import (  # noqa: E402
    fast_item_arrays,
    resident_timing_args,
    sustained_batch_time,
)
from portello_tpu.kernels.simplify_kernel import _compact_core  # noqa: E402
from portello_tpu.models.pipeline_model import (  # noqa: E402
    _lift_core,
    cigar_read_len,
    fwd_batch_resident,
)
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

cpu = jax.default_backend() == "cpu"
B = 64 if cpu else 512
bcfg = HIFI_BUCKET
kw = dict(
    max_out=bcfg.resolved_max_out(), max_clusters=bcfg.max_clusters,
    window=bcfg.window, max_rows=bcfg.resolved_max_rows(),
)
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, 2000 if cpu else 18000, rev=False)
res_np, words = resident_timing_args(items, rng, 8 if cpu else 256)
args = tuple(jax.device_put(a) for a in res_np) + (jax.device_put(words),)


@partial(jax.jit, static_argnames=())
def full(ops, lens, n_ops, pos, bk, bv, nb, g_sb, g_off, ref_base,
         read_packed, ref_words):
    return fwd_batch_resident(
        ops, lens, n_ops, pos, bk, bv, nb, g_sb, g_off, ref_base,
        read_packed, ref_words, **kw,
    )


@jax.jit
def stubbed(ops, lens, n_ops, pos, bk, bv, nb, g_sb, g_off, ref_base,
            read_packed, ref_words):
    """fwd_batch_resident with runs_fn stubbed: everything (lift, cleanup,
    compress, cluster part1, batch compaction, scatter/emit) except the
    window fetch+compare itself.  The stub keeps gst/gitem + the packed
    table live so compaction isn't dead-code-eliminated."""
    l_codes, l_lens, l_n, ref2_pos, mapped, overflow = jax.vmap(
        lambda o, l, n, p, k, v, m: _lift_core(
            o, l, n, p, k, v, m,
            max_out=kw["max_out"], mm=True, max_rows=kw["max_rows"],
        )
    )(ops, lens, n_ops, pos, bk, bv, nb)
    read_len = jax.vmap(cigar_read_len)(l_codes, l_lens)

    def runs_stub(gst, gitem):
        anchor = gst[:, 0] + gst[:, 1] + gitem + read_packed[0, 0]
        raw = (anchor % jnp.int32(kw["window"] + 1)).astype(jnp.int32)
        return raw, raw

    s_codes, s_lens, s_n, s_pos_rel, s_fb = _compact_core(
        l_codes, l_lens, ref2_pos - ref_base, runs_stub,
        max_clusters=kw["max_clusters"], window=kw["window"],
        max_out=kw["max_out"],
    )
    return {
        "codes": s_codes, "lens": s_lens, "n_out": s_n,
        "ref2_pos": s_pos_rel + ref_base, "mapped": mapped,
        "read_len": read_len, "fallback": s_fb | overflow,
    }


REPS = 4 if cpu else 24
for _pass in range(3):
    for name, f in (("A full resident", full), ("B fetch stubbed", stubbed)):
        ms = sustained_batch_time(f, args, REPS, 3, already_batched=True) * 1e3
        print(f"{name:18s} {ms:8.3f} ms/batch", flush=True)
