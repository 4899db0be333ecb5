"""Same-run interleaved A/B: prev_end2 via packed int32 cummax (current)
vs the (U, U) one-hot expansion (pre-pack, scripts/_liftover_prevexp.py =
git 4fec3f6), at max_rows 176 (proven bound) and 192.

Full fwd leg (lift + compress + simplify) so the comparison is in-context.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from _liftover_prevexp import (  # noqa: E402
    _liftover_parallel_single as prevexp_single,
)
from portello_tpu.kernels.cigar_kernels import (  # noqa: E402
    cigar_read_len, cleanup_and_compress,
)
from portello_tpu.kernels.liftover_parallel import (  # noqa: E402
    _liftover_parallel_single as pack_single,
)
from portello_tpu.kernels.shift_kernel import (  # noqa: E402
    shift_stage_a_batch, shift_stage_b_batch,
)
from portello_tpu.kernels.simplify_kernel import _simplify_single  # noqa: E402
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

B = 512
bcfg = HIFI_BUCKET
MAX_OUT = bcfg.resolved_max_out()
mm = jax.default_backend() == "tpu"
rng = np.random.default_rng(2026)
fwd_items = fast_item_arrays(rng, B, bcfg, 18000, rev=False)
dev_fwd = tuple(jax.device_put(np.asarray(a)) for a in fwd_items)

rev_items = fast_item_arrays(rng, B, bcfg, 18000, rev=True)
(ops, lens, n_ops, pos, win_base, contig_win, bk, bv, nb,
 ref_win, ref_base, read_seq) = [jax.device_put(np.asarray(a)) for a in rev_items]
rel_pos = pos - win_base
st = shift_stage_a_batch(
    ops, lens, rel_pos, win_base, contig_win, read_seq,
    max_clusters=bcfg.max_clusters, window=bcfg.window, mm=mm,
)
sh_codes, sh_lens, sh_n, sh_pos, _fb = shift_stage_b_batch(
    ops, lens, rel_pos, st, window=bcfg.window, max_out=MAX_OUT, mm=mm
)

REPS = 24
print(f"device={jax.devices()[0]}", file=sys.stderr)


def make_fwd(single, max_rows):
    def item(o, l, n, p, k, v, m, rw, rb, rq):
        out = single(o, l, n, p, k, v, m, mm, max_rows)
        e_codes, e_lens, ref2_start = out[0], out[1], out[2]
        l_codes, l_lens, l_n, shift, overflow = cleanup_and_compress(
            e_codes, e_lens, MAX_OUT, mm
        )
        mapped = ref2_start >= 0
        ref2_pos = jnp.where(mapped, ref2_start + shift, -1)
        read_len = cigar_read_len(l_codes, l_lens)
        s_codes, s_lens, s_n, s_pos_rel, s_fb = _simplify_single(
            l_codes, l_lens, ref2_pos - rb, rw, rq,
            max_clusters=bcfg.max_clusters, window=bcfg.window,
            max_out=MAX_OUT, mm=mm,
        )
        return (s_codes, s_lens, s_n, s_pos_rel, mapped, read_len,
                s_fb | overflow)

    return item


def t_fwd(single, max_rows):
    return sustained_batch_time(make_fwd(single, max_rows), dev_fwd, REPS, 3) * 1e3


def t_rev(single, width, max_rows):
    args = (sh_codes[:, :width], sh_lens[:, :width], sh_n, sh_pos + win_base,
            bk, bv, nb, ref_win, ref_base, read_seq)
    return sustained_batch_time(make_fwd(single, max_rows), args, REPS, 3) * 1e3


REV_VARIANTS = [
    ("pack    w136 U=184", pack_single, 184),
    ("pack    w136 U=178", pack_single, 178),
    ("prevexp w136 U=192", prevexp_single, 192),
]
for rnd in range(3):
    for name, single, u in REV_VARIANTS:
        print(f"round {rnd} rev {name}: {t_rev(single, 136, u):7.3f} ms",
              flush=True)
