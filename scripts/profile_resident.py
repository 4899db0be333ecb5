"""On-chip A/B: production fwd graph (per-item ref/seq tables) vs the
round-5 resident formulation (fwd_batch_resident: HBM-resident superblock
reference + packed read rows, kernels/resident.py).

Protocol (VERDICT r4 #1a): the resident path's H2D savings cannot be timed
faithfully through the axon relay (dispatch RTT ~0.5 s measures the tunnel,
not production PCIe), so the decision splits into medium-independent parts:

  1. GRAPH time — sustained in-jit A/B, interleaved passes (this script);
  2. H2D bytes — exact per-batch arithmetic (printed below): the classic
     graph moves two (B, max_seq) uint8 tables, the resident graph moves one
     (B, max_seq/2) packed table (the reference table is resident across
     batches);
  3. host fill — profile_feed.py once the C++ fill is wired (the 24 KB/item
     ref memcpy and the nibble decode disappear).

If (1) is at parity or better, the resident graph strictly dominates in
production (2)+(3) and becomes the default dispatch.

Usage: python scripts/profile_resident.py [cpu] [table_mb]
"""

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

from bench import fast_item_arrays, sustained_batch_time  # noqa: E402
from portello_tpu.kernels.resident import SB, pack_seq_rows  # noqa: E402
from portello_tpu.models.pipeline_model import (  # noqa: E402
    fwd_batch,
    fwd_batch_resident,
)
from portello_tpu.testutil.batchgen import HIFI_BUCKET  # noqa: E402

cpu = jax.default_backend() == "cpu"
B = 64 if cpu else 512
READ_LEN = 2000 if cpu else 18000
TABLE_MB = int(sys.argv[2]) if len(sys.argv) > 2 else (8 if cpu else 256)
bcfg = HIFI_BUCKET
kw = dict(
    max_out=bcfg.resolved_max_out(), max_clusters=bcfg.max_clusters,
    window=bcfg.window, max_rows=bcfg.resolved_max_rows(),
)
rng = np.random.default_rng(2026)
items = fast_item_arrays(rng, B, bcfg, READ_LEN, rev=False)
(ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq) = [
    np.asarray(a) for a in items
]

# resident args: synthetic genome table (content-random — kernel cost is
# data-independent given shapes), window origins scattered across it
nsb = TABLE_MB * (1 << 20) // SB
words = rng.integers(0, 2**32, size=(nsb, SB // 4), dtype=np.uint32)
g_sb = rng.integers(2, nsb - 4096, size=B, dtype=np.int64).astype(np.int32)
g_off = rng.integers(0, SB, size=B, dtype=np.int32)
read_packed = pack_seq_rows(read_seq)

args_t = tuple(jax.device_put(a) for a in (
    ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base, read_seq))
jwords = jax.device_put(words)
args_r = tuple(jax.device_put(a) for a in (
    ops, lens, n_ops, pos, bk, bv, nb, g_sb, g_off, ref_base, read_packed)
) + (jwords,)

h2d_t = ref_win.nbytes + read_seq.nbytes
h2d_r = read_packed.nbytes + g_sb.nbytes + g_off.nbytes
print(
    f"B={B} read_len={READ_LEN} table={TABLE_MB}MB  per-batch H2D: "
    f"table-form {h2d_t/2**20:.2f} MiB vs resident {h2d_r/2**20:.2f} MiB "
    f"({h2d_t/h2d_r:.2f}x less)",
    flush=True,
)

mm = not cpu


def run_t(*a):
    return fwd_batch(*a, mm=mm, **kw)


def run_r(*a):
    return fwd_batch_resident(*a, **kw)


REPS = 4 if cpu else 24
for _pass in range(3):
    for name, f, a in (("table", run_t, args_t), ("resident", run_r, args_r)):
        ms = sustained_batch_time(f, a, REPS, 3, already_batched=True) * 1e3
        print(f"{name:10s} {ms:8.3f} ms/batch", flush=True)
