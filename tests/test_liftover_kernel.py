"""Device liftover kernel conformance: must match the host oracle exactly.

Covers the reference's liftover unit vectors
(reference src/liftover_read_alignment.rs:225-449) plus randomized fuzzing of
alignments against random block maps.
"""

import numpy as np
import pytest

from portello_tpu.models.batch import BucketConfig, build_liftover_batch, unpad_cigar
from portello_tpu.ops import cigar as cg
from portello_tpu.ops.blockmap import BlockMap, build_block_map
from portello_tpu.ops.liftover import liftover_read_alignment

jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402

from portello_tpu.kernels.cigar_kernels import cleanup_and_compress  # noqa: E402
from portello_tpu.kernels.liftover_kernel import (  # noqa: E402
    _liftover_scan_single,
    liftover_batch,
)
from portello_tpu.kernels.liftover_parallel import _liftover_parallel_single  # noqa: E402

CFG = BucketConfig(max_ops=64, max_blocks=32, max_seq=1024)

IMPLS = {
    "scan": _liftover_scan_single,
    "parallel": lambda *a, **k: _liftover_parallel_single(*a, **k)[:3],
}


def run_batch(items, cfg=CFG, impl="scan"):
    arrs = build_liftover_batch(items, cfg)
    max_out = cfg.resolved_max_out()
    if impl == "scan":
        out = liftover_batch(*[np.asarray(a) for a in arrs], max_out=max_out)
        return {k: np.asarray(v) for k, v in out.items()}

    single = IMPLS[impl]

    def item(ops, lens, n_ops, pos, bk, bv, nb):
        e_codes, e_lens, ref2_start = single(ops, lens, n_ops, pos, bk, bv, nb)
        o_codes, o_lens, n_out, shift, overflow = cleanup_and_compress(
            e_codes, e_lens, max_out
        )
        mapped = ref2_start >= 0
        return {
            "ref2_pos": jnp.where(mapped, ref2_start + shift, -1),
            "codes": o_codes, "lens": o_lens, "n_out": n_out,
            "mapped": mapped, "overflow": overflow,
        }

    out = jax.jit(jax.vmap(item))(*[np.asarray(a) for a in arrs])
    return {k: np.asarray(v) for k, v in out.items()}


def check_against_oracle(items, cfg=CFG, impl="scan"):
    out = run_batch(items, cfg, impl)
    for i, (cig, pos, bm) in enumerate(items):
        expected = liftover_read_alignment(bm, pos, cig)
        assert not out["overflow"][i], f"item {i} overflowed"
        if expected is None:
            assert not out["mapped"][i], f"item {i}: expected unmapped"
        else:
            exp_pos, exp_cig = expected
            assert out["mapped"][i], f"item {i}: expected mapped"
            got_cig = unpad_cigar(out["codes"][i], out["lens"][i], out["n_out"][i])
            assert out["ref2_pos"][i] == exp_pos, (
                f"item {i}: pos {out['ref2_pos'][i]} != {exp_pos}"
            )
            assert cg.to_string(got_cig) == cg.to_string(exp_cig), (
                f"item {i}: {cg.to_string(got_cig)} != {cg.to_string(exp_cig)}"
            )


@pytest.mark.parametrize("impl", list(IMPLS))
def test_reference_vectors(impl):
    read = cg.from_string("10M10D10M10I10M10S")
    items = [
        (read, 10, BlockMap()),
        (read, 10, build_block_map(1000, cg.from_string("100M"), False)),
        (read, 10, build_block_map(1000, cg.from_string("10M1D5M1D5M1D5M1D10M1D15M1D50M"), False)),
        (read, 10, build_block_map(1000, cg.from_string("5M10I10M5I5M5I3M5I1M5I46M"), False)),
        (read, 0, build_block_map(1000, cg.from_string("30S70M"), False)),
        (read, 5, build_block_map(1000, cg.from_string("10S90M"), False)),
        (cg.from_string("10M10D10M"), 5, build_block_map(1000, cg.from_string("20S90M"), False)),
        (cg.from_string("10M10D10M"), 45, build_block_map(1000, cg.from_string("70M30S"), False)),
        (cg.from_string("10M10I10M"), 60, build_block_map(1000, cg.from_string("70M30S"), False)),
        (cg.from_string("10M10D10M"), 55, build_block_map(1000, cg.from_string("70M30S"), False)),
        (cg.from_string("5H10M5H"), 10, build_block_map(1000, cg.from_string("100M"), False)),
    ]
    check_against_oracle(items, impl=impl)


def random_cigar(rng, max_ops, read_only=False, allow_nx=True):
    """Random plausible alignment cigar: clips on edges, M runs with indels."""
    n_mid = rng.integers(1, max_ops - 4)
    ops = []
    if rng.random() < 0.5:
        ops.append((cg.H if rng.random() < 0.3 else cg.S, int(rng.integers(1, 20))))
    last_was_match = False
    for _ in range(n_mid):
        if not last_was_match or rng.random() < 0.5:
            code = rng.choice([cg.M, cg.EQ, cg.X] if allow_nx else [cg.M])
            last_was_match = True
        else:
            code = rng.choice([cg.I, cg.D, cg.N] if allow_nx else [cg.I, cg.D])
            last_was_match = False
        ops.append((int(code), int(rng.integers(1, 30))))
    if not any(cg.IS_ALIGN_MATCH[c] for c, _ in ops):
        ops.append((cg.M, int(rng.integers(1, 30))))
    if rng.random() < 0.5:
        ops.append((cg.S, int(rng.integers(1, 20))))
    return np.array(ops, dtype=np.int64)


@pytest.mark.parametrize("impl", list(IMPLS))
def test_fuzz_against_oracle(impl):
    rng = np.random.default_rng(20260816)
    items = []
    for _ in range(300):
        map_cigar = random_cigar(rng, 24)
        map_pos = int(rng.integers(0, 5000))
        bm = build_block_map(map_pos, map_cigar, False)
        if len(bm) > CFG.max_blocks:
            continue
        map_read_len = cg.get_cigar_read_offset(map_cigar, False)
        read_cigar = random_cigar(rng, 48)
        read_span = cg.get_cigar_ref_offset(read_cigar)
        hi = max(map_read_len - read_span, 1)
        read_pos = int(rng.integers(0, hi + 10))
        items.append((read_cigar, read_pos, bm))
    assert len(items) > 200
    check_against_oracle(items, impl=impl)


def test_empty_cigar_batch():
    items = [(cg.EMPTY, 0, BlockMap())]
    out = run_batch(items)
    assert not out["mapped"][0]
