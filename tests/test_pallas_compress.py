"""Pallas fused cleanup+compress conformance: bit-identical to the XLA
cigar_kernels.cleanup_and_compress(mm=True) on randomized and edge-case
streams (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from portello_tpu.kernels.cigar_kernels import PAD, cleanup_and_compress
from portello_tpu.kernels.pallas.compress_pallas import (
    cleanup_and_compress_batch,
)

MAX_OUT = 232


def _ref(codes, lens):
    return jax.vmap(
        lambda c, l: cleanup_and_compress(c, l, MAX_OUT, True)
    )(jnp.asarray(codes), jnp.asarray(lens))


def _got(codes, lens):
    with pltpu.force_tpu_interpret_mode():
        return cleanup_and_compress_batch(
            jnp.asarray(codes), jnp.asarray(lens), MAX_OUT, interpret=True
        )


@pytest.mark.parametrize("k", [352, 464])
def test_randomized_streams_bit_identical(k):
    rng = np.random.default_rng(17)
    b = 48
    codes = rng.integers(0, 10, size=(b, k)).astype(np.int32)
    lens = rng.integers(0, 24000, size=(b, k)).astype(np.int32)
    lens[rng.random((b, k)) < 0.3] = 0
    # edge rows: all-PAD, all-zero-len, single op, leading/trailing indels
    codes[0, :] = PAD
    lens[1, :] = 0
    codes[2, :] = PAD
    codes[2, 0] = 0
    lens[2, 0] = 5
    codes[3, :4] = [2, 1, 0, 2]  # D I M D: edge del/ins both sides
    lens[3, :4] = [3, 2, 7, 4]
    codes[3, 4:] = PAD
    ref = _ref(codes, lens)
    got = _got(codes, lens)
    for i, (a, bb) in enumerate(zip(ref, got)):
        assert np.array_equal(np.asarray(a), np.asarray(bb)), i


def test_run_overflow_flag_matches():
    k = 352
    codes = np.tile(np.tile(np.array([0, 1], np.int32), k // 2)[None, :],
                    (8, 1))
    lens = np.ones((8, k), np.int32)  # alternating M/I: k runs > MAX_OUT
    ref = _ref(codes, lens)
    got = _got(codes, lens)
    assert np.asarray(ref[4])[0] and np.asarray(got[4])[0]
    for a, b in zip(ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_big_lens_raise_defensive_flag():
    """lens >= 2^16 violate the byte-plane contract: the pallas kernel must
    FLAG them (host fallback) rather than return wrong sums."""
    k = 352
    codes = np.full((8, k), PAD, np.int32)
    codes[0, :3] = [0, 2, 0]
    lens = np.zeros((8, k), np.int32)
    lens[0, :3] = [70000, 5, 9]
    got = _got(codes, lens)
    assert bool(np.asarray(got[4])[0])
