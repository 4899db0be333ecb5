"""Simplify / left-shift device kernel conformance vs the host oracle.

Covers the reference unit vectors (simplify_alignment_indels.rs:158-254,
shift_indels/mod.rs:8-174) plus randomized alignments over random sequences.
"""

import numpy as np
import pytest

from portello_tpu.ops import cigar as cg
from portello_tpu.ops.seq import from_bytes
from portello_tpu.ops.shift import left_shift_indels
from portello_tpu.ops.simplify import simplify_alignment_indels

jax = pytest.importorskip("jax")

from portello_tpu.kernels.cigar_kernels import INT32_MAX, PAD  # noqa: E402
from portello_tpu.kernels.shift_kernel import left_shift_batch  # noqa: E402
from portello_tpu.kernels.simplify_kernel import simplify_batch  # noqa: E402

MAX_OPS = 48
MAX_CL = 24
WIN = 16
MAX_OUT = 96
MAX_SEQ = 512


def pad_batch(items):
    """items: list of (cigar, ref_pos, ref_seq, read_seq[, win_base])"""
    b = len(items)
    codes = np.full((b, MAX_OPS), PAD, np.int32)
    lens = np.zeros((b, MAX_OPS), np.int32)
    pos = np.zeros(b, np.int32)
    base = np.zeros(b, np.int32)
    refw = np.zeros((b, MAX_SEQ), np.uint8)
    readw = np.zeros((b, MAX_SEQ), np.uint8)
    for i, item in enumerate(items):
        cig, ref_pos, ref_seq, read_seq = item[:4]
        codes[i, : len(cig)] = cig[:, 0]
        lens[i, : len(cig)] = cig[:, 1]
        pos[i] = ref_pos
        refw[i, : len(ref_seq)] = ref_seq
        readw[i, : len(read_seq)] = read_seq
        base[i] = item[4] if len(item) > 4 else 0
    return codes, lens, pos, base, refw, readw


def unpack(out, i):
    f_codes, f_lens, n_out, pos, fallback = out
    n = int(n_out[i])
    cig = np.stack(
        [np.asarray(f_codes)[i, :n], np.asarray(f_lens)[i, :n]], axis=1
    ).astype(np.int64)
    return int(pos[i]), cig, bool(fallback[i])


SIMPLIFY_CASES = [
    ("6M", 2, b"XXABCCDEXX", b"ABCCDE"),
    ("2M1I3M", 2, b"XXABCDEXX", b"ABCCDE"),
    ("2M1D3M", 2, b"XXABCCDEXX", b"ABCDE"),
    ("2M2D2I3M", 2, b"XXABCCCDEXX", b"ABBBCDE"),
    ("3M1I2D2M", 2, b"XXABCCCDEXX", b"ABCCDE"),
    ("3M3D3I1M", 2, b"XXABCCCDEXX", b"ABCCXXE"),
    ("3M1D1I2M", 2, b"XXABCCCDEXX", b"ABCQDE"),
    ("2D4M", 2, b"XXABCCDEXX", b"CCDE"),
    ("2S2M1I1D1M2S", 1, b"XABCCDX", b"QQABBCQQ"),
]


def test_simplify_kernel_reference_vectors():
    items = [
        (cg.from_string(s), p, from_bytes(r), from_bytes(q))
        for s, p, r, q in SIMPLIFY_CASES
    ]
    arrs = pad_batch(items)
    out = simplify_batch(
        arrs[0], arrs[1], arrs[2], arrs[4], arrs[5],
        max_clusters=MAX_CL, window=WIN, max_out=MAX_OUT,
    )
    for i, (cig, pos, ref, read) in enumerate(items):
        exp_pos, exp_cig = simplify_alignment_indels(pos, cig, ref, read)
        got_pos, got_cig, fb = unpack(out, i)
        assert not fb, f"case {i} fell back"
        assert (got_pos, cg.to_string(got_cig)) == (exp_pos, cg.to_string(exp_cig)), (
            f"case {i}: got {got_pos},{cg.to_string(got_cig)} want "
            f"{exp_pos},{cg.to_string(exp_cig)}"
        )


SHIFT_CASES = [
    ("6M", 2, b"XXABCCDEXX", b"ABCCDE"),
    ("2S2M2S", 4, b"XXABCCDEXX", b"ABCCDE"),
    ("3M1I2M", 2, b"XXABCDEXX", b"ABCCDE"),
    ("1M1I2M", 4, b"XXABCDEXX", b"CCDE"),
    ("3M1D2M", 2, b"XXABCCDEXX", b"ABCDE"),
    ("3M3D2M", 2, b"XXABBCBBBAXX", b"ABBBA"),
    ("1M1D2M", 4, b"XXABCCDEXX", b"CDE"),
    ("3M1I2M1D1M", 2, b"XXABCDEEFXX", b"ABCCDEF"),
    ("4M2D2I1M", 2, b"XXABBBABFXX", b"ABBBBBF"),
    ("2H3M1I2M2H", 2, b"XXABCDEXX", b"QQABCCDEQQ"),
]


def test_shift_kernel_reference_vectors():
    items = [
        (cg.from_string(s), p, from_bytes(r), from_bytes(q))
        for s, p, r, q in SHIFT_CASES
    ]
    arrs = pad_batch(items)
    out = left_shift_batch(
        arrs[0], arrs[1], arrs[2], arrs[3], arrs[4], arrs[5],
        max_clusters=MAX_CL, window=WIN, max_out=MAX_OUT,
    )
    for i, (cig, pos, ref, read) in enumerate(items):
        exp_pos, exp_cig = left_shift_indels(pos, cig, ref, read)
        got_pos, got_cig, fb = unpack(out, i)
        assert not fb, f"case {i} fell back"
        assert (got_pos, cg.to_string(got_cig)) == (exp_pos, cg.to_string(exp_cig)), (
            f"case {i}: got {got_pos},{cg.to_string(got_cig)} want "
            f"{exp_pos},{cg.to_string(exp_cig)}"
        )


def random_alignment(rng, max_len=200):
    """Random (cigar, ref_pos, ref_seq, read_seq) over a 2-letter alphabet so
    indel homology and re-match opportunities are common."""
    alpha = np.frombuffer(b"AB", dtype=np.uint8)
    ref_seq = rng.choice(alpha, size=max_len)
    ref_pos = int(rng.integers(0, 20))
    ops = []
    ref_left = max_len - ref_pos - 10
    read_parts = []
    if rng.random() < 0.3:
        ln = int(rng.integers(1, 6))
        ops.append((cg.S, ln))
        read_parts.append(rng.choice(alpha, size=ln))
    rp = ref_pos
    last = None
    for _ in range(int(rng.integers(1, 12))):
        choices = [cg.M, cg.I, cg.D]
        code = int(rng.choice(choices))
        if code == last and code != cg.M:
            code = cg.M
        ln = int(rng.integers(1, 8))
        if code == cg.M or code == cg.D:
            if ref_left - ln < 1:
                break
            ref_left -= ln
        if code == cg.M:
            read_parts.append(ref_seq[rp : rp + ln])  # mostly matching
            rp += ln
        elif code == cg.I:
            read_parts.append(rng.choice(alpha, size=ln))
        else:
            rp += ln
        ops.append((code, ln))
        last = code
    if not any(c == cg.M for c, _ in ops):
        ops.append((cg.M, 3))
        read_parts.append(ref_seq[rp : rp + 3])
    if rng.random() < 0.3:
        ln = int(rng.integers(1, 6))
        ops.append((cg.S, ln))
        read_parts.append(rng.choice(alpha, size=ln))
    cig = np.array(ops, dtype=np.int64)
    read_seq = np.concatenate(read_parts) if read_parts else np.zeros(0, np.uint8)
    return cig, ref_pos, ref_seq, read_seq


def test_simplify_kernel_fuzz():
    rng = np.random.default_rng(7)
    items = [random_alignment(rng) for _ in range(200)]
    arrs = pad_batch(items)
    out = simplify_batch(
        arrs[0], arrs[1], arrs[2], arrs[4], arrs[5],
        max_clusters=MAX_CL, window=WIN, max_out=MAX_OUT,
    )
    n_fallback = 0
    for i, (cig, pos, ref, read) in enumerate(items):
        got_pos, got_cig, fb = unpack(out, i)
        if fb:
            n_fallback += 1
            continue
        exp_pos, exp_cig = simplify_alignment_indels(pos, cig, ref, read)
        assert (got_pos, cg.to_string(got_cig)) == (exp_pos, cg.to_string(exp_cig)), (
            f"case {i} ({cg.to_string(cig)}@{pos}): got "
            f"{got_pos},{cg.to_string(got_cig)} want {exp_pos},{cg.to_string(exp_cig)}"
        )
    assert n_fallback < len(items) // 4


def test_shift_kernel_fuzz():
    rng = np.random.default_rng(8)
    items = [random_alignment(rng) for _ in range(200)]
    arrs = pad_batch(items)
    out = left_shift_batch(
        arrs[0], arrs[1], arrs[2], arrs[3], arrs[4], arrs[5],
        max_clusters=MAX_CL, window=WIN, max_out=MAX_OUT,
    )
    n_fallback = 0
    for i, (cig, pos, ref, read) in enumerate(items):
        got_pos, got_cig, fb = unpack(out, i)
        if fb:
            n_fallback += 1
            continue
        exp_pos, exp_cig = left_shift_indels(pos, cig, ref, read)
        assert (got_pos, cg.to_string(got_cig)) == (exp_pos, cg.to_string(exp_cig)), (
            f"case {i} ({cg.to_string(cig)}@{pos}): got "
            f"{got_pos},{cg.to_string(got_cig)} want {exp_pos},{cg.to_string(exp_cig)}"
        )
    assert n_fallback < len(items) // 4


def test_shift_kernel_window_base():
    """win_base shifts the absolute left-edge limit: an indel in an all-equal
    context must slide further when the window sits deeper in the contig."""
    ref = from_bytes(b"BBBBBBBBBB")
    read = from_bytes(b"BBB")
    cig = cg.from_string("1M1D2M")
    # window-relative pos 1; absolute pos = win_base + 1
    items = [(cig, 1, ref, read, 0), (cig, 1, ref, read, 5)]
    arrs = pad_batch(items)
    out = left_shift_batch(
        arrs[0], arrs[1], arrs[2], arrs[3], arrs[4], arrs[5],
        max_clusters=MAX_CL, window=WIN, max_out=MAX_OUT,
    )
    # oracle comparison: emulate absolute coords by prefixing the window
    for i, base in enumerate([0, 5]):
        full_ref = np.concatenate([np.full(base, ord("B"), np.uint8), ref])
        exp_pos, exp_cig = left_shift_indels(base + 1, cig, full_ref, read)
        got_pos, got_cig, fb = unpack(out, i)
        assert not fb
        assert got_pos + base == exp_pos
        assert cg.to_string(got_cig) == cg.to_string(exp_cig)
