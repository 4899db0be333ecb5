"""SIMD seq-codec conformance: the AVX2 nibble codecs in ptscan.cc must be
byte-identical to the scalar LUT walks (and to BAM 4-bit semantics,
SAM spec section 4.2) for every length and alignment.

Covers the three hot paths (fill decode, revcomp fill decode, finisher
flip re-pack) across the scalar/SIMD crossover (>=64 bases engages AVX2),
odd/even lengths, and unaligned source offsets.
"""

import numpy as np
import pytest

from portello_tpu.pipeline import native_feed

SEQ_CHARS = b"=ACMGRSVTWYHKDBN"


def _luts():
    comp = {c: ord("N") for c in range(256)}
    for a, b in zip(b"ATCGN", b"TAGCN"):
        comp[a] = b
        comp[a + 32] = b + 32
    enc = {c: 15 for c in range(256)}
    for i, c in enumerate(SEQ_CHARS):
        enc[c] = i
        enc[ord(chr(c).lower())] = i
    code_comp_ascii = [comp[SEQ_CHARS[c]] for c in range(16)]
    code_comp = [enc[code_comp_ascii[c]] for c in range(16)]
    return code_comp_ascii, code_comp


CODE_COMP_ASCII, CODE_COMP = _luts()


def _codes(packed, l_seq):
    out = []
    for i in range(l_seq):
        b = packed[i // 2]
        out.append((b >> 4) & 0xF if i % 2 == 0 else b & 0xF)
    return out


def oracle(mode, packed, l_seq):
    codes = _codes(packed, l_seq)
    if mode == 0:
        return bytes(SEQ_CHARS[c] for c in codes)
    if mode == 1:
        return bytes(CODE_COMP_ASCII[c] for c in reversed(codes))
    rc = [CODE_COMP[c] for c in reversed(codes)]
    if len(rc) % 2:
        rc.append(0)
    return bytes((rc[i] << 4) | rc[i + 1] for i in range(0, len(rc), 2))


@pytest.fixture(scope="module")
def lib():
    li = native_feed.get_lib()
    if li is None:
        pytest.skip(f"native scanner unavailable: {native_feed.build_error()}")
    return li


LENGTHS = sorted(
    set(
        list(range(0, 8))
        + [31, 32, 33, 62, 63, 64, 65, 66, 127, 128, 129, 255, 256, 257]
        + [1000, 1001, 4096, 4097, 18000, 18001]
    )
)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_codec_matches_oracle(lib, mode):
    rng = np.random.default_rng(42 + mode)
    for l_seq in LENGTHS:
        n_bytes = (l_seq + 1) // 2
        packed = rng.integers(0, 256, size=max(n_bytes, 1), dtype=np.uint8)
        if l_seq % 2:
            packed[n_bytes - 1] &= 0xF0  # BAM pads the final nibble with 0
        out_len = n_bytes if mode == 2 else l_seq
        out = np.full(max(out_len, 1) + 8, 0xEE, dtype=np.uint8)  # canary
        lib.ptscan_dbg_seqcodec(mode, np.ascontiguousarray(packed), l_seq, out)
        got = bytes(out[:out_len])
        assert got == oracle(mode, packed, l_seq), (mode, l_seq)
        assert all(b == 0xEE for b in out[out_len:]), ("overwrite", mode, l_seq)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_codec_unaligned_sources(lib, mode):
    """SIMD loads must be correct from any source alignment (the packed seq
    sits at an arbitrary offset inside the raw BAM record)."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=4096, dtype=np.uint8)
    l_seq = 1002  # even: engages all three SIMD paths
    n_bytes = (l_seq + 1) // 2
    for off in range(1, 33):
        packed = np.ascontiguousarray(base[off : off + n_bytes])
        out_len = n_bytes if mode == 2 else l_seq
        out = np.zeros(out_len, dtype=np.uint8)
        lib.ptscan_dbg_seqcodec(mode, packed, l_seq, out)
        assert bytes(out) == oracle(mode, packed, l_seq), (mode, off)
