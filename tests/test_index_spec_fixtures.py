"""Spec-derived BAI/CSI known-answer fixtures.

The round-trip tests (own writer -> own reader) catch internal inconsistency
but not spec divergence; here the index BYTES are hand-assembled from the SAM
spec section 5.2 (BAI) and the CSI spec directly — including the htslib
pseudo-bin 37450 (metadata), the optional trailing n_no_coor count, a
nonzero CSI l_aux, and non-default CSI (min_shift, depth) — and the parser
must reproduce hand-computed bins, counts, and query chunk lists.
"""

import gzip
import struct

from portello_tpu.io.bai import BamIndex, reg2bin, reg2bins

V = lambda co, uo=0: (co << 16) | uo  # virtual offset  # noqa: E731


def test_reg2bin_spec_values():
    # leaf level (depth 5, min_shift 14): bins 4681 + (beg >> 14)
    assert reg2bin(0, 16384) == 4681
    assert reg2bin(16384, 32768) == 4682
    assert reg2bin(1 << 26, (1 << 26) + 100) == 4681 + (1 << 12)
    # one level up (bins 585 + (beg >> 17)) once the interval spans leaves
    assert reg2bin(0, 16385) == 585
    assert reg2bin(1 << 17, (1 << 17) + 20000) == 586
    # full-span interval -> root
    assert reg2bin(0, 1 << 29) == 0
    # generalized CSI parameters (min_shift 12, depth 3): leaves at 73
    assert reg2bin(0, 1 << 12, 12, 3) == 73
    assert reg2bin(1 << 12, 1 << 13, 12, 3) == 74


def test_reg2bins_spec_values():
    assert reg2bins(0, 100) == [0, 1, 9, 73, 585, 4681]
    assert reg2bins(1 << 17, (1 << 17) + 1) == [0, 1, 9, 73, 586, 4689]


def _bai_bytes() -> bytes:
    """One-ref BAI with root/mid/leaf bins, pseudo-bin 37450, linear index,
    and the optional trailing n_no_coor."""
    out = bytearray(b"BAI\x01")
    out += struct.pack("<i", 1)  # n_ref
    bins = [
        (0, [(V(10), V(20))]),
        (585, [(V(50), V(60))]),
        (4681, [(V(100, 5), V(200, 10))]),
        (4682, [(V(300), V(400))]),
        # pseudo-bin: [unmapped file range], [n_mapped, n_unmapped]
        (37450, [(V(10), V(400)), (7, 3)]),
    ]
    out += struct.pack("<i", len(bins))
    for bin_id, chunks in bins:
        out += struct.pack("<Ii", bin_id, len(chunks))
        for cb, ce in chunks:
            out += struct.pack("<QQ", cb, ce)
    linear = [V(15), V(15), V(300)] + [V(300)] * 5
    out += struct.pack("<i", len(linear))
    for lo in linear:
        out += struct.pack("<Q", lo)
    out += struct.pack("<Q", 11)  # optional n_no_coor
    return bytes(out)


def test_bai_fixture_parse_and_query(tmp_path):
    p = tmp_path / "x.bam"
    (tmp_path / "x.bam.bai").write_bytes(_bai_bytes())
    idx = BamIndex.load(str(p))
    assert not idx.is_csi and (idx.min_shift, idx.depth) == (14, 5)
    ref = idx.refs[0]
    # pseudo-bin is metadata, not a queryable bin
    assert 37450 not in ref.bins
    assert (ref.n_mapped, ref.n_unmapped) == (7, 3)
    assert set(ref.bins) == {0, 585, 4681, 4682}

    # query [0, 100): bins 0/585/4681 hold chunks; the linear index floor at
    # V(15) clips bin 0's chunk and drops nothing else; merged + sorted
    assert idx.query(0, 0, 100) == [
        (V(15), V(20)), (V(50), V(60)), (V(100, 5), V(200, 10)),
    ]
    # query [2^17, 2^17+1): no bin on that path holds chunks
    assert idx.query(0, 1 << 17, (1 << 17) + 1) == []
    # query crossing both leaves: linear floor V(15); all four bins join,
    # and the [V(300), V(400)] chunk from leaf 4682 appears
    assert idx.query(0, 10000, 20000) == [
        (V(15), V(20)), (V(50), V(60)), (V(100, 5), V(200, 10)),
        (V(300), V(400)),
    ]
    # out-of-range tid
    assert idx.query(1, 0, 100) == []
    assert idx.max_mapped_voffset() == V(400)


def _csi_bytes(min_shift: int, depth: int, bins, l_aux_pad: bytes) -> bytes:
    out = bytearray(b"CSI\x01")
    out += struct.pack("<iii", min_shift, depth, len(l_aux_pad))
    out += l_aux_pad
    out += struct.pack("<i", 1)  # n_ref
    out += struct.pack("<i", len(bins))
    for bin_id, loffset, chunks in bins:
        out += struct.pack("<IQi", bin_id, loffset, len(chunks))
        for cb, ce in chunks:
            out += struct.pack("<QQ", cb, ce)
    return bytes(out)


def test_csi_fixture_default_params(tmp_path):
    pseudo = 37450  # ((1 << 18) - 1) // 7 + 1 for depth 5
    raw = _csi_bytes(
        14, 5,
        [
            (0, V(10), [(V(10), V(20))]),
            (4681, V(100, 5), [(V(100, 5), V(200, 10))]),
            (pseudo, 0, [(V(10), V(200)), (21, 4)]),
        ],
        l_aux_pad=b"AUX!",  # parser must skip l_aux bytes
    )
    p = tmp_path / "y.bam"
    (tmp_path / "y.bam.csi").write_bytes(gzip.compress(raw))
    idx = BamIndex.load(str(p))
    assert idx.is_csi and (idx.min_shift, idx.depth) == (14, 5)
    ref = idx.refs[0]
    assert pseudo not in ref.bins
    assert (ref.n_mapped, ref.n_unmapped) == (21, 4)
    # loffset of the leaf containing beg floors the chunk list: bin 4681's
    # loffset V(100,5) clips bin 0's chunk away entirely
    assert idx.query(0, 0, 100) == [(V(100, 5), V(200, 10))]


def test_csi_fixture_custom_params(tmp_path):
    # min_shift 12, depth 3: leaves at 73 + (beg >> 12); pseudo-bin 586
    raw = _csi_bytes(
        12, 3,
        [
            (73, V(5), [(V(5), V(9))]),
            (74, V(40), [(V(40), V(44))]),
            (586, 0, [(V(5), V(44)), (2, 0)]),
        ],
        l_aux_pad=b"",
    )
    p = tmp_path / "z.bam"
    (tmp_path / "z.bam.csi").write_bytes(gzip.compress(raw))
    idx = BamIndex.load(str(p))
    assert (idx.min_shift, idx.depth) == (12, 3)
    ref = idx.refs[0]
    assert set(ref.bins) == {73, 74}
    assert (ref.n_mapped, ref.n_unmapped) == (2, 0)
    assert idx.query(0, 0, 4096) == [(V(5), V(9))]
    assert idx.query(0, 4096, 8192) == [(V(40), V(44))]
    assert idx.query(0, 0, 8192) == [(V(5), V(9)), (V(40), V(44))]
