"""Spec-based known-answer conformance fixtures.

The round-trip tests elsewhere (our writer -> our reader) catch internal
inconsistency but not spec divergence.  Every artifact here is built BYTE BY
BYTE in this file directly from the published formats — the SAM/BAM spec
(v1.6: BGZF section 3, BAM section 4, indexing section 5) — independently of
``portello_tpu.io``'s encoders, so reader bugs and writer bugs cannot cancel.
(No htslib/samtools exists in this image; hand-transcribed spec bytes are the
strongest available external anchor.)
"""

import struct
import zlib

import numpy as np
import pytest

from portello_tpu.io.bai import BamIndex, bam_reg2bin, reg2bin, reg2bins
from portello_tpu.io.bam import BamReader
from portello_tpu.io.bgzf import BGZF_EOF, BgzfReader

# The spec's fixed 28-byte BGZF EOF marker (SAM spec section 3, verbatim).
SPEC_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def spec_bgzf_block(payload: bytes) -> bytes:
    """One BGZF block per SAM spec section 3: gzip member with the BC extra
    subfield carrying BSIZE (total block length minus 1)."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = co.compress(payload) + co.flush()
    bsize = 12 + 6 + len(cdata) + 8  # header + XLEN extra + CDATA + CRC/ISIZE
    out = bytearray()
    out += b"\x1f\x8b\x08\x04"           # ID1 ID2 CM FLG(FEXTRA)
    out += struct.pack("<IBB", 0, 0, 0xFF)  # MTIME XFL OS
    out += struct.pack("<H", 6)          # XLEN
    out += b"BC" + struct.pack("<HH", 2, bsize - 1)  # SI1 SI2 SLEN BSIZE
    out += cdata
    out += struct.pack("<II", zlib.crc32(payload), len(payload) & 0xFFFFFFFF)
    assert len(out) == bsize
    return bytes(out)


def test_bgzf_eof_marker_matches_spec():
    assert BGZF_EOF == SPEC_EOF


def test_bgzf_reader_decodes_spec_blocks(tmp_path):
    p = str(tmp_path / "x.bgzf")
    payloads = [b"hello bgzf ", b"", b"second block" * 100]
    with open(p, "wb") as f:
        for pl in payloads:
            f.write(spec_bgzf_block(pl))
        f.write(SPEC_EOF)
    r = BgzfReader(p)
    assert r.read(10_000) == b"".join(payloads)
    # virtual offset after a full read of block 0 = (coffset of block 1) << 16
    r2 = BgzfReader(p)
    r2.read(len(payloads[0]))
    assert r2.tell_voffset() >> 16 in (0, len(spec_bgzf_block(payloads[0])))


def spec_bam_record() -> bytes:
    """One alignment per BAM spec section 4.2, hand-packed.

    read1, FLAG 0, chr1:101 (POS 100 0-based), MAPQ 30, CIGAR 2S3M,
    SEQ ACGTN, QUAL 30..34, tags NM:i:1 SA:Z:... XF:f:1.5 CB:B:I,7,9.
    """
    qname = b"read1\x00"
    # CIGAR op order MIDNSHP=X (spec table): S=4, M=0
    cigar = struct.pack("<II", (2 << 4) | 4, (3 << 4) | 0)
    # 4-bit codes from "=ACMGRSVTWYHKDBN": A=1 C=2 G=4 T=8 N=15
    seq_packed = bytes([(1 << 4) | 2, (4 << 4) | 8, 15 << 4])
    qual = bytes([30, 31, 32, 33, 34])
    sa = b"chr1,201,+,5M,60,0;"
    tags = (
        b"NMc" + struct.pack("<b", 1)
        + b"SAZ" + sa + b"\x00"
        + b"XFf" + struct.pack("<f", 1.5)
        + b"CBB" + b"I" + struct.pack("<iII", 2, 7, 9)
    )
    body = struct.pack(
        "<iiBBHHHiiii",
        0,                       # refID
        100,                     # POS
        len(qname),              # l_read_name
        30,                      # MAPQ
        4681,                    # BIN for [100, 103] at the 16kb level
        2,                       # n_cigar_op
        0,                       # FLAG
        5,                       # l_seq
        -1, -1, 0,               # next_refID next_pos tlen
    ) + qname + cigar + seq_packed + qual + tags
    return struct.pack("<i", len(body)) + body


def write_spec_bam(path: str) -> None:
    text = b"@HD\tVN:1.6\tSO:unsorted\n@SQ\tSN:chr1\tLN:1000\n"
    hdr = (
        b"BAM\x01" + struct.pack("<i", len(text)) + text
        + struct.pack("<i", 1)
        + struct.pack("<i", 5) + b"chr1\x00" + struct.pack("<i", 1000)
    )
    with open(path, "wb") as f:
        # header and record in separate blocks exercises cross-block reads
        f.write(spec_bgzf_block(hdr))
        f.write(spec_bgzf_block(spec_bam_record()))
        f.write(SPEC_EOF)


@pytest.mark.parametrize("engine", ["python", "native"])
def test_bam_reader_decodes_spec_file(tmp_path, engine):
    p = str(tmp_path / "spec.bam")
    write_spec_bam(p)
    with BamReader(p, engine=engine) as r:
        assert r.header.refs == [("chr1", 1000)]
        assert b"SO:unsorted" in r.header.text
        recs = list(r)
    assert len(recs) == 1
    rec = recs[0]
    assert rec.qname == b"read1"
    assert rec.flag == 0 and rec.tid == 0 and rec.pos == 100 and rec.mapq == 30
    assert rec.cigar.tolist() == [[4, 2], [0, 3]]  # 2S3M
    assert bytes(rec.seq) == b"ACGTN"
    assert rec.qual.tolist() == [30, 31, 32, 33, 34]
    assert rec.get_int_tag(b"NM") == 1
    assert rec.get_string_tag(b"SA") == "chr1,201,+,5M,60,0;"
    assert rec.get_float_tag(b"XF") == 1.5
    ty, (sub, arr) = rec.get_tag(b"CB")
    assert ty == b"B" and sub == b"I" and list(arr) == [7, 9]
    assert rec.alignment_end() == 103


def test_reg2bin_spec_constants():
    # Values from the spec's C pseudocode (section 5.3), precomputed by hand:
    # t offsets 4681/585/73/9/1 for the 16kb..64Mb levels.
    assert bam_reg2bin(0, 1) == 4681
    assert bam_reg2bin(1 << 14, (1 << 14) + 1) == 4682
    assert bam_reg2bin((1 << 14) - 1, (1 << 14) + 1) == 585
    assert bam_reg2bin(0, (1 << 17)) == 585
    assert bam_reg2bin(0, (1 << 17) + 1) == 73
    assert bam_reg2bin(0, (1 << 20) + 1) == 9
    assert bam_reg2bin(0, (1 << 23) + 1) == 1
    assert bam_reg2bin(0, (1 << 26) + 1) == 0
    assert bam_reg2bin(9_999, 10_000) == 4681
    # reg2bins must contain the ancestors and the leaf for a sub-16kb region
    bins = reg2bins(100, 104)
    for b in (0, 1, 9, 73, 585, 4681):
        assert b in bins


def spec_reg2bin_reference(beg: int, end: int) -> int:
    """Direct transcription of the spec section 5.3 C function (independent
    of portello_tpu.io.bai's loop formulation)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def test_reg2bin_matches_spec_transcription():
    rng = np.random.default_rng(7)
    for _ in range(500):
        beg = int(rng.integers(0, 1 << 29))
        end = beg + int(rng.integers(1, 1 << 20))
        assert bam_reg2bin(beg, end) == spec_reg2bin_reference(beg, end)
    assert reg2bin(0, 1, 14, 5) == spec_reg2bin_reference(0, 1)


def test_bai_parser_on_handbuilt_index(tmp_path):
    """BAI bytes written per spec section 5.2 (magic, bins, pseudo-bin 37450,
    linear index), independent of io/index_build.py."""
    p = str(tmp_path / "spec.bam")
    write_spec_bam(p)
    chunk = (0x0000_0123_0000_0010, 0x0000_0456_0000_0020)
    bai = bytearray(b"BAI\x01")
    bai += struct.pack("<i", 1)            # n_ref
    bai += struct.pack("<i", 2)            # n_bin
    bai += struct.pack("<Ii", 4681, 1)     # bin, n_chunk
    bai += struct.pack("<QQ", *chunk)
    bai += struct.pack("<Ii", 37450, 2)    # pseudo-bin
    bai += struct.pack("<QQ", chunk[0], chunk[1])   # ref_beg, ref_end
    bai += struct.pack("<QQ", 1, 0)        # n_mapped, n_unmapped
    bai += struct.pack("<i", 1)            # n_intv
    bai += struct.pack("<Q", chunk[0])     # ioffset[0]
    with open(p + ".bai", "wb") as f:
        f.write(bytes(bai))

    idx = BamIndex.load(p)
    assert not idx.is_csi
    assert idx.refs[0].n_mapped == 1 and idx.refs[0].n_unmapped == 0
    assert idx.refs[0].bins[4681] == [chunk]
    assert 37450 not in idx.refs[0].bins
    # query for the covered 16kb window returns the chunk; a far window doesn't
    assert idx.query(0, 100, 104) == [chunk]
    assert idx.query(0, (1 << 16), (1 << 16) + 1) == []
    assert idx.max_mapped_voffset() == chunk[1]
