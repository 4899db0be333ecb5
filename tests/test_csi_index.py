"""CSI index parsing + query coverage (the .csi alternative to .bai)."""

import gzip
import struct

import numpy as np

from portello_tpu.io.bai import BamIndex, reg2bin
from portello_tpu.io.bam import BamHeader, BamRecord, BamReader, BamWriter
from portello_tpu.io.index_build import build_bai
from portello_tpu.ops import cigar as cg


def csi_from_bai(bai: BamIndex, min_shift=14, depth=5) -> bytes:
    """Serialize an equivalent CSI file from a parsed BAI (loffset = min chunk
    start per bin, a valid conservative choice)."""
    out = bytearray(b"CSI\x01")
    out += struct.pack("<iii", min_shift, depth, 0)
    out += struct.pack("<i", len(bai.refs))
    for ref in bai.refs:
        out += struct.pack("<i", len(ref.bins))
        for b, chunks in sorted(ref.bins.items()):
            loffset = min(cb for cb, _ in chunks)
            out += struct.pack("<IQi", b, loffset, len(chunks))
            for cb, ce in chunks:
                out += struct.pack("<QQ", cb, ce)
    return bytes(out)


def test_csi_query_matches_bai(tmp_path):
    header = BamHeader.from_refs([("chr1", 1 << 22)])
    rng = np.random.default_rng(2)
    records = []
    pos = 5
    for i in range(400):
        pos += int(rng.integers(1, 20000))
        ln = int(rng.integers(50, 3000))
        records.append(
            BamRecord(
                qname=f"r{i}".encode(), flag=0, tid=0, pos=pos, mapq=60,
                cigar=cg.cigar((cg.M, ln)),
                seq=np.full(ln, ord("A"), np.uint8),
                qual=np.full(ln, 30, np.uint8),
            )
        )
    p = str(tmp_path / "x.bam")
    with BamWriter(p, header) as w:
        for r in records:
            w.write(r)
    build_bai(p)
    bai = BamIndex.load(p)

    # write the CSI (gzip-compressed as produced by htslib) and reload
    with open(str(tmp_path / "x.bam.csi"), "wb") as f:
        f.write(gzip.compress(csi_from_bai(bai)))
    import os

    os.remove(p + ".bai")
    csi = BamIndex.load(p)
    assert csi.is_csi and csi.min_shift == 14 and csi.depth == 5

    reader = BamReader(p)
    reader._index = csi
    for beg, end in [(0, 1 << 22), (100000, 300000), (4000000, 4002000)]:
        got = [r.qname for r in reader.fetch(0, beg, end)]
        want = [
            r.qname for r in records
            if r.pos < end and r.alignment_end() > beg
        ]
        assert got == want, (beg, end)
    reader.close()


def test_reg2bin_csi_generalized():
    # larger min_shift coarsens bins
    assert reg2bin(0, 1 << 16, min_shift=16, depth=4) == ((1 << 12) - 1) // 7 + 0 + (0)
    b14 = reg2bin(123456, 123457)
    b16 = reg2bin(123456, 123457, min_shift=16, depth=4)
    assert b14 != b16


def test_build_csi_fetch_matches_bai(tmp_path):
    """build_csi output drives fetch identically to the BAI on the same BAM."""
    import numpy as np

    from portello_tpu.io.bai import BamIndex
    from portello_tpu.io.bam import BamReader
    from portello_tpu.io.index_build import build_csi
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(19))
    bam = str(tmp_path / "read_to_asm.bam")
    with BamReader(bam) as r:
        via_bai = {
            (tid, 0, 30000): sorted(
                rec.qname for rec in r.fetch(tid, 0, 30000)
            )
            for tid in range(len(r.header.refs))
        }
    import os

    os.rename(bam + ".bai", bam + ".bai.hidden")
    csi = build_csi(bam)
    assert csi == bam + ".csi"
    idx = BamIndex.load(bam)
    assert idx.is_csi and idx.depth >= 5
    with BamReader(bam) as r:
        for (tid, b, e), want in via_bai.items():
            got = sorted(rec.qname for rec in r.fetch(tid, b, e))
            assert got == want, (tid, b, e)
    os.rename(bam + ".bai.hidden", bam + ".bai")


def test_build_csi_indexes_past_bai_limit(tmp_path):
    """A contig longer than 2^29 (BAI-impossible) indexes and fetches via
    CSI: the depth grows to cover it and spanning-record loffsets stay
    conservative (linear fill)."""
    import numpy as np
    import pytest

    from portello_tpu.io.bam import BamHeader, BamRecord, BamReader, BamWriter
    from portello_tpu.io.index_build import build_bai, build_csi
    from portello_tpu.ops import cigar as cg

    ln = (1 << 30) + 1000
    header = BamHeader.from_refs([("big", ln)], f"@SQ\tSN:big\tLN:{ln}\n".encode())
    positions = [100, (1 << 29) + 5, (1 << 30) - 50, (1 << 30) + 100]
    recs = [
        BamRecord(
            qname=f"r{i}".encode(), flag=0, tid=0, pos=p, mapq=60,
            cigar=cg.cigar((cg.M, 50)),
            seq=np.full(50, ord("A"), np.uint8),
            qual=np.full(50, 30, np.uint8),
        )
        for i, p in enumerate(positions)
    ]
    bam = str(tmp_path / "big.bam")
    with BamWriter(bam, header) as w:
        for rec in recs:
            w.write(rec)
    with pytest.raises(ValueError, match="CSI"):
        build_bai(bam)
    build_csi(bam)
    with BamReader(bam) as r:
        for i, p in enumerate(positions):
            got = [rec.qname for rec in r.fetch(0, p, p + 10)]
            assert got == [f"r{i}".encode()], p
        assert [rec.qname for rec in r.fetch(0, 0, ln)] == [
            rec.qname for rec in recs
        ]
