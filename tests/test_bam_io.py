"""BAM/BGZF/BAI I/O round-trip and region-fetch tests.

The reference relies on htslib for all of this; our codec must round-trip
records losslessly and reproduce htslib's fetch overlap semantics."""

import struct

import numpy as np
import pytest

from portello_tpu.io.bai import bam_reg2bin
from portello_tpu.io.bam import (
    FREVERSE,
    FUNMAP,
    BamHeader,
    BamReader,
    BamRecord,
    BamWriter,
    assert_bam_eof,
)
from portello_tpu.io.bgzf import BgzfReader, BgzfWriter, check_eof_marker
from portello_tpu.io.fasta import get_genome_ref_from_fasta, write_fasta
from portello_tpu.io.index_build import build_bai
from portello_tpu.ops import cigar as cg


def test_bgzf_roundtrip(tmp_path):
    p = tmp_path / "t.bgzf"
    data = bytes(range(256)) * 2000
    with open(p, "wb") as f:
        w = BgzfWriter(f)
        w.write(data)
        w.close()
    assert check_eof_marker(str(p))
    r = BgzfReader(str(p))
    assert r.read(len(data) + 10) == data
    r.close()


def test_bgzf_uncompressed_level(tmp_path):
    p = tmp_path / "t0.bgzf"
    data = b"ACGT" * 50000
    with open(p, "wb") as f:
        w = BgzfWriter(f, level=0)
        w.write(data)
        w.close()
    r = BgzfReader(str(p))
    assert r.read(len(data)) == data
    r.close()


def make_header():
    return BamHeader.from_refs([("chr1", 100000), ("chr2", 50000)], text=b"@HD\tVN:1.6\n")


def test_record_roundtrip(tmp_path):
    header = make_header()
    rec = BamRecord.from_sam(
        header,
        "read1\t0\tchr1\t100\t60\t5S10M2I3M\t*\t0\t0\t"
        + "ACGTACGTACGTACGTACGT\tIIIIIIIIIIIIIIIIIIII\t"
        + "NM:i:3\tSA:Z:chr2,5,-,20M,60,0;\tZM:i:7\trq:f:0.99",
    )
    raw = rec.encode()
    back = BamRecord.decode(raw)
    assert back.qname == b"read1"
    assert back.tid == 0 and back.pos == 99 and back.mapq == 60
    assert cg.to_string(back.cigar) == "5S10M2I3M"
    assert back.seq.tobytes() == b"ACGTACGTACGTACGTACGT"
    assert back.get_int_tag(b"NM") == 3
    assert back.get_string_tag(b"SA") == "chr2,5,-,20M,60,0;"
    assert back.get_int_tag(b"ZM") == 7
    assert back.encode() == raw
    assert back.to_sam(header).startswith("read1\t0\tchr1\t100\t60\t5S10M2I3M")


def test_record_flags_and_end():
    header = make_header()
    rec = BamRecord.from_sam(
        header, "r\t16\tchr1\t10\t60\t5S5M10D5I5M\t*\t0\t0\t" + "A" * 20 + "\t" + "I" * 20
    )
    assert rec.is_reverse()
    assert rec.alignment_end() == 29
    rec.set_supplementary()
    assert rec.is_supplementary()
    rec.unset_supplementary()
    assert not rec.is_supplementary()
    rec.set_unmapped()
    assert rec.is_unmapped()


def test_long_cigar_cg_tag():
    header = make_header()
    n_ops = 70000
    cigar = np.tile([[cg.EQ, 1], [cg.X, 1]], (n_ops // 2, 1)).astype(np.int64)
    seq = np.full(n_ops, ord("A"), np.uint8)
    rec = BamRecord(
        qname=b"long", flag=0, tid=0, pos=5, mapq=60, cigar=cigar,
        seq=seq, qual=np.full(n_ops, 30, np.uint8),
    )
    raw = rec.encode()
    # encoded record must carry the kSmN placeholder + CG tag
    n_cigar = struct.unpack_from("<H", raw, 12)[0]
    assert n_cigar == 2
    back = BamRecord.decode(raw)
    assert len(back.cigar) == n_ops
    assert cg.to_string(back.cigar[:2]) == "1=1X"
    assert back.get_tag(b"CG") is None


def write_sorted_bam(path, header, records):
    with BamWriter(str(path), header) as w:
        for r in records:
            w.write(r)
    return build_bai(str(path))


def test_writer_reader_fetch(tmp_path):
    header = make_header()
    rng = np.random.default_rng(1)
    records = []
    # sorted records across two chroms
    for tid in (0, 1):
        pos = 10
        for i in range(300):
            pos += int(rng.integers(1, 500))
            ln = int(rng.integers(50, 200))
            rec = BamRecord(
                qname=f"r{tid}_{i}".encode(), flag=0, tid=tid, pos=pos, mapq=60,
                cigar=cg.cigar((cg.M, ln)),
                seq=np.full(ln, ord("A"), np.uint8),
                qual=np.full(ln, 30, np.uint8),
            )
            records.append(rec)
    # trailing unmapped records
    unmapped = []
    for i in range(5):
        rec = BamRecord(
            qname=f"u{i}".encode(), flag=FUNMAP, tid=-1, pos=-1, mapq=255,
            seq=np.full(42, ord("C"), np.uint8), qual=np.full(42, 20, np.uint8),
        )
        unmapped.append(rec)
    p = tmp_path / "t.bam"
    write_sorted_bam(p, header, records + unmapped)
    assert_bam_eof(str(p))

    reader = BamReader(str(p))
    assert reader.header.refs == [("chr1", 100000), ("chr2", 50000)]
    all_recs = list(reader)
    assert len(all_recs) == len(records) + len(unmapped)

    # fetch must return exactly the overlapping records, htslib-style
    for tid, beg, end in [(0, 0, 100000), (0, 5000, 20000), (1, 30000, 31000), (1, 49999, 50000)]:
        got = [r.qname for r in reader.fetch(tid, beg, end)]
        want = [
            r.qname
            for r in records
            if r.tid == tid and r.pos < end and r.alignment_end() > beg
        ]
        assert got == want, f"fetch({tid},{beg},{end})"

    got_unmapped = [r.qname for r in reader.fetch_unmapped() if r.is_unmapped()]
    assert got_unmapped == [r.qname for r in unmapped]
    reader.close()


def test_unmapped_record_roundtrip():
    rec = BamRecord(
        qname=b"u", flag=FUNMAP | FREVERSE, tid=-1, pos=-1, mapq=255,
        seq=np.frombuffer(b"ACGTN", np.uint8).copy(),
        qual=np.full(5, 0xFF, np.uint8),
    )
    back = BamRecord.decode(rec.encode())
    assert back.is_unmapped() and back.tid == -1 and back.pos == -1
    assert back.seq.tobytes() == b"ACGTN"


def test_bam_reg2bin():
    # value spot-checks from the binning scheme
    assert bam_reg2bin(0, 1) == 4681
    assert bam_reg2bin(0, 1 << 14) == 4681
    assert bam_reg2bin(0, (1 << 14) + 1) == 585
    assert bam_reg2bin(1 << 26, (1 << 26) + 1) == 4681 + (1 << 12)


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "ref.fa"
    write_fasta(str(p), [("chr1", b"acgtACGTnn"), ("chr2 extra desc", b"GGGG" * 40)])
    g = get_genome_ref_from_fasta(str(p))
    assert set(g.chroms) == {"chr1", "chr2"}
    assert g.chroms["chr1"].tobytes() == b"ACGTACGTNN"
    assert len(g.chroms["chr2"]) == 160
    g.convert_disallowed_characters(b"ACGTN", ord("N"))
    assert g.chroms["chr1"].tobytes() == b"ACGTACGTNN"


def test_build_bai_refuses_beyond_bai_limit(tmp_path):
    """BAI tops out at 2^29-1; beyond it reg2bin collides with the 37450
    pseudo-bin (silently dropped chunks).  htslib refuses; so do we."""
    import numpy as np
    import pytest

    from portello_tpu.io.bam import BamHeader, BamRecord, BamWriter
    from portello_tpu.io.index_build import build_bai
    from portello_tpu.ops import cigar as cg

    header = BamHeader.from_refs(
        [("big", (1 << 30))], b"@SQ\tSN:big\tLN:1073741824\n"
    )
    rec = BamRecord(
        qname=b"far", flag=0, tid=0, pos=(1 << 29) + 10, mapq=60,
        cigar=cg.cigar((cg.M, 5)),
        seq=np.frombuffer(b"ACGTA", np.uint8).copy(),
        qual=np.full(5, 30, np.uint8),
    )
    path = str(tmp_path / "big.bam")
    with BamWriter(path, header) as w:
        w.write(rec)
    with pytest.raises(ValueError, match="CSI"):
        build_bai(path)


def test_native_bulk_read_grows_for_oversized_record(tmp_path):
    """A record larger than the bulk buffer must be returned (grow+retry),
    never silently treated as EOF; a corrupt size field must raise."""
    import numpy as np
    import pytest

    from portello_tpu.io.bam import BamHeader, BamRecord, BamReader, BamWriter

    header = BamHeader.from_refs([("chr1", 10000)], b"@SQ\tSN:chr1\tLN:10000\n")
    seq = np.frombuffer(b"ACGT" * 500, np.uint8).copy()
    recs = [
        BamRecord(
            qname=f"r{i}".encode(), flag=4, tid=-1, pos=-1, mapq=0,
            seq=seq, qual=np.full(len(seq), 30, np.uint8),
        )
        for i in range(3)
    ]
    path = str(tmp_path / "wide.bam")
    with BamWriter(path, header) as w:
        for r in recs:
            w.write(r)

    with BamReader(path) as rd:
        if rd._native is None:
            pytest.skip("native codec unavailable")
        rd._bgzf.seek_voffset(rd._data_voffset)
        # buffer far smaller than one record: must grow+retry, never EOF
        total = 0
        while True:
            more = rd._native.read_records_bulk(buf_cap=64)
            if not more:
                break
            total += len(more)
        assert total == 3
