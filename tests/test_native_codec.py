"""Native (C++) codec conformance: must byte-match the Python codec."""

import numpy as np
import pytest

from portello_tpu.io.bam import BamHeader, BamReader, BamRecord, BamWriter
from portello_tpu.io.bgzf import BgzfReader, check_eof_marker
from portello_tpu.io.index_build import build_bai
from portello_tpu.io.native_codec import (
    NativeBgzfReader,
    NativeBgzfWriter,
    get_lib,
    native_check_eof,
)
from portello_tpu.ops import cigar as cg

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native codec not buildable"
)


def test_native_bgzf_roundtrip(tmp_path):
    p = str(tmp_path / "n.bgzf")
    data = bytes(range(256)) * 4000
    w = NativeBgzfWriter(p, level=6, n_threads=4)
    # write in odd-sized chunks to exercise block slicing
    for i in range(0, len(data), 70001):
        w.write(data[i : i + 70001])
    w.close()
    assert check_eof_marker(p)
    assert native_check_eof(p)

    # python reader reads native output
    r = BgzfReader(p)
    assert r.read(len(data) + 1) == data
    r.close()

    # native reader reads python output
    n = NativeBgzfReader(p)
    assert n.read(len(data) + 1) == data
    n.close()


def make_records(n=500):
    rng = np.random.default_rng(5)
    recs = []
    pos = 1
    for i in range(n):
        pos += int(rng.integers(1, 300))
        ln = int(rng.integers(60, 150))
        rec = BamRecord(
            qname=f"r{i}".encode(), flag=0, tid=0, pos=pos, mapq=60,
            cigar=cg.cigar((cg.M, ln)),
            seq=rng.choice(np.frombuffer(b"ACGT", np.uint8), size=ln),
            qual=rng.integers(10, 50, size=ln).astype(np.uint8),
        )
        rec.push_tag(b"NM", b"i", i)
        recs.append(rec)
    return recs


def test_native_bam_write_read_fetch(tmp_path):
    header = BamHeader.from_refs([("chr1", 1_000_000)])
    recs = make_records()
    p_native = str(tmp_path / "n.bam")
    p_python = str(tmp_path / "p.bam")
    with BamWriter(p_native, header, engine="native", n_threads=4) as w:
        for r in recs:
            w.write(r)
    with BamWriter(p_python, header, engine="python") as w:
        for r in recs:
            w.write(r)
    build_bai(p_native)

    # decoded content identical across engines and codecs
    with BamReader(p_native, engine="native") as rn:
        native_recs = [r.encode() for r in rn]
    with BamReader(p_python, engine="python") as rp:
        python_recs = [r.encode() for r in rp]
    assert native_recs == python_recs

    # region fetch through the native bulk scan
    with BamReader(p_native, engine="native") as rn:
        got = [r.qname for r in rn.fetch(0, 10_000, 30_000)]
        want = [
            r.qname for r in recs
            if r.pos < 30_000 and r.alignment_end() > 10_000
        ]
        assert got == want


def test_native_reader_on_python_bam(tmp_path):
    header = BamHeader.from_refs([("chr1", 1_000_000)])
    recs = make_records(50)
    p = str(tmp_path / "x.bam")
    with BamWriter(p, header, engine="python") as w:
        for r in recs:
            w.write(r)
    with BamReader(p, engine="native") as rn:
        assert len(list(rn)) == 50
