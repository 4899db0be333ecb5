"""CRAM 3.0 codec tests: primitive codecs (known answers + round trips) and
record-level round trips through the writer subset.

No htslib exists in this image, so interop fixtures can't be generated; the
writer emits spec-valid CRAM 3.0 and the reader is spec-based (see
io/cram.py docstring)."""

import numpy as np
import pytest

from portello_tpu.io import cram
from portello_tpu.io.bam import BamReader
from portello_tpu.ops import cigar as cg


def test_itf8_known_vectors():
    # spec examples: single byte for < 0x80; prefix bits select the width
    assert cram.write_itf8(0) == b"\x00"
    assert cram.write_itf8(0x7F) == b"\x7f"
    assert cram.write_itf8(0x80) == b"\x80\x80"
    assert cram.write_itf8(-1)[:1] == b"\xff"
    assert len(cram.write_itf8(-1)) == 5
    assert cram.read_itf8(b"\xff\xff\xff\xff\xff", 0)[0] == -1


def test_rans_roundtrip_orders():
    rng = np.random.default_rng(1)
    cases = [
        b"", b"x", b"hello world " * 100,
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
        bytes(rng.integers(65, 70, 9999, dtype=np.uint8)),
        bytes(300 * [7]),
    ]
    for data in cases:
        assert cram.rans_decode(cram.rans_encode_order0(data)) == data
        assert cram.rans_decode(cram.rans_encode_order1(data)) == data


def test_rans_freq_normalization():
    rng = np.random.default_rng(2)
    counts = np.bincount(
        rng.integers(0, 256, 10000, dtype=np.uint8), minlength=256
    ).astype(np.int64)
    F = cram._normalize_freqs(counts)
    assert F.sum() == 4096
    assert ((counts > 0) == (F > 0)).all()


def test_block_methods():
    data = b"portello" * 100
    for method in (cram.RAW, cram.GZIP, cram.RANS4X8):
        blk_bytes = cram.write_block(method, cram.EXTERNAL_T, 7, data)
        blk, off = cram.read_block(blk_bytes, 0)
        assert off == len(blk_bytes)
        assert blk.data == data
        assert blk.content_id == 7


def _norm(rec, collapse_mx=False):
    cigar = rec.cigar
    if collapse_mx and len(cigar):
        c = cigar.copy()
        c[np.isin(c[:, 0], (cg.EQ, cg.X)), 0] = cg.M
        cigar = cg.compress_cigar(c)
    # CRAM stores no MQ for unmapped records; htslib decodes them as 0
    mapq = 0 if rec.is_unmapped() else rec.mapq
    return (
        rec.qname, rec.flag, rec.tid, rec.pos, mapq,
        cg.to_string(cigar), rec.mtid, rec.mpos, rec.tlen,
        rec.seq.tobytes(), rec.qual.tobytes(),
        sorted(
            (t, ty, str(v.encode() if isinstance(v, str) else v))
            for t, ty, v in rec.tags
        ),
    )


@pytest.mark.parametrize("src", ["read_to_asm.bam", "asm_to_ref.bam"])
def test_cram_roundtrip_scenario(tmp_path, src):
    """Every record of the simulated BAMs round-trips through CRAM.

    =/X cigar ops collapse to M (CRAM's feature model, like htslib), so the
    eqx contig file is compared M-normalized."""
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(31))
    path = tmp_path / src
    with BamReader(str(path)) as r:
        recs = list(r)
        header = r.header
    cram_path = str(tmp_path / (src + ".cram"))
    with cram.CramWriter(cram_path, header, records_per_slice=37) as w:
        for rec in recs:
            w.write(rec)
    assert cram.is_cram(cram_path)
    assert cram.check_cram_eof(cram_path)
    with cram.CramReader(cram_path) as cr:
        got = list(cr)
        assert [x for x in cr.header.refs] == list(header.refs)
    assert len(got) == len(recs)
    collapse = src == "asm_to_ref.bam"
    for a, b in zip(recs, got):
        assert _norm(a, collapse) == _norm(b), a.qname


@pytest.mark.parametrize("src", ["read_to_asm.bam", "asm_to_ref.bam"])
def test_cram_31_roundtrip_scenario(tmp_path, src):
    """CRAM 3.1 write (rANS Nx16 external blocks) decodes identically.

    The 3.1 magic + method-5 blocks make this file unreadable to a 3.0-only
    reader, so a pass here exercises the full Nx16 path through the real
    container machinery (reference src/cli.rs:25,32 accepts such files via
    htslib)."""
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(31))
    path = tmp_path / src
    with BamReader(str(path)) as r:
        recs = list(r)
        header = r.header
    cram_path = str(tmp_path / (src + ".v31.cram"))
    with cram.CramWriter(
        cram_path, header, records_per_slice=41, version=(3, 1)
    ) as w:
        for rec in recs:
            w.write(rec)
    with open(cram_path, "rb") as f:
        assert f.read(6) == b"CRAM\x03\x01"
    with cram.CramReader(cram_path) as cr:
        got = list(cr)
    assert len(got) == len(recs)
    collapse = src == "asm_to_ref.bam"
    for a, b in zip(recs, got):
        assert _norm(a, collapse) == _norm(b), a.qname


@pytest.mark.parametrize("src", ["read_to_asm.bam", "asm_to_ref.bam"])
def test_cram_31_archive_profile_roundtrip(tmp_path, src):
    """Archive profile: QS rides fqzcomp (method 7), BA/tags ride the
    adaptive arithmetic coder (method 6), RN rides tok3 — the htslib
    archive layout, decoded identically through the real container
    machinery."""
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(31))
    path = tmp_path / src
    with BamReader(str(path)) as r:
        recs = list(r)
        header = r.header
    cram_path = str(tmp_path / (src + ".arch.cram"))
    with cram.CramWriter(
        cram_path, header, records_per_slice=43, version=(3, 1),
        profile="archive",
    ) as w:
        for rec in recs:
            w.write(rec)
    # the archive methods actually appear in the blocks
    methods = set()
    with open(cram_path, "rb") as f:
        f.read(26)
        while True:
            h = cram.read_container_header(f)
            if h is None:
                break
            body = f.read(h.length)
            off = 0
            while off < len(body):
                blk, off = cram.read_block(body, off)
                methods.add(blk.method)
    assert cram.FQZCOMP in methods
    assert cram.ARITH in methods
    with cram.CramReader(cram_path) as cr:
        got = list(cr)
    assert len(got) == len(recs)
    collapse = src == "asm_to_ref.bam"
    for a, b in zip(recs, got):
        assert _norm(a, collapse) == _norm(b), a.qname


def test_cram_archive_profile_requires_31(tmp_path):
    from portello_tpu.io.bam import BamHeader

    header = BamHeader.from_refs([("c", 100)], b"@SQ\tSN:c\tLN:100\n")
    with pytest.raises(cram.CramFormatError, match="archive"):
        cram.CramWriter(
            str(tmp_path / "x.cram"), header, version=(3, 0),
            profile="archive",
        )


def test_cram_31_blocks_use_method5(tmp_path):
    from portello_tpu.io.bam import BamHeader, BamRecord

    header = BamHeader.from_refs([("chr1", 1000)], b"@SQ\tSN:chr1\tLN:1000\n")
    rec = BamRecord(
        qname=b"m1", flag=0, tid=0, pos=10, mapq=60,
        cigar=cg.cigar((cg.M, 8)),
        seq=np.frombuffer(b"ACGTACGT", np.uint8).copy(),
        qual=np.full(8, 30, np.uint8),
    )
    path = str(tmp_path / "t31.cram")
    with cram.CramWriter(path, header, version=(3, 1)) as w:
        w.write(rec)
    methods = set()
    with open(path, "rb") as f:
        f.read(26)
        while True:
            h = cram.read_container_header(f)
            if h is None:
                break
            body = f.read(h.length)
            off = 0
            while off < len(body):
                blk, off = cram.read_block(body, off)
                methods.add(blk.method)
    assert cram.RANSNX16 in methods


def test_cram_unmapped_and_tags(tmp_path):
    from portello_tpu.io.bam import BamHeader, BamRecord, FUNMAP

    header = BamHeader.from_refs([("chr1", 1000)], b"@SQ\tSN:chr1\tLN:1000\n")
    recs = [
        BamRecord(
            qname=b"m1", flag=0, tid=0, pos=10, mapq=60,
            cigar=cg.cigar((cg.S, 2), (cg.M, 5), (cg.I, 2), (cg.D, 3), (cg.M, 3)),
            seq=np.frombuffer(b"ACGTACGTACGT", np.uint8).copy(),
            qual=np.arange(12, dtype=np.uint8),
            tags=[(b"ZM", b"C", 42), (b"PS", b"Z", "ctg_split0+"),
                  (b"XB", b"B", (b"i", np.array([1, -2, 3], np.int32)))],
        ),
        BamRecord(
            qname=b"u1", flag=FUNMAP, tid=-1, pos=-1, mapq=0,
            seq=np.frombuffer(b"GATTACA", np.uint8).copy(),
            qual=np.full(7, 30, np.uint8),
        ),
    ]
    path = str(tmp_path / "t.cram")
    with cram.CramWriter(path, header) as w:
        for r in recs:
            w.write(r)
    with cram.CramReader(path) as cr:
        got = list(cr)
    assert len(got) == 2
    for a, b in zip(recs, got):
        assert _norm(a) == _norm(b)


def test_cram_reader_rejects_non_cram(tmp_path):
    p = tmp_path / "x.cram"
    p.write_bytes(b"BAM\x01junk")
    with pytest.raises(cram.CramFormatError):
        cram.CramReader(str(p))


def test_cram_cli_e2e_matches_bam(tmp_path):
    """Full pipeline over CRAM inputs produces the same lifted output as the
    BAM run (reference accepts either format, cli.rs:25,32).

    The unassembled output is compared with mapq normalized: CRAM stores no
    MQ for unmapped records (htslib decodes 0)."""
    from portello_tpu.main import main
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(33))
    for src in ("asm_to_ref.bam", "read_to_asm.bam"):
        with BamReader(str(tmp_path / src)) as r:
            recs = list(r)
            header = r.header
        with cram.CramWriter(str(tmp_path / (src + ".cram")), header) as w:
            for rec in recs:
                w.write(rec)

    def run(tag, a2r, r2a):
        out = tmp_path / f"rem_{tag}.bam"
        un = tmp_path / f"un_{tag}.bam"
        main([
            "--assembly-to-ref", str(tmp_path / a2r),
            "--read-to-assembly", str(tmp_path / r2a),
            "--remapped-read-output", str(out),
            "--unassembled-read-output", str(un),
            "--ref", str(tmp_path / "ref.fa"),
            "--device", "host",
        ])
        return out, un

    out_b, un_b = run("bam", "asm_to_ref.bam", "read_to_asm.bam")
    out_c, un_c = run("cram", "asm_to_ref.bam.cram", "read_to_asm.bam.cram")

    def recs_sam(path, zero_unmapped_mapq=False):
        with BamReader(str(path)) as r:
            out = []
            for rec in r:
                if zero_unmapped_mapq and rec.is_unmapped():
                    rec.mapq = 0
                out.append(rec.to_sam(r.header))
        return sorted(out)

    assert recs_sam(out_b) == recs_sam(out_c)
    assert recs_sam(un_b, True) == recs_sam(un_c, True)
    assert len(recs_sam(out_b)) > 0


def test_cram_native_feed_matches_python_feed(tmp_path):
    """CRAM input through the native scanner (direct push-mode streaming,
    no temp-BAM) must produce output record-identical to the Python feed on
    the same CRAM (reference reads CRAM directly via htslib, cli.rs:25,32)."""
    from portello_tpu.pipeline import native_feed

    if native_feed.get_lib() is None:
        pytest.skip(f"ptscan unavailable: {native_feed.build_error()}")

    from portello_tpu.main import main
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(47))
    src = "read_to_asm.bam"
    with BamReader(str(tmp_path / src)) as r:
        recs = list(r)
        header = r.header
    with cram.CramWriter(str(tmp_path / (src + ".cram")), header) as w:
        for rec in recs:
            w.write(rec)

    def run(tag, feed):
        out = tmp_path / f"rem_{tag}.bam"
        un = tmp_path / f"un_{tag}.bam"
        main([
            "--assembly-to-ref", str(tmp_path / "asm_to_ref.bam"),
            "--read-to-assembly", str(tmp_path / (src + ".cram")),
            "--remapped-read-output", str(out),
            "--unassembled-read-output", str(un),
            "--ref", str(tmp_path / "ref.fa"),
            "--device", "cpu", "--feed", feed, "--batch-size", "32",
        ])
        return out, un

    import glob
    import os
    import tempfile

    tmp_pat = os.path.join(tempfile.gettempdir(), "ptpu_cram_*.bam")
    before = set(glob.glob(tmp_pat))
    out_n, un_n = run("native", "native")
    out_p, un_p = run("python", "python")

    def recs_sam(path):
        with BamReader(str(path)) as r:
            return sorted(rec.to_sam(r.header) for rec in r)

    assert recs_sam(out_n) == recs_sam(out_p)
    assert recs_sam(un_n) == recs_sam(un_p)
    assert len(recs_sam(out_n)) > 0
    # direct streaming: no transcode temporary may ever appear
    assert set(glob.glob(tmp_pat)) == before


def test_cram_native_feed_streams_without_temp(tmp_path, monkeypatch):
    """The native feed must never call the temp-BAM transcode for CRAM input
    (direct streaming; reference read_alignment_scanner.rs:382-394)."""
    from portello_tpu.pipeline import native_feed

    if native_feed.get_lib() is None:
        pytest.skip(f"ptscan unavailable: {native_feed.build_error()}")

    from portello_tpu.io import aln_input
    from portello_tpu.main import main
    from portello_tpu.testutil.simulate import make_scenario

    def _boom(*a, **kw):
        raise AssertionError("temp-BAM transcode invoked on the main path")

    monkeypatch.setattr(aln_input, "cram_to_bam", _boom)

    make_scenario(str(tmp_path), rng=np.random.default_rng(53))
    src = "read_to_asm.bam"
    with BamReader(str(tmp_path / src)) as r:
        recs = list(r)
        header = r.header
    with cram.CramWriter(str(tmp_path / (src + ".cram")), header) as w:
        for rec in recs:
            w.write(rec)
    out = tmp_path / "rem.bam"
    main([
        "--assembly-to-ref", str(tmp_path / "asm_to_ref.bam"),
        "--read-to-assembly", str(tmp_path / (src + ".cram")),
        "--remapped-read-output", str(out),
        "--unassembled-read-output", str(tmp_path / "un.bam"),
        "--ref", str(tmp_path / "ref.fa"),
        "--device", "cpu", "--feed", "native", "--batch-size", "32",
    ])
    with BamReader(str(out)) as r:
        assert len(list(r)) > 0


def test_cram_native_feed_surfaces_decode_error(tmp_path):
    """A CRAM that breaks mid-stream must fail the native feed with the
    producer's decode error — never a silent truncation (the feeder closes
    the push stream without EOF; native_feed re-raises its exception)."""
    from portello_tpu.pipeline import native_feed

    if native_feed.get_lib() is None:
        pytest.skip(f"ptscan unavailable: {native_feed.build_error()}")

    from portello_tpu.main import main
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(59))
    src = "read_to_asm.bam"
    with BamReader(str(tmp_path / src)) as r:
        recs = list(r)
        header = r.header
    path = tmp_path / (src + ".cram")
    with cram.CramWriter(str(path), header, records_per_slice=40) as w:
        for rec in recs:
            w.write(rec)
    # corrupt a byte inside the LAST data container's block area (past the
    # header container) so decode starts fine and fails mid-stream
    data = bytearray(path.read_bytes())
    data[-60] ^= 0xFF
    path.write_bytes(bytes(data))
    with pytest.raises((cram.CramFormatError, SystemExit, RuntimeError)):
        main([
            "--assembly-to-ref", str(tmp_path / "asm_to_ref.bam"),
            "--read-to-assembly", str(path),
            "--remapped-read-output", str(tmp_path / "rem.bam"),
            "--unassembled-read-output", str(tmp_path / "un.bam"),
            "--ref", str(tmp_path / "ref.fa"),
            "--device", "cpu", "--feed", "native", "--batch-size", "32",
        ])


def test_cram_native_feed_surfaces_early_decode_error(tmp_path):
    """A CRAM that fails while the header container is still being pushed
    must surface the producer's CramFormatError — not the scanner's
    misleading 'create failed' (the create-failure path re-raises the
    feeder's exception)."""
    from portello_tpu.pipeline import native_feed

    if native_feed.get_lib() is None:
        pytest.skip(f"ptscan unavailable: {native_feed.build_error()}")

    from portello_tpu.main import main
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(61))
    src = "read_to_asm.bam"
    with BamReader(str(tmp_path / src)) as r:
        recs = list(r)
        header = r.header
    path = tmp_path / (src + ".cram")
    with cram.CramWriter(str(path), header) as w:
        for rec in recs:
            w.write(rec)
    # corrupt the FIRST data container (right after the 26-byte file header
    # + header container): decode dies before any record reaches the scanner
    data = bytearray(path.read_bytes())
    hdr_end = 26
    # find the end of the header container: parse its length
    import io as _io

    f = _io.BytesIO(bytes(data))
    f.seek(26)
    h = cram.read_container_header(f)
    first_data = f.tell() + h.length + 8
    data[first_data] ^= 0xFF
    path.write_bytes(bytes(data))
    with pytest.raises((cram.CramFormatError, SystemExit, RuntimeError)):
        main([
            "--assembly-to-ref", str(tmp_path / "asm_to_ref.bam"),
            "--read-to-assembly", str(path),
            "--remapped-read-output", str(tmp_path / "rem.bam"),
            "--unassembled-read-output", str(tmp_path / "un.bam"),
            "--ref", str(tmp_path / "ref.fa"),
            "--device", "cpu", "--feed", "native", "--batch-size", "32",
        ])


def test_cram_reference_resolution_validates_name_and_length(tmp_path):
    """RR=1 slice decode must never read the wrong sequence: the decode
    reference is resolved by the CRAM's OWN @SQ name and validated by
    length (a read-to-assembly CRAM's tids are assembly contigs — passing
    ref-genome arrays positionally used to corrupt silently)."""
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(91))
    src = str(tmp_path / "read_to_asm.bam")
    with BamReader(src) as r:
        recs = list(r)
        header = r.header
    path = str(tmp_path / "x.cram")
    with cram.CramWriter(path, header) as w:
        for rec in recs:
            w.write(rec)

    name0, len0 = header.refs[0]
    ok_seq = np.zeros(len0, np.uint8)

    rd = cram.CramReader(path, reference={name0: ok_seq})
    assert rd._resolve_ref(0) is ok_seq
    rd.close()

    # wrong length for the right name -> hard error
    rd = cram.CramReader(path, reference={name0: np.zeros(len0 + 5, np.uint8)})
    with pytest.raises(cram.CramFormatError, match="length"):
        rd._resolve_ref(0)
    rd.close()

    # name missing entirely -> hard error (not positional fallback)
    rd = cram.CramReader(path, reference={"chrZZ": ok_seq})
    with pytest.raises(cram.CramFormatError, match=name0):
        rd._resolve_ref(0)
    rd.close()

    # positional list is accepted only when the length matches
    rd = cram.CramReader(path, reference=[np.zeros(3, np.uint8)])
    with pytest.raises(cram.CramFormatError):
        rd._resolve_ref(0)
    rd.close()


def test_rans_o1_odd_sizes_roundtrip():
    """Order-1 quarter layout is floor(n/4) with state 3 carrying the tail
    (htslib rANS_static.c); sizes % 4 != 0 are the regression class."""
    rng = np.random.default_rng(5)
    for n in (1, 2, 3, 5, 7, 101, 1023, 4097):
        d = bytes(rng.integers(60, 75, n, dtype=np.uint8))
        assert cram.rans_decode(cram.rans_encode_order1(d)) == d, n


def test_cram_block_crc_detects_corruption(tmp_path):
    """CRAM 3.0 block/container CRCs are verified: a bit flip must raise,
    not decode to silently corrupt records (htslib behavior)."""
    from portello_tpu.io.bam import BamHeader, BamRecord

    header = BamHeader.from_refs([("chr1", 100)], b"@SQ\tSN:chr1\tLN:100\n")
    rec = BamRecord(
        qname=b"r1", flag=0, tid=0, pos=5, mapq=60,
        cigar=cg.cigar((cg.M, 8)),
        seq=np.frombuffer(b"ACGTACGT", np.uint8).copy(),
        qual=np.full(8, 30, np.uint8),
    )
    path = str(tmp_path / "c.cram")
    with cram.CramWriter(path, header) as w:
        w.write(rec)
    data = bytearray(open(path, "rb").read())
    with cram.CramReader(path) as r:
        assert len(list(r)) == 1  # pristine file reads fine
    # flip one byte in the middle (inside container/block payload territory)
    data[len(data) // 2] ^= 0xFF
    bad = str(tmp_path / "bad.cram")
    open(bad, "wb").write(bytes(data))
    with pytest.raises((cram.CramFormatError, Exception)):
        with cram.CramReader(bad) as r:
            list(r)


def test_cram_rejects_v20_and_v1(tmp_path):
    """2.1 decodes (see test_cram_21_roundtrip_scenario); 2.0 (predates the
    counter/bases fields) and 1.x must still be rejected clearly."""
    for ver in (b"\x02\x00", b"\x01\x00"):
        p = tmp_path / f"v{ver[0]}{ver[1]}.cram"
        p.write_bytes(b"CRAM" + ver + b"\x00" * 20)
        with pytest.raises(cram.CramFormatError, match="not supported"):
            cram.CramReader(str(p))


@pytest.mark.parametrize("src", ["read_to_asm.bam", "asm_to_ref.bam"])
def test_cram_21_roundtrip_scenario(tmp_path, src):
    """CRAM 2.1 write (no CRCs, itf8 counters, v2 EOF, gzip blocks)
    decodes identically — the legacy-format read path htslib also covers
    (reference src/cli.rs:25,32)."""
    from portello_tpu.testutil.simulate import make_scenario

    make_scenario(str(tmp_path), rng=np.random.default_rng(31))
    path = tmp_path / src
    with BamReader(str(path)) as r:
        recs = list(r)
        header = r.header
    cram_path = str(tmp_path / (src + ".v21.cram"))
    with cram.CramWriter(
        cram_path, header, records_per_slice=29, version=(2, 1)
    ) as w:
        for rec in recs:
            w.write(rec)
    with open(cram_path, "rb") as f:
        assert f.read(6) == b"CRAM\x02\x01"
    assert cram.check_cram_eof(cram_path)
    with cram.CramReader(cram_path) as cr:
        got = list(cr)
    assert len(got) == len(recs)
    collapse = src == "asm_to_ref.bam"
    for a, b in zip(recs, got):
        assert _norm(a, collapse) == _norm(b), a.qname


def test_container_header_many_landmarks_roundtrip():
    """The varint section is unbounded (one landmark per slice); parsing
    must grow its window instead of assuming a byte cap."""
    import io

    h = cram.ContainerHeader(
        length=12345, ref_id=3, start=1000, span=500, n_records=77,
        record_counter=123456789, bases=999999, n_blocks=41,
        landmarks=[100000 + 137 * i for i in range(40)],
    )
    raw = cram.write_container_header(h)
    got = cram.read_container_header(io.BytesIO(raw))
    assert got.landmarks == h.landmarks
    assert (got.ref_id, got.start, got.span, got.n_records) == (3, 1000, 500, 77)


def test_cram_writer_no_seq_record_roundtrip(tmp_path):
    """A mapped record with SEQ '*' (empty seq, real cigar) must carry
    CF_NO_SEQ and consume no BA bytes — without it, the shared BA stream
    desynchronizes and corrupts every later record in the slice."""
    from portello_tpu.io.bam import BamHeader, BamRecord

    header = BamHeader.from_refs([("chr1", 1000)], b"@SQ\tSN:chr1\tLN:1000\n")
    recs = [
        BamRecord(
            qname=b"noseq", flag=0, tid=0, pos=10, mapq=60,
            cigar=cg.cigar((cg.M, 10), (cg.S, 5)),
            seq=np.zeros(0, np.uint8), qual=np.zeros(0, np.uint8),
        ),
        BamRecord(
            qname=b"normal", flag=0, tid=0, pos=50, mapq=60,
            cigar=cg.cigar((cg.M, 8)),
            seq=np.frombuffer(b"ACGTACGT", np.uint8).copy(),
            qual=np.full(8, 30, np.uint8),
        ),
    ]
    path = str(tmp_path / "noseq.cram")
    with cram.CramWriter(path, header) as w:
        for r in recs:
            w.write(r)
    with cram.CramReader(path) as r:
        got = list(r)
    assert len(got) == 2
    # the '*'-seq record keeps its cigar shape, sequence stays absent
    assert cg.to_string(got[0].cigar) == "10M5S"
    assert len(got[0].seq) == 0
    # the FOLLOWING record's bases are intact (the BA stream stayed in sync)
    assert got[1].seq.tobytes() == b"ACGTACGT"
    assert cg.to_string(got[1].cigar) == "8M"


def test_cram_writer_slice_header_is_raw(tmp_path):
    """Spec section 8.5: the slice header block must be uncompressed
    (htslib rejects non-RAW slice headers)."""
    from portello_tpu.io.bam import BamHeader, BamRecord

    header = BamHeader.from_refs([("chr1", 1000)], b"@SQ\tSN:chr1\tLN:1000\n")
    rec = BamRecord(
        qname=b"r", flag=0, tid=0, pos=1, mapq=60,
        cigar=cg.cigar((cg.M, 4)),
        seq=np.frombuffer(b"ACGT", np.uint8).copy(),
        qual=np.full(4, 30, np.uint8),
    )
    path = str(tmp_path / "raw.cram")
    with cram.CramWriter(path, header) as w:
        w.write(rec)
    with open(path, "rb") as f:
        f.read(26)  # magic + file id
        # file-header container
        h = cram.read_container_header(f)
        f.read(h.length)
        # first data container
        h = cram.read_container_header(f)
        body = f.read(h.length)
        blk, off = cram.read_block(body, 0)  # compression header
        assert blk.content_type == cram.COMPRESSION_HEADER
        # slice header block: method byte must be RAW
        assert body[off] == cram.RAW
        assert body[off + 1] == cram.SLICE_HEADER
