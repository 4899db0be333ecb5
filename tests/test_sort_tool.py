"""Coordinate-sort tool: samtools-sort order, spill path, determinism."""

import struct

import numpy as np

from portello_tpu.io.bam import BamReader
from portello_tpu.testutil.simulate import make_scenario
from portello_tpu.tools.sort import sort_bam


def _raws(path):
    with BamReader(str(path)) as r:
        return list(r.iter_raw()), r.header


def _expected_order(raws):
    keyed = [
        (struct.unpack_from("<ii", raw, 0)[0] & 0xFFFFFFFF,
         struct.unpack_from("<ii", raw, 0)[1], i, raw)
        for i, raw in enumerate(raws)
    ]
    keyed.sort(key=lambda t: t[:3])
    return [t[3] for t in keyed]


def test_sort_matches_expected_order(tmp_path):
    make_scenario(str(tmp_path), rng=np.random.default_rng(15))
    src = tmp_path / "read_to_asm.bam"
    out = tmp_path / "sorted.bam"
    n = sort_bam(str(src), str(out))
    raws_in, _ = _raws(src)
    raws_out, header = _raws(out)
    assert n == len(raws_in) > 0
    assert raws_out == _expected_order(raws_in)
    assert b"SO:coordinate" in header.text
    # unmapped records (tid -1) must sort last
    tids = [struct.unpack_from("<i", raw, 0)[0] for raw in raws_out]
    seen_unmapped = False
    for t in tids:
        if t < 0:
            seen_unmapped = True
        else:
            assert not seen_unmapped, "mapped record after unmapped section"


def test_sort_spill_path_identical(tmp_path):
    make_scenario(str(tmp_path), rng=np.random.default_rng(16))
    src = tmp_path / "read_to_asm.bam"
    a = tmp_path / "mem.bam"
    b = tmp_path / "spill.bam"
    sort_bam(str(src), str(a))
    # force many chunk spills
    sort_bam(str(src), str(b), mem_bytes=4096, tmp_dir=str(tmp_path))
    assert _raws(a)[0] == _raws(b)[0]
    assert not list(tmp_path.glob("ptpu_sort_*.bam")), "spill temp leak"


def test_parallel_sort_byte_identical_across_threads_and_budgets(tmp_path):
    """The threaded spill pipeline (numpy stable argsort + async chunk
    write) must reproduce the single-thread output byte-for-byte at every
    chunk-budget partitioning, including placed pos=-1 records (the
    composite-key +1 mapping)."""
    import struct

    import numpy as np

    from portello_tpu.io.bam import BamHeader, BamRecord, BamWriter
    from portello_tpu.ops import cigar as cg

    rng = np.random.default_rng(77)
    header = BamHeader.from_refs(
        [("c1", 1_000_000), ("c2", 1_000_000)],
        b"@SQ\tSN:c1\tLN:1000000\n@SQ\tSN:c2\tLN:1000000\n",
    )
    src = str(tmp_path / "in.bam")
    w = BamWriter(src, header, level=1)
    for i in range(3000):
        tid = int(rng.integers(-1, 2))
        pos = -1 if tid < 0 else int(rng.integers(0, 1_000_000))
        w.write(BamRecord(
            qname=f"r{i}".encode(), flag=4 if tid < 0 else 0, tid=tid,
            pos=pos, mapq=30,
            cigar=cg.cigar((cg.M, 8)) if tid >= 0 else cg.EMPTY.copy(),
            seq=np.frombuffer(b"ACGTACGT", np.uint8).copy(),
            qual=np.full(8, 30, np.uint8),
        ))
    w.close()

    outs = set()
    for threads, mem in ((1, 1 << 30), (1, 64 << 10), (4, 64 << 10),
                         (4, 16 << 10)):
        out = str(tmp_path / f"o_{threads}_{mem}.bam")
        n = sort_bam(src, out, n_threads=threads, mem_bytes=mem)
        assert n == 3000
        outs.add(open(out, "rb").read())
    assert len(outs) == 1

    with BamReader(str(tmp_path / "o_1_65536.bam")) as r:
        last = (-1, -1)
        for raw in r.iter_raw():
            tid, pos = struct.unpack_from("<ii", raw, 0)
            k = (tid & 0xFFFFFFFF, pos)
            assert k >= last
            last = k
