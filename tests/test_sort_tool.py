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
