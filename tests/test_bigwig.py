"""BigWig writer/reader round trips and format-layout checks
(reference bigwig_utils.rs:7-23 parity; no external BBI implementation
exists in this image, see auxlib/bigwig.py)."""

import struct

import numpy as np

from portello_tpu.auxlib.bigwig import (
    BIGWIG_MAGIC,
    BigWigReader,
    write_bigwig,
    write_coverage_bigwig,
)


def test_roundtrip_intervals(tmp_path):
    path = str(tmp_path / "t.bw")
    chroms = [("chr1", 10000), ("chr2", 5000)]
    ivs = [
        ("chr1", 0, 100, 1.5),
        ("chr1", 100, 250, 2.0),
        ("chr1", 5000, 5010, -3.25),
        ("chr2", 10, 20, 7.0),
    ]
    write_bigwig(path, chroms, ivs)
    with BigWigReader(path) as r:
        assert r.chroms == chroms
        got = list(r.intervals())
        assert got == ivs
        got1 = list(r.intervals("chr2"))
        assert got1 == [("chr2", 10, 20, 7.0)]
        s = r.summary()
        assert s["valid_count"] == 100 + 150 + 10 + 10
        assert s["min"] == -3.25 and s["max"] == 7.0


def test_header_layout(tmp_path):
    path = str(tmp_path / "h.bw")
    write_bigwig(path, [("c", 100)], [("c", 0, 10, 1.0)])
    raw = open(path, "rb").read()
    magic, version, zoom = struct.unpack_from("<IHH", raw, 0)
    assert magic == BIGWIG_MAGIC and version == 4 and zoom == 0
    # 64-byte header; summary offset field sits at byte 44
    # (4+2+2 + 3*8 + 2+2 + 8 autoSql)
    (summary_off,) = struct.unpack_from("<Q", raw, 44)
    valid, vmin, vmax, vsum, _ = struct.unpack_from("<Qdddd", raw, summary_off)
    assert valid == 10 and vmin == 1.0 and vmax == 1.0 and vsum == 10.0


def test_many_sections_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    path = str(tmp_path / "m.bw")
    chroms = [("chrA", 10_000_000)]
    starts = np.sort(rng.choice(9_000_000, size=5000, replace=False))
    ivs = [
        ("chrA", int(s), int(s) + 5, float(v))
        for s, v in zip(starts, rng.normal(size=5000).astype(np.float32))
    ]
    write_bigwig(path, chroms, ivs)
    with BigWigReader(path) as r:
        assert list(r.intervals()) == ivs


def test_coverage_helper(tmp_path):
    path = str(tmp_path / "cov.bw")
    depth = np.zeros(1000, np.int32)
    depth[100:200] = 3
    depth[200:205] = 1
    write_coverage_bigwig(path, [("chr1", 1000)], {"chr1": depth})
    with BigWigReader(path) as r:
        assert list(r.intervals()) == [
            ("chr1", 100, 200, 3.0), ("chr1", 200, 205, 1.0),
        ]


def test_unsorted_rejected(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        write_bigwig(
            str(tmp_path / "x.bw"), [("c", 100)],
            [("c", 50, 60, 1.0), ("c", 10, 20, 1.0)],
        )


def test_bigwig_chunk_spanning_three_chromosomes(tmp_path):
    """A 1024-item section chunk crossing 3+ chromosomes must split at
    EVERY boundary (one chrom_id per section; a single cut would mix
    coordinate systems under the second chromosome's id)."""
    from portello_tpu.auxlib.bigwig import BigWigReader, write_bigwig

    chroms = [("cA", 100000), ("cB", 100000), ("cC", 100000)]
    ivals = []
    for cname, _ in chroms:
        for k in range(400):
            ivals.append((cname, 10 * k, 10 * k + 10, float(len(ivals))))
    path = str(tmp_path / "multi.bw")
    write_bigwig(path, chroms, ivals)
    with BigWigReader(path) as r:
        got = list(r.intervals())
        assert [(c, s, e, v) for c, s, e, v in got] == [
            (c, s, e, float(i)) for i, (c, s, e, _v) in enumerate(ivals)
        ]
        # per-chromosome queries stay clean
        assert len(list(r.intervals("cC"))) == 400
        import pytest

        with pytest.raises(ValueError, match="chrUnknown"):
            list(r.intervals("chrUnknown"))


def test_zoom_levels_emitted_and_consistent(tmp_path):
    """Zoom headers + per-level aggregated records (libBigWig parity,
    bigwig_utils.rs:7-23): bin summaries must reconcile exactly with the
    full-resolution data."""
    import numpy as np

    from portello_tpu.auxlib.bigwig import BigWigReader, write_bigwig

    rng = np.random.default_rng(5)
    chroms = [("chr1", 100_000), ("chr2", 40_000)]
    ivs = []
    for name, ln in chroms:
        pos = 0
        while pos < ln - 50:
            span = int(rng.integers(5, 40))
            ivs.append((name, pos, pos + span, float(rng.integers(1, 9))))
            pos += span + int(rng.integers(0, 30))
    path = str(tmp_path / "zoom.bw")
    write_bigwig(path, chroms, ivs)

    with BigWigReader(path) as r:
        assert r.zoom_levels >= 2  # ladder reaches whole-chrom scale
        # reductions ascend 4x
        reds = [z["reduction"] for z in r.zooms]
        assert all(b == a * 4 for a, b in zip(reds, reds[1:]))
        total_valid = sum(e - s for _, s, e, _ in ivs)
        total_sum = sum(v * (e - s) for _, s, e, v in ivs)
        for lvl in range(r.zoom_levels):
            recs = list(r.zoom_records(lvl))
            assert recs, f"level {lvl} empty"
            assert sum(rv[3] for rv in recs) == total_valid
            assert abs(sum(rv[6] for rv in recs) - total_sum) < 1e-3 * total_sum
            # bins aligned to the reduction and clipped to the chromosome
            red = reds[lvl]
            lens = dict(chroms)
            for name, st, en, valid, mn, mx, sm, ssq in recs:
                assert st % red == 0
                assert en <= lens[name]
                assert 0 < valid <= red
                assert mn <= mx
        # full data unchanged by the zoom machinery
        assert list(r.intervals()) == ivs


def test_zoom_skipped_for_tiny_tracks(tmp_path):
    from portello_tpu.auxlib.bigwig import BigWigReader, write_bigwig

    path = str(tmp_path / "tiny.bw")
    # mean span 10 -> first reduction 100 >= longest chrom (60): no zooms
    write_bigwig(path, [("c", 60)], [("c", 0, 10, 1.0), ("c", 20, 30, 2.0)])
    with BigWigReader(path) as r:
        assert r.zoom_levels == 0
        assert list(r.intervals()) == [("c", 0, 10, 1.0), ("c", 20, 30, 2.0)]
