"""Device-resident reference + packed read rows (kernels/resident.py):
primitive window-fetch exactness and output equality of fwd_batch_resident
with the per-item-table production graph (fwd_batch, mm=True).

The resident formulation reads REAL genome bytes at window edge positions
where the table formulation sees zero padding / fill sentinels; the module's
influence proof says outputs cannot depend on those positions, and these
tests fuzz exactly the adversarial cases (clusters at span edges, odd read
offsets, chrom-boundary windows, gap-deletion lifts) to enforce it.
"""

import numpy as np
import pytest

from portello_tpu.ops import cigar as cg

jax = pytest.importorskip("jax")

from portello_tpu.kernels.cigar_kernels import INT32_MAX, PAD  # noqa: E402
from portello_tpu.kernels.resident import (  # noqa: E402
    SEQ_SYMBOLS,
    build_global_ref,
    fetch_read_windows_packed,
    fetch_ref_windows_global,
    pack_seq_rows,
    split_global_base,
)
from portello_tpu.models.pipeline_model import (  # noqa: E402
    fwd_batch,
    fwd_batch_resident,
)

WIN = 48


def test_build_global_ref_layout():
    chroms = [
        np.frombuffer(b"ACGTACGTAC", np.uint8),
        np.frombuffer(b"T" * 64, np.uint8),
        np.frombuffer(b"GATTACA", np.uint8),
    ]
    words, goff = build_global_ref(chroms)
    flat = words.view(np.uint8).reshape(-1)
    assert goff[0] == 64  # front pad superblock
    for c, off in zip(chroms, goff):
        assert bytes(flat[off : off + len(c)]) == bytes(c)
        assert off % 64 == 0
    # tail pad leaves the +1 superblock of any last-window fetch in-table
    assert flat.shape[0] % 64 == 0
    assert flat.shape[0] >= goff[-1] + len(chroms[-1]) + 128


def test_fetch_ref_windows_global_exact():
    rng = np.random.default_rng(7)
    # genome containing non-alphabet bytes too (the resident path never
    # re-encodes the reference, so arbitrary bytes must round-trip)
    chroms = [
        rng.integers(60, 100, size=n, dtype=np.uint8)
        for n in (300, 64, 129)
    ]
    words, goff = build_global_ref(chroms)
    flat = words.view(np.uint8).reshape(-1)
    jwords = jax.numpy.asarray(words)

    cases = []
    for _ in range(64):
        ci = int(rng.integers(0, len(chroms)))
        base = int(rng.integers(0, len(chroms[ci])))
        start = int(rng.integers(-WIN, len(chroms[ci]) - base + 8))
        cases.append((ci, base, start))
    # chrom-boundary edges
    cases += [(0, 0, -WIN), (2, 128, 0), (1, 63, 40)]

    g_sb, g_off = split_global_base(
        np.array([goff[c] + b for c, b, _ in cases], np.int64)
    )
    starts = np.array([s for _, _, s in cases], np.int32)
    got = np.asarray(
        fetch_ref_windows_global(
            jwords, jax.numpy.asarray(g_sb), jax.numpy.asarray(g_off),
            jax.numpy.asarray(starts), WIN,
        )
    )  # (WIN, C)
    for j, (ci, base, start) in enumerate(cases):
        p = goff[ci] + base + start
        expect = flat[p : p + WIN]
        np.testing.assert_array_equal(got[:, j], expect, err_msg=str(cases[j]))


def test_pack_fetch_read_windows_exact():
    rng = np.random.default_rng(11)
    alpha = np.frombuffer(SEQ_SYMBOLS, np.uint8)
    g, length = 5, 400
    rows = rng.choice(alpha, size=(g, length))
    rows[:, -7:] = 0  # production rows are zero-padded past the read
    packed = pack_seq_rows(rows)
    assert packed.shape == (g, length // 2)
    starts = rng.integers(-WIN, length - WIN, size=(g, 3)).astype(np.int32)
    starts[0, 0] = -WIN           # most-negative contract edge
    starts[1, 1] = length - WIN   # row tail
    starts[2, 2] = 33             # odd parity
    got = np.asarray(
        fetch_read_windows_packed(
            jax.numpy.asarray(packed), jax.numpy.asarray(starts), WIN
        )
    )  # (G, WIN, 3)
    # zero pads decode to '=' (code 0), matching pack_seq_rows' contract
    decoded = rows.copy()
    decoded[rows == 0] = ord("=")
    for i in range(g):
        for j in range(starts.shape[1]):
            s = int(starts[i, j])
            for t in range(WIN):
                if 0 <= s + t < length:
                    assert got[i, t, j] == decoded[i, s + t], (i, j, t, s)


def _mixed_cigar(rng, read_len, n_clusters, edge=None):
    """Input cigar with n_clusters DI clusters; ``edge`` places one cluster
    at the very start/end of the alignment (window reads off the span)."""
    ops = []
    if edge == "start":
        ops += [(cg.D, 2), (cg.I, 2)]
    ops += [(cg.M, 6)]
    for _ in range(n_clusters):
        ops += [(cg.D, int(rng.integers(1, 4))), (cg.I, int(rng.integers(1, 4))),
                (cg.M, int(rng.integers(4, 9)))]
    if edge == "end":
        ops += [(cg.I, 2), (cg.D, 2)]
    # top up read length with a final M
    rlen = sum(l for c, l in ops if c in (cg.M, cg.I))
    if rlen < read_len:
        ops.append((cg.M, read_len - rlen))
    return np.array(ops, np.int64)


def _build_batches(rng, n_items, max_ops, max_blocks, max_seq, chroms, goff):
    """Paired inputs for fwd_batch (table form, filled exactly like
    DeviceEngine._prep_item) and fwd_batch_resident."""
    b = n_items
    ops = np.full((b, max_ops), PAD, np.int32)
    lens = np.zeros((b, max_ops), np.int32)
    n_ops = np.zeros(b, np.int32)
    pos = np.zeros(b, np.int32)
    bk = np.full((b, max_blocks), INT32_MAX, np.int32)
    bv = np.full((b, max_blocks), -1, np.int32)
    nb = np.zeros(b, np.int32)
    ref_win = np.zeros((b, max_seq), np.uint8)
    ref_base = np.zeros(b, np.int32)
    read_seq = np.zeros((b, max_seq), np.uint8)
    gbyte = np.zeros(b, np.int64)
    alpha = np.frombuffer(b"ACGT", np.uint8)

    for i in range(b):
        ci = int(rng.integers(0, len(chroms)))
        chrom = chroms[ci]
        edge = [None, "start", "end", None][i % 4]
        cig = _mixed_cigar(rng, int(rng.integers(40, 120)), 1 + i % 3, edge)
        rspan = int(cg.get_cigar_ref_offset(cig))
        p0 = int(rng.integers(0, max(1, len(chrom) - rspan - 4)))
        # block map: one or two mapped blocks (a split creates a lift gap)
        if i % 3 == 2 and rspan > 20:
            cut = rspan // 2
            gap = int(rng.integers(0, 6))
            keys = np.array([p0, p0 + cut, p0 + cut + 1], np.int64)
            vals = np.array([p0, -1, p0 + cut + gap], np.int64)
            keys_v = np.array([p0, p0 + cut + 1], np.int64)
            vals_v = np.array([p0, p0 + cut + gap], np.int64)
        else:
            keys = np.array([p0], np.int64)
            vals = np.array([p0], np.int64)
            keys_v, vals_v = keys, vals
        k = len(keys)
        bk[i, :k] = keys
        bv[i, :k] = np.where(vals < 0, -1, vals)
        nb[i] = k
        n = len(cig)
        ops[i, :n] = cig[:, 0]
        lens[i, :n] = cig[:, 1]
        n_ops[i] = n
        pos[i] = p0
        # ref window exactly as _prep_item computes it (span-tight)
        span_end = p0 + rspan
        nxt = np.concatenate([keys_v[1:], [span_end]])
        ref_lo = int(vals_v.min())
        ref_hi = int(
            (vals_v + np.minimum(nxt, span_end) - keys_v).max()
        )
        win = chrom[ref_lo:min(ref_hi, len(chrom))]
        ref_win[i, : len(win)] = win
        ref_base[i] = ref_lo
        gbyte[i] = goff[ci] + ref_lo
        # read bases: matches over M ops against the LIFTED ref (use the
        # contig==ref identity away from the gap), random ins content with
        # occasional re-matchable bases
        parts = []
        rp = p0
        for code, ln in cig:
            if code == cg.M:
                seg = chrom[rp : rp + ln].copy()
                if len(seg) < ln:
                    seg = np.concatenate(
                        [seg, rng.choice(alpha, size=ln - len(seg))]
                    )
                rp += ln
                parts.append(seg)
            elif code == cg.D:
                rp += ln
            else:
                parts.append(rng.choice(alpha, size=ln))
        rs = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
        read_seq[i, : len(rs)] = rs

    g_sb, g_off = split_global_base(gbyte)
    packed = pack_seq_rows(read_seq)
    table_args = (ops, lens, n_ops, pos, bk, bv, nb, ref_win, ref_base,
                  read_seq)
    res_args = (ops, lens, n_ops, pos, bk, bv, nb, g_sb, g_off, ref_base,
                packed)
    return table_args, res_args


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fwd_batch_resident_equals_table(seed):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGTN", np.uint8)
    chroms = [rng.choice(alpha, size=n) for n in (700, 333)]
    words, goff = build_global_ref(chroms)
    kw = dict(max_out=256, max_clusters=32, window=WIN, max_rows=160)
    table_args, res_args = _build_batches(
        rng, 24, max_ops=64, max_blocks=8, max_seq=512, chroms=chroms,
        goff=goff,
    )
    ref = fwd_batch(*table_args, mm=True, **kw)
    got = fwd_batch_resident(*res_args, jax.numpy.asarray(words), **kw)
    for key in ("codes", "lens", "n_out", "ref2_pos", "mapped", "read_len",
                "fallback"):
        np.testing.assert_array_equal(
            np.asarray(ref[key]), np.asarray(got[key]), err_msg=key
        )
    # the scenario must actually exercise the window compare
    assert int(np.asarray(ref["mapped"]).sum()) > 12
