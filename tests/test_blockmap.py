"""Block map conformance tests (vectors from reference read_to_ref_map.rs:139-177)."""

import numpy as np

from portello_tpu.ops import cigar as cg
from portello_tpu.ops.blockmap import NONE, BlockMap, build_block_map, build_dense_read_to_ref_map


def test_dense_map():
    # reference read_to_ref_map.rs:154-162: pos 9 (0-based), cigar 2H2M1I1M,
    # ignore_hard_clip=True, seq_len 4
    c = cg.from_string("2H2M1I1M")
    rval = build_dense_read_to_ref_map(4, 9, c, ignore_hard_clip=True)
    assert list(rval) == [9, 10, NONE, 11]


def test_tree_map_lookup():
    # reference read_to_ref_map.rs:165-176
    c = cg.from_string("2H2M1I1M")
    bm = build_block_map(9, c, ignore_hard_clip=True)
    assert [bm.get_ref_pos(i) for i in range(4)] == [9, 10, None, 11]
    keys, vals = bm.get_ref_range(0, 2)
    assert list(keys) == [0]
    assert list(vals) == [9]


def test_tree_map_hard_clip_counted():
    c = cg.from_string("2H2M1I1M")
    bm = build_block_map(9, c, ignore_hard_clip=False)
    # read positions now include the 2 hard-clipped bases
    assert [bm.get_ref_pos(i) for i in range(6)] == [None, None, 9, 10, None, 11]


def test_tree_map_del_no_gap_entry():
    # A pure deletion between match runs must overwrite the gap entry (BTreeMap
    # same-key insert semantics, read_to_ref_map.rs:111-119).
    c = cg.from_string("5M3D5M")
    bm = build_block_map(100, c, False)
    assert list(bm.keys) == [0, 5, 10]
    assert list(bm.vals) == [100, 108, NONE]
    assert bm.get_ref_pos(4) == 104
    assert bm.get_ref_pos(5) == 108
    assert bm.get_ref_pos(9) == 112
    assert bm.get_ref_pos(10) is None


def test_tree_map_ins_gap_entry():
    c = cg.from_string("5M2I5M")
    bm = build_block_map(100, c, False)
    assert list(bm.keys) == [0, 5, 7, 12]
    assert list(bm.vals) == [100, NONE, 105, NONE]
    assert bm.get_ref_pos(5) is None
    assert bm.get_ref_pos(6) is None
    assert bm.get_ref_pos(7) == 105


def test_get_ref_range_floor_semantics():
    c = cg.from_string("10M")
    bm = build_block_map(1000, c, False)
    # start inside the first block: range starts at the enclosing block
    keys, vals = bm.get_ref_range(3, 8)
    assert list(keys) == [0]
    # no key <= start: range covers keys >= start
    bm2 = BlockMap(np.array([5, 10], dtype=np.int64), np.array([100, NONE], dtype=np.int64))
    keys, _ = bm2.get_ref_range(2, 7)
    assert list(keys) == [5]


def test_empty_and_unaligned():
    assert len(build_block_map(0, cg.EMPTY, False)) == 0
    assert len(build_block_map(0, cg.from_string("5S5H"), False)) == 0
    assert BlockMap().get_ref_pos(5) is None
