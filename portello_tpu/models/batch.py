"""Padded batch construction for the device kernels.

Converts ragged host-side work items (one per read-segment x contig-segment
liftover, reference read_alignment_scanner.rs:456-471) into fixed-shape int32
tensors bucketed by CIGAR length / block count, the layout the kernels in
``portello_tpu.kernels`` consume.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from portello_tpu.kernels.cigar_kernels import INT32_MAX, PAD
from portello_tpu.ops.blockmap import BlockMap


@dataclass(frozen=True)
class BucketConfig:
    """Static shapes for one compilation bucket."""

    max_ops: int = 1024          # read->contig cigar ops
    max_blocks: int = 64         # contig->ref map entries in the read's window
    max_out: int = 0             # lifted cigar ops (0 -> derived)
    max_seq: int = 32768         # read length (bases)
    max_clusters: int = 512      # indel clusters for simplify/shift
    window: int = 64             # base-compare window for simplify/shift
    max_rows: int = 0            # liftover update-grid rows (0 -> worst case)

    def resolved_max_out(self) -> int:
        # Each input op splits at most once per overlapped block boundary and
        # each block gap adds at most one Del (SURVEY.md section 7 "hard parts").
        return self.max_out or (self.max_ops + 2 * self.max_blocks + 8)

    def resolved_max_rows(self) -> int:
        # Proven worst case under the renumbered visit scheme
        # (liftover_parallel): every rc op needs inside_keys + 1 rows and the
        # window keys are disjoint across op intervals, so
        # total_rows <= n_ops + n_blocks (tests/test_update_rows.py fuzzes
        # this).  Explicit max_rows still allows tighter measured bounds;
        # over-bound items bucket-spill on the host row count and the
        # kernel's row_overflow flag backstops any miscount.
        return self.max_rows or (self.max_ops + self.max_blocks)


def pad_cigar(cig: np.ndarray, max_ops: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Pad one host cigar tensor to (max_ops,) code/len vectors."""
    n = len(cig)
    if n > max_ops:
        raise ValueError(f"cigar with {n} ops exceeds bucket max_ops={max_ops}")
    codes = np.full(max_ops, PAD, dtype=np.int32)
    lens = np.zeros(max_ops, dtype=np.int32)
    if n:
        codes[:n] = cig[:, 0]
        lens[:n] = cig[:, 1]
    return codes, lens, n


def pad_blocks(bm: BlockMap, max_blocks: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Pad one block-map window to (max_blocks,) key/val vectors."""
    n = len(bm)
    if n > max_blocks:
        raise ValueError(f"block map with {n} entries exceeds max_blocks={max_blocks}")
    keys = np.full(max_blocks, INT32_MAX, dtype=np.int32)
    vals = np.full(max_blocks, -1, dtype=np.int32)
    if n:
        keys[:n] = bm.keys
        vals[:n] = bm.vals
    return keys, vals, n


def unpad_cigar(codes: np.ndarray, lens: np.ndarray, n: int) -> np.ndarray:
    """Recover a host cigar tensor from padded device output."""
    out = np.empty((int(n), 2), dtype=np.int64)
    out[:, 0] = codes[: int(n)]
    out[:, 1] = lens[: int(n)]
    return out


def build_liftover_batch(items, cfg: BucketConfig):
    """Stack a list of (cigar, ref1_pos, BlockMap) items into batch tensors."""
    b = len(items)
    ops = np.full((b, cfg.max_ops), PAD, dtype=np.int32)
    lens = np.zeros((b, cfg.max_ops), dtype=np.int32)
    n_ops = np.zeros(b, dtype=np.int32)
    pos = np.zeros(b, dtype=np.int32)
    bk = np.full((b, cfg.max_blocks), INT32_MAX, dtype=np.int32)
    bv = np.full((b, cfg.max_blocks), -1, dtype=np.int32)
    n_blocks = np.zeros(b, dtype=np.int32)
    for i, (cig, ref1_pos, bm) in enumerate(items):
        ops[i], lens[i], n_ops[i] = pad_cigar(cig, cfg.max_ops)
        bk[i], bv[i], n_blocks[i] = pad_blocks(bm, cfg.max_blocks)
        pos[i] = ref1_pos
    return ops, lens, n_ops, pos, bk, bv, n_blocks
