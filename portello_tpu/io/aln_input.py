"""Alignment-input dispatch: BAM or CRAM by magic bytes.

The reference accepts both formats via htslib (cli.rs:25,32); this helper
routes to the matching native reader.
"""

from __future__ import annotations


def is_cram_file(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(4) == b"CRAM"


def open_alignment_input(path: str, reference=None):
    """Open a BAM or CRAM alignment file with the shared reader surface
    (.header, iteration, close, context manager)."""
    if is_cram_file(path):
        from portello_tpu.io.cram import CramReader

        return CramReader(path, reference=reference)
    from portello_tpu.io.bam import BamReader

    return BamReader(path)
