"""The two-phase liftover pipeline.

Phase 1 (``contig_scan``): scan the assembly-to-reference BAM into the contig
mapping index (reference src/contig_alignment_scanner/).
Phase 2 (``read_scan``): stream the read-to-assembly BAM through the index,
lift every read segment, and emit the remapped + unassembled BAMs (reference
src/read_alignment_scanner.rs).
"""
