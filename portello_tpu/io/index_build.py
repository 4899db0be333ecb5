"""BAI index construction for coordinate-sorted BAMs.

The reference assumes externally indexed inputs (cli.rs:143-163); this framework
additionally ships an indexer so fixtures and downstream pipelines don't need
samtools.  Format per SAM spec section 5.2 (htslib bam_index_core equivalent).
"""

from __future__ import annotations

import struct

from portello_tpu.io.bai import bam_reg2bin
from portello_tpu.io.bam import BamReader


def build_bai(bam_path: str, out_path: str | None = None) -> str:
    out_path = out_path or bam_path + ".bai"
    reader = BamReader(bam_path)
    n_ref = len(reader.header.refs)
    bins: list[dict[int, list[list[int]]]] = [dict() for _ in range(n_ref)]
    linear: list[dict[int, int]] = [dict() for _ in range(n_ref)]
    counts = [[0, 0] for _ in range(n_ref)]  # mapped, unmapped per ref
    ref_range = [[None, None] for _ in range(n_ref)]  # voffset span per ref
    n_no_coor = 0

    bgzf = reader._bgzf
    bgzf.seek_voffset(reader._data_voffset)
    last_key = (-1, -1)
    while True:
        v_start = bgzf.tell_voffset()
        raw = reader._read_record_raw()
        if raw is None:
            break
        v_end = bgzf.tell_voffset()
        tid, pos = struct.unpack_from("<ii", raw, 0)
        flag = struct.unpack_from("<H", raw, 14)[0]
        if tid < 0 or pos < 0:
            n_no_coor += 1
            continue
        if (tid, pos) < last_key:
            raise ValueError(
                f"Cannot index '{bam_path}': records are not coordinate-sorted"
            )
        last_key = (tid, pos)
        # end position from the cigar ops
        n_cigar = struct.unpack_from("<H", raw, 12)[0]
        l_read_name = raw[8]
        ref_len = 0
        off = 32 + l_read_name
        for k in range(n_cigar):
            (u,) = struct.unpack_from("<I", raw, off + 4 * k)
            op = u & 0xF
            if op in (0, 2, 3, 7, 8):  # M D N = X
                ref_len += u >> 4
        end = pos + max(ref_len, 1)
        if end > (1 << 29):
            # BAI's 5-level binning tops out at 2^29-1; beyond it reg2bin
            # emits ids that collide with the 37450 pseudo-bin (whose chunks
            # readers silently drop) or fall outside the scheme entirely.
            # htslib refuses and requires CSI here; so do we.
            raise ValueError(
                f"Cannot BAI-index '{bam_path}': alignment end {end} on tid "
                f"{tid} exceeds the BAI limit of 2^29 (use a CSI index)"
            )
        b = bam_reg2bin(pos, end)
        chunks = bins[tid].setdefault(b, [])
        if chunks and chunks[-1][1] == v_start:
            chunks[-1][1] = v_end
        else:
            chunks.append([v_start, v_end])
        for w in range(pos >> 14, ((end - 1) >> 14) + 1):
            if w not in linear[tid] or linear[tid][w] > v_start:
                linear[tid][w] = v_start
        if flag & 0x4:
            counts[tid][1] += 1
        else:
            counts[tid][0] += 1
        rr = ref_range[tid]
        rr[0] = v_start if rr[0] is None else min(rr[0], v_start)
        rr[1] = v_end if rr[1] is None else max(rr[1], v_end)
    reader.close()

    out = bytearray(b"BAI\x01")
    out += struct.pack("<i", n_ref)
    for tid in range(n_ref):
        tid_bins = bins[tid]
        has_meta = ref_range[tid][0] is not None
        out += struct.pack("<i", len(tid_bins) + (1 if has_meta else 0))
        for b in sorted(tid_bins):
            chunks = tid_bins[b]
            out += struct.pack("<Ii", b, len(chunks))
            for cb, ce in chunks:
                out += struct.pack("<QQ", cb, ce)
        if has_meta:  # pseudo-bin 37450
            out += struct.pack("<Ii", 37450, 2)
            out += struct.pack("<QQ", ref_range[tid][0], ref_range[tid][1])
            out += struct.pack("<QQ", counts[tid][0], counts[tid][1])
        if linear[tid]:
            n_intv = max(linear[tid]) + 1
            ioff = []
            prev = 0
            for w in range(n_intv):
                if w in linear[tid]:
                    prev = linear[tid][w]
                ioff.append(prev)
            out += struct.pack("<i", n_intv)
            out += struct.pack(f"<{n_intv}Q", *ioff)
        else:
            out += struct.pack("<i", 0)
    out += struct.pack("<Q", n_no_coor)
    with open(out_path, "wb") as f:
        f.write(bytes(out))
    return out_path
