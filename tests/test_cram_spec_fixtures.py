"""Writer-independent CRAM spec fixtures (the test_index_spec_fixtures.py
discipline applied to the CRAM layer).

Round-trip tests can never catch a bug that encoder and decoder share (the
round-2 rANS order-1 floor(n/4) split bug was exactly that class), so this
file decodes byte streams this repo's writer never produced:

* rANS 4x8 order-0/order-1 payloads assembled by hand from hts-specs
  CRAMcodecs section 3 (worked state arithmetic in comments), including
  n % 4 != 0 sizes that exercise the tail-on-state-3 layout;
* a complete CRAM 3.0 container assembled field-by-field whose data series
  use encoding codecs the writer never emits: BETA core bits, canonical
  multi-symbol HUFFMAN, and BYTE_ARRAY_LEN with a BETA length.
"""

import struct

import numpy as np
import pytest

from portello_tpu.io import cram
from portello_tpu.io.cram import (
    CRAM_EOF,
    CRAM_MAGIC,
    E_BETA,
    E_BYTE_ARRAY_LEN,
    E_EXTERNAL,
    E_HUFFMAN,
    Encoding,
    encode_encoding,
    write_block,
    write_container_header,
    write_itf8,
    write_ltf8,
)


# ---------------------------------------------------------------------------
# rANS 4x8 hand-assembled payloads (spec: [order u8][clen u32][rlen u32]...)
# ---------------------------------------------------------------------------

def _rans4x8(order: int, payload: bytes, n_out: int) -> bytes:
    return struct.pack("<BII", order, len(payload), n_out) + payload


class TestRans4x8SpecStreams:
    def test_order0_single_symbol(self):
        """'G' x 5 with F[G] = 4096: the decode step r = 4096*(r>>12) +
        (r & 4095) is the identity, so all four states hold their 2^23
        initial and there is no byte payload."""
        payload = (
            b"\x47"              # first symbol 'G'
            b"\x90\x00"          # F = 4096 (two-byte >=128 form)
            b"\x00"              # next-symbol terminator
            + b"\x00\x00\x80\x00" * 4  # states: 8388608 LE x4
        )
        assert cram.rans_decode(_rans4x8(0, payload, 5)) == b"GGGGG"

    def test_order0_two_symbols_worked_states(self):
        """"ab", F[a]=F[b]=2048, states computed by hand:
        'b' via state1: R = (2^23/2048)<<12 + 0 + C[b]=2048 -> 16779264;
        'a' via state0: R = 4096<<12 -> 16777216.  No renormalisation."""
        payload = (
            b"\x61"              # first symbol 'a'
            b"\x88\x00"          # F[a] = 2048
            b"\x62"              # next symbol 'b' (= a+1)
            b"\x00"              # run byte 0
            b"\x88\x00"          # F[b] = 2048
            b"\x00"              # terminator
            b"\x00\x00\x00\x01"  # state0 = 16777216
            b"\x00\x08\x00\x01"  # state1 = 16779264
            b"\x00\x00\x80\x00"  # state2 = 8388608
            b"\x00\x00\x80\x00"  # state3 = 8388608
        )
        assert cram.rans_decode(_rans4x8(0, payload, 2)) == b"ab"

    def test_order1_tail_on_state3_n5(self):
        """'a' x 5 (n % 4 = 1): quarters of floor(5/4)=1 at 0/1/2/3 and the
        tail [4,5) on state 3 continuing its context chain.  Contexts 0 and
        'a' both map 'a'->4096, so every state is the 2^23 identity."""
        row = b"\x61\x90\x00\x00"  # {a: 4096}
        payload = (
            b"\x00" + row          # context 0
            + b"\x61" + row        # context 'a'
            + b"\x00"              # context terminator
            + b"\x00\x00\x80\x00" * 4
        )
        assert cram.rans_decode(_rans4x8(1, payload, 5)) == b"aaaaa"

    def test_order1_two_contexts_worked_states(self):
        """"ababa" (n=5): F[0]={a:2048,b:2048}, F['b']={a:4096}.
        Worked encode (reverse order, LIFO):
          (s3,i4)'a'|ctx'b': identity  -> R3 = 2^23
          (s3,i3)'b'|ctx0: (2^23/2048)<<12 + C[b]=2048 -> 16779264
          (s2,i2)'a'|ctx0 -> 16777216;  (s1,i1)'b' -> 16779264;
          (s0,i0)'a' -> 16777216.  No renormalisation bytes."""
        row0 = b"\x61\x88\x00\x62\x00\x88\x00\x00"  # {a:2048, b:2048}
        rowb = b"\x61\x90\x00\x00"                  # {a:4096}
        payload = (
            b"\x00" + row0
            + b"\x62" + rowb
            + b"\x00"
            + b"\x00\x00\x00\x01"  # R0 = 16777216
            + b"\x00\x08\x00\x01"  # R1 = 16779264
            + b"\x00\x00\x00\x01"  # R2 = 16777216
            + b"\x00\x08\x00\x01"  # R3 = 16779264
        )
        assert cram.rans_decode(_rans4x8(1, payload, 5)) == b"ababa"

    def test_order0_truncated_freq_table_raises(self):
        with pytest.raises(Exception):
            cram.rans_decode(_rans4x8(0, b"\x47\x90", 5))


# ---------------------------------------------------------------------------
# hand-assembled container (encodings the writer never emits)
# ---------------------------------------------------------------------------

def _huff(alphabet, bit_lens):
    e = Encoding(E_HUFFMAN)
    e.alphabet = list(alphabet)
    e.bit_lens = list(bit_lens)
    return e


def _beta(offset, n_bits):
    e = Encoding(E_BETA)
    e.offset = offset
    e.n_bits = n_bits
    return e


def _ext(cid):
    e = Encoding(E_EXTERNAL)
    e.content_id = cid
    return e


def _byte_array_len(len_enc, val_enc):
    e = Encoding(E_BYTE_ARRAY_LEN)
    e.len_enc = len_enc
    e.val_enc = val_enc
    return e


def _build_hand_container(tmp_path):
    """One detached unmapped record ('uX', seq ACGT, quals 30..33) coded
    with BETA core bits (BF, AP), a 2-symbol canonical HUFFMAN (CF), and
    BYTE_ARRAY_LEN{BETA len, EXTERNAL val} (RN)."""
    series = [
        (b"BF", _beta(0, 8)),             # core: 8 bits, value 4 (FUNMAP)
        (b"CF", _huff([2, 3], [1, 1])),   # core: 1 bit, value 3 (code 1)
        (b"RL", _ext(1)),                 # external itf8
        (b"AP", _beta(0, 3)),             # core: 3 bits, value 0
        (b"RG", _huff([-1], [0])),        # zero-bit constant
        (b"RN", _byte_array_len(_beta(0, 4), _ext(2))),
        (b"MF", _huff([0], [0])),
        (b"NS", _huff([-1], [0])),
        (b"NP", _huff([0], [0])),
        (b"TS", _huff([0], [0])),
        (b"TL", _huff([0], [0])),
        (b"BA", _ext(3)),
        (b"QS", _ext(4)),
    ]
    series_blob = write_itf8(len(series)) + b"".join(
        key + encode_encoding(e) for key, e in series
    )
    pres = (
        write_itf8(3)
        + b"RN\x01" + b"AP\x00"
        + b"TD" + write_itf8(1) + b"\x00"   # one empty tag line (TL=0)
    )
    chdr = (
        write_itf8(len(pres)) + pres
        + write_itf8(len(series_blob)) + series_blob
        + write_itf8(1) + write_itf8(0)     # zero tag encodings (size, n)
    )
    # core bits per record: BF 00000100 | CF 1 | AP 000 | RN-len 0010
    core = bytes([0b00000100, 0b10000010])
    ext_streams = {
        1: write_itf8(4),        # RL = 4
        2: b"uX",                # RN value bytes
        3: b"ACGT",              # BA
        4: bytes([30, 31, 32, 33]),  # QS
    }
    chdr_blk = write_block(cram.RAW, cram.COMPRESSION_HEADER, 0, chdr)
    blocks = [write_block(cram.RAW, cram.CORE_T, 0, core)]
    for cid, data in sorted(ext_streams.items()):
        blocks.append(write_block(cram.RAW, cram.EXTERNAL_T, cid, data))
    sh = bytearray()
    sh += write_itf8(-1)          # ref id: unmapped slice
    sh += write_itf8(0)           # start
    sh += write_itf8(0)           # span
    sh += write_itf8(1)           # n_records
    sh += write_ltf8(0)           # record counter
    sh += write_itf8(len(blocks))
    sh += write_itf8(len(ext_streams))
    for cid in sorted(ext_streams):
        sh += write_itf8(cid)
    sh += write_itf8(-1)          # no embedded reference
    sh += b"\x00" * 16            # MD5 (unchecked)
    sh_blk = write_block(cram.RAW, cram.SLICE_HEADER, 0, bytes(sh))
    body = chdr_blk + sh_blk + b"".join(blocks)
    h = cram.ContainerHeader(
        len(body), -1, 0, 0, 1, 0, 4, 2 + len(blocks), [len(chdr_blk)]
    )

    text = b"@HD\tVN:1.6\n"
    hdr_payload = struct.pack("<i", len(text)) + text
    hdr_blk = write_block(cram.RAW, cram.FILE_HEADER, 0, hdr_payload)
    hdr_cont = cram.ContainerHeader(len(hdr_blk), 0, 0, 0, 0, 0, 0, 1, [0])

    path = tmp_path / "hand.cram"
    with open(path, "wb") as f:
        f.write(CRAM_MAGIC + bytes([3, 0]) + b"spec-fixture".ljust(20, b"\x00"))
        f.write(write_container_header(hdr_cont))
        f.write(hdr_blk)
        f.write(write_container_header(h))
        f.write(body)
        f.write(CRAM_EOF)
    return str(path)


def test_hand_container_beta_huffman_byte_array_len(tmp_path):
    path = _build_hand_container(tmp_path)
    with cram.CramReader(path) as r:
        recs = list(r)
    assert len(recs) == 1
    rec = recs[0]
    assert rec.qname == b"uX"
    assert rec.flag == 4
    assert rec.tid == -1
    assert rec.pos == -1
    assert rec.mapq == 0
    assert rec.seq.tobytes() == b"ACGT"
    assert rec.qual.tolist() == [30, 31, 32, 33]
    assert rec.mtid == -1 and rec.tlen == 0
    assert rec.tags == []
