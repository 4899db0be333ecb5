"""Adversarial-input discipline for the CRAM 3.1 codecs: random garbage,
truncations and bit flips must raise (or decode to something) promptly —
never hang or demand unbounded work.  Guards under test: block-size vs
embedded-length agreement, PACK/RLE length monotonicity, range-coder
underflow detection."""

import random
import signal

import pytest

from portello_tpu.io import arith_nx16, fqzcomp, rans_nx16, tok3

DECODERS = [
    ("rans", lambda d: rans_nx16.decode(d, n_out=100)),
    ("tok3", lambda d: tok3.decode(d)),
    ("arith", lambda d: arith_nx16.decode(d, n_out=100)),
    ("fqz", lambda d: fqzcomp.decode(d, n_out=100)),
]


class _Timeout(Exception):
    pass


def _run_bounded(fn, blob, seconds=5):
    def handler(_sig, _frm):
        raise _Timeout

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        fn(blob)
    except _Timeout:
        pytest.fail(f"decoder hung on {blob[:24].hex()}")
    except Exception:
        pass  # raising cleanly is the accepted outcome
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def test_random_garbage_never_hangs():
    rng = random.Random(20260819)
    for _ in range(500):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 300)))
        for _name, fn in DECODERS:
            _run_bounded(fn, blob)


def test_truncations_and_bitflips_never_hang():
    rng = random.Random(7)
    streams = [
        ("rans", rans_nx16.encode(b"hello world " * 50, order=1),
         lambda d: rans_nx16.decode(d)),
        ("tok3", tok3.encode(b"".join(f"r{i}\x00".encode() for i in range(100))),
         lambda d: tok3.decode(d)),
        ("arith", arith_nx16.encode(b"hello world " * 50, order=1),
         lambda d: arith_nx16.decode(d)),
        ("fqz", fqzcomp.encode(bytes([30, 40] * 300), [100] * 6),
         lambda d: fqzcomp.decode(d, n_out=600)),
    ]
    for _name, enc, fn in streams:
        step = max(1, len(enc) // 25)
        for cut in range(0, len(enc), step):
            _run_bounded(fn, enc[:cut])
        for _ in range(40):
            b = bytearray(enc)
            b[rng.randrange(len(b))] ^= 0xFF
            _run_bounded(fn, bytes(b))


def test_block_size_mismatch_rejected_before_work():
    enc = rans_nx16.encode(b"x" * 500)
    with pytest.raises(rans_nx16.RansNx16Error, match="block size"):
        rans_nx16.decode(enc, n_out=400)
    enc2 = arith_nx16.encode(b"x" * 500)
    with pytest.raises(arith_nx16.ArithError, match="block size"):
        arith_nx16.decode(enc2, n_out=400)
