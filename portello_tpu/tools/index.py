"""Build a .bai index for a coordinate-sorted BAM (samtools index equivalent)."""

from __future__ import annotations

import argparse

from portello_tpu.io.index_build import build_bai


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="portello-tpu index")
    p.add_argument("bam")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args(argv)
    out = build_bai(args.bam, args.output)
    print(out)


if __name__ == "__main__":
    main()
