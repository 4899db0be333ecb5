"""Rev-item routing A/B: host-shift routing (default; the reverse-contig
left-shift of reference read_alignment_scanner.rs:159-176 runs on the host
during prep and the item dispatches the fwd device graph) must produce
byte-identical output to the device-shift routing (PTPU_HOST_SHIFT=0, the
shift stage A/B device chain)."""

import os

import numpy as np
import pytest

from portello_tpu.pipeline import native_feed
from portello_tpu.testutil.simulate import make_scenario


def _run_cli(tmp_path, tag, feed, host_shift):
    from portello_tpu.main import main

    out = tmp_path / f"remapped_{tag}.bam"
    un = tmp_path / f"un_{tag}.bam"
    os.environ["PTPU_HOST_SHIFT"] = "1" if host_shift else "0"
    try:
        main([
            "--assembly-to-ref", str(tmp_path / "asm_to_ref.bam"),
            "--read-to-assembly", str(tmp_path / "read_to_asm.bam"),
            "--remapped-read-output", str(out),
            "--unassembled-read-output", str(un),
            "--ref", str(tmp_path / "ref.fa"),
            "--device", "cpu", "--feed", feed, "--batch-size", "32",
        ])
    finally:
        del os.environ["PTPU_HOST_SHIFT"]
    return out, un


def _records(path):
    from portello_tpu.io.bam import BamReader

    with BamReader(str(path)) as r:
        return sorted(rec.to_sam(r.header) for rec in r)


def _scenario_has_rev_items(tmp_path):
    """The A/B only proves something if reverse-contig items exist."""
    from portello_tpu.pipeline.contig_scan import scan_contig_bam
    from portello_tpu.utils.chrom_list import ChromList

    ref_cl = ChromList.from_bam_filename(str(tmp_path / "asm_to_ref.bam"))
    asm_cl = ChromList.from_bam_filename(str(tmp_path / "read_to_asm.bam"))
    info = scan_contig_bam(str(tmp_path / "asm_to_ref.bam"), ref_cl, asm_cl, None)
    return any(
        not s.seq_order_segment.is_fwd_strand
        for ci in info
        for s in ci.ordered_contig_segment_info
    )


@pytest.mark.skipif(
    native_feed.get_lib() is None,
    reason=f"ptscan unavailable: {native_feed.build_error()}",
)
def test_host_shift_equals_device_shift_native_feed(tmp_path):
    rng = np.random.default_rng(31)
    make_scenario(str(tmp_path), rng=rng, n_reads_per_contig=50, read_len=400)
    assert _scenario_has_rev_items(tmp_path)
    out_h, un_h = _run_cli(tmp_path, "hs", "native", host_shift=True)
    out_d, un_d = _run_cli(tmp_path, "ds", "native", host_shift=False)
    rh = _records(out_h)
    assert rh == _records(out_d)
    assert _records(un_h) == _records(un_d)
    assert len(rh) > 0


def test_host_shift_equals_device_shift_python_engine(tmp_path):
    rng = np.random.default_rng(32)
    make_scenario(str(tmp_path), rng=rng, n_reads_per_contig=40, read_len=350)
    assert _scenario_has_rev_items(tmp_path)
    out_h, _ = _run_cli(tmp_path, "hs_py", "python", host_shift=True)
    out_d, _ = _run_cli(tmp_path, "ds_py", "python", host_shift=False)
    rh = _records(out_h)
    assert rh == _records(out_d)
    assert len(rh) > 0


def test_host_shift_routes_rev_items_to_fwd_graph(tmp_path):
    """Under host-shift routing the engine must dispatch NO rev-graph
    batches (every rev item becomes a fwd-graph item after the host shift)."""
    from portello_tpu.io.fasta import get_genome_ref_from_fasta
    from portello_tpu.models.pipeline_model import DeviceEngine
    from portello_tpu.pipeline.contig_scan import scan_contig_bam
    from portello_tpu.pipeline.read_scan import scan_and_remap_reads
    from portello_tpu.utils.chrom_list import ChromList

    rng = np.random.default_rng(33)
    make_scenario(str(tmp_path), rng=rng, n_reads_per_contig=30, read_len=300)
    assert _scenario_has_rev_items(tmp_path)
    contig_bam = str(tmp_path / "asm_to_ref.bam")
    read_bam = str(tmp_path / "read_to_asm.bam")
    ref_cl = ChromList.from_bam_filename(contig_bam)
    asm_cl = ChromList.from_bam_filename(read_bam)
    genome = get_genome_ref_from_fasta(str(tmp_path / "ref.fa"))
    reference = [genome.chroms[c.label] for c in ref_cl.data]
    info = scan_contig_bam(contig_bam, ref_cl, asm_cl, None)

    engine = DeviceEngine(
        reference, asm_cl, info, batch_size=16, host_shift=True
    )
    seen_rev = []
    orig = engine._run_group

    def spy(bcfg, is_rev, items):
        seen_rev.append(is_rev)
        return orig(bcfg, is_rev, items)

    engine._run_group = spy
    scan_and_remap_reads(
        read_bam, str(tmp_path / "rs.bam"), str(tmp_path / "us.bam"),
        reference, ref_cl, info, False, engine=engine,
    )
    assert seen_rev, "no device batches ran"
    assert not any(seen_rev), "host-shift routing dispatched a rev-graph batch"
