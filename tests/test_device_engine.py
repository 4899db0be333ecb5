"""Device engine conformance: CLI outputs with the device batch path must be
byte-identical (as sorted record sets) to the exact host oracle path."""

import numpy as np
import pytest

from portello_tpu.io.bam import BamReader
from portello_tpu.main import main
from portello_tpu.testutil.simulate import make_scenario

jax = pytest.importorskip("jax")


def content(path):
    with BamReader(path) as r:
        return sorted(rec.encode() for rec in r)


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sim_dev")
    return make_scenario(str(tmp), rng=np.random.default_rng(7)), tmp


def run(scn, tmp, tag, device, extra=()):
    out_r = str(tmp / f"r_{tag}.bam")
    out_u = str(tmp / f"u_{tag}.bam")
    main(
        [
            "--assembly-to-ref", scn.contig_bam,
            "--read-to-assembly", scn.read_bam,
            "--remapped-read-output", out_r,
            "--unassembled-read-output", out_u,
            "--ref", scn.ref_fasta,
            "--device", device,
            *extra,
        ]
    )
    return out_r, out_u


def test_device_engine_matches_host(scenario):
    scn, tmp = scenario
    r_host, u_host = run(scn, tmp, "host", "host")
    r_dev, u_dev = run(scn, tmp, "dev", "cpu", extra=["--batch-size", "64"])
    assert content(r_dev) == content(r_host)
    assert content(u_dev) == content(u_host)


def test_device_engine_small_batches(scenario):
    """Flush boundaries must not change results."""
    scn, tmp = scenario
    r1, _ = run(scn, tmp, "b1", "cpu", extra=["--batch-size", "1"])
    r2, _ = run(scn, tmp, "b512", "cpu", extra=["--batch-size", "512"])
    assert content(r1) == content(r2)


def test_device_engine_stats(scenario):
    """Most items must actually run on device, not fall back."""
    scn, tmp = scenario
    from portello_tpu.models.pipeline_model import DeviceEngine
    from portello_tpu.pipeline.contig_scan import scan_contig_bam
    from portello_tpu.pipeline.read_scan import scan_and_remap_reads
    from portello_tpu.utils.chrom_list import ChromList
    from portello_tpu.io.fasta import get_genome_ref_from_fasta

    ref_chrom_list = ChromList.from_bam_filename(scn.contig_bam)
    contig_list = ChromList.from_bam_filename(scn.read_bam)
    genome = get_genome_ref_from_fasta(scn.ref_fasta)
    reference = [genome.chroms[c.label] for c in ref_chrom_list.data]
    info = scan_contig_bam(scn.contig_bam, ref_chrom_list, contig_list, None)
    engine = DeviceEngine(reference, contig_list, info, batch_size=128)
    scan_and_remap_reads(
        scn.read_bam,
        str(tmp / "r_stats.bam"),
        str(tmp / "u_stats.bam"),
        reference,
        ref_chrom_list,
        info,
        False,
        engine=engine,
    )
    assert engine.stats["device_items"] > 100
    assert engine.stats["fallback_items"] < engine.stats["device_items"] * 0.1
