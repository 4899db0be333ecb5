"""Multi-host execution plan.

The liftover workload distributes by *input sharding*, not tensor sharding:
each host owns a disjoint subset of assembly contigs, streams only the reads
whose primary alignment starts on its contigs (the same start-ownership dedup
rule the reference uses for threads, reference read_alignment_scanner.rs:398-405),
runs the device pipeline on its local chips, and writes its own unsorted output
shard.  Shards are concatenated by ``portello_tpu.tools.merge`` before the
final coordinate sort — permitted by the output contract
(docs/user_guide.md:227-230).  The contig mapping index is built identically on
every host from the (shared-filesystem) assembly-to-ref BAM, i.e. replicated by
recomputation; at ~MBs it can alternatively be broadcast over DCN with
``jax.experimental.multihost_utils`` when the input is not shared.
"""

from __future__ import annotations

from dataclasses import dataclass


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize JAX multi-host (DCN) communication.

    No-op when single-host or when no coordinator is given (independent
    per-host runs over shared storage need no DCN at all — the merge happens
    at the output files).
    """
    if num_processes is None or num_processes <= 1 or coordinator_address is None:
        return
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    # the handshake succeeded: every process sees the global device set
    from portello_tpu.logger import setup_logger

    setup_logger().info(
        f"JAX distributed initialized: process {jax.process_index()}"
        f"/{jax.process_count()}, {len(jax.devices())} global devices"
    )


@dataclass
class HostShardPlan:
    """Contig ownership for one host."""

    host_id: int
    num_hosts: int
    contig_indices: list[int]

    def owns(self, contig_index: int) -> bool:
        return contig_index in self._owned

    def __post_init__(self):
        self._owned = set(self.contig_indices)


def plan_host_shards(contig_lengths: list[int], num_hosts: int, host_id: int) -> HostShardPlan:
    """Greedy longest-first balanced partition of contigs across hosts.

    Work is proportional to contig length (reads distribute ~uniformly over
    the assembly), so balance total owned length.
    """
    order = sorted(range(len(contig_lengths)), key=lambda i: -contig_lengths[i])
    loads = [0] * num_hosts
    owner = [0] * len(contig_lengths)
    for ci in order:
        h = loads.index(min(loads))
        owner[ci] = h
        loads[h] += contig_lengths[ci]
    return HostShardPlan(
        host_id=host_id,
        num_hosts=num_hosts,
        contig_indices=[i for i, h in enumerate(owner) if h == host_id],
    )


def shard_output_path(path: str, host_id: int, num_hosts: int) -> str:
    """Per-host output shard naming ('out.bam' -> 'out.shard03of08.bam')."""
    if num_hosts <= 1 or path == "-":
        return path
    if "." in path.rsplit("/", 1)[-1]:
        stem, ext = path.rsplit(".", 1)
        return f"{stem}.shard{host_id:02d}of{num_hosts:02d}.{ext}"
    return f"{path}.shard{host_id:02d}of{num_hosts:02d}"
