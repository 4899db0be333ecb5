"""Device mesh construction and batch sharding for the liftover kernels.

The liftover workload is embarrassingly parallel across reads, so the natural
mesh is 1-D over a ``data`` axis with every batch tensor sharded on dim 0 and
all outputs likewise; XLA inserts no collectives on the hot path (the ideal
case for ICI).  The same entry points serve single-host multi-chip (one mesh
over local devices) and multi-host (jax.distributed + the same named sharding
over the global mesh).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch_arrays(mesh: Mesh, arrays: tuple) -> tuple:
    """Place every batch tensor with dim-0 sharded over the data axis."""
    sh = batch_sharding(mesh)
    return tuple(jax.device_put(np.asarray(a), sh) for a in arrays)


def make_sharded_fwd_step(mesh: Mesh, *, max_out: int, max_clusters: int, window: int):
    """pjit-style sharded forward liftover step over the mesh.

    Batch dim must be divisible by the mesh size.  Inputs/outputs are sharded
    on dim 0; scalars-per-read shard likewise.
    """
    from portello_tpu.models.pipeline_model import _fwd_item

    fn = jax.vmap(
        lambda *a: _fwd_item(
            *a, max_out=max_out, max_clusters=max_clusters, window=window
        )
    )
    sh = batch_sharding(mesh)
    in_sh = (sh,) * 10
    return jax.jit(fn, in_shardings=in_sh, out_shardings=sh)


def make_sharded_rev_step(mesh: Mesh, *, max_out: int, max_clusters: int, window: int):
    """Sharded reverse-contig step: left-shift + liftover + simplify."""
    from portello_tpu.models.pipeline_model import _rev_item

    fn = jax.vmap(
        lambda *a: _rev_item(
            *a, max_out=max_out, max_clusters=max_clusters, window=window
        )
    )  # fused single-graph variant: fine for compile validation dry runs
    sh = batch_sharding(mesh)
    in_sh = (sh,) * 12
    return jax.jit(fn, in_shardings=in_sh, out_shardings=sh)
