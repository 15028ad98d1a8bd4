"""Device mesh + sharding utilities (the distributed runtime).

TPU-native replacement for the reference's PTL/DDP/NCCL stack
(reference: examples/train_flash_sdxl.py:423-428 SLURM env → DDP strategy;
SURVEY.md §2.2): one ``jax.sharding.Mesh``, batch sharded over the ``data``
axis, parameters replicated (extensible to an ``fsdp`` axis for sharded
states). Gradient reduction is XLA's — jit over sharded inputs inserts the
``psum`` over ICI/DCN; there is no NCCL analog to port. Multi-host bootstrap
is ``jax.distributed.initialize`` (replacing the SLURM/PTL launcher).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap. No-op when no coordinator is configured; on
    clusters with auto-detection (GKE/SLURM) the extra args stay None and
    JAX's cluster detect fills them in. Outside those (bare-metal pods,
    tests), pass them explicitly or via ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` (replaces the reference's SLURM_NPROCS plumbing,
    examples/train_flash_sdxl.py:423-428)."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Mesh over all (or given) devices. Default: 1-D data-parallel mesh,
    matching the reference's DDP-only parallelism; pass
    ``axes=("data", "model")`` + shape for tp/dp hybrids."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axis_names=tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Device-put array leaves with leading-axis sharding; leaves whose
    leading dim does not divide the mesh axis (tiny debug batches, scalars)
    are replicated instead."""
    sharding = batch_sharding(mesh, axis)
    repl = replicated(mesh)
    n = mesh.shape[axis]

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_params_fsdp(
    tree,
    mesh: Mesh,
    axis: str = "data",
    min_size: int = 2**16,
):
    """FSDP-style parameter sharding: shard each large leaf's first
    axis-divisible dimension over ``axis``; small leaves stay replicated.
    XLA all-gathers shards on use inside jit — memory scales down with the
    mesh while the step stays a plain jit (ZeRO-3-like; the reference has
    no counterpart, SURVEY.md §2.2 'no FSDP/ZeRO')."""
    n = mesh.shape[axis]

    def spec_for(x):
        if not hasattr(x, "shape") or x.size * getattr(x.dtype, "itemsize", 4) < min_size:
            return P()
        for d, s in enumerate(x.shape):
            if s % n == 0 and s >= n:
                parts = [None] * len(x.shape)
                parts[d] = axis
                return P(*parts)
        return P()

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_for(x))), tree
    )


def local_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of a globally-indexed dataset (replaces
    webdataset split_by_node, reference data/datasets/dataset.py:83)."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
