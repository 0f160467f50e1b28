"""Device mesh + sharding helpers.

The workload is data-parallel over scan items and their rays (each ray is
independent; the reference's only strategy is DDP, SURVEY.md section 2.2). The
TPU-native equivalent is a 1-D `jax.sharding.Mesh` over ICI with the global
batch sharded on the leading axis; gradients and BN statistics are psum'd over
the mesh inside one jitted shard_map step -- XLA lowers these to ICI
all-reduces, no NCCL-style host involvement.

Multi-host (v5e-8+) runs feed per-host shards via
`jax.make_array_from_process_local_data`; DCN only carries input data.
Exercised for real by tests/test_multihost.py: a 2-process JAX CPU cluster
(jax.distributed) asserting the assembled global batch matches the
single-process one shard by shard.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (DATA_AXIS,))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Put a host batch onto the mesh, sharded along the leading (item) axis.

    Single-process: a plain device_put of the full global batch. Multi-host:
    `batch` is this process's LOCAL shard (DataLoader with process_index/
    process_count set) and the global array is assembled from per-process
    shards -- each host feeds only its own devices, DCN carries nothing.
    """
    if jax.process_count() > 1:
        return shard_batch_multihost(batch, mesh)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def shard_batch_multihost(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Assemble global sharded arrays from per-process local batch shards via
    jax.make_array_from_process_local_data (per-host input feeding; the
    reference's DDP analog is Lightning's per-rank DataLoader)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a host tree over the mesh (the ray modes' batch
    layout: same items on every device, rays sharded/sampled per device).

    Multi-host: every process must hold the SAME host data (ray-mode loaders
    are deliberately unsliced -- same seed, same order on every process); the
    replicated global array is assembled from each process's full copy via
    make_array_from_process_local_data, so ray modes run across hosts with
    DCN carrying no batch data at all. device_put is deliberately avoided
    under multi-process: its cross-process consistency check
    (multihost_utils.assert_equal) is a Gloo allgather with a hard 30 s
    deadline that spuriously fails when processes are skewed by compile
    time. Used for ALL replicated puts (batches, TrainState, sphere maps)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda v: jax.make_array_from_process_local_data(
                sharding, np.asarray(v)), tree)
    return jax.device_put(tree, sharding)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by mesh size {n}")
    return global_batch // n
