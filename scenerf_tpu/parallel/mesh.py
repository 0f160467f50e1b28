"""Device mesh + sharding helpers.

The workload is data-parallel over scan items and their rays (each ray is
independent; the reference's only strategy is DDP, SURVEY.md section 2.2). The
TPU-native equivalent is a 1-D `jax.sharding.Mesh` over ICI with the global
batch sharded on the leading axis; gradients and BN statistics are psum'd over
the mesh inside one jitted shard_map step -- XLA lowers these to ICI
all-reduces, no NCCL-style host involvement.

Multi-host (v5e-8+) runs feed per-host shards via
`jax.make_array_from_process_local_data`; DCN only carries input data.
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
    """Put a host batch onto the mesh, sharded along the leading (item) axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by mesh size {n}")
    return global_batch // n
