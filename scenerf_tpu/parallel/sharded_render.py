"""Mesh-sharded ray rendering for evaluation/reconstruction.

Rays are embarrassingly parallel (SURVEY.md section 2.2): for large eval
renders (full images, pose sweeps, LiDAR pixel sets) the pixel batch is
sharded over the 1-D `data` mesh and every chip renders its slice against the
replicated feature pyramid -- no cross-chip communication at all; results
gather on the host.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scenerf_tpu import rendering as R
from scenerf_tpu.parallel.mesh import DATA_AXIS


def make_sharded_renderer(model, mesh: Mesh, ray_chunk: int):
    """Returns render(variables, levels, cam_K, T, pixels, key) with `pixels`
    [N, 2] sharded over the mesh; N must divide by mesh size * ray_chunk."""
    n_dev = mesh.devices.size

    def per_shard(variables, levels, cam_K, T, pixels, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        pyr = R.FeaturePyramid(levels=levels)
        out = model.render_rays(variables, pyr, cam_K, T, pixels, key,
                                ray_chunk=ray_chunk, remat=False)
        return {"depth": out["depth"], "color": out["color"]}

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    jfn = jax.jit(fn)

    def render(variables, levels, cam_K, T, pixels, key) -> Dict[str, jnp.ndarray]:
        N = pixels.shape[0]
        if N % (n_dev * ray_chunk) != 0:
            raise ValueError(
                f"{N} rays must divide over {n_dev} devices x chunk {ray_chunk}")
        pixels = jax.device_put(pixels, NamedSharding(mesh, P(DATA_AXIS)))
        return jfn(variables, levels, cam_K, T, pixels, key)

    return render
