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


def _local_chunk(n_local: int, ray_chunk: int) -> int:
    """Largest block size <= ray_chunk that divides the per-device ray count
    (per-ray noise is chunk-layout-invariant, so any block size gives the
    same values; this just bounds memory)."""
    import math
    return n_local if n_local <= ray_chunk else math.gcd(n_local, ray_chunk)


def _replicator(mesh: Mesh):
    """device_put trees replicated over `mesh`, caching by object identity --
    eval CLIs call the renderer once per source with the SAME weights, so the
    broadcast happens once, not per call (committed single-device arrays, e.g.
    checkpoint restores, would otherwise re-broadcast every call)."""
    rep = NamedSharding(mesh, P())
    cache: dict = {}

    def place(tree, cache_slot=None):
        if cache_slot is not None and cache.get(cache_slot, (None,))[0] == id(tree):
            return cache[cache_slot][1]
        placed = jax.device_put(tree, rep)
        if cache_slot is not None:
            cache[cache_slot] = (id(tree), placed)
        return placed

    return place


def make_sharded_renderer(model, mesh: Mesh, ray_chunk: int):
    """Returns render(variables, levels, cam_K, T, pixels, key) with `pixels`
    [N, 2] sharded over the mesh; N must divide by mesh size.

    Every device renders its contiguous row slice with the SHARED key and its
    global row offset (sampling.row_noise), so the gathered result is
    identical to a single-device render of the same pixels -- sharding is
    a pure wall-clock optimization, not a semantics change."""
    n_dev = mesh.devices.size

    def per_shard(variables, levels, cam_K, T, pixels, key):
        n_local = pixels.shape[0]
        off = jax.lax.axis_index(DATA_AXIS) * n_local
        pyr = R.FeaturePyramid(levels=levels)
        out = model.render_rays(
            variables, pyr, cam_K, T, pixels, key,
            ray_chunk=_local_chunk(n_local, ray_chunk), remat=False,
            row_offset=off, total_rows=n_local * n_dev)
        return {"depth": out["depth"], "color": out["color"]}

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    jfn = jax.jit(fn)
    place = _replicator(mesh)

    def render(variables, levels, cam_K, T, pixels, key) -> Dict[str, jnp.ndarray]:
        N = pixels.shape[0]
        if N % n_dev != 0:
            raise ValueError(f"{N} rays must divide over {n_dev} devices")
        pixels = jax.device_put(pixels, NamedSharding(mesh, P(DATA_AXIS)))
        return jfn(place(variables, "vars"), place(levels),
                   place(cam_K), place(T), pixels, place(key))

    return render


def make_sharded_pose_sweep(model, mesh: Mesh, stride: int,
                            ray_chunk: int):
    """Mesh-sharded render_pose_sweep: the per-pose pixel grid is sharded over
    devices (poses replicated, lax.map over poses on every device, each
    rendering its pixel slice with shard-invariant noise). Output matches
    model.render_pose_sweep (ref generate_novel_depths.py:116-152 pose loop,
    run on all chips at once).

    Returns sweep(variables, levels, cam_K, poses [P,4,4], key) ->
    {depth [P, h, w], color [P, h, w, 3]}."""
    import numpy as np

    n_dev = mesh.devices.size
    cfg = model.cfg
    W, H = cfg.img_size
    xs = np.arange(0, W, stride, dtype=np.float32)
    ys = np.arange(0, H, stride, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    pixels = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    n = pixels.shape[0]
    h, w = len(ys), len(xs)
    chunk = ray_chunk or cfg.eval_ray_chunk
    # pad so the pixel rows divide evenly over devices AND each device's row
    # count divides by the chunk (padding does not change the real rows'
    # noise -- counter-indexed draws, see
    # tests/test_sampling.py::test_row_noise_prefix_property)
    pad = (-n) % (n_dev * chunk)
    padded = np.concatenate([pixels, np.zeros((pad, 2), np.float32)], axis=0)
    total = padded.shape[0]
    n_local = total // n_dev
    local_chunk = _local_chunk(n_local, chunk)

    def per_shard(variables, levels, cam_K, poses, pix, key):
        off = jax.lax.axis_index(DATA_AXIS) * n_local
        pyr = R.FeaturePyramid(levels=levels)
        keys = jax.random.split(key, poses.shape[0])

        def one(args):
            T, k = args
            out = model.render_rays(variables, pyr, cam_K, T, pix, k,
                                    ray_chunk=local_chunk, remat=False,
                                    row_offset=off, total_rows=total)
            return {"depth": out["depth"], "color": out["color"]}

        return jax.lax.map(one, (poses, keys))

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=P(None, DATA_AXIS),
        check_vma=False,
    )
    jfn = jax.jit(fn)
    place = _replicator(mesh)
    pix_dev = jax.device_put(jnp.asarray(padded),
                             NamedSharding(mesh, P(DATA_AXIS)))

    def sweep(variables, levels, cam_K, poses, key) -> Dict[str, jnp.ndarray]:
        out = jfn(place(variables, "vars"), place(levels), place(cam_K),
                  place(poses), pix_dev, place(key))
        Pn = poses.shape[0]
        return {
            "depth": out["depth"][:, :n].reshape(Pn, h, w),
            "color": out["color"][:, :n].reshape(Pn, h, w, 3),
        }

    return sweep
