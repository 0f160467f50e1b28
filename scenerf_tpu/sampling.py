"""Ray samplers: stratified uniform, log, weighted-uniform, and Gaussian-mixture
(PrSamp) sampling along rays.

TPU-native counterparts of ref scenerf/models/utils.py:52-229. All samplers are
shape-static, take explicit jax.random keys (the reference uses torch global
RNG), and return
  cam_pts          [R, P, 3]  points in the *infer* camera frame (after T)
  depth_volume     [R, P]     z-depth in the *source* camera frame
  sensor_distance  [R, P]     distance along the ray from the source sensor
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from scenerf_tpu.geometry import apply_matrix, homogenize, transform_points


def row_noise(
    key: jax.Array,
    n_rays: int,
    n_cols: int,
    full_rows: int | None = None,
    row_offset: jnp.ndarray | int = 0,
    dist: str = "uniform",
) -> jnp.ndarray:
    """[n_rays, n_cols] noise whose values depend only on the GLOBAL ray index.

    With `full_rows`, the draw covers the full ray set and rows
    [row_offset : row_offset + n_rays] are sliced out, so a ray gets the same
    noise regardless of how the ray batch is chunked into blocks or sharded
    across devices -- this is what makes `ray_shard` bit-exact vs the
    unsharded step (SURVEY 2.2)."""
    rows = n_rays if full_rows is None else full_rows
    draw = jax.random.uniform if dist == "uniform" else jax.random.normal
    noise = draw(key, (rows, n_cols))
    if full_rows is not None and (full_rows != n_rays or not isinstance(row_offset, int) or row_offset != 0):
        noise = jax.lax.dynamic_slice(noise, (row_offset, 0), (n_rays, n_cols))
    return noise


def uniform_sensor_distances(
    key: jax.Array, n_rays: int, n_pts: int, d_min: float, d_max: float,
    full_rows: int | None = None, row_offset: jnp.ndarray | int = 0,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Stratified distances: linspace(d_min, d_max, n_pts) + U(0, step) jitter,
    step = (d_max - d_min) / n_pts (ref models/utils.py:75-90 -- note the
    reference jitters by range/n while the linspace spacing is range/(n-1);
    reproduced as-is).

    `noise`: optional precomputed U(0,1) [n_rays, n_pts] (a row_noise slice) --
    callers rendering many blocks draw once and slice (rendering.render_rays)."""
    base = jnp.linspace(d_min, d_max, n_pts)
    step = (d_max - d_min) / n_pts
    if noise is None:
        noise = row_noise(key, n_rays, n_pts, full_rows, row_offset)
    return base[None, :] + noise * step


def log_sensor_distances(
    key: jax.Array, n_rays: int, n_pts: int, d_min: float, d_max: float,
    full_rows: int | None = None, row_offset: jnp.ndarray | int = 0,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Log-spaced distances concentrating samples near the camera
    (ref models/utils.py:94-109)."""
    step = (d_max - d_min) / n_pts
    d_i = d_min + jnp.arange(n_pts - 1, -1, -1, dtype=jnp.float32) * (d_max - d_min) / n_pts
    if noise is None:
        noise = row_noise(key, n_rays, n_pts, full_rows, row_offset)
    d_i = d_i[None, :] + noise * step
    return d_max - jnp.log(d_i - d_min + 1.0) / jnp.log(d_max - d_min + 1.0) * (d_max - d_min)


def weighted_uniform_sensor_distances(
    key: jax.Array, weights: jnp.ndarray, n_fine: int, d_min: float, d_max: float,
    full_rows: int | None = None, row_offset: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """Importance-sample distances from per-ray coarse weights via inverse-CDF
    over equal-width bins (ref models/utils.py:52-72).

    full_rows/row_offset give it the same shard-invariant noise contract as
    every other sampler (row_noise): a ray draws the same (u, jitter)
    regardless of chunking/sharding. NOTE the invariance covers the noise
    only -- `weights` must already be the global ray's coarse weights."""
    n_rays, n_coarse = weights.shape
    w = jax.lax.stop_gradient(weights) + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.concatenate([jnp.zeros((n_rays, 1)), jnp.cumsum(pdf, axis=-1)], axis=-1)
    ku, kj = jax.random.split(key)
    u = row_noise(ku, n_rays, n_fine, full_rows, row_offset)
    # searchsorted(right) - 1, clamped at 0
    inds = jnp.maximum(
        jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u) - 1, 0
    ).astype(jnp.float32)
    frac = (inds + row_noise(kj, n_rays, n_fine, full_rows, row_offset)) / n_coarse
    return d_min + (d_max - d_min) * frac


def points_from_distances(
    sensor_distance: jnp.ndarray,  # [R, P]
    unit_direction: jnp.ndarray,   # [R, 3]
    T_source2infer: jnp.ndarray,   # [4, 4]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """distance * direction in the source frame, transformed to the infer frame.

    Returns (cam_pts_infer [R, P, 3], depth_volume [R, P]). depth_volume is the
    z-coordinate of the point in the *source* frame (ref models/utils.py:159,
    :219): the rendered 'depth' supervises source-frame z, not ray length.
    """
    cam_pts_src = sensor_distance[..., None] * unit_direction[:, None, :]
    depth_volume = cam_pts_src[..., 2]
    cam_pts_infer = transform_points(cam_pts_src, T_source2infer)
    return cam_pts_infer, depth_volume


def sample_rays_uniform(
    key: jax.Array,
    pix: jnp.ndarray,          # [R, 2]
    inv_K: jnp.ndarray,
    T_source2infer: jnp.ndarray,
    n_pts: int,
    d_min: float,
    d_max: float,
    method: str = "uniform",
    full_rows: int | None = None,
    row_offset: jnp.ndarray | int = 0,
    noise: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform/log stratified sampling along rays through `pix`
    (ref sample_rays_viewdir, models/utils.py:112-173).

    Returns (cam_pts_infer [R,P,3], depth_volume [R,P], sensor_distance [R,P],
    viewdir_infer [R,3]). viewdir_infer is the UNNORMALIZED back-projected
    direction rotated into the infer frame (the reference feeds this raw vector
    to the MLP, models/utils.py:170).

    full_rows/row_offset make the per-ray jitter a function of the global ray
    index (see row_noise) for chunk/shard-invariant rendering.
    """
    n_rays = pix.shape[0]
    raw_dir = apply_matrix(homogenize(pix), inv_K[:3, :3])  # [R, 3], unnormalized
    unit_dir = raw_dir / jnp.linalg.norm(raw_dir, axis=-1, keepdims=True)

    if method == "uniform":
        sd = uniform_sensor_distances(key, n_rays, n_pts, d_min, d_max,
                                      full_rows, row_offset, noise)
    elif method == "log":
        sd = log_sensor_distances(key, n_rays, n_pts, d_min, d_max,
                                  full_rows, row_offset, noise)
    else:
        raise ValueError(f"unknown sampling method: {method}")

    cam_pts, depth_volume = points_from_distances(sd, unit_dir, T_source2infer)
    viewdir_infer = apply_matrix(raw_dir, T_source2infer[:3, :3])
    return cam_pts, depth_volume, sd, viewdir_infer


def sample_rays_gaussian(
    key: jax.Array,
    unit_direction: jnp.ndarray,   # [R, 3]
    T_source2infer: jnp.ndarray,
    gaussian_means: jnp.ndarray,   # [R, G] sensor distances
    gaussian_stds: jnp.ndarray,    # [R, G]
    n_pts_per_gaussian: int,
    min_clamp_depth: float = 0.1,
    full_rows: int | None = None,
    row_offset: jnp.ndarray | int = 0,
    noise: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw n_pts_per_gaussian points from each per-ray Gaussian along the ray
    (ref models/utils.py:186-229). Distances are clamped at min_clamp_depth.

    full_rows/row_offset: see row_noise (chunk/shard-invariant draws);
    `noise` optionally supplies the N(0,1) [R, G*Pg] draw directly.
    """
    n_rays, n_gauss = gaussian_means.shape
    mean_rep = jnp.repeat(gaussian_means, n_pts_per_gaussian, axis=1)  # [R, G*Pg]
    std_rep = jnp.repeat(gaussian_stds, n_pts_per_gaussian, axis=1)
    if noise is None:
        noise = row_noise(key, n_rays, n_gauss * n_pts_per_gaussian,
                          full_rows, row_offset, dist="normal")
    sd = jnp.maximum(mean_rep + noise * std_rep, min_clamp_depth)
    cam_pts, depth_volume = points_from_distances(sd, unit_direction, T_source2infer)
    return cam_pts, depth_volume, sd


def gaussian_anchor_distances(n_gaussians: int, max_sample_depth: float) -> jnp.ndarray:
    """Evenly spaced Gaussian anchor distances: step/2 to max - step/2
    (ref scenerf.py:554-567)."""
    step = max_sample_depth / n_gaussians
    return jnp.linspace(step / 2.0, max_sample_depth - step / 2.0, n_gaussians)


def sort_samples_by_distance(
    sensor_distance: jnp.ndarray,  # [R, P]
    depth_volume: jnp.ndarray,     # [R, P]
    cam_pts: jnp.ndarray,          # [R, P, 3]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jointly sort the per-ray samples by sensor distance (ref scenerf.py:652-659).

    One argsort + gathers; XLA fuses this into a single sort on TPU.
    """
    order = jnp.argsort(sensor_distance, axis=1)
    sd = jnp.take_along_axis(sensor_distance, order, axis=1)
    dv = jnp.take_along_axis(depth_volume, order, axis=1)
    pts = jnp.take_along_axis(cam_pts, order[..., None], axis=1)
    return sd, dv, pts


def random_grid_pixels(
    key: jax.Array,
    n_rays: int,
    img_W: int,
    img_H: int,
    stride: int = 2,
    grid_size: int = 1,
) -> jnp.ndarray:
    """Choose n_rays training pixels from the stride-subsampled image grid
    without replacement (ref scenerf.py:253-264).

    grid_size > 1 reproduces the BundleFusion variant that spreads rays over a
    coarse grid of image cells (ref scenerf_bf.py:160-190): n_rays/grid_size^2
    pixels are drawn in each of grid_size x grid_size image cells.
    """
    if grid_size <= 1:
        xs = jnp.arange(0, img_W, stride, dtype=jnp.float32)
        ys = jnp.arange(0, img_H, stride, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys, indexing="ij")  # torch.meshgrid default 'ij'
        pixels = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
        idx = jax.random.permutation(key, pixels.shape[0])[:n_rays]
        return pixels[idx]

    n_per_cell = n_rays // (grid_size * grid_size)
    cell_W, cell_H = img_W // grid_size, img_H // grid_size
    keys = jax.random.split(key, grid_size * grid_size)
    out = []
    for cy in range(grid_size):
        for cx in range(grid_size):
            k = keys[cy * grid_size + cx]
            xs = jnp.arange(cx * cell_W, (cx + 1) * cell_W, stride, dtype=jnp.float32)
            ys = jnp.arange(cy * cell_H, (cy + 1) * cell_H, stride, dtype=jnp.float32)
            gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
            pixels = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
            idx = jax.random.permutation(k, pixels.shape[0])[:n_per_cell]
            out.append(pixels[idx])
    return jnp.concatenate(out, axis=0)
