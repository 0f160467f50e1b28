"""Fused ray rendering: PrSamp sampling -> point featurization -> field MLP ->
sort -> alpha compositing -> RaySOM, all in one jittable region.

This replaces the reference's serial Python chunk loop over ray batches
(ref scenerf/models/scenerf.py:392-471, :598-700) with a `lax.map` over
fixed-shape ray blocks wrapped in `jax.checkpoint`: one compiled program, no
per-chunk kernel launches, activation memory bounded by the block size, and the
backward pass recomputes block activations instead of storing them.

The per-point featurization (ref scenerf.py:505-547) projects each 3D sample to
pixels, maps pixels onto the spherical grid, and bilinearly samples all five
pyramid scales. Gathers run against [H, W, C] (channel-minor) feature maps so
XLA lowers them to efficient row gathers from HBM.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from scenerf_tpu import sampling as S
from scenerf_tpu.config import SceneRFConfig, SphereConfig
from scenerf_tpu.encoding import positional_encoding
from scenerf_tpu.fields import gaussian_params_from_offsets, radiance_outputs
from scenerf_tpu import geometry as geo
from scenerf_tpu.som import ray_som

# A field function maps (latent [N, d_latent] | None, x_in [N, d_in]) -> [N, d_out].
FieldFn = Callable[[Optional[jnp.ndarray], jnp.ndarray], jnp.ndarray]

SCALES = (1, 2, 4, 8, 16)


def pyramid_level_size(sphere: SphereConfig, scale: int) -> Tuple[int, int]:
    """Actual (H, W) of a pyramid level: round(sphere/scale)
    (ref unet2d_sphere.py:139)."""
    return (
        int(round(sphere.height / scale)),
        int(round(sphere.width / scale)),
    )


def pyramid_norm_size(sphere: SphereConfig, scale: int) -> Tuple[int, int]:
    """(W, H) used to normalize sample coords at a level. The reference
    normalizes by the floor-divided nominal size, which can differ by one pixel
    from the actual map (ref scenerf.py:522-525); reproduced for parity."""
    if scale == 1:
        return (sphere.width, sphere.height)
    return (sphere.width // scale, sphere.height // scale)


class FeaturePyramid(NamedTuple):
    """Spherical-grid feature maps, channel-last, keyed by scale order
    (1, 2, 4, 8, 16) -- channels (80, 160, 320, 640, 1280) at full size."""

    levels: Tuple[jnp.ndarray, ...]  # each [H_s, W_s, C_s]

    @property
    def d_latent(self) -> int:
        return sum(l.shape[-1] for l in self.levels)


def featurize_points(
    pyramid: FeaturePyramid,
    cam_pts: jnp.ndarray,   # [N, 3] points in the infer camera frame
    viewdir: jnp.ndarray,   # [N, 3] unnormalized view directions (infer frame)
    cam_K: jnp.ndarray,
    inv_K: jnp.ndarray,
    sphere: SphereConfig,
    n_pe_freqs: int = 6,
    gather_impl: str = "taps",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point conditioning: (latent [N, d_latent], x_in [N, 39+3]).

    Pipeline (ref scenerf.py:505-531): project to pixels -> spherical coords of
    the back-projected direction (rounded to grid cells) -> bilinear-sample all
    pyramid scales at coords/scale -> concat; positional-encode the 3D point and
    append the raw view direction.

    gather_impl: "taps" or "win2" (windowed gather/scatter, bit-identical --
    see ops/gather_scatter.py).
    """
    projected_pix = geo.cam_pts_2_pix(cam_pts, cam_K)  # [N, 2] (-1 behind cam)
    _, sphere_coords, _ = geo.sphere_coords_from_pixels(
        inv_K, sphere, pix=projected_pix
    )  # [N, 2] rounded grid coords

    feats = []
    for level, scale in zip(pyramid.levels, SCALES):
        norm_wh = pyramid_norm_size(sphere, scale)
        coords = sphere_coords if scale == 1 else sphere_coords / scale
        feats.append(geo.sample_feats_2d(level, coords, norm_wh,
                                         impl=gather_impl))
    latent = jnp.concatenate(feats, axis=-1)

    pe = positional_encoding(cam_pts, num_freqs=n_pe_freqs)
    x_in = jnp.concatenate([pe, viewdir], axis=-1)
    return latent, x_in


def composite(
    density: jnp.ndarray,          # [R, P]
    sensor_distance: jnp.ndarray,  # [R, P] sorted ascending
    depth_volume: jnp.ndarray,     # [R, P]
    colors: jnp.ndarray,           # [R, P, 3]
) -> Dict[str, jnp.ndarray]:
    """Alpha-composite densities along each ray (ref scenerf.py:704-748).

    deltas[0] = d[0]; alpha = 1 - exp(-delta * sigma); T = cumprod of shifted
    (1 - alpha + 1e-10); weights = alpha * T. Depth integrates the *source-frame
    z* (depth_volume), not ray length.
    """
    sd = jnp.maximum(sensor_distance, 0.0)
    deltas = jnp.concatenate([sd[:, :1], sd[:, 1:] - sd[:, :-1]], axis=1)
    alphas = 1.0 - jnp.exp(-deltas * density)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=1),
        axis=1,
    )[:, :-1]
    weights = alphas * trans

    depth = jnp.sum(weights * depth_volume, axis=-1)
    color = jnp.sum(weights[..., None] * colors, axis=-2)

    abs_diff = jnp.abs(depth[:, None] - depth_volume)
    closest_idx = jnp.argmin(abs_diff, axis=1)
    closest_pts_to_depth = jnp.min(abs_diff, axis=1)
    weights_at_depth = jnp.take_along_axis(weights, closest_idx[:, None], axis=1)[:, 0]

    return {
        "depth": depth,
        "color": color,
        "alphas": alphas,
        "weights": weights,
        "weights_at_depth": weights_at_depth,
        "closest_pts_to_depth": closest_pts_to_depth,
        "depth_volume": depth_volume,
        "density": density,
    }


def render_ray_block(
    key: jax.Array,
    pixels: jnp.ndarray,  # [r, 2]
    pyramid: FeaturePyramid,
    cam_K: jnp.ndarray,
    inv_K: jnp.ndarray,
    T_source2infer: jnp.ndarray,
    field_fn: FieldFn,
    gaussian_fn: FieldFn,
    cfg: SceneRFConfig,
    row_offset: jnp.ndarray | int = 0,
    total_rows: Optional[int] = None,
    noise_uni: Optional[jnp.ndarray] = None,
    noise_gauss: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Render one fixed-size block of rays end to end
    (ref batchify_depth_and_color, scenerf.py:598-700).

    row_offset/total_rows: this block's position within a larger ray batch --
    per-ray noise is drawn for the full batch from the shared key and sliced,
    so rendering is bit-identical across chunk layouts and device shards
    (sampling.row_noise). noise_uni [r, n_pts_uni] / noise_gauss [r, G*Pg]
    optionally supply the raw U(0,1)/N(0,1) draws directly (render_rays draws
    once for all blocks and slices -- same values, one threefry pass)."""
    r = pixels.shape[0]
    k_uni, k_gauss = jax.random.split(key)

    # --- directions -------------------------------------------------------
    raw_dir = geo.ray_directions(pixels, inv_K, normalize=False)
    unit_dir = raw_dir / jnp.linalg.norm(raw_dir, axis=-1, keepdims=True)
    viewdir_infer = geo.rotate_vectors(raw_dir, T_source2infer)  # [r, 3]

    # --- uniform stratified samples --------------------------------------
    pts_uni, dv_uni, sd_uni, _ = S.sample_rays_uniform(
        k_uni, pixels, inv_K, T_source2infer,
        cfg.n_pts_uni, cfg.min_sample_depth, cfg.max_sample_depth,
        method=cfg.sampling_method,
        full_rows=total_rows, row_offset=row_offset, noise=noise_uni,
    )

    # --- Gaussian mixture prediction at anchor points ---------------------
    anchors = S.gaussian_anchor_distances(cfg.n_gaussians, cfg.max_sample_depth)
    anchor_pts_src = anchors[None, :, None] * unit_dir[:, None, :]  # [r, G, 3]
    anchor_pts = geo.transform_points(anchor_pts_src, T_source2infer)

    vd_anchor = jnp.broadcast_to(
        viewdir_infer[:, None, :], (r, cfg.n_gaussians, 3)
    ).reshape(-1, 3)
    z_a, x_a = featurize_points(
        pyramid, anchor_pts.reshape(-1, 3), vd_anchor, cam_K, inv_K, cfg.sphere,
        cfg.n_pe_freqs, gather_impl=cfg.featurize_gather,
    )
    offsets = gaussian_fn(z_a, x_a).reshape(r, cfg.n_gaussians, 2)
    g_means, g_stds = gaussian_params_from_offsets(
        offsets, anchors, cfg.std, cfg.mean_std_floor
    )  # [r, G] each

    # --- sample the mixture ------------------------------------------------
    pts_g, dv_g, sd_g = S.sample_rays_gaussian(
        k_gauss, unit_dir, T_source2infer, g_means, g_stds,
        cfg.n_pts_per_gaussian, cfg.min_clamp_depth,
        full_rows=total_rows, row_offset=row_offset, noise=noise_gauss,
    )

    # --- merge + sort -------------------------------------------------------
    if cfg.n_pts_uni > 0:
        pts = jnp.concatenate([pts_uni, pts_g], axis=1)
        dv = jnp.concatenate([dv_uni, dv_g], axis=1)
        sd = jnp.concatenate([sd_uni, sd_g], axis=1)
    else:
        pts, dv, sd = pts_g, dv_g, sd_g
    sd, dv, pts = S.sort_samples_by_distance(sd, dv, pts)

    # --- field evaluation (positions detached, ref scenerf.py:661-665) ----
    P = sd.shape[1]
    vd = jnp.broadcast_to(viewdir_infer[:, None, :], (r, P, 3)).reshape(-1, 3)

    def field_eval(pyr, pts_flat, vd_flat):
        z, x_in = featurize_points(
            pyr, pts_flat, vd_flat, cam_K, inv_K,
            cfg.sphere, cfg.n_pe_freqs, gather_impl=cfg.featurize_gather,
        )
        return radiance_outputs(field_fn(z, x_in))

    if cfg.remat_field:
        # Save only the [N, 4] field outputs; the [N, d_latent] gather concat
        # and the MLP hiddens (the largest render residuals) are recomputed in
        # the backward pass. pyramid/pts are live regardless, so peak saved
        # memory drops by ~d_latent+d_hidden per sample point.
        field_eval = jax.checkpoint(field_eval)
    density, rgb = field_eval(
        pyramid, jax.lax.stop_gradient(pts.reshape(-1, 3)), vd)
    density = density.reshape(r, P)
    rgb = rgb.reshape(r, P, 3)

    out = composite(density, sd, dv, rgb)

    som = ray_som(
        g_means, g_stds, sd, out["alphas"],
        som_sigma=cfg.som_sigma,
        mask_threshold=cfg.som_mask_threshold,
        std_floor=cfg.kl_std_floor,
    )
    out["loss_kl"] = som.loss_kl
    out["som_vars"] = som.new_vars
    out["gaussian_means"] = g_means
    out["gaussian_stds"] = g_stds
    return out


def render_rays(
    key: jax.Array,
    pixels: jnp.ndarray,  # [R, 2]
    pyramid: FeaturePyramid,
    cam_K: jnp.ndarray,
    T_source2infer: jnp.ndarray,
    field_fn: FieldFn,
    gaussian_fn: FieldFn,
    cfg: SceneRFConfig,
    ray_chunk: Optional[int] = None,
    remat: Optional[bool] = None,
    row_offset: jnp.ndarray | int = 0,
    total_rows: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Render R rays in fixed-size blocks (ref render_rays_batch,
    scenerf.py:392-471).

    R must be a multiple of the chosen block size; callers pad+mask (see
    `pad_rays`). Blocks run under `lax.map`; with remat=True each block is
    `jax.checkpoint`ed so the backward pass trades recompute for memory --
    the TPU replacement for the reference's serial 100-ray chunking.

    Per-ray noise depends only on the global ray index (shared key + row
    slicing, see render_ray_block): the output is bit-identical for any chunk
    size, and a caller holding a slice of a larger ray batch (ray_shard)
    passes row_offset/total_rows to reproduce exactly the rays the unsharded
    step would render.
    """
    inv_K = jnp.linalg.inv(cam_K)
    chunk = ray_chunk or cfg.ray_chunk
    R = pixels.shape[0]
    total = total_rows if total_rows is not None else R

    # one threefry pass for ALL blocks (values identical to per-block draws
    # at the corresponding row offsets -- row_noise slices one full draw)
    k_uni, k_gauss = jax.random.split(key)
    noise_uni = S.row_noise(k_uni, R, cfg.n_pts_uni, total, row_offset)
    noise_gauss = S.row_noise(
        k_gauss, R, cfg.n_gaussians * cfg.n_pts_per_gaussian,
        total, row_offset, dist="normal")

    def block(args):
        pix, nu, ng = args
        return render_ray_block(
            key, pix, pyramid, cam_K, inv_K, T_source2infer,
            field_fn, gaussian_fn, cfg,
            noise_uni=nu, noise_gauss=ng,
        )

    if R <= chunk:
        return block((pixels, noise_uni, noise_gauss))

    if R % chunk != 0:
        raise ValueError(f"n_rays={R} not a multiple of ray_chunk={chunk}")
    n_blocks = R // chunk
    pix_blocks = pixels.reshape(n_blocks, chunk, 2)
    nu_blocks = noise_uni.reshape(n_blocks, chunk, -1)
    ng_blocks = noise_gauss.reshape(n_blocks, chunk, -1)

    fn = block
    if remat if remat is not None else cfg.remat_chunks:
        fn = jax.checkpoint(block)
    out = jax.lax.map(fn, (pix_blocks, nu_blocks, ng_blocks))
    # [n_blocks, chunk, ...] -> [R, ...]
    return jax.tree_util.tree_map(
        lambda a: a.reshape(R, *a.shape[2:]), out
    )


def pad_rays(pixels: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad [R, 2] pixels up to a multiple of `chunk`; returns (padded, mask)."""
    R = pixels.shape[0]
    pad = (-R) % chunk
    if pad == 0:
        return pixels, jnp.ones((R,), dtype=bool)
    padded = jnp.concatenate([pixels, jnp.zeros((pad, 2), pixels.dtype)], axis=0)
    mask = jnp.concatenate([jnp.ones((R,), bool), jnp.zeros((pad,), bool)])
    return padded, mask
