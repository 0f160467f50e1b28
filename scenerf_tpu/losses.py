"""Training losses and in-graph depth metrics.

Contract: ref scenerf/loss/ss_loss.py, scenerf/loss/depth_metrics.py, and the
loss assembly in scenerf/models/scenerf.py:203-386. All losses are fixed-shape
with value-level masks (never boolean indexing) so they jit cleanly.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from scenerf_tpu import geometry as geo


def l1_color_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-ray L1 color loss, mean over channels (ref ss_loss.py:4-19).
    pred/target: [R, 3] -> [R]."""
    return jnp.abs(target - pred).mean(axis=-1)


def reprojection_loss(
    key: jax.Array,
    pix_source: jnp.ndarray,       # [R, 2]
    color_source: jnp.ndarray,     # [R, 3] colors sampled at pix_source
    depth_rendered: jnp.ndarray,   # [R] (carries gradient)
    img_target: jnp.ndarray,       # [H, W, 3]
    inv_K: jnp.ndarray,
    cam_K: jnp.ndarray,
    T_source2target: jnp.ndarray,
    full_rows: int | None = None,
    row_offset: jnp.ndarray | int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """monodepth2-style min(reprojection, identity) L1 loss
    (ref scenerf.py:349-386).

    Warps source pixels into the target view using the rendered depth, compares
    the source color against (a) target color at the warped pixel and (b) target
    color at the unwarped pixel (identity reprojection, + tiny noise to break
    ties), and takes the per-ray minimum. Returns (loss [R], valid_mask [R])
    where valid = warped point in front of the target camera; the reference
    drops invalid rays via boolean indexing -- here callers take a masked mean.

    full_rows/row_offset make the tie-break noise a function of the global ray
    index (sampling.row_noise) so sharded ray slices match the unsharded step.
    """
    cam_src = geo.pix_2_cam_pts(pix_source, inv_K, depth_rendered)
    cam_tgt = geo.transform_points(cam_src, T_source2target)
    pix_tgt = geo.cam_pts_2_pix(cam_tgt, cam_K)
    valid = cam_tgt[:, 2] > 0

    color_tgt = geo.sample_pix_features(pix_tgt, img_target)
    color_identity = geo.sample_pix_features(pix_source, img_target)

    loss_re = l1_color_loss(color_source, color_tgt)
    loss_id = l1_color_loss(color_source, color_identity)
    from scenerf_tpu.sampling import row_noise
    noise = row_noise(key, loss_id.shape[0], 1, full_rows, row_offset,
                      dist="normal")[:, 0]
    loss_id = loss_id + noise * 1e-5
    return jnp.minimum(loss_re, loss_id), valid


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-8,
                axis_name: str | None = None) -> jnp.ndarray:
    """Mean of x over mask. With `axis_name`, numerator and denominator are
    psum'd across the mesh axis first, so sharded rays reproduce the exact
    unsharded masked mean (valid counts can differ per shard)."""
    m = mask.astype(x.dtype)
    num = jnp.sum(x * m)
    den = jnp.sum(m)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, eps)


def dist2closest_gaussian(
    gaussian_means: jnp.ndarray,  # [R, G]
    gaussian_stds: jnp.ndarray,   # [R, G]
    som_vars: jnp.ndarray,        # [R, G]
    depth_rendered: jnp.ndarray,  # [R]
) -> Dict[str, jnp.ndarray]:
    """|closest gaussian mean - rendered depth| + the matching std/som-var logs
    (ref scenerf.py:290-300). Depth is detached, means carry gradient."""
    diff = jnp.abs(gaussian_means - jax.lax.stop_gradient(depth_rendered)[:, None])
    idx = jnp.argmin(diff, axis=1)
    return {
        "loss_dist2closest_gauss": jnp.min(diff, axis=1),
        "min_stds": jnp.take_along_axis(gaussian_stds, idx[:, None], axis=1)[:, 0],
        "min_som_vars": jnp.take_along_axis(som_vars, idx[:, None], axis=1)[:, 0],
    }


# --------------------------------------------------------------------------- #
# Depth metrics (Eigen), jnp version for in-graph logging
# --------------------------------------------------------------------------- #


def depth_metrics(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    min_depth: float = 1e-3,
    max_depth: float = 80.0,
    axis_name: str | None = None,
) -> Dict[str, jnp.ndarray]:
    """abs_rel / sq_rel / rmse / rmse_log / a1 / a2 / a3
    (ref loss/depth_metrics.py:3-23), with an optional validity mask for padded
    GT pixels. Predictions are clamped to [min_depth, max_depth].

    With `axis_name`, each mean psums its numerator/denominator across the
    mesh axis, so metrics over GT rows sharded across devices reproduce the
    unsharded metrics (rmse/rmse_log take the sqrt AFTER the global mean)."""
    pred = jnp.clip(pred, min_depth, max_depth)
    if mask is None:
        mask = jnp.ones_like(gt, dtype=bool)
    gt_safe = jnp.where(mask, gt, 1.0)

    def mmean(x):
        return masked_mean(x, mask, axis_name=axis_name)

    thresh = jnp.maximum(gt_safe / pred, pred / gt_safe)
    out = {
        "a1": mmean((thresh < 1.25).astype(jnp.float32)),
        "a2": mmean((thresh < 1.25 ** 2).astype(jnp.float32)),
        "a3": mmean((thresh < 1.25 ** 3).astype(jnp.float32)),
        "rmse": jnp.sqrt(mmean((gt_safe - pred) ** 2)),
        "rmse_log": jnp.sqrt(
            mmean((jnp.log(gt_safe) - jnp.log(pred)) ** 2)
        ),
        "abs_rel": mmean(jnp.abs(gt_safe - pred) / gt_safe),
        "sq_rel": mmean((gt_safe - pred) ** 2 / gt_safe),
    }
    return out


DEPTH_METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
