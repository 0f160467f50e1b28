"""Pure-jnp camera geometry, bilinear image sampling and spherical mapping.

TPU-first counterparts of the reference's torch geometry helpers
(ref scenerf/models/utils.py:177-315 and scenerf/models/spherical_mapping.py).
Everything here is shape-static, differentiable where meaningful, and safe under
jit/vmap: data-dependent masks are value-level (`jnp.where`), never boolean
indexing.

Conventions
-----------
* pixels are (x, y) pairs, float32, origin at the top-left pixel *center*
* camera intrinsics K are 3x3, poses T are 4x4 (row-major, applied as T @ p)
* images are channel-last [H, W, C] (TPU-friendly: C on the 128-lane axis)
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu.config import SphereConfig

# --------------------------------------------------------------------------- #
# Basic projective geometry
# --------------------------------------------------------------------------- #

# 3x3/4x4 transforms are tiny but precision-critical: force full-f32 matmuls so
# the MXU's default bf16 accumulation never corrupts projections.
_HI = jax.lax.Precision.HIGHEST


def apply_matrix(pts: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """(M @ p) for batched points: [..., D] x [E, D] -> [..., E], full precision."""
    return jnp.einsum("...i,ji->...j", pts, M, precision=_HI)


def homogenize(pts: jnp.ndarray) -> jnp.ndarray:
    """[..., D] -> [..., D+1] with a trailing 1."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def pix_2_cam_pts(pix: jnp.ndarray, inv_K: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Unproject pixels to camera-frame points at the given z-depth.

    pix: [..., 2], inv_K: [3, 3], depth: [...]. Matches ref models/utils.py:285-295:
    the unprojected direction (inv_K @ [x, y, 1]) is scaled by `depth`, so `depth`
    is the z-coordinate (K has unit third row in practice).
    """
    dirs = apply_matrix(homogenize(pix), inv_K[:3, :3])  # [..., 3]
    return dirs * depth[..., None]


def cam_pts_2_pix(cam_pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points to pixels; points behind the camera map to -1.

    Matches ref models/utils.py:298-315 (pix = -1 where z <= 0, exact division
    where z > 0).
    """
    homo = apply_matrix(cam_pts, K)  # [..., 3]
    z = homo[..., 2:3]
    valid = z > 0
    safe_z = jnp.where(valid, z, 1.0)
    pix = homo[..., :2] / safe_z
    return jnp.where(valid, pix, -1.0)


def transform_points(pts: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid/affine transform to [..., 3] points
    (ref models/utils.py:272-282)."""
    return apply_matrix(homogenize(pts), T[:3, :4])


def rotate_vectors(vecs: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation part of a 4x4 transform to [..., 3] vectors."""
    return apply_matrix(vecs, T[:3, :3])


def ray_directions(pix: jnp.ndarray, inv_K: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Back-projected ray direction per pixel (ref models/utils.py:177-182).

    Returns unit directions if `normalize` else the raw inv_K @ [x, y, 1].
    """
    dirs = apply_matrix(homogenize(pix), inv_K[:3, :3])
    if normalize:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs


def depth2disp(depth: jnp.ndarray, min_depth: float = 0.1, max_depth: float = 100.0) -> jnp.ndarray:
    """Depth -> disparity (ref models/utils.py:319-328, including its
    un-parenthesized normalization quirk, reproduced faithfully)."""
    depth = jnp.clip(depth, min_depth, max_depth)
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    return 1.0 / depth - min_disp / (max_disp - min_disp)


# --------------------------------------------------------------------------- #
# Bilinear sampling (torch grid_sample parity, zero padding, align_corners=False)
# --------------------------------------------------------------------------- #


def bilinear_sample(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample `img` [H, W, C] at continuous pixel coords (ix, iy) [N].

    Out-of-bounds corner taps contribute zero (torch grid_sample
    padding_mode="zeros"). Implemented as four flat row-gathers so XLA lowers it
    to efficient TPU gathers over the [H*W, C] layout.
    """
    H, W, C = img.shape
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(H * W, C)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        vals = jnp.take(flat, yc * W + xc, axis=0)  # [N, C]
        return vals * inb[:, None].astype(img.dtype)

    v00 = tap(x0i, y0i)
    v10 = tap(x0i + 1, y0i)
    v01 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)

    wx = wx[:, None].astype(img.dtype)
    wy = wy[:, None].astype(img.dtype)
    top = v00 * (1 - wx) + v10 * wx
    bot = v01 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_norm(img: jnp.ndarray, grid_xy: jnp.ndarray,
                     impl: str = "taps") -> jnp.ndarray:
    """torch.grid_sample(align_corners=False, padding zeros) over [H, W, C].

    grid_xy: [N, 2] normalized coords in [-1, 1]. Returns [N, C].
    impl: "taps" (4 row-gathers), "win2" (windowed gather/scatter custom
    VJP) or "mm" (taps forward + one-hot-matmul d_img backward for small
    maps, ops/gather_scatter.py) -- bit-identical results in f32.
    """
    H, W, _ = img.shape
    ix = ((grid_xy[:, 0] + 1.0) * W - 1.0) * 0.5
    iy = ((grid_xy[:, 1] + 1.0) * H - 1.0) * 0.5
    if impl == "win2":
        from scenerf_tpu.ops.gather_scatter import bilinear_sample_w2
        return bilinear_sample_w2(img, ix, iy)
    if impl == "mm":
        from scenerf_tpu.ops.gather_scatter import bilinear_sample_mm
        return bilinear_sample_mm(img, ix, iy)
    if impl == "mmseg":
        from scenerf_tpu.ops.gather_scatter import bilinear_sample_mmseg
        return bilinear_sample_mmseg(img, ix, iy)
    return bilinear_sample(img, ix, iy)


def sample_feats_2d(feat: jnp.ndarray, pix: jnp.ndarray, norm_wh: Tuple[int, int],
                    impl: str = "taps") -> jnp.ndarray:
    """Sample features at pixel coords, normalizing by a caller-provided (W, H).

    feat: [H, W, C]; pix: [N, 2]. Mirrors ref models/utils.py:232-247, where the
    coords are normalized by the *nominal* grid size (which can differ by one
    pixel from the actual feature map at rounded pyramid scales).
    """
    norm = jnp.asarray(norm_wh, dtype=pix.dtype)
    grid = (pix / norm) * 2.0 - 1.0
    return grid_sample_norm(feat, grid, impl=impl)


def sample_pix_features(pix: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample image colors at pixel coords (ref models/utils.py:250-269).

    img: [H, W, C]; pix: [N, 2]. The reference normalizes by (size - 1), so the
    effective sample point is pix * size/(size-1) - 0.5; reproduced exactly.
    Returns [N, C].
    """
    H, W, _ = img.shape
    gx = (pix[:, 0] / (W - 1) - 0.5) * 2.0
    gy = (pix[:, 1] / (H - 1) - 0.5) * 2.0
    return grid_sample_norm(img, jnp.stack([gx, gy], axis=-1))


# --------------------------------------------------------------------------- #
# Spherical (equirectangular) mapping
# --------------------------------------------------------------------------- #


def cam_pts_2_angles(cam_pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Camera-frame points -> (v_angle, h_angle, distance) in degrees.

    v_angle is measured against the -y axis (up), h_angle = 180 - atan2(z, x)
    against the +x axis (ref spherical_mapping.py:95-102).
    """
    x, y, z = cam_pts[..., 0], cam_pts[..., 1], cam_pts[..., 2]
    distance = jnp.linalg.norm(cam_pts, axis=-1)
    safe = jnp.maximum(distance, 1e-12)
    v_angle = jnp.arccos(jnp.clip(-y / safe, -1.0, 1.0)) / math.pi * 180.0
    h_angle = 180.0 - jnp.arctan2(z, x) / math.pi * 180.0
    return v_angle, h_angle, distance


def cam_pts_2_sphere_coords(
    cam_pts: jnp.ndarray, sphere: SphereConfig, round_coords: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame points -> spherical-grid pixel coords [..., 2] + distance.

    The reference rounds to integer grid cells (spherical_mapping.py:104-115);
    `round_coords=False` gives the continuous coords (useful for smoother
    feature lookups -- the rounded variant is the parity default).
    """
    v_angle, h_angle, distance = cam_pts_2_angles(cam_pts)
    proj_x = (h_angle - sphere.h_min) / sphere.h_fov
    proj_y = (v_angle - sphere.v_min) / sphere.v_fov
    coords = jnp.stack(
        [proj_x * (sphere.width - 1), proj_y * (sphere.height - 1)], axis=-1
    )
    if round_coords:
        coords = jnp.round(coords)
    return coords, distance


def pixel_grid(W: int, H: int, dtype=jnp.float32) -> jnp.ndarray:
    """All pixel coords of a WxH image as [W*H, 2] in 'xy' meshgrid order
    (x varies fastest along rows of the original grid; matches
    ref spherical_mapping.py:82-87 flattening)."""
    xs = jnp.arange(W, dtype=dtype)
    ys = jnp.arange(H, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def sphere_coords_from_pixels(
    inv_K: jnp.ndarray,
    sphere: SphereConfig,
    pix: jnp.ndarray | None = None,
    img_size: Tuple[int, int] | None = None,
    round_coords: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pixels -> spherical-grid coords (ref spherical_mapping.py:80-93).

    If `pix` is None, uses the full pixel grid of `img_size` (W, H). Returns
    (pix, sphere_coords, distance).
    """
    if pix is None:
        assert img_size is not None
        pix = pixel_grid(img_size[0], img_size[1], dtype=inv_K.dtype)
    cam_pts = pix_2_cam_pts(pix, inv_K, jnp.ones(pix.shape[:-1], dtype=pix.dtype))
    coords, distance = cam_pts_2_sphere_coords(cam_pts, sphere, round_coords=round_coords)
    return pix, coords, distance


def determine_angles(inv_K: np.ndarray, img_W: int, img_H: int) -> Dict[str, float]:
    """Min/max spherical angles of a camera's pixel grid.

    Host-side port of the reference FOV-calibration tool
    (ref scenerf/scripts/determine_angles.py); its output is what SphereConfig's
    base angles are set to.
    """
    pix = np.asarray(pixel_grid(img_W, img_H))
    cam_pts = np.asarray(homogenize(jnp.asarray(pix))) @ np.asarray(inv_K)[:3, :3].T
    v, h, _ = (np.asarray(t) for t in cam_pts_2_angles(jnp.asarray(cam_pts)))
    return {
        "v_angle_min": float(v.min()),
        "v_angle_max": float(v.max()),
        "h_angle_min": float(h.min()),
        "h_angle_max": float(h.max()),
    }


# --------------------------------------------------------------------------- #
# Novel-pose sweeps for reconstruction
# --------------------------------------------------------------------------- #


def _y_rotation_pose(step: float, angle_deg: float) -> np.ndarray:
    """rot_y(angle) @ translate_z(step), as the reference composes them
    (ref models/utils.py:29-49)."""
    rad = angle_deg / 180.0 * math.pi
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = step
    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = np.array(
        [
            [math.cos(rad), 0.0, math.sin(rad)],
            [0.0, 1.0, 0.0],
            [-math.sin(rad), 0.0, math.cos(rad)],
        ],
        dtype=np.float32,
    )
    return rot @ trans


def sample_rel_poses(
    step: float = 0.5, angle: float = 0.0, max_distance: float = 10.1
) -> Dict[Tuple[float, float], np.ndarray]:
    """KITTI-style synthetic pose sweep: forward steps x yaw angles {0, +a, -a}
    (ref models/utils.py:29-49). Returns {(step, angle): 4x4}."""
    angles: List[float] = [0.0] + ([angle, -angle] if angle != 0.0 else [])
    poses = {}
    for s in np.arange(0.0, max_distance, step):
        for a in angles:
            poses[(float(s), float(a))] = _y_rotation_pose(float(s), a)
    return poses


def sample_rel_poses_bf(
    angle: float = 0.0, max_distance: float = 2.1, step: float = 0.2
) -> Dict[Tuple[float, float], np.ndarray]:
    """BundleFusion-style sweep with angle order {0, -a, +a}
    (ref models/utils.py:6-26)."""
    angles: List[float] = [0.0] + ([-angle, angle] if angle != 0.0 else [])
    poses = {}
    for s in np.arange(0.0, max_distance, step):
        for a in angles:
            poses[(float(s), float(a))] = _y_rotation_pose(float(s), a)
    return poses


def rel_pose_stack(poses: Dict[Tuple[float, float], np.ndarray]) -> np.ndarray:
    """Stack a pose sweep dict into one [P, 4, 4] array for batched rendering."""
    return np.stack(list(poses.values()), axis=0)
