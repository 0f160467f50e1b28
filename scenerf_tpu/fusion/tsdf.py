"""Volumetric TSDF fusion of rendered RGB-D frames, as one batched XLA program.

Contract: ref scenerf/data/utils/fusion.py. The reference has two divergent
native paths: an inline CUDA kernel doing a weighted running average of
truncated distances (ref fusion.py:72-145) and the numba CPU path the published
reconstruction pipeline actually exercises, which keeps the *minimum-|distance|*
signed distance in meters (ref fusion.py:200-217, :262-325). The evaluation
thresholds (ref eval_sr.py:11-17) are in meters, so the min-|dist| semantics is
the behavior contract -- implemented here as mode="closest"; the CUDA kernel's
averaging semantics is available as mode="average".

TPU design: one `integrate` step is a fused gather + elementwise update over
the whole voxel grid (2.1M voxels for KITTI); a frame *sequence* is integrated
with `lax.scan` on-device (integrate_frames), so fusing the ~63-pose sweep is a
single XLA launch instead of 63 python calls.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

COLOR_CONST = 256.0 * 256.0


def pack_colors(color_im: np.ndarray) -> np.ndarray:
    """RGB [H, W, 3] (0..255 floats) -> packed single channel B*65536+G*256+R
    (ref fusion.py:232-234)."""
    c = np.floor(color_im.astype(np.float32))
    return np.floor(c[..., 2] * COLOR_CONST + c[..., 1] * 256.0 + c[..., 0])


def unpack_colors(packed: np.ndarray) -> np.ndarray:
    """Packed channel -> [..., 3] uint8-ish floats (r, g, b)."""
    b = np.floor(packed / COLOR_CONST)
    g = np.floor((packed - b * COLOR_CONST) / 256.0)
    r = packed - b * COLOR_CONST - g * 256.0
    return np.stack([r, g, b], axis=-1)


@functools.partial(jax.jit, static_argnames=("mode",))
def _integrate_one(
    tsdf: jnp.ndarray,      # [X, Y, Z]
    weight: jnp.ndarray,    # [X, Y, Z]
    color: jnp.ndarray,     # [X, Y, Z] packed
    depth_im: jnp.ndarray,  # [H, W]
    color_packed: jnp.ndarray,  # [H, W]
    cam_intr: jnp.ndarray,  # [3, 3]
    world2cam: jnp.ndarray,  # [4, 4] (inverse of the reference's cam_pose)
    vol_origin: jnp.ndarray,  # [3]
    voxel_size: float,
    trunc_margin: float,
    obs_weight: float,
    mode: str = "closest",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    X, Y, Z = tsdf.shape
    H, W = depth_im.shape

    gx = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 0)
    gy = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 1)
    gz = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 2)
    wx = vol_origin[0] + gx * voxel_size
    wy = vol_origin[1] + gy * voxel_size
    wz = vol_origin[2] + gz * voxel_size

    R, t = world2cam[:3, :3], world2cam[:3, 3]
    cx = R[0, 0] * wx + R[0, 1] * wy + R[0, 2] * wz + t[0]
    cy = R[1, 0] * wx + R[1, 1] * wy + R[1, 2] * wz + t[1]
    cz = R[2, 0] * wx + R[2, 1] * wy + R[2, 2] * wz + t[2]

    safe_z = jnp.where(cz > 0, cz, 1.0)
    px = jnp.round(cam_intr[0, 0] * cx / safe_z + cam_intr[0, 2]).astype(jnp.int32)
    py = jnp.round(cam_intr[1, 1] * cy / safe_z + cam_intr[1, 2]).astype(jnp.int32)
    in_fov = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (cz > 0)

    pxc = jnp.clip(px, 0, W - 1)
    pyc = jnp.clip(py, 0, H - 1)
    flat_idx = (pyc * W + pxc).reshape(-1)
    depth_val = jnp.where(
        in_fov, jnp.take(depth_im.reshape(-1), flat_idx).reshape(X, Y, Z), 0.0
    )
    new_col = jnp.take(color_packed.reshape(-1), flat_idx).reshape(X, Y, Z)

    depth_diff = depth_val - cz
    valid = (depth_val > 0) & (depth_diff >= -trunc_margin)

    if mode == "closest":
        # keep the signed distance of smallest magnitude (ref fusion.py:209-217)
        replace = jnp.abs(tsdf) >= jnp.abs(depth_diff)
        take = valid & replace
        new_tsdf = jnp.where(take, depth_diff, tsdf)
        new_color = jnp.where(take, new_col, color)
        new_weight = weight + jnp.where(valid, obs_weight, 0.0)
    elif mode == "average":
        # CUDA-kernel semantics: truncated, weighted running average
        # (ref fusion.py:121-144)
        dist = jnp.minimum(1.0, depth_diff / trunc_margin)
        w_new = weight + obs_weight
        avg = (tsdf * weight + obs_weight * dist) / w_new
        new_tsdf = jnp.where(valid, avg, tsdf)
        new_weight = jnp.where(valid, w_new, weight)
        old_rgb = jnp.stack(
            [color % 256.0,
             jnp.floor(color / 256.0) % 256.0,
             jnp.floor(color / COLOR_CONST)], -1)
        new_rgb = jnp.stack(
            [new_col % 256.0,
             jnp.floor(new_col / 256.0) % 256.0,
             jnp.floor(new_col / COLOR_CONST)], -1)
        mixed = jnp.minimum(
            jnp.round((old_rgb * weight[..., None] + obs_weight * new_rgb)
                      / w_new[..., None]), 255.0)
        packed = (mixed[..., 2] * COLOR_CONST + mixed[..., 1] * 256.0
                  + mixed[..., 0])
        new_color = jnp.where(valid, packed, color)
    else:
        raise ValueError(mode)
    return new_tsdf, new_weight, new_color


@functools.partial(jax.jit, static_argnames=("mode",))
def _integrate_frames(
    tsdf, weight, color,
    depths,          # [F, H, W]
    colors_packed,   # [F, H, W]
    cam_intrs,       # [F, 3, 3]
    world2cams,      # [F, 4, 4]
    vol_origin, voxel_size, trunc_margin, obs_weight,
    mode: str = "closest",
):
    def body(carry, xs):
        tsdf, weight, color = carry
        depth_im, col, K, w2c = xs
        out = _integrate_one(tsdf, weight, color, depth_im, col, K, w2c,
                             vol_origin, voxel_size, trunc_margin, obs_weight,
                             mode=mode)
        return out, None

    (tsdf, weight, color), _ = jax.lax.scan(
        body, (tsdf, weight, color),
        (depths, colors_packed, cam_intrs, world2cams))
    return tsdf, weight, color


class TSDFVolume:
    """Drop-in equivalent of the reference TSDFVolume (ref fusion.py:20-379),
    holding device-resident volumes and integrating frames with XLA."""

    def __init__(self, vol_bnds, voxel_size: float, trunc_margin: float = 10.0,
                 mode: str = "closest"):
        vol_bnds64 = np.asarray(vol_bnds, dtype=np.float64)
        assert vol_bnds64.shape == (3, 2)
        self._voxel_size = float(voxel_size)
        self._trunc_margin = float(trunc_margin)
        self.mode = mode
        # dims from the float64 caller bounds: casting to f32 first turns
        # 4.8/0.04 into 120.00001 -> ceil 121, off-by-one vs the reference's
        # 120x120x96 BF / 256x256x32 KITTI grids (ref fusion.py:39)
        self._vol_dim = np.ceil(
            (vol_bnds64[:, 1] - vol_bnds64[:, 0]) / self._voxel_size
        ).astype(int)
        vol_bnds = vol_bnds64.astype(np.float32)
        vol_bnds[:, 1] = vol_bnds[:, 0] + self._vol_dim * self._voxel_size
        self._vol_origin = vol_bnds[:, 0].copy()
        self._vol_bnds = vol_bnds

        shape = tuple(self._vol_dim)
        # out-of-view sentinel 255 (ref fusion.py:55)
        self._tsdf = jnp.full(shape, 255.0, jnp.float32)
        self._weight = jnp.zeros(shape, jnp.float32)
        self._color = jnp.zeros(shape, jnp.float32)

    # -------------------------------------------------------------- integrate
    def integrate(self, color_im, depth_im, cam_intr, cam_pose, obs_weight=1.0):
        """Integrate one RGB-D frame. cam_pose is camera->world (as in the
        reference); it is inverted once here."""
        packed = jnp.asarray(pack_colors(np.asarray(color_im)))
        self._tsdf, self._weight, self._color = _integrate_one(
            self._tsdf, self._weight, self._color,
            jnp.asarray(depth_im, jnp.float32), packed,
            jnp.asarray(cam_intr, jnp.float32),
            jnp.asarray(np.linalg.inv(np.asarray(cam_pose)), jnp.float32),
            jnp.asarray(self._vol_origin), self._voxel_size,
            self._trunc_margin, float(obs_weight), mode=self.mode,
        )

    def integrate_frames(self, color_ims, depth_ims, cam_intrs, cam_poses,
                         obs_weight=1.0):
        """Integrate a whole frame stack in one on-device scan."""
        packed = jnp.asarray(
            np.stack([pack_colors(np.asarray(c)) for c in color_ims]))
        w2cs = jnp.asarray(
            np.stack([np.linalg.inv(np.asarray(p)) for p in cam_poses]),
            jnp.float32)
        self._tsdf, self._weight, self._color = _integrate_frames(
            self._tsdf, self._weight, self._color,
            jnp.asarray(depth_ims, jnp.float32), packed,
            jnp.asarray(cam_intrs, jnp.float32), w2cs,
            jnp.asarray(self._vol_origin), self._voxel_size,
            self._trunc_margin, float(obs_weight), mode=self.mode,
        )

    # ------------------------------------------------------------------- read
    def get_volume(self) -> Tuple[np.ndarray, np.ndarray]:
        return np.asarray(self._tsdf), np.asarray(self._color)

    def get_point_cloud(self):
        from scenerf_tpu.fusion.meshing import marching_cubes
        tsdf_vol, color_vol = self.get_volume()
        verts, faces, norms = marching_cubes(tsdf_vol, level=0.0)
        ind = np.round(verts).astype(int)
        ind = np.clip(ind, 0, np.asarray(tsdf_vol.shape) - 1)
        colors = unpack_colors(color_vol[ind[:, 0], ind[:, 1], ind[:, 2]])
        verts = verts * self._voxel_size + self._vol_origin
        return verts, colors.astype(np.uint8)

    def get_mesh(self, mask: Optional[np.ndarray] = None):
        """Marching-cubes mesh (world coords) + per-vertex colors
        (ref fusion.py:356-379)."""
        from scenerf_tpu.fusion.meshing import marching_cubes
        tsdf_vol, color_vol = self.get_volume()
        if mask is not None:
            tsdf_vol = tsdf_vol.copy()
            tsdf_vol[~mask.reshape(tsdf_vol.shape).astype(bool)] = 1.0
        verts, faces, norms = marching_cubes(tsdf_vol, level=0.0)
        ind = np.round(verts).astype(int)
        ind = np.clip(ind, 0, np.asarray(tsdf_vol.shape) - 1)
        colors = unpack_colors(color_vol[ind[:, 0], ind[:, 1], ind[:, 2]])
        verts = verts * self._voxel_size + self._vol_origin
        return verts, faces, norms, colors.astype(np.uint8)


def tsdf2occ_bf(tsdf: np.ndarray, min_th: float, th: float = 0.25,
                max_th: float = 0.2, voxel_size: float = 0.04) -> np.ndarray:
    """BundleFusion occupancy threshold ramped along the z (height) axis
    (ref eval_sc_bf.py:15-21)."""
    Z = tsdf.shape[2]
    ramp = voxel_size + np.arange(Z).reshape(1, 1, Z) * voxel_size * th
    ramp = np.clip(ramp, min_th, max_th)
    occ = np.zeros(tsdf.shape, dtype=np.float32)
    occ[(np.abs(tsdf) < ramp) & (np.abs(tsdf) != 255)] = 1
    return occ


def tsdf_to_gt_occupancy(tsdf: np.ndarray, voxel_size: float) -> np.ndarray:
    """Fused-depth GT occupancy: 255 unknown, 0 free, 1 surface
    (ref generate_sc_gt_bf.py:88-92)."""
    occ = np.full_like(tsdf, 255.0)
    occ[(tsdf > voxel_size) & (tsdf != 255)] = 0
    occ[(np.abs(tsdf) < voxel_size) & (tsdf != 255)] = 1
    return occ


def tsdf2occ(tsdf: np.ndarray, th: float, max_th: float = 4.0,
             voxel_size: float = 0.2) -> np.ndarray:
    """TSDF -> occupancy with a distance-ramped threshold along the x (forward)
    axis (ref eval_sr.py:11-17): threshold grows with distance from the sensor,
    clamped to [0.2, max_th]; 255 marks never-observed voxels."""
    X = tsdf.shape[0]
    ramp = (0.1 + np.arange(X).reshape(X, 1, 1) * voxel_size) * th
    ramp = np.clip(ramp, 0.2, max_th)
    occ = np.zeros(tsdf.shape, dtype=np.float32)
    occ[(np.abs(tsdf) < ramp) & (np.abs(tsdf) != 255)] = 1
    return occ
