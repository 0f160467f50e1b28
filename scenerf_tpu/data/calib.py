"""Host-side KITTI IO helpers: calibration, odometry poses, RGB, LiDAR
projection, and voxel->pixel mapping.

Contract: ref scenerf/data/utils/helpers.py and
scenerf/data/semantic_kitti/kitti_dataset.py:200-229.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def read_rgb(path: str, crop_hw: Tuple[int, int] = (370, 1220)) -> np.ndarray:
    """RGB [H, W, 3] float in [0, 1], cropped to the KITTI training size
    (ref helpers.py:33-40)."""
    img = np.array(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return img[: crop_hw[0], : crop_hw[1], :]


def normalize_rgb(img: np.ndarray) -> np.ndarray:
    """ImageNet normalization (ref kitti_dataset.py:186-193); channel-last."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_rgb(img: np.ndarray) -> np.ndarray:
    return img * IMAGENET_STD + IMAGENET_MEAN


def read_poses(path: str) -> List[np.ndarray]:
    """KITTI odometry poses file -> list of 4x4 cam0->world transforms
    (ref helpers.py:43-53)."""
    poses = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            T = np.fromstring(line, dtype=np.float64, sep=" ").reshape(3, 4)
            poses.append(np.vstack([T, [0, 0, 0, 1]]))
    return poses


def read_calib(calib_path: str) -> Dict[str, np.ndarray]:
    """KITTI calib.txt -> {P2, Tr, T_cam0_2_cam2} (ref helpers.py:56-80)."""
    raw = {}
    with open(calib_path) as f:
        for line in f:
            if line == "\n":
                break
            key, value = line.split(":", 1)
            raw[key] = np.array([float(x) for x in value.split()])
    out = {}
    out["P2"] = raw["P2"].reshape(3, 4)
    out["Tr"] = np.eye(4)
    out["Tr"][:3, :4] = raw["Tr"].reshape(3, 4)
    T2 = np.eye(4)
    T2[0, 3] = out["P2"][0, 3] / out["P2"][0, 0]
    out["T_cam0_2_cam2"] = T2
    return out


def dump_xyz(T: np.ndarray) -> np.ndarray:
    return T[0:3, 3]


def apply_transform(pts: np.ndarray, T: np.ndarray) -> np.ndarray:
    homo = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=1)
    return (T @ homo.T).T[:, :3]


def lidar_to_depth(
    lidar_points: np.ndarray,  # [N, >=3] velodyne xyz
    P: np.ndarray,             # [3, 4] projection (P2)
    T_velo_2_cam: np.ndarray,  # [4, 4]
    image_size: Tuple[int, int],  # (W, H)
    max_depth: float = 80.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Project LiDAR into the image: returns (pixels [M, 2] int, depths [M],
    cam_pts [M, 3]) for forward points within the image and depth range
    (ref kitti_dataset.py:200-229, incl. its strict >0 bounds check)."""
    pts = lidar_points[:, :3]
    keep = pts[:, 0] > 0
    cam = apply_transform(pts[keep], T_velo_2_cam)
    mask = (cam[:, 2] > 0) & (cam[:, 2] <= max_depth)
    cam = cam[mask]
    img_pts = (P[:3, :3] @ cam.T).T
    img_pts = np.round(img_pts[:, :2] / img_pts[:, 2:3]).astype(int)
    W, H = image_size
    inb = (img_pts[:, 0] > 0) & (img_pts[:, 1] > 0) & \
          (img_pts[:, 0] < W) & (img_pts[:, 1] < H)
    return img_pts[inb], cam[inb][:, 2], cam[inb]


def read_lidar(path: str) -> np.ndarray:
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def vox2pix(
    cam_E: np.ndarray,
    cam_K: np.ndarray,
    vox_origin: np.ndarray,
    voxel_size: float,
    img_W: int,
    img_H: int,
    scene_size,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """2D projection of voxel centroids + FOV mask + sensor distance
    (ref helpers.py:123-192, numba kernels replaced by vectorized numpy)."""
    vox_origin = np.asarray(vox_origin, dtype=np.float32)
    vol_dim = np.ceil(np.asarray(scene_size) / voxel_size).astype(int)
    xv, yv, zv = np.meshgrid(*(np.arange(d) for d in vol_dim), indexing="ij")
    coords = np.stack([xv, yv, zv], axis=-1).reshape(-1, 3).astype(np.float32)
    world = vox_origin[None] + coords * voxel_size
    cam = apply_transform(world, cam_E)
    z = cam[:, 2]
    safe_z = np.where(z != 0, z, 1.0)
    fx, fy = cam_K[0, 0], cam_K[1, 1]
    cx, cy = cam_K[0, 2], cam_K[1, 2]
    pix = np.stack(
        [np.round(cam[:, 0] * fx / safe_z + cx),
         np.round(cam[:, 1] * fy / safe_z + cy)], axis=-1
    ).astype(np.int64)
    fov_mask = (pix[:, 0] >= 0) & (pix[:, 0] < img_W) & \
               (pix[:, 1] >= 0) & (pix[:, 1] < img_H) & (z > 0)
    return pix, fov_mask, z
