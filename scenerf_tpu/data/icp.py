"""ICP pose refinement for KITTI preprocessing, with the reference's on-disk
pickle cache layout.

Contract: ref scenerf/data/utils/helpers.py:83-119 (voxel-downsample 0.05 m,
point-to-point ICP, max corr 0.2 m, 200 iters, initialized at identity on
pre-transformed clouds) and ref kitti_dataset.py:298-338 (cache at
{preprocess}/transform/{seq}_{interval}_all/{frame}.pkl keyed by source id).
The registration itself runs in native C++ (scenerf_tpu/native/icp.cpp).
"""
from __future__ import annotations

import ctypes
import os
import pickle
from typing import Dict

import numpy as np

from scenerf_tpu.data.calib import apply_transform, read_lidar
from scenerf_tpu.native.build import load


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Average points per voxel cell (open3d voxel_down_sample semantics)."""
    coords = np.floor(points / voxel_size).astype(np.int64)
    # unique cells -> mean of member points
    _, inv, counts = np.unique(coords, axis=0, return_inverse=True,
                               return_counts=True)
    sums = np.zeros((counts.shape[0], 3), dtype=np.float64)
    np.add.at(sums, inv, points)
    return (sums / counts[:, None]).astype(np.float32)


def icp_point_to_point(
    source: np.ndarray,
    target: np.ndarray,
    max_correspondence: float = 0.2,
    max_iteration: int = 200,
) -> np.ndarray:
    """Point-to-point ICP; returns the 4x4 transform aligning source->target."""
    lib = load()
    lib.icp_register.restype = ctypes.c_double
    lib.icp_register.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    src = np.ascontiguousarray(source, dtype=np.float32)
    tgt = np.ascontiguousarray(target, dtype=np.float32)
    T = np.eye(4, dtype=np.float64)
    lib.icp_register(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(src),
        tgt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(tgt),
        float(max_correspondence), int(max_iteration),
        T.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return T


def compute_transformation(
    lidar_path_source: str,
    lidar_path_infer: str,
    lidar_path_target: str,
    pose_source: np.ndarray,
    pose_infer: np.ndarray,
    pose_target: np.ndarray,
    T_velo_2_cam2: np.ndarray,
    T_cam0_2_cam2: np.ndarray,
) -> Dict[str, np.ndarray]:
    """Odometry-derived relative transforms refined by ICP on the LiDAR clouds
    (ref helpers.py:83-119)."""
    pts_src = apply_transform(read_lidar(lidar_path_source)[:, :3], T_velo_2_cam2)
    pts_inf = apply_transform(read_lidar(lidar_path_infer)[:, :3], T_velo_2_cam2)
    pts_tgt = apply_transform(read_lidar(lidar_path_target)[:, :3], T_velo_2_cam2)

    T_cam2_2_cam0 = np.linalg.inv(T_cam0_2_cam2)
    T_source2infer = T_cam0_2_cam2 @ np.linalg.inv(pose_infer) @ pose_source @ T_cam2_2_cam0
    T_source2target = T_cam0_2_cam2 @ np.linalg.inv(pose_target) @ pose_source @ T_cam2_2_cam0

    a = voxel_downsample(apply_transform(pts_src, T_source2infer), 0.05)
    b = voxel_downsample(pts_inf, 0.05)
    refined_s2i = icp_point_to_point(a, b)

    c = voxel_downsample(apply_transform(pts_src, T_source2target), 0.05)
    d = voxel_downsample(pts_tgt, 0.05)
    refined_s2t = icp_point_to_point(c, d)

    return {
        "T_source2infer": T_source2infer @ refined_s2i,
        "T_source2target": T_source2target @ refined_s2t,
    }


class TransformCache:
    """Pickle cache at {root}/{sequence}_{interval}_all/{frame}.pkl, keyed by
    source id (ref kitti_dataset.py:298-338)."""

    def __init__(self, transform_root: str, sequence: str, frames_interval: float):
        self.dir = os.path.join(transform_root, f"{sequence}_{frames_interval}_all")
        os.makedirs(self.dir, exist_ok=True)

    def path(self, frame_id: str) -> str:
        return os.path.join(self.dir, f"{frame_id}.pkl")

    def load(self, frame_id: str) -> Dict:
        p = self.path(frame_id)
        if os.path.exists(p):
            try:
                with open(p, "rb") as f:
                    return pickle.load(f)
            except (EOFError, pickle.UnpicklingError):
                return {}
        return {}

    def get_or_compute(self, frame_id: str, source_id: int, compute_fn) -> Dict:
        data = self.load(frame_id)
        key = str(source_id)
        if key not in data:
            data[key] = compute_fn()
            with open(self.path(frame_id), "wb") as f:
                pickle.dump(data, f)
        return data[key]
