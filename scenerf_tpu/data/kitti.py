"""KITTI (SemanticKITTI odometry) dataset: scan construction, LiDAR depth GT,
ICP-refined relative poses, voxel GT, and fixed-shape batching for the model.

Contract: ref scenerf/data/semantic_kitti/kitti_dataset.py + kitti_dm.py +
collate.py. A *scan* is an input frame plus all following frames within
`sequence_distance` meters of travel that are at least `frames_interval` apart
(ref :110-134). Sequences 00-10 train with 08 as val (every 5th frame)
(ref :38-42, :95).

Differences from the reference (TPU batching contract):
  * __getitem__ returns numpy, channel-last images
  * to_model_batch() pads the ragged per-scan sources / LiDAR points to the
    fixed shapes of model.SceneRF's batch contract with masks
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from scenerf_tpu.config import SceneRFConfig
from scenerf_tpu.data import calib as C
from scenerf_tpu.data import io_voxel
from scenerf_tpu.data.icp import TransformCache, compute_transformation

SPLITS = {
    "train": ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10"],
    "val": ["08"],
    "test": ["11", "12", "13", "14", "15", "16", "17", "18", "19", "20", "21"],
}

# frames whose GT voxels are corrupt in the val split (ref params.py:51-57)
VAL_ERROR_FRAMES = {"000000", "000195", "001325", "001690", "001700", "001995",
                    "002740", "002750", "003000", "003325", "003740", "003745",
                    "004070"}


class KittiDataset:
    def __init__(
        self,
        split: str,
        root: str,
        preprocess_root: str,
        frames_interval: float = 0.4,
        sequence_distance: float = 10.0,
        n_sources: int = 1,
        eval_depth: float = 80.0,
        sequences: Optional[Sequence[str]] = None,
        selected_frames: Optional[Sequence[str]] = None,
        n_rays: int = 1200,
        load_voxels: bool = False,
        seed: Optional[int] = None,
    ):
        self.root = root
        self.preprocess_root = preprocess_root
        self.transform_root = os.path.join(preprocess_root, "transform")
        self.split = split
        self.sequences = list(sequences) if sequences else SPLITS[split]
        self.frames_interval = frames_interval
        self.sequence_distance = sequence_distance
        self.n_sources = n_sources
        self.eval_depth = eval_depth
        self.n_rays = n_rays
        self.load_voxels = load_voxels
        self.img_W, self.img_H = 1220, 370
        self.scene_size = (51.2, 51.2, 6.4)
        self.vox_origin = np.array([0, -25.6, -2])
        self.voxel_size = 0.2
        self.rng = np.random.default_rng(seed)

        self.scans: List[Dict] = []
        for sequence in self.sequences:
            self._walk_sequence(sequence, selected_frames)

    # ----------------------------------------------------------------- build
    def _seq_dir(self, sequence: str) -> str:
        return os.path.join(self.root, "dataset", "sequences", sequence)

    def _walk_sequence(self, sequence: str, selected_frames):
        pose_path = os.path.join(self.root, "dataset", "poses", sequence + ".txt")
        poses_all = C.read_poses(pose_path)
        cal = C.read_calib(os.path.join(self._seq_dir(sequence), "calib.txt"))
        P = cal["P2"]
        T_cam0_2_cam2 = cal["T_cam0_2_cam2"]
        T_velo_2_cam = T_cam0_2_cam2 @ cal["Tr"]

        # val anchors on frames that have voxel GT; train on all images
        # (ref kitti_dataset.py:77-96)
        if self.split == "val":
            anchor_glob = os.path.join(self._seq_dir(sequence), "voxels", "*.bin")
        else:
            anchor_glob = os.path.join(self._seq_dir(sequence), "image_2", "*.png")

        for anchor_path in sorted(glob.glob(anchor_glob)):
            frame_id = os.path.splitext(os.path.basename(anchor_path))[0]
            if self.split == "val" and int(frame_id) % 5 != 0:
                continue
            if self.split == "val" and frame_id in VAL_ERROR_FRAMES:
                continue

            scan = self._build_scan(sequence, frame_id, poses_all, P,
                                    T_velo_2_cam, T_cam0_2_cam2)
            if scan is None:
                continue
            if selected_frames is not None and frame_id not in selected_frames:
                continue
            self.scans.append(scan)

    def _build_scan(self, sequence, frame_id, poses_all, P, T_velo_2_cam,
                    T_cam0_2_cam2):
        """Collect following frames within sequence_distance meters, at least
        frames_interval apart (ref kitti_dataset.py:110-134)."""
        img_dir = os.path.join(self._seq_dir(sequence), "image_2")
        lidar_dir = os.path.join(self._seq_dir(sequence), "velodyne")
        rel_frame_ids, img_paths, lidar_paths, poses, distances = [], [], [], [], []
        distance = 0.0
        cnt = -1
        while True:
            cnt += 1
            rel_id = f"{int(frame_id) + cnt:06d}"
            img_path = os.path.join(img_dir, rel_id + ".png")
            if not os.path.exists(img_path):
                break
            current_pose = poses_all[int(rel_id)]
            if poses:
                prev = C.dump_xyz(poses[-1])
                cur = C.dump_xyz(current_pose)
                rel_distance = float(np.hypot(prev[0] - cur[0], prev[2] - cur[2]))
                distance += rel_distance
                if rel_distance < self.frames_interval:
                    continue
                if distance > self.sequence_distance:
                    break
            rel_frame_ids.append(rel_id)
            img_paths.append(img_path)
            lidar_paths.append(os.path.join(lidar_dir, rel_id + ".bin"))
            poses.append(current_pose)
            distances.append(distance)

        if len(poses) <= 1:
            return None
        return {
            "frame_id": frame_id,
            "sequence": sequence,
            "img_paths": img_paths,
            "lidar_paths": lidar_paths,
            "T_velo_2_cam": T_velo_2_cam,
            "P": P,
            "T_cam0_2_cam2": T_cam0_2_cam2,
            "T_cam2_2_cam0": np.linalg.inv(T_cam0_2_cam2),
            "poses": np.stack(poses, axis=0),
            "distances": distances,
            "rel_frame_ids": rel_frame_ids,
        }

    # ------------------------------------------------------------------ item
    def __len__(self):
        return len(self.scans)

    def _refined_transforms(self, scan, source_id: int) -> Dict[str, np.ndarray]:
        cache = TransformCache(self.transform_root, scan["sequence"],
                               self.frames_interval)
        target_id = source_id - 1

        def compute():
            poses = scan["poses"]
            return compute_transformation(
                scan["lidar_paths"][source_id],
                scan["lidar_paths"][0],
                scan["lidar_paths"][target_id],
                poses[source_id], poses[0], poses[target_id],
                scan["T_velo_2_cam"], scan["T_cam0_2_cam2"],
            )

        return cache.get_or_compute(scan["frame_id"], source_id, compute)

    def __getitem__(self, index: int) -> Dict:
        scan = self.scans[index]
        P = scan["P"]
        T_velo_2_cam = scan["T_velo_2_cam"]
        distances = scan["distances"]
        n_sources = min(len(distances) - 1, self.n_sources)

        img_sources, img_targets, img_input_sources = [], [], []
        lidar_depths, loc2d_with_depths = [], []
        T_source2infers, T_source2targets = [], []
        source_distances, source_frame_ids = [], []

        for d_id in range(n_sources):
            if self.n_sources < len(distances):
                source_id = int(self.rng.integers(1, len(distances)))
            else:
                source_id = d_id + 1
            source_distances.append(distances[source_id])
            source_frame_ids.append(scan["rel_frame_ids"][source_id])
            target_id = source_id - 1

            img_source = C.read_rgb(scan["img_paths"][source_id])
            img_target = C.read_rgb(scan["img_paths"][target_id])
            img_sources.append(img_source)
            img_targets.append(img_target)
            img_input_sources.append(C.normalize_rgb(img_source))

            lidar = C.read_lidar(scan["lidar_paths"][source_id])
            loc2d, depth, _ = C.lidar_to_depth(
                lidar, P, T_velo_2_cam, (self.img_W, self.img_H),
                max_depth=self.eval_depth)
            if self.n_rays < depth.shape[0]:
                idx = self.rng.choice(depth.shape[0], size=self.n_rays,
                                      replace=False)
                loc2d, depth = loc2d[idx], depth[idx]
            loc2d_with_depths.append(loc2d.astype(np.float32))
            lidar_depths.append(depth.astype(np.float32))

            T = self._refined_transforms(scan, source_id)
            T_source2infers.append(T["T_source2infer"].astype(np.float32))
            T_source2targets.append(T["T_source2target"].astype(np.float32))

        data = {
            "frame_id": scan["frame_id"],
            "sequence": scan["sequence"],
            "img_input": C.normalize_rgb(C.read_rgb(scan["img_paths"][0])),
            "cam_K": P[0:3, 0:3].astype(np.float32),
            "P": P,
            "T_velo_2_cam": T_velo_2_cam.astype(np.float32),
            "T_cam2_2_cam0": scan["T_cam2_2_cam0"].astype(np.float32),
            "T_cam0_2_cam2": scan["T_cam0_2_cam2"].astype(np.float32),
            "img_sources": img_sources,
            "img_targets": img_targets,
            "img_input_sources": img_input_sources,
            "lidar_depths": lidar_depths,
            "loc2d_with_depths": loc2d_with_depths,
            "T_source2infers": T_source2infers,
            "T_source2targets": T_source2targets,
            "source_distances": source_distances,
            "source_frame_ids": source_frame_ids,
        }

        if self.load_voxels:
            vox_dir = os.path.join(self._seq_dir(scan["sequence"]), "voxels")
            data["target_1_1"] = io_voxel.read_semantic_voxels(
                os.path.join(vox_dir, scan["frame_id"] + ".label"),
                os.path.join(vox_dir, scan["frame_id"] + ".invalid"))
            pix, fov_mask, sensor_dist = C.vox2pix(
                T_velo_2_cam, data["cam_K"], self.vox_origin, self.voxel_size,
                self.img_W, self.img_H, self.scene_size)
            data["projected_pix_1"] = pix
            data["fov_mask_1"] = fov_mask
            data["sensor_distance_1"] = sensor_dist
        return data


def to_model_batch(items: List[Dict], cfg: SceneRFConfig) -> Dict[str, np.ndarray]:
    """Pad+mask a list of ragged scan items into the fixed-shape batch contract
    of model.SceneRF (replaces the reference's ragged-list collate,
    ref collate.py:3-95)."""
    B = len(items)
    S = cfg.n_sources
    G = cfg.n_gt_depth
    H, W = items[0]["img_input"].shape[:2]

    out = {
        "img_input": np.stack([it["img_input"] for it in items]).astype(np.float32),
        "cam_K": np.stack([it["cam_K"] for it in items]).astype(np.float32),
        "T_source2infer": np.zeros((B, S, 4, 4), np.float32),
        "T_source2target": np.zeros((B, S, 4, 4), np.float32),
        "img_sources": np.zeros((B, S, H, W, 3), np.float32),
        "img_targets": np.zeros((B, S, H, W, 3), np.float32),
        "source_mask": np.zeros((B, S), np.float32),
        "gt_pix": np.zeros((B, S, G, 2), np.float32),
        "gt_depth": np.ones((B, S, G), np.float32),
        "gt_mask": np.zeros((B, S, G), np.float32),
    }
    for b, it in enumerate(items):
        n = min(len(it["img_sources"]), S)
        for s in range(n):
            out["T_source2infer"][b, s] = it["T_source2infers"][s]
            out["T_source2target"][b, s] = it["T_source2targets"][s]
            out["img_sources"][b, s] = it["img_sources"][s]
            out["img_targets"][b, s] = it["img_targets"][s]
            out["source_mask"][b, s] = 1.0
            g = min(len(it["lidar_depths"][s]), G)
            out["gt_pix"][b, s, :g] = it["loc2d_with_depths"][s][:g]
            out["gt_depth"][b, s, :g] = it["lidar_depths"][s][:g]
            out["gt_mask"][b, s, :g] = 1.0
        # identity pose in padded slots keeps geometry well-defined
        for s in range(n, S):
            out["T_source2infer"][b, s] = np.eye(4)
            out["T_source2target"][b, s] = np.eye(4)
    return out
