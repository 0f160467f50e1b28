"""BundleFusion (indoor RGB-D) dataset.

Contract: ref scenerf/data/bundlefusion/bundlefusion_dataset.py + _dm.py +
collate.py. A scan is a window of `n_frames` frames spaced `frame_interval`
apart, centered on the infer frame; poses are read per-frame (no ICP); depth
PNGs (16-bit, millimeters) serve as GT for evaluation and for building fused GT
occupancy. 7 train scenes / 1 val scene (copyroom) (ref :26-30).
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import imageio.v2 as imageio
import numpy as np
from PIL import Image

from scenerf_tpu.config import SceneRFConfig
from scenerf_tpu.data.calib import normalize_rgb

SPLITS = {
    "train": ["apt0", "apt1", "apt2", "office0", "office1", "office2", "office3"],
    "val": ["copyroom"],
    "all": ["apt0", "apt1", "apt2", "office0", "office1", "office2", "office3",
            "copyroom"],
}


def read_camera_params(path: str):
    """info.txt -> (color K 3x3, depth K 3x3) (ref :202-221)."""
    cam_K_color = cam_K_depth = None
    with open(path) as f:
        for line in f:
            if line == "\n":
                break
            if "=" not in line:
                continue
            key, value = line.split("=", 1)
            key, value = key.strip(), value.strip()
            if key == "m_calibrationColorIntrinsic":
                cam_K_color = np.array([float(x) for x in value.split()]).reshape(4, 4)
            if key == "m_calibrationDepthIntrinsic":
                cam_K_depth = np.array([float(x) for x in value.split()]).reshape(4, 4)
    return cam_K_color[:3, :3], cam_K_depth[:3, :3]


def read_pose(path: str) -> np.ndarray:
    pose = np.identity(4)
    with open(path) as f:
        for i, line in enumerate(f.readlines()):
            pose[i, :] = np.fromstring(line, dtype=float, sep=" ")
    return pose


def read_rgb(path: str) -> np.ndarray:
    return np.array(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


def read_depth(path: str) -> np.ndarray:
    """16-bit depth PNG in millimeters -> meters (ref :248-256)."""
    return np.asarray(imageio.imread(path)).astype(np.float64) / 1000.0


class BundlefusionDataset:
    def __init__(
        self,
        split: str,
        root: str,
        n_sources: int = 1,
        frame_interval: int = 4,
        n_frames: int = 16,
        infer_frame_interval: int = 2,
        select_scans: Optional[Sequence[str]] = None,
        seed: Optional[int] = None,
    ):
        self.root = root
        self.sequences = SPLITS[split]
        self.n_sources = n_sources
        self.frame_interval = frame_interval
        self.n_frames = n_frames
        self.infer_frame_interval = infer_frame_interval
        self.img_W, self.img_H = 640, 480
        self.rng = np.random.default_rng(seed)

        self.error_frames = set()
        err_path = os.path.join(os.path.dirname(__file__), "bf_error_frames.txt")
        if os.path.exists(err_path):
            with open(err_path) as f:
                self.error_frames = {line.strip() for line in f}

        self.scans: List[Dict] = []
        for sequence in self.sequences:
            info = os.path.join(root, sequence, "info.txt")
            cam_K_color, cam_K_depth = read_camera_params(info)
            rgb_paths = glob.glob(os.path.join(root, sequence, "*.color.jpg"))
            half = self.n_frames // 2
            for rgb_path in sorted(rgb_paths):
                name = os.path.splitext(os.path.basename(rgb_path))[0]
                frame_id = float(name[6:12])
                tag = f"{sequence}_{int(frame_id):06d}"
                if tag in self.error_frames:
                    continue
                if frame_id % self.infer_frame_interval != 0:
                    continue
                if frame_id < half * self.frame_interval:
                    continue
                if frame_id > (len(rgb_paths) - 1 - half * self.frame_interval):
                    continue
                rel_frame_ids = [
                    f"{int(frame_id) + i * self.frame_interval:06d}"
                    for i in range(-half, half + 1)
                ]
                if select_scans is not None and rel_frame_ids[half] not in select_scans:
                    continue
                self.scans.append({
                    "sequence": sequence,
                    "rel_frame_ids": rel_frame_ids,
                    "cam_K_color": cam_K_color,
                    "cam_K_depth": cam_K_depth,
                })

    def __len__(self):
        return len(self.scans)

    def _frame_path(self, sequence: str, frame_id: str, kind: str) -> str:
        return os.path.join(self.root, sequence, f"frame-{frame_id}.{kind}")

    def __getitem__(self, index: int) -> Dict:
        scan = self.scans[index]
        sequence = scan["sequence"]
        rel = scan["rel_frame_ids"]
        infer_id = self.n_frames // 2
        frame_id = rel[infer_id]

        img_input_raw = read_rgb(self._frame_path(sequence, frame_id, "color.jpg"))
        infer_depth = read_depth(self._frame_path(sequence, frame_id, "depth.png"))
        infer_pose = read_pose(self._frame_path(sequence, frame_id, "pose.txt"))

        idx = np.delete(np.arange(self.n_frames + 1), infer_id)
        n_sources = min(len(idx), self.n_sources)

        img_sources, img_targets, source_depths = [], [], []
        T_source2infers, T_source2targets, source_frame_ids = [], [], []
        for d_id in range(n_sources):
            if self.n_sources < len(rel):
                source_id = int(self.rng.choice(idx, 1)[0])
            else:
                source_id = int(idx[d_id])
            source_frame_ids.append(rel[source_id])
            target_id = source_id - 1

            img_sources.append(read_rgb(self._frame_path(sequence, rel[source_id], "color.jpg")))
            img_targets.append(read_rgb(self._frame_path(sequence, rel[target_id], "color.jpg")))
            source_pose = read_pose(self._frame_path(sequence, rel[source_id], "pose.txt"))
            target_pose = read_pose(self._frame_path(sequence, rel[target_id], "pose.txt"))
            T_source2infers.append(
                (np.linalg.inv(infer_pose) @ source_pose).astype(np.float32))
            T_source2targets.append(
                (np.linalg.inv(target_pose) @ source_pose).astype(np.float32))
            source_depths.append(
                read_depth(self._frame_path(sequence, rel[source_id], "depth.png")))

        return {
            "frame_id": frame_id,
            "sequence": sequence,
            "img_input": normalize_rgb(img_input_raw),
            "img_input_original": img_input_raw,
            "infer_depth": infer_depth,
            "cam_K": scan["cam_K_color"].astype(np.float32),
            "cam_K_depth": scan["cam_K_depth"].astype(np.float32),
            "img_sources": img_sources,
            "img_targets": img_targets,
            "source_depths": source_depths,
            "T_source2infers": T_source2infers,
            "T_source2targets": T_source2targets,
            "source_frame_ids": source_frame_ids,
        }


def to_model_batch(items: List[Dict], cfg: SceneRFConfig) -> Dict[str, np.ndarray]:
    """Fixed-shape batch for model.SceneRF. GT depth pixels are sampled from
    the source depth maps (the BF variant evaluates depth against depth-PNG GT
    at rendered pixels, ref scenerf_bf.py:198-207)."""
    B, S, G = len(items), cfg.n_sources, cfg.n_gt_depth
    H, W = items[0]["img_input"].shape[:2]
    rng = np.random.default_rng(0)

    out = {
        "img_input": np.stack([it["img_input"] for it in items]).astype(np.float32),
        "cam_K": np.stack([it["cam_K"] for it in items]).astype(np.float32),
        "T_source2infer": np.tile(np.eye(4, dtype=np.float32), (B, S, 1, 1)),
        "T_source2target": np.tile(np.eye(4, dtype=np.float32), (B, S, 1, 1)),
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
            depth = it["source_depths"][s]
            ys, xs = np.nonzero(depth > 0)
            if len(ys):
                take = min(G, len(ys))
                sel = rng.choice(len(ys), size=take, replace=False)
                out["gt_pix"][b, s, :take] = np.stack(
                    [xs[sel], ys[sel]], axis=-1)
                out["gt_depth"][b, s, :take] = depth[ys[sel], xs[sel]]
                out["gt_mask"][b, s, :take] = 1.0
    return out
