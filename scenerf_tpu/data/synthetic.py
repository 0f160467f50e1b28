"""Synthetic in-memory scans matching the training batch contract.

Used by tests, the benchmark, and the multi-chip dry run: a procedurally
textured 'scene' rendered as flat-ish depth so losses are well-defined, with
valid relative poses. Shapes follow model.SceneRF's batch contract exactly.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from scenerf_tpu.config import SceneRFConfig


def default_intrinsics(cfg: SceneRFConfig) -> np.ndarray:
    W, H = cfg.img_size
    f = 0.6 * W
    return np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)


def _texture(H: int, W: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.5 * np.sin(xx / (3 + 7 * rng.random()) + rng.random() * 6),
            0.5 + 0.5 * np.sin(yy / (3 + 7 * rng.random()) + rng.random() * 6),
            0.5 + 0.5 * np.sin((xx + yy) / (5 + 5 * rng.random())),
        ],
        axis=-1,
    )
    return img.astype(np.float32)


def make_batch(cfg: SceneRFConfig, batch_size: int = 1, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    W, H = cfg.img_size
    B, S, G = batch_size, cfg.n_sources, cfg.n_gt_depth
    cam_K = np.tile(default_intrinsics(cfg)[None], (B, 1, 1))

    def fwd_pose(dz: float) -> np.ndarray:
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = dz
        return T

    batch = {
        "img_input": np.stack([_texture(H, W, seed + b) for b in range(B)]),
        "cam_K": cam_K,
        "T_source2infer": np.stack(
            [[fwd_pose(0.4 * (s + 1)) for s in range(S)] for _ in range(B)]
        ),
        "T_source2target": np.stack(
            [[fwd_pose(-0.4) for _ in range(S)] for _ in range(B)]
        ),
        "img_sources": np.stack(
            [[_texture(H, W, seed + 10 + s) for s in range(S)] for _ in range(B)]
        ),
        "img_targets": np.stack(
            [[_texture(H, W, seed + 20 + s) for s in range(S)] for _ in range(B)]
        ),
        "source_mask": np.ones((B, S), dtype=np.float32),
        "gt_pix": rng.uniform(
            0, [W - 1, H - 1], size=(B, S, G, 2)
        ).astype(np.float32),
        "gt_depth": rng.uniform(2.0, 0.8 * cfg.eval_depth, size=(B, S, G)).astype(
            np.float32
        ),
        "gt_mask": np.ones((B, S, G), dtype=np.float32),
    }
    return batch
