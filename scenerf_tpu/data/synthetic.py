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


def _plane_view(cam_K: np.ndarray, c: np.ndarray, H: int, W: int,
                z0: float, slope: float):
    """Render a textured slanted plane z = z0 + slope*x (world frame) from a
    camera at world position `c` (identity rotation).

    Returns (img [H, W, 3], depth [H, W]) -- depth is the camera-frame z of
    the plane intersection, the exact quantity SceneRF renders. The texture is
    a smooth band-limited function of the world (x, y) hit point, so two views
    of the same plane are photometrically consistent under reprojection (the
    property the random `_texture` images lack; see make_geometric_batch)."""
    fx, fy, cx, cy = cam_K[0, 0], cam_K[1, 1], cam_K[0, 2], cam_K[1, 2]
    vv, uu = np.mgrid[0:H, 0:W].astype(np.float32)
    # ray direction with d_z = 1
    dx = (uu + 0.5 - cx) / fx
    dy = (vv + 0.5 - cy) / fy
    lam = (z0 + slope * c[0] - c[2]) / (1.0 - slope * dx)  # camera z == depth
    x = c[0] + lam * dx
    y = c[1] + lam * dy
    img = np.stack(
        [
            0.5 + 0.35 * np.sin(2.1 * x) * np.cos(1.7 * y),
            0.5 + 0.35 * np.sin(1.3 * x + 2.0) * np.sin(2.3 * y),
            0.5 + 0.35 * np.cos(1.9 * x - 0.7) * np.cos(1.1 * y + 1.3),
        ],
        axis=-1,
    ).astype(np.float32)
    return img, lam.astype(np.float32)


def make_geometric_batch(cfg: SceneRFConfig, seed: int = 0,
                         z0: float = 5.0, slope: float = 0.15) -> Dict[str, np.ndarray]:
    """One geometrically CONSISTENT frame: all views are renders of the same
    textured slanted plane, gt_depth is the analytic plane depth.

    `make_batch`'s random textures/depths have no photometric optimum at any
    depth, so nothing can converge on them; this scene's reprojection loss is
    minimized exactly at the true depth, making it the overfit-one-frame
    convergence fixture (SURVEY section 4; VERDICT r2 weak 5)."""
    rng = np.random.default_rng(seed)
    W, H = cfg.img_size
    S, G = cfg.n_sources, cfg.n_gt_depth
    cam_K = default_intrinsics(cfg)

    def pose_from(c: np.ndarray) -> np.ndarray:
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = c
        return T

    # infer camera at the world origin; sources offset with parallax
    infer_img, _ = _plane_view(cam_K, np.zeros(3, np.float32), H, W, z0, slope)
    src_imgs, src_depths, T_s2i = [], [], []
    for s in range(S):
        c = np.array([0.25 * (s + 1), 0.1 * s, -0.35 * (s + 1)], np.float32)
        img, depth = _plane_view(cam_K, c, H, W, z0, slope)
        src_imgs.append(img)
        src_depths.append(depth)
        T_s2i.append(pose_from(c))  # identity rotation: source->world(=infer)

    # GT-depth pixels in each source frame with analytic plane depth
    gt_pix = rng.uniform(1, [W - 2, H - 2], size=(S, G, 2)).astype(np.float32)
    gt_depth = np.stack([
        src_depths[s][gt_pix[s, :, 1].astype(int), gt_pix[s, :, 0].astype(int)]
        for s in range(S)
    ])

    batch = {
        "img_input": infer_img[None],
        "cam_K": cam_K[None],
        "T_source2infer": np.stack(T_s2i)[None],
        # target camera IS the infer camera (the reference's KITTI pairing)
        "T_source2target": np.stack(T_s2i)[None],
        "img_sources": np.stack(src_imgs)[None],
        "img_targets": np.tile(infer_img[None, None], (1, S, 1, 1, 1)),
        "source_mask": np.ones((1, S), dtype=np.float32),
        "gt_pix": gt_pix[None],
        "gt_depth": gt_depth[None],
        "gt_mask": np.ones((1, S, G), dtype=np.float32),
    }
    return batch


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
