"""Shared helpers for the CLI entry points."""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import click
import jax
import numpy as np

from scenerf_tpu.config import SceneRFConfig
from scenerf_tpu.model import SceneRF
from scenerf_tpu.train import Trainer, TrainState
from scenerf_tpu.parallel.mesh import make_mesh
from scenerf_tpu.utils.checkpoint import CheckpointManager
from scenerf_tpu.utils.jax_setup import setup_compilation_cache


class SetupCommand(click.Command):
    """click.Command that applies process-level JAX setup before the command
    body runs. Every console script uses it so JAX_PLATFORMS=cpu is honored
    even for commands that never load a model (this image's sitecustomize
    preloads the `axon` TPU plugin, which otherwise wins the backend race and
    blocks on the device claim — e.g. generate-sc-gt-bf fusing GT depth)."""

    def invoke(self, ctx):
        setup_compilation_cache()
        return super().invoke(ctx)


def load_model(model_path: str, which: str = "best",
               overrides: Optional[Dict] = None) -> Tuple[SceneRF, TrainState, SceneRFConfig]:
    """Load a checkpoint directory saved by CheckpointManager: rebuilds the
    model from the embedded config (the analog of Lightning's
    load_from_checkpoint, ref scenerf.py:94 + save_depth_metrics.py:57)."""
    setup_compilation_cache()
    mgr = CheckpointManager(model_path)
    meta = mgr._read_meta()
    if not meta:
        raise FileNotFoundError(f"no checkpoint metadata under {model_path}")
    from scenerf_tpu.utils.checkpoint import config_from_json
    import json
    cfg = config_from_json(json.dumps(meta["config"]))
    if overrides:
        cfg = cfg.replace(**overrides)
    model = SceneRF(cfg)
    trainer = Trainer(cfg, mesh=make_mesh(jax.devices()[:1]),
                      with_depth_eval=False)
    # abstract template via eval_shape: no multi-minute eager init just to
    # learn the tree structure
    template = jax.eval_shape(trainer.create_state, jax.random.PRNGKey(0))
    if which == "best" and mgr.best() is None:
        which = "last"
    state, _ = mgr.restore(template, which=which)
    state = jax.device_put(state, jax.devices()[0])
    return model, state, cfg


def encode_frame(model: SceneRF, state: TrainState, img_input: np.ndarray,
                 cam_K: np.ndarray):
    """Encode one (or a batch of) input frames -> spherical pyramids."""
    import jax.numpy as jnp
    variables = state.variables()
    if img_input.ndim == 3:
        img_input = img_input[None]
    levels, _ = model.encode(variables, jnp.asarray(img_input),
                             jnp.asarray(cam_K), train=False)
    return levels, variables


def strided_pixel_grid(img_size: Tuple[int, int], stride: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """The reference's torch.meshgrid('ij') pixel grid: shape (W/stride,
    H/stride) flattened W-major (ref render_colors.py:102-111)."""
    xs = np.arange(0, img_size[0], stride, dtype=np.float32)
    ys = np.arange(0, img_size[1], stride, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pixels = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    return pixels, gx.shape  # (n_x, n_y)


def print_depth_metrics_table(agg_depth_errors: Dict, n_frames: Dict):
    """Fixed-format per-distance table (ref save_depth_metrics.py:149-183)."""
    print("|distance|abs_rel |sq_rel  |rmse     |rmse_log|a1      |a2      |a3      |n_frames|")
    total = None
    total_frames = 0
    for distance in sorted(agg_depth_errors):
        e = agg_depth_errors[distance]
        n = n_frames[distance]
        total = np.copy(e) if total is None else total + e
        total_frames += n
        print("|{:08d}|{:02.6f}|{:.6f}|{:.6f}|{:.6f}|{:.6f}|{:.6f}|{:.6f}|{:08d}|".format(
            distance, *(e[j] / n for j in range(7)), n))
    if total is not None:
        print("|{}|{:02.6f}|{:.6f}|{:.6f}|{:.6f}|{:.6f}|{:.6f}|{:.6f}|{:08d}|".format(
            "All     ", *(total[j] / total_frames for j in range(7)), total_frames))


def print_color_metrics_table(psnr_accum, ssim_accum, lpips_accum, cnt_accum,
                              lpips_enabled=True):
    """Per-distance novel-view metric table (ref eval_color.py:33-60).
    With lpips_enabled=False the lpips column prints 'skipped' instead of a
    misleading 0."""
    def lp(v):
        return "{:.6f}".format(v) if lpips_enabled else "skipped "
    print("|distance |psnr |ssim   |lpips     |n_frames|")
    tp = ts = tl = tf = 0.0
    for distance in sorted(psnr_accum):
        tp += psnr_accum[distance]
        ts += ssim_accum[distance]
        tl += lpips_accum[distance]
        tf += cnt_accum[distance]
        print("|{:08d}|{:02.6f}|{:.6f}|{}|{:.6f}|".format(
            distance,
            psnr_accum[distance] / cnt_accum[distance],
            ssim_accum[distance] / cnt_accum[distance],
            lp(lpips_accum[distance] / cnt_accum[distance]),
            cnt_accum[distance]))
    if tf:
        print("|{}|{:02.6f}|{:.6f}|{}|{:.6f}|".format(
            "All     ", tp / tf, ts / tf, lp(tl / tf), tf))


def save_depth_visual(path: str, depth: np.ndarray, min_depth=0.1, max_depth=100.0):
    """Magma-colormapped disparity visualization
    (ref generate_novel_depths.py:155-166)."""
    import matplotlib as mpl
    import matplotlib.cm as cm
    from PIL import Image

    depth = np.clip(depth, min_depth, max_depth)
    min_disp, max_disp = 1.0 / max_depth, 1.0 / min_depth
    disp = 1.0 / depth - min_disp / (max_disp - min_disp)
    vmax = np.percentile(disp, 95)
    normalizer = mpl.colors.Normalize(vmin=disp.min(), vmax=vmax)
    mapper = cm.ScalarMappable(norm=normalizer, cmap="magma")
    colormapped = (mapper.to_rgba(disp)[:, :, :3] * 255).astype(np.uint8)
    Image.fromarray(colormapped).save(path)


def save_color_png(path: str, color: np.ndarray):
    from PIL import Image
    arr = (np.clip(color, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
