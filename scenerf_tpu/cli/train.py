"""Training entry points: train_kitti / train_bundlefusion.

Contract: ref scenerf/scripts/train_kitti.py and train_bundlefusion.py --
click flags, exp-name construction, auto-resume from `last`, checkpoint
selection on valdepth/abs_rel, TensorBoard logging, half-train-set epochs.
The Lightning Trainer + DDP is replaced by scenerf_tpu.train.Trainer's
jit(shard_map) step over the data mesh.
"""
from __future__ import annotations

import os
import time

import click
import jax
import numpy as np

from scenerf_tpu import config as CFG
from scenerf_tpu.data.loader import DataLoader
from scenerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from scenerf_tpu.train import Trainer
from scenerf_tpu.utils.checkpoint import CheckpointManager
from scenerf_tpu.cli import common
from scenerf_tpu.utils.jax_setup import setup_compilation_cache
from scenerf_tpu.utils.logging_utils import MetricLogger


def run_training(
    cfg,
    train_ds,
    val_ds,
    collate,
    exp_name: str,
    logdir: str,
    n_epochs: int,
    enable_log: bool,
    limit_train_fraction: float = 0.5,
    global_batch_size: int = 1,
    seed: int = 42,
    max_steps_per_epoch: int | None = None,
    parallel_mode: str = "data",
):
    """Shared epoch loop (ref train_kitti.py:104-158).

    parallel_mode: "data" shards batch items over the mesh (DDP parity,
    ref train_kitti.py:130-139); "ray_parallel" replicates items and gives
    each device an independent ray sample; "ray_shard" replicates items and
    splits each item's rays across the mesh (see train.Trainer).
    """
    setup_compilation_cache()
    devices = jax.devices()
    if parallel_mode == "data":
        # mesh over the largest device count that divides the global batch
        n_dev = next(k for k in range(min(len(devices), global_batch_size),
                                      0, -1) if global_batch_size % k == 0)
    else:  # ray modes use the whole mesh regardless of batch size
        n_dev = len(devices)
    mesh = make_mesh(devices[:n_dev])

    # multi-host input: data mode slices each global batch per process
    # (shard_batch_multihost assembles it); ray modes REPLICATE the batch, so
    # every process loads the identical full batch (same seed => same order)
    # and parallel.mesh.replicate assembles the replicated global array from
    # the per-process copies (tests/test_multihost.py exercises both on a
    # real 2-process cluster)
    p_idx, p_cnt = jax.process_index(), jax.process_count()
    if parallel_mode != "data":
        p_idx, p_cnt = 0, 1  # unsliced loaders: identical batches everywhere
    train_loader = DataLoader(train_ds, collate, batch_size=global_batch_size,
                              shuffle=True, limit_fraction=limit_train_fraction,
                              seed=seed, process_index=p_idx,
                              process_count=p_cnt)
    val_loader = DataLoader(val_ds, collate, batch_size=global_batch_size,
                            shuffle=False, process_index=p_idx,
                            process_count=p_cnt)

    steps_per_epoch = max(1, len(train_loader))
    if max_steps_per_epoch is not None:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=steps_per_epoch,
                      ray_parallel=parallel_mode == "ray_parallel",
                      ray_shard=parallel_mode == "ray_shard")

    ckpt_dir = os.path.join(logdir, "ckpts", exp_name)
    mgr = CheckpointManager(ckpt_dir, monitor="depth/abs_rel", mode="min")
    logger = MetricLogger(os.path.join(logdir, "tb", exp_name) if enable_log else None)

    key = jax.random.PRNGKey(seed)
    state = trainer.create_state(key)
    start_epoch = 0
    if mgr.latest() is not None:  # auto-resume (ref train_kitti.py:124-140)
        template = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
        state, _ = mgr.restore(template, which="last")
        start_epoch = int(np.asarray(state.step)) // steps_per_epoch
        print(f"resumed from step {int(np.asarray(state.step))} (epoch {start_epoch})")

    # host-side mirror of state.step: reading state.step from the device every
    # iteration would block on each step's completion and serialize the loop
    # behind the ~30-50 ms dispatch latency; with the mirror the host runs
    # ahead and the runtime queue pipelines steps back-to-back
    step = int(np.asarray(state.step))
    for epoch in range(start_epoch, n_epochs):
        t_ep = time.time()
        for bi, batch in enumerate(train_loader):
            if max_steps_per_epoch is not None and bi >= max_steps_per_epoch:
                break
            # per-step key derivation happens inside the jitted step
            # (train.py folds in state.step) -- a host-side fold_in here
            # would be an extra dispatched program every step
            batch = (shard_batch(batch, mesh) if parallel_mode == "data"
                     else replicate(batch, mesh))
            state, metrics = trainer.train_step(state, batch, key)
            step += 1
            if step % 10 == 0:
                logger.log(jax.device_get(metrics), step, "train")
                # LearningRateMonitor parity (ref train_kitti.py:108-109)
                logger.log_lr(float(trainer.lr_schedule(step)), step)
                print(f"epoch {epoch} step {step} "
                      f"loss {float(metrics['total_loss']):.4f}")

        # ---- validation epoch ----
        val_metrics_acc, n_val = None, 0
        for bi, batch in enumerate(val_loader):
            if max_steps_per_epoch is not None and bi >= max_steps_per_epoch:
                break
            batch = (shard_batch(batch, mesh) if parallel_mode == "data"
                     else replicate(batch, mesh))
            val_key = jax.random.fold_in(jax.random.fold_in(key, 0x5EED), bi)
            m = jax.device_get(trainer.val_step(state, batch, val_key))
            val_metrics_acc = m if val_metrics_acc is None else {
                k: val_metrics_acc[k] + m[k] for k in m}
            n_val += 1
        if val_metrics_acc:
            val_metrics = {k: v / n_val for k, v in val_metrics_acc.items()}
            logger.log(val_metrics, int(np.asarray(state.step)), "val")
            mgr.save(state, cfg, metrics=val_metrics)
            print(f"epoch {epoch} ({time.time()-t_ep:.0f}s) "
                  f"val abs_rel {val_metrics.get('depth/abs_rel', float('nan')):.4f}")
        else:
            mgr.save(state, cfg)
    logger.flush()
    return state


@click.command(cls=common.SetupCommand)
@click.option("--root", default="", help="path to dataset folder")
@click.option("--preprocess_root", default="", help="path to preprocess folder")
@click.option("--logdir", default="", help="log/checkpoint directory")
@click.option("--bs", default=1, help="global batch size")
@click.option("--n_rays", default=1200)
@click.option("--n_sources", default=1, help="sources per step (fixed shape)")
@click.option("--lr", default=1e-5)
@click.option("--weight_decay", default=0.0)
@click.option("--n_epochs", default=50)
@click.option("--enable_log", default=True, type=bool)
@click.option("--sequence_distance", default=10.0)
@click.option("--frames_interval", default=0.4)
@click.option("--n_gaussians", default=4)
@click.option("--n_pts_per_gaussian", default=8)
@click.option("--n_pts_uni", default=32)
@click.option("--n_gt_depth", default=1024)
@click.option("--std", default=2.0)
@click.option("--add_fov_hor", default=20.0)
@click.option("--add_fov_ver", default=8.0)
@click.option("--sphere_w", default=1500)
@click.option("--sphere_h", default=452)
@click.option("--som_sigma", default=2.0)
@click.option("--max_sample_depth", default=100.0)
@click.option("--eval_depth", default=80.0, help="cap depth for evaluation")
@click.option("--use_color", default=True, type=bool)
@click.option("--use_reprojection", default=True, type=bool)
@click.option("--encoder", default="effnet-b7")
@click.option("--exp_prefix", default="exp")
@click.option("--compute_dtype", default="float32")
@click.option("--max_steps_per_epoch", default=None, type=int)
@click.option("--sequences", default="", help="comma list overriding the train split")
@click.option("--val_sequences", default="", help="comma list overriding the val split")
@click.option("--parallel_mode", default="data",
              type=click.Choice(["data", "ray_parallel", "ray_shard"]),
              help="mesh strategy: shard items / per-device ray samples / "
                   "split each item's rays across the mesh")
def train_kitti(root, preprocess_root, logdir, bs, n_rays, n_sources, lr,
                weight_decay, n_epochs, enable_log, sequence_distance,
                frames_interval, n_gaussians, n_pts_per_gaussian, n_pts_uni,
                n_gt_depth, std, add_fov_hor, add_fov_ver, sphere_w, sphere_h,
                som_sigma, max_sample_depth, eval_depth, use_color,
                use_reprojection, encoder, exp_prefix, compute_dtype,
                max_steps_per_epoch, sequences, val_sequences, parallel_mode):
    """Train SceneRF on SemanticKITTI (ref scenerf/scripts/train_kitti.py)."""
    from scenerf_tpu.data.kitti import KittiDataset, to_model_batch

    cfg = CFG.kitti(
        n_rays=n_rays, n_sources=n_sources, lr=lr, weight_decay=weight_decay,
        n_gaussians=n_gaussians, n_pts_per_gaussian=n_pts_per_gaussian,
        n_pts_uni=n_pts_uni, std=std, som_sigma=som_sigma,
        max_sample_depth=max_sample_depth, eval_depth=eval_depth,
        use_color=use_color, use_reprojection=use_reprojection,
        encoder=encoder, n_gt_depth=n_gt_depth, compute_dtype=compute_dtype,
    )
    cfg = cfg.replace(sphere=cfg.sphere.__class__(
        width=sphere_w, height=sphere_h,
        add_fov_hor=add_fov_hor, add_fov_ver=add_fov_ver))

    # experiment identity string (ref train_kitti.py:64-72)
    exp_name = (f"{exp_prefix}_kitti_rays{n_rays}_gauss{n_gaussians}x"
                f"{n_pts_per_gaussian}_std{std}_sigma{som_sigma}"
                f"_fov{add_fov_hor}x{add_fov_ver}_sphere{sphere_w}x{sphere_h}")
    print("exp_name:", exp_name)

    train_ds = KittiDataset("train", root, preprocess_root,
                            frames_interval=frames_interval,
                            sequence_distance=sequence_distance,
                            n_sources=n_sources, n_rays=n_gt_depth, seed=42,
                            sequences=sequences.split(",") if sequences else None)
    val_ds = KittiDataset("val", root, preprocess_root,
                          frames_interval=frames_interval,
                          sequence_distance=sequence_distance,
                          n_sources=n_sources, n_rays=n_gt_depth, seed=42,
                          sequences=val_sequences.split(",") if val_sequences else None)
    collate = lambda items: to_model_batch(items, cfg)
    run_training(cfg, train_ds, val_ds, collate, exp_name, logdir, n_epochs,
                 enable_log, limit_train_fraction=0.5, global_batch_size=bs,
                 max_steps_per_epoch=max_steps_per_epoch,
                 parallel_mode=parallel_mode)


@click.command(cls=common.SetupCommand)
@click.option("--root", default="", help="path to bundlefusion folder")
@click.option("--logdir", default="")
@click.option("--bs", default=1)
@click.option("--n_rays", default=2048)
@click.option("--n_sources", default=1)
@click.option("--lr", default=2e-5)
@click.option("--weight_decay", default=0.0)
@click.option("--n_epochs", default=50)
@click.option("--enable_log", default=True, type=bool)
@click.option("--frame_interval", default=2)
@click.option("--n_frames", default=16)
@click.option("--n_gaussians", default=4)
@click.option("--n_pts_per_gaussian", default=8)
@click.option("--n_pts_uni", default=32)
@click.option("--n_gt_depth", default=1024)
@click.option("--std", default=0.2)
@click.option("--som_sigma", default=0.02)
@click.option("--sample_grid_size", default=2)
@click.option("--sampling_method", default="uniform",
              type=click.Choice(["uniform", "log"]))
@click.option("--max_sample_depth", default=12.0)
@click.option("--eval_depth", default=10.0, help="cap depth for evaluation")
@click.option("--add_fov_hor", default=14.0)
@click.option("--add_fov_ver", default=11.0)
@click.option("--sphere_w", default=960)
@click.option("--sphere_h", default=720)
@click.option("--use_color", default=True, type=bool)
@click.option("--use_reprojection", default=True, type=bool)
@click.option("--img_w", default=640, help="input width (smoke runs shrink it)")
@click.option("--img_h", default=480, help="input height (smoke runs shrink it)")
@click.option("--encoder", default="effnet-b7")
@click.option("--encoder_features", default=2560,
              help="bottleneck channels (matches --encoder)")
@click.option("--exp_prefix", default="exp")
@click.option("--compute_dtype", default="float32")
@click.option("--max_steps_per_epoch", default=None, type=int)
@click.option("--parallel_mode", default="data",
              type=click.Choice(["data", "ray_parallel", "ray_shard"]))
def train_bundlefusion(root, logdir, bs, n_rays, n_sources, lr, weight_decay,
                       n_epochs, enable_log, frame_interval, n_frames,
                       n_gaussians, n_pts_per_gaussian, n_pts_uni, n_gt_depth,
                       std, som_sigma, sample_grid_size, sampling_method,
                       max_sample_depth, eval_depth, add_fov_hor, add_fov_ver,
                       sphere_w, sphere_h, use_color, use_reprojection,
                       img_w, img_h, encoder, encoder_features, exp_prefix,
                       compute_dtype, max_steps_per_epoch, parallel_mode):
    """Train SceneRF on BundleFusion (ref scenerf/scripts/train_bundlefusion.py)."""
    import dataclasses

    from scenerf_tpu.data.bundlefusion import BundlefusionDataset, to_model_batch

    cfg = CFG.bundlefusion(
        n_rays=n_rays, n_sources=n_sources, lr=lr, weight_decay=weight_decay,
        n_gaussians=n_gaussians, n_pts_per_gaussian=n_pts_per_gaussian,
        n_pts_uni=n_pts_uni, std=std, som_sigma=som_sigma, encoder=encoder,
        n_gt_depth=n_gt_depth, sample_grid_size=sample_grid_size,
        sampling_method=sampling_method, max_sample_depth=max_sample_depth,
        eval_depth=eval_depth, use_color=use_color,
        use_reprojection=use_reprojection, img_size=(img_w, img_h),
        encoder_features=encoder_features, compute_dtype=compute_dtype,
    )
    # keep the BF-calibrated base angles; only the grid + FOV margins are flags
    # (ref train_bundlefusion.py:44-48)
    cfg = cfg.replace(sphere=dataclasses.replace(
        cfg.sphere, width=sphere_w, height=sphere_h,
        add_fov_hor=add_fov_hor, add_fov_ver=add_fov_ver))
    exp_name = (f"{exp_prefix}_bf_rays{n_rays}_gauss{n_gaussians}x"
                f"{n_pts_per_gaussian}_std{std}_sigma{som_sigma}")
    print("exp_name:", exp_name)

    train_ds = BundlefusionDataset("train", root, n_sources=n_sources,
                                   frame_interval=frame_interval,
                                   n_frames=n_frames, seed=42)
    val_ds = BundlefusionDataset("val", root, n_sources=n_sources,
                                 frame_interval=frame_interval,
                                 n_frames=n_frames, seed=42)
    collate = lambda items: to_model_batch(items, cfg)
    run_training(cfg, train_ds, val_ds, collate, exp_name, logdir, n_epochs,
                 enable_log, limit_train_fraction=1.0, global_batch_size=bs,
                 max_steps_per_epoch=max_steps_per_epoch,
                 parallel_mode=parallel_mode)


if __name__ == "__main__":
    train_kitti()
