"""Evaluation entry points: novel-depth metrics, novel-view rendering/metrics,
and scene-reconstruction metrics.

Contract: ref scenerf/scripts/evaluation/* -- file layouts, metric grouping by
ceil(source distance), fixed-format tables, and idempotent output-file skipping
(the reference's poor-man's work queue) are all preserved, for both the KITTI
and BundleFusion variants (one parameterized implementation each).
"""
from __future__ import annotations

import glob
import math
import os
import pickle
import shutil
from collections import defaultdict

import click
import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu import rendering as R
from scenerf_tpu.cli import common
from scenerf_tpu.utils.image_metrics import psnr, ssim
from scenerf_tpu.utils.ssc_metrics import SSCMetrics
from scenerf_tpu.fusion.tsdf import tsdf2occ, tsdf2occ_bf


# --------------------------------------------------------------------------- #
# shared eval machinery
# --------------------------------------------------------------------------- #


def compute_depth_errors_np(gt, pred, min_depth=1e-3, max_depth=80.0):
    """numpy Eigen metrics returning the reference's 7-vector
    (ref loss/depth_metrics.py:3-23)."""
    pred = np.clip(pred, min_depth, max_depth)
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()
    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())
    abs_rel = np.mean(np.abs(gt - pred) / gt)
    sq_rel = np.mean((gt - pred) ** 2 / gt)
    return np.array([abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3])


def make_ray_renderer(model, chunk: int, devices=None):
    """One jitted renderer reused across frames/sources (the reference
    re-launches python chunk loops per call; here a single compiled program).

    With more than one visible device the pixel batch is sharded over a 1-D
    mesh (parallel/sharded_render): per-ray noise is a function of the global
    ray index, so the gathered result is identical to the single-device render
    and sharding cuts the reference's slowest pipelines (every LiDAR pixel of
    every source of every val frame, ref save_depth_metrics.py:113) by
    ~n_devices. The returned fn carries `.pad_to`, the granule callers must
    pad ray counts to (render_depth_at_pixels does)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if len(devices) > 1:
        from scenerf_tpu.parallel.mesh import make_mesh
        from scenerf_tpu.parallel.sharded_render import make_sharded_renderer
        render = make_sharded_renderer(model, make_mesh(devices),
                                       ray_chunk=chunk)
        render.pad_to = chunk * len(devices)
        return render

    @jax.jit
    def render(variables, levels, cam_K, T, pixels, key):
        pyr = R.FeaturePyramid(levels=levels)
        return model.render_rays(variables, pyr, cam_K, T, pixels, key,
                                 ray_chunk=chunk, remat=False)

    render.pad_to = chunk
    return render


def render_depth_at_pixels(render_fn, variables, levels, cam_K, T, pixels,
                           chunk, key):
    pad_to = getattr(render_fn, "pad_to", chunk)
    padded, mask = R.pad_rays(jnp.asarray(pixels, jnp.float32), pad_to)
    out = render_fn(variables, levels, jnp.asarray(cam_K), jnp.asarray(T),
                    padded, key)
    n = pixels.shape[0]
    return np.asarray(out["depth"])[:n], np.asarray(out["color"])[:n]


def _item_levels(levels, i=0):
    return tuple(levels[k][i] for k in ("1_1", "1_2", "1_4", "1_8", "1_16"))


# --------------------------------------------------------------------------- #
# save_depth_metrics / agg_depth_metrics
# --------------------------------------------------------------------------- #


def _select_devices(n_devices: int = 0):
    """All visible devices (n_devices=0) or the first n (eval renders shard
    the pixel batch over them, identical results -- see make_ray_renderer)."""
    devs = jax.devices()
    return list(devs if n_devices <= 0 else devs[:n_devices])


def _save_depth_metrics_impl(dataset, model_path, eval_save_dir, eval_depth,
                             chunk=4000, n_devices=0):
    model, state, cfg = common.load_model(model_path)
    variables = state.variables()
    render_fn = make_ray_renderer(model, chunk,
                                  devices=_select_devices(n_devices))
    key = jax.random.PRNGKey(0)

    for idx in range(len(dataset)):
        item = dataset[idx]
        frame_id, sequence = item["frame_id"], item["sequence"]
        save_dir = os.path.join(eval_save_dir, "depth_metrics", sequence)
        os.makedirs(save_dir, exist_ok=True)
        save_filepath = os.path.join(save_dir, f"{frame_id}.npy")
        if os.path.exists(save_filepath):
            continue

        levels, _ = common.encode_frame(model, state, item["img_input"],
                                        item["cam_K"])
        lv = _item_levels(levels)

        agg, n_frames = {}, {}
        for sid in range(len(item["img_sources"])):
            if "loc2d_with_depths" in item:  # KITTI: lidar pixels
                pixels = item["loc2d_with_depths"][sid].astype(np.float32)
                gt = item["lidar_depths"][sid]
                dist = item["source_distances"][sid]
            else:  # BundleFusion: nonzero depth-PNG pixels
                depth_im = item["source_depths"][sid]
                ys, xs = np.nonzero(depth_im > 0)
                pixels = np.stack([xs, ys], -1).astype(np.float32)
                gt = depth_im[ys, xs]
                dist = float(np.linalg.norm(
                    item["T_source2infers"][sid][:3, 3]))
            if len(gt) == 0:
                continue
            pred, _ = render_depth_at_pixels(
                render_fn, variables, lv, item["cam_K"],
                item["T_source2infers"][sid], pixels, chunk,
                jax.random.fold_in(key, sid))
            errors = compute_depth_errors_np(np.asarray(gt), pred,
                                             max_depth=eval_depth)
            k = math.ceil(dist)
            if k not in agg:
                agg[k], n_frames[k] = errors, 1
            else:
                agg[k] = agg[k] + errors
                n_frames[k] += 1

        with open(save_filepath, "wb") as f:
            pickle.dump({"depth_errors": agg, "n_frames": n_frames}, f)
        print(f"==== Frame {frame_id} ====")
        common.print_depth_metrics_table(agg, n_frames)


def _agg_depth_metrics_impl(eval_save_dir, sequences):
    agg, n_frames = {}, {}
    for sequence in sequences:
        for path in sorted(glob.glob(os.path.join(
                eval_save_dir, "depth_metrics", sequence, "*.npy"))):
            with open(path, "rb") as f:
                data = pickle.load(f)
            for k in data["depth_errors"]:
                if k not in agg:
                    agg[k] = data["depth_errors"][k]
                    n_frames[k] = data["n_frames"][k]
                else:
                    agg[k] = agg[k] + data["depth_errors"][k]
                    n_frames[k] += data["n_frames"][k]
    print("====== Total ======")
    common.print_depth_metrics_table(agg, n_frames)
    return agg, n_frames


_kitti_opts = [
    click.option("--root", default=""),
    click.option("--preprocess_root", default=""),
    click.option("--model_path", default=""),
    click.option("--eval_save_dir", default=""),
    click.option("--sequence_distance", default=10.0),
    click.option("--frames_interval", default=0.4),
]


def _add_opts(opts):
    def deco(f):
        for opt in reversed(opts):
            f = opt(f)
        return f
    return deco


def _kitti_val_ds(root, preprocess_root, sequence_distance, frames_interval,
                  load_voxels=False):
    from scenerf_tpu.data.kitti import KittiDataset
    return KittiDataset(
        "val", root, preprocess_root, frames_interval=frames_interval,
        sequence_distance=sequence_distance, n_sources=1000,
        n_rays=1_000_000, load_voxels=load_voxels, seed=0)


def _bf_val_ds(root, frame_interval=2, n_frames=16):
    from scenerf_tpu.data.bundlefusion import BundlefusionDataset
    return BundlefusionDataset("val", root, n_sources=1000,
                               frame_interval=frame_interval,
                               n_frames=n_frames, seed=0)


@click.command(cls=common.SetupCommand)
@_add_opts(_kitti_opts)
@click.option("--n_devices", default=0, help="devices to shard eval renders over (0=all)")
def save_depth_metrics(root, preprocess_root, model_path, eval_save_dir,
                       sequence_distance, frames_interval, n_devices):
    """Render depth at LiDAR pixels for every val source frame; save per-frame
    error pickles (ref evaluation/save_depth_metrics.py)."""
    ds = _kitti_val_ds(root, preprocess_root, sequence_distance, frames_interval)
    _save_depth_metrics_impl(ds, model_path, eval_save_dir, eval_depth=80.0,
                             n_devices=n_devices)


@click.command(cls=common.SetupCommand)
@click.option("--root", default="")
@click.option("--model_path", default="")
@click.option("--eval_save_dir", default="")
@click.option("--frame_interval", default=2)
@click.option("--n_frames", default=16)
@click.option("--n_devices", default=0, help="devices to shard eval renders over (0=all)")
def save_depth_metrics_bf(root, model_path, eval_save_dir, frame_interval,
                          n_frames, n_devices):
    """BundleFusion variant (ref evaluation/save_depth_metrics_bf.py)."""
    ds = _bf_val_ds(root, frame_interval, n_frames)
    _save_depth_metrics_impl(ds, model_path, eval_save_dir, eval_depth=10.0,
                             n_devices=n_devices)


@click.command(cls=common.SetupCommand)
@click.option("--eval_save_dir", default="")
def agg_depth_metrics(eval_save_dir):
    """Aggregate per-frame depth-error pickles into the per-distance table
    (ref evaluation/agg_depth_metrics.py)."""
    _agg_depth_metrics_impl(eval_save_dir, ["08"])


@click.command(cls=common.SetupCommand)
@click.option("--eval_save_dir", default="")
def agg_depth_metrics_bf(eval_save_dir):
    """BundleFusion variant (ref evaluation/agg_depth_metrics_bf.py)."""
    _agg_depth_metrics_impl(eval_save_dir, ["copyroom"])


# --------------------------------------------------------------------------- #
# render_colors / eval_color
# --------------------------------------------------------------------------- #


def _render_colors_impl(dataset, model_path, eval_save_dir, stride, chunk,
                        source_image_saver, upsample_to=None, n_devices=0):
    model, state, cfg = common.load_model(model_path)
    variables = state.variables()
    render_fn = make_ray_renderer(model, chunk,
                                  devices=_select_devices(n_devices))
    key = jax.random.PRNGKey(0)
    pixels, grid_shape = common.strided_pixel_grid(cfg.img_size, stride)

    for idx in range(len(dataset)):
        item = dataset[idx]
        frame_id, sequence = item["frame_id"], item["sequence"]
        rgb_save_dir = os.path.join(eval_save_dir, "rgb", sequence)
        render_save_dir = os.path.join(eval_save_dir, "render_rgb", sequence)
        os.makedirs(rgb_save_dir, exist_ok=True)
        os.makedirs(render_save_dir, exist_ok=True)

        levels = None
        for sid in range(len(item["img_sources"])):
            if "source_distances" in item:
                dist = item["source_distances"][sid]
            else:
                dist = float(np.linalg.norm(item["T_source2infers"][sid][:3, 3]))
            source_frame_id = item["source_frame_ids"][sid]
            name = f"{frame_id}_{source_frame_id}_{dist:.2f}.png"
            rgb_filepath = os.path.join(rgb_save_dir, name)
            render_filepath = os.path.join(render_save_dir, name)
            if os.path.exists(render_filepath):
                continue
            if not os.path.exists(rgb_filepath):
                source_image_saver(item, sid, rgb_filepath)

            if levels is None:
                lv_all, _ = common.encode_frame(model, state, item["img_input"],
                                                item["cam_K"])
                levels = _item_levels(lv_all)
            _, color = render_depth_at_pixels(
                render_fn, variables, levels, item["cam_K"],
                item["T_source2infers"][sid], pixels, chunk,
                jax.random.fold_in(key, idx * 1000 + sid))
            # grid is W-major (n_x, n_y): transpose to (H, W, 3)
            img = color.reshape(grid_shape[0], grid_shape[1], 3)
            img = np.transpose(img, (1, 0, 2))
            if upsample_to is not None:
                # BF saves renders upsampled back to full resolution
                # (ref render_colors_bf.py:146-155)
                img = np.asarray(jax.image.resize(
                    jnp.asarray(img), (*upsample_to, 3), method="bilinear"))
            common.save_color_png(render_filepath, img)
            print("Color saved", render_filepath)


@click.command(cls=common.SetupCommand)
@_add_opts(_kitti_opts)
@click.option("--n_devices", default=0, help="devices to shard eval renders over (0=all)")
def render_colors(root, preprocess_root, model_path, eval_save_dir,
                  sequence_distance, frames_interval, n_devices):
    """Render novel RGB views at stride 3 for every val source frame
    (ref evaluation/render_colors.py)."""
    ds = _kitti_val_ds(root, preprocess_root, sequence_distance, frames_interval)

    def save_src(item, sid, path):
        src = os.path.join(root, "dataset/sequences/08/image_2",
                           f"{item['source_frame_ids'][sid]}.png")
        shutil.copyfile(src, path)

    _render_colors_impl(ds, model_path, eval_save_dir, stride=3, chunk=4000,
                        source_image_saver=save_src, n_devices=n_devices)


@click.command(cls=common.SetupCommand)
@click.option("--root", default="")
@click.option("--model_path", default="")
@click.option("--eval_save_dir", default="")
@click.option("--frame_interval", default=2)
@click.option("--n_frames", default=16)
@click.option("--n_devices", default=0, help="devices to shard eval renders over (0=all)")
def render_colors_bf(root, model_path, eval_save_dir, frame_interval, n_frames,
                     n_devices):
    """BundleFusion novel-view rendering at stride 2
    (ref evaluation/render_colors_bf.py)."""
    ds = _bf_val_ds(root, frame_interval, n_frames)

    def save_src(item, sid, path):
        common.save_color_png(path, item["img_sources"][sid])

    _render_colors_impl(ds, model_path, eval_save_dir, stride=2, chunk=4000,
                        source_image_saver=save_src, upsample_to=(480, 640),
                        n_devices=n_devices)


def _eval_color_impl(eval_save_dir, sequence, resize, skip_frames=(),
                     lpips_weights=None):
    from PIL import Image

    lpips_metric = None
    if lpips_weights:
        from scenerf_tpu.utils.lpips import LPIPS
        if isinstance(lpips_weights, str):  # converted npz
            lpips_metric = LPIPS.from_npz(lpips_weights)
        else:  # (vgg_state_path, lpips_state_path) torch dicts
            lpips_metric = LPIPS.from_torch_checkpoint(*lpips_weights)
    else:
        # do NOT silently report 0 -- the reference's lpips column is a
        # published metric (ref eval_color.py:16-27)
        print("LPIPS: skipped (no weights supplied -- see "
              "scripts/convert_lpips_weights.py)")

    rgb_dir = os.path.join(eval_save_dir, "rgb", sequence)
    render_dir = os.path.join(eval_save_dir, "render_rgb", sequence)
    psnr_a, ssim_a, lpips_a = (defaultdict(float) for _ in range(3))
    cnt_a = defaultdict(int)
    for rgb_path in sorted(glob.glob(os.path.join(rgb_dir, "*.png"))):
        filename = os.path.basename(rgb_path)
        parts = filename[:-4].split("_")
        frame_id, source_distance = parts[0], float(parts[-1])
        if frame_id in skip_frames:
            continue
        render_path = os.path.join(render_dir, filename)
        if not os.path.exists(render_path):
            continue
        rgb = Image.open(rgb_path).convert("RGB").resize(resize)
        rgb = np.array(rgb, np.float32) / 255.0
        rendered = Image.open(render_path).convert("RGB")
        if rendered.size != resize:
            rendered = rendered.resize(resize)
        rendered = np.array(rendered, np.float32) / 255.0

        k = math.ceil(source_distance)
        psnr_a[k] += psnr(rendered, rgb)
        ssim_a[k] += ssim(rendered, rgb)
        if lpips_metric is not None:
            lpips_a[k] += float(lpips_metric(
                jnp.asarray((rendered - 0.5) * 2), jnp.asarray((rgb - 0.5) * 2)))
        cnt_a[k] += 1
    common.print_color_metrics_table(psnr_a, ssim_a, lpips_a, cnt_a,
                                     lpips_enabled=lpips_metric is not None)
    return psnr_a, ssim_a, lpips_a, cnt_a


@click.command(cls=common.SetupCommand)
@click.option("--eval_save_dir", default="")
@click.option("--lpips_weights", default="",
              help="converted lpips npz (scripts/convert_lpips_weights.py)")
@click.option("--lpips_vgg_path", default="", help="torchvision vgg16 state dict")
@click.option("--lpips_lin_path", default="", help="lpips linear weights state dict")
def eval_color(eval_save_dir, lpips_weights, lpips_vgg_path, lpips_lin_path):
    """PSNR/SSIM/LPIPS on rendered novel views, grouped by distance
    (ref evaluation/eval_color.py; 407x124 comparisons)."""
    from scenerf_tpu.data.kitti import VAL_ERROR_FRAMES
    weights = lpips_weights or (
        (lpips_vgg_path, lpips_lin_path) if lpips_vgg_path else None)
    _eval_color_impl(eval_save_dir, "08", (407, 124),
                     skip_frames=VAL_ERROR_FRAMES, lpips_weights=weights)


@click.command(cls=common.SetupCommand)
@click.option("--eval_save_dir", default="")
@click.option("--lpips_weights", default="",
              help="converted lpips npz (scripts/convert_lpips_weights.py)")
@click.option("--lpips_vgg_path", default="")
@click.option("--lpips_lin_path", default="")
def eval_color_bf(eval_save_dir, lpips_weights, lpips_vgg_path, lpips_lin_path):
    """BundleFusion novel-view metrics at full 640x480
    (ref evaluation/eval_color_bf.py)."""
    weights = lpips_weights or (
        (lpips_vgg_path, lpips_lin_path) if lpips_vgg_path else None)
    # BF compares at full 640x480 (ref eval_color_bf.py:85-91: no resize)
    _eval_color_impl(eval_save_dir, "copyroom", (640, 480),
                     lpips_weights=weights)


# --------------------------------------------------------------------------- #
# eval_sr / eval_sc_bf
# --------------------------------------------------------------------------- #


@click.command(cls=common.SetupCommand)
@_add_opts(_kitti_opts)
@click.option("--recon_save_dir", default="")
def eval_sr(root, preprocess_root, model_path, eval_save_dir,
            sequence_distance, frames_interval, recon_save_dir):
    """Scene-reconstruction occupancy IoU/P/R against SemanticKITTI voxel GT
    (ref evaluation/eval_sr.py)."""
    ds = _kitti_val_ds(root, preprocess_root, sequence_distance,
                       frames_interval, load_voxels=True)
    metric, fov_metric = SSCMetrics(2), SSCMetrics(2)
    for idx in range(len(ds)):
        item = ds[idx]
        target = item["target_1_1"]
        fov_mask = item["fov_mask_1"].reshape(target.shape)
        tsdf_path = os.path.join(recon_save_dir, "tsdf", item["sequence"],
                                 item["frame_id"] + ".npy")
        if not os.path.exists(tsdf_path):
            continue
        tsdf = np.load(tsdf_path)

        t = np.copy(target)
        t[target == 255] = 0
        max_z = t.nonzero()[2].max()
        occ = tsdf2occ(tsdf, 0.25, 6.0)
        occ[:, :, max_z:] = 0  # cap at lidar height (ref eval_sr.py:81-84)

        metric.add_batch(occ[None], target[None])
        fov_metric.add_batch(occ[None], target[None], fov_mask[None])

    print("==== Whole Scene ====")
    s = metric.get_stats()
    print(s["iou"], s["precision"], s["recall"])
    print("==== in FOV ====")
    s = fov_metric.get_stats()
    print(s["iou"], s["precision"], s["recall"])
    return metric.get_stats(), fov_metric.get_stats()


@click.command(cls=common.SetupCommand)
@click.option("--root", default="")
@click.option("--recon_save_dir", default="")
@click.option("--frame_interval", default=2)
@click.option("--n_frames", default=16)
def eval_sc_bf(root, recon_save_dir, frame_interval, n_frames):
    """BundleFusion scene-completion IoU/P/R against fused-depth GT occupancy
    (ref evaluation/eval_sc_bf.py)."""
    ds = _bf_val_ds(root, frame_interval, n_frames)
    metric = SSCMetrics(2)
    voxel_size = 0.04
    for idx in range(len(ds)):
        item = ds[idx]
        tsdf_path = os.path.join(recon_save_dir, "tsdf", item["sequence"],
                                 item["frame_id"] + ".pkl")
        gt_path = os.path.join(recon_save_dir, "sc_gt", item["sequence"],
                               item["frame_id"] + ".pkl")
        if not (os.path.exists(tsdf_path) and os.path.exists(gt_path)):
            continue
        with open(tsdf_path, "rb") as f:
            tsdf = pickle.load(f)["tsdf_grid"]
        with open(gt_path, "rb") as f:
            target = pickle.load(f)["occ"]
        # (ref eval_sc_bf.py:100-105: th 0.1, min voxel, max 10*voxel)
        occ = tsdf2occ_bf(tsdf, min_th=voxel_size, th=0.1,
                          max_th=voxel_size * 10, voxel_size=voxel_size)
        metric.add_batch(occ[None], np.asarray(target)[None])
    s = metric.get_stats()
    print("==== Scene Completion ====")
    print(s["iou"], s["precision"], s["recall"])
    return s
