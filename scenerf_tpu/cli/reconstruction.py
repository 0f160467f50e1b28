"""Reconstruction entry points: novel-depth sweeps, TSDF fusion, and
BundleFusion GT occupancy.

Contract: ref scenerf/scripts/reconstruction/* -- pose sweeps, file layouts,
and TSDF volumes match; the pose sweep is rendered on-device per frame and the
TSDF integrates the whole sweep in a single lax.scan (the reference loops
python-side per pose).
"""
from __future__ import annotations

import os
import pickle

import click
import jax
import numpy as np

from scenerf_tpu import geometry as geo
from scenerf_tpu.cli import common
from scenerf_tpu.cli.evaluation import (_add_opts, _bf_val_ds, _kitti_opts,
                                        _kitti_val_ds, _item_levels)
from scenerf_tpu.fusion.tsdf import TSDFVolume, tsdf_to_gt_occupancy


def _upsample_to(img: np.ndarray, out_hw, channels_last=True) -> np.ndarray:
    """Bilinear upsample (align_corners=False) to full resolution
    (ref generate_novel_depths.py:129-142)."""
    if img.ndim == 2:
        return np.asarray(jax.image.resize(jax.numpy.asarray(img), out_hw,
                                           method="bilinear"))
    return np.asarray(jax.image.resize(jax.numpy.asarray(img),
                                       (*out_hw, img.shape[-1]),
                                       method="bilinear"))


def _generate_novel_depths_impl(dataset, model_path, recon_save_dir, scale,
                                rel_poses, chunk=5000, n_devices=0):
    import jax.numpy as jnp

    from scenerf_tpu.rendering import FeaturePyramid

    model, state, cfg = common.load_model(model_path)
    variables = state.variables()
    key = jax.random.PRNGKey(0)
    W, H = cfg.img_size
    pose_names = [f"_{step}_{angle}" for (step, angle) in rel_poses.keys()]
    pose_stack = jnp.asarray(np.stack([np.asarray(p) for p in rel_poses.values()]))

    # the whole sweep renders as one program per frame (lax.map over poses);
    # with >1 visible device the per-pose pixel grid is sharded over the mesh
    # (parallel/sharded_render.make_sharded_pose_sweep) -- identical output
    # (shard-invariant noise), ~n_devices x faster than the reference's
    # serial per-pose loop (ref generate_novel_depths.py:116-152)
    devices = jax.devices()
    devices = list(devices if n_devices <= 0 else devices[:n_devices])
    if len(devices) > 1:
        from scenerf_tpu.parallel.mesh import make_mesh
        from scenerf_tpu.parallel.sharded_render import make_sharded_pose_sweep
        sweep = make_sharded_pose_sweep(model, make_mesh(devices),
                                        stride=scale, ray_chunk=chunk)
    else:
        sweep = jax.jit(lambda v, lv, K, poses, k: model.render_pose_sweep(
            v, FeaturePyramid(levels=lv), K, poses, k, stride=scale,
            ray_chunk=chunk))

    for idx in range(len(dataset)):
        item = dataset[idx]
        frame_id, sequence = item["frame_id"], item["sequence"]
        depth_dir = os.path.join(recon_save_dir, "depth", sequence)
        visual_dir = os.path.join(recon_save_dir, "depth_visual", sequence)
        rgb_dir = os.path.join(recon_save_dir, "render_rgb", sequence)
        for d in (depth_dir, visual_dir, rgb_dir):
            os.makedirs(d, exist_ok=True)

        names = [f"{frame_id}{pn}" for pn in pose_names]
        if all(os.path.exists(os.path.join(depth_dir, n + ".npy"))
               and os.path.exists(os.path.join(visual_dir, n + ".png"))
               and os.path.exists(os.path.join(rgb_dir, n + ".png"))
               for n in names):
            continue

        lv_all, _ = common.encode_frame(model, state, item["img_input"],
                                        item["cam_K"])
        levels = _item_levels(lv_all)
        out = sweep(variables, levels, jnp.asarray(item["cam_K"]), pose_stack,
                    jax.random.fold_in(key, idx))
        depths = np.asarray(out["depth"])   # [P, h, w]
        colors = np.asarray(out["color"])   # [P, h, w, 3]

        for pi, name in enumerate(names):
            depth_im, color_im = depths[pi], colors[pi]
            if scale != 1:
                depth_im = _upsample_to(depth_im, (H, W))
                color_im = _upsample_to(color_im, (H, W))
            np.save(os.path.join(depth_dir, name + ".npy"), depth_im)
            common.save_color_png(os.path.join(rgb_dir, name + ".png"), color_im)
            common.save_depth_visual(os.path.join(visual_dir, name + ".png"),
                                     depth_im)
        print(f"saved sweep for frame {frame_id} ({len(names)} poses)")


@click.command(cls=common.SetupCommand)
@_add_opts(_kitti_opts)
@click.option("--recon_save_dir", default="")
@click.option("--scale", default=2, help="render stride")
@click.option("--angle", default=10.0)
@click.option("--step", default=0.5)
@click.option("--max_distance", default=10.1)
@click.option("--n_devices", default=0, help="devices to shard the sweep over (0=all)")
def generate_novel_depths(root, preprocess_root, model_path, eval_save_dir,
                          sequence_distance, frames_interval, recon_save_dir,
                          scale, angle, step, max_distance, n_devices):
    """Render depth+RGB for the synthetic pose sweep on every val frame
    (ref reconstruction/generate_novel_depths.py)."""
    ds = _kitti_val_ds(root, preprocess_root, sequence_distance, frames_interval)
    rel_poses = geo.sample_rel_poses(step=step, angle=angle,
                                     max_distance=max_distance)
    _generate_novel_depths_impl(ds, model_path, recon_save_dir, scale, rel_poses,
                                n_devices=n_devices)


@click.command(cls=common.SetupCommand)
@click.option("--root", default="")
@click.option("--model_path", default="")
@click.option("--recon_save_dir", default="")
@click.option("--scale", default=2)
@click.option("--angle", default=30.0)
@click.option("--step", default=0.2)
@click.option("--max_distance", default=2.1)
@click.option("--frame_interval", default=2)
@click.option("--n_frames", default=16)
@click.option("--n_devices", default=0, help="devices to shard the sweep over (0=all)")
def generate_novel_depths_bf(root, model_path, recon_save_dir, scale, angle,
                             step, max_distance, frame_interval, n_frames,
                             n_devices):
    """BundleFusion pose-sweep rendering
    (ref reconstruction/generate_novel_depths_bf.py)."""
    ds = _bf_val_ds(root, frame_interval, n_frames)
    rel_poses = {
        (f"{s:.2f}", f"{a:.2f}"): p
        for (s, a), p in geo.sample_rel_poses_bf(
            angle=angle, max_distance=max_distance, step=step).items()
    }
    _generate_novel_depths_impl(ds, model_path, recon_save_dir, scale, rel_poses,
                                n_devices=n_devices)


# --------------------------------------------------------------------------- #
# depth2tsdf
# --------------------------------------------------------------------------- #


def _load_sweep_frames(recon_save_dir, sequence, frame_id, rel_poses):
    from PIL import Image

    depth_dir = os.path.join(recon_save_dir, "depth", sequence)
    rgb_dir = os.path.join(recon_save_dir, "render_rgb", sequence)
    depths, colors, poses = [], [], []
    for (step, angle), rel_pose in rel_poses.items():
        name = f"{frame_id}_{step}_{angle}"
        depth_path = os.path.join(depth_dir, name + ".npy")
        rgb_path = os.path.join(rgb_dir, name + ".png")
        if not (os.path.exists(depth_path) and os.path.exists(rgb_path)):
            continue
        depths.append(np.load(depth_path))
        img = np.array(Image.open(rgb_path).convert("RGB"), np.float32)
        colors.append(img)
        poses.append(np.asarray(rel_pose))
    return depths, colors, poses


@click.command(cls=common.SetupCommand)
@_add_opts(_kitti_opts)
@click.option("--recon_save_dir", default="")
@click.option("--angle", default=10.0)
@click.option("--step", default=0.5)
@click.option("--max_distance", default=10.1)
def depth2tsdf(root, preprocess_root, model_path, eval_save_dir,
               sequence_distance, frames_interval, recon_save_dir, angle,
               step, max_distance):
    """Fuse the rendered pose sweep into a TSDF volume per val frame
    (ref reconstruction/depth2tsdf.py): 256x256x32 @ 0.2m, origin
    (0, -25.6, -2), camera pose inv(T_velo2cam) @ rel_pose."""
    ds = _kitti_val_ds(root, preprocess_root, sequence_distance, frames_interval)
    rel_poses = geo.sample_rel_poses(step=step, angle=angle,
                                     max_distance=max_distance)
    for idx in range(len(ds)):
        item = ds[idx]
        frame_id, sequence = item["frame_id"], item["sequence"]
        tsdf_dir = os.path.join(recon_save_dir, "tsdf", sequence)
        os.makedirs(tsdf_dir, exist_ok=True)
        tsdf_path = os.path.join(tsdf_dir, frame_id + ".npy")
        if os.path.exists(tsdf_path):
            continue
        depths, colors, poses = _load_sweep_frames(
            recon_save_dir, sequence, frame_id, rel_poses)
        if not depths:
            continue

        scene_size = np.array([51.2, 51.2, 6.4])
        vox_origin = np.array([0, -25.6, -2])
        vol_bnds = np.stack([vox_origin, vox_origin + scene_size], axis=1)
        vol = TSDFVolume(vol_bnds, voxel_size=0.2, trunc_margin=10.0)

        T_velo2cam = item["T_velo_2_cam"]
        cam_poses = [np.linalg.inv(T_velo2cam) @ p for p in poses]
        cam_K = item["cam_K"]
        vol.integrate_frames(np.stack(colors), np.stack(depths),
                             np.tile(cam_K[None], (len(depths), 1, 1)),
                             np.stack(cam_poses))
        tsdf_grid, _ = vol.get_volume()
        np.save(tsdf_path, tsdf_grid)
        print("saved to", tsdf_path)


@click.command(cls=common.SetupCommand)
@click.option("--root", default="")
@click.option("--recon_save_dir", default="")
@click.option("--angle", default=30.0)
@click.option("--step", default=0.2)
@click.option("--max_distance", default=2.1)
@click.option("--frame_interval", default=2)
@click.option("--n_frames", default=16)
def depth2tsdf_bf(root, recon_save_dir, angle, step, max_distance,
                  frame_interval, n_frames):
    """BundleFusion TSDF fusion: 120x120x96 @ 0.04m, origin (-2.4, -2.4, 0),
    pose = rel_pose, depth intrinsics; stores pkl with tsdf + mesh
    (ref reconstruction/depth2tsdf_bf.py)."""
    ds = _bf_val_ds(root, frame_interval, n_frames)
    rel_poses = {
        (f"{s:.2f}", f"{a:.2f}"): p
        for (s, a), p in geo.sample_rel_poses_bf(
            angle=angle, max_distance=max_distance, step=step).items()
    }
    for idx in range(len(ds)):
        item = ds[idx]
        frame_id, sequence = item["frame_id"], item["sequence"]
        tsdf_dir = os.path.join(recon_save_dir, "tsdf", sequence)
        os.makedirs(tsdf_dir, exist_ok=True)
        tsdf_path = os.path.join(tsdf_dir, frame_id + ".pkl")
        if os.path.exists(tsdf_path):
            continue
        depths, colors, poses = _load_sweep_frames(
            recon_save_dir, sequence, frame_id, rel_poses)
        if not depths:
            continue

        sx, sy, sz = 4.8, 4.8, 3.84
        vox_origin = np.array([-sx / 2, -sy / 2, 0.0])
        vol_bnds = np.stack([vox_origin, vox_origin + np.array([sx, sy, sz])],
                            axis=1)
        vol = TSDFVolume(vol_bnds, voxel_size=0.04, trunc_margin=10.0)
        cam_K = item["cam_K_depth"]
        vol.integrate_frames(np.stack(colors), np.stack(depths),
                             np.tile(cam_K[None], (len(depths), 1, 1)),
                             np.stack(poses))
        verts, faces, norms, colors_v = vol.get_mesh()
        tsdf_grid, _ = vol.get_volume()
        with open(tsdf_path, "wb") as f:
            pickle.dump({"tsdf_grid": tsdf_grid, "verts": verts,
                         "faces": faces, "norms": norms, "colors": colors_v}, f)
        print("wrote to", tsdf_path)


@click.command(cls=common.SetupCommand)
@click.option("--root", default="")
@click.option("--recon_save_dir", default="")
@click.option("--frame_interval", default=2)
@click.option("--n_frames", default=16)
def generate_sc_gt_bf(root, recon_save_dir, frame_interval, n_frames):
    """Build BundleFusion GT occupancy by fusing the GT depth maps of all
    source frames (ref reconstruction/generate_sc_gt_bf.py)."""
    ds = _bf_val_ds(root, frame_interval, n_frames)
    for idx in range(len(ds)):
        item = ds[idx]
        frame_id, sequence = item["frame_id"], item["sequence"]
        gt_dir = os.path.join(recon_save_dir, "sc_gt", sequence)
        os.makedirs(gt_dir, exist_ok=True)
        gt_path = os.path.join(gt_dir, frame_id + ".pkl")
        if os.path.exists(gt_path):
            continue

        sx, sy, sz = 4.8, 4.8, 3.84
        voxel_size = 0.04
        vox_origin = np.array([-sx / 2, -sy / 2, 0.0])
        vol_bnds = np.stack([vox_origin, vox_origin + np.array([sx, sy, sz])],
                            axis=1)
        vol = TSDFVolume(vol_bnds, voxel_size=voxel_size, trunc_margin=10.0)
        cam_K = item["cam_K_depth"]

        depths, colors, poses = [], [], []
        for sid in range(len(item["img_sources"])):
            # fuse at the depth map's native resolution: the reference
            # interpolates to (480, 640) (ref generate_sc_gt_bf.py:78), a
            # no-op at the dataset's native size, and cam_K_depth is
            # calibrated for that native size
            depths.append(item["source_depths"][sid])
            colors.append(item["img_sources"][sid] * 255.0)
            poses.append(item["T_source2infers"][sid])
        vol.integrate_frames(np.stack(colors), np.stack(depths),
                             np.tile(cam_K[None], (len(depths), 1, 1)),
                             np.stack(poses))
        tsdf_grid, _ = vol.get_volume()
        occ = tsdf_to_gt_occupancy(tsdf_grid, voxel_size)
        with open(gt_path, "wb") as f:
            pickle.dump({"tsdf_grid": tsdf_grid, "occ": occ.astype(np.uint8)}, f)
        print("wrote to", gt_path)


@click.command(cls=common.SetupCommand)
@click.option("--img_w", default=1220)
@click.option("--img_h", default=370)
@click.option("--fx", default=707.0912)
@click.option("--fy", default=707.0912)
@click.option("--cx", default=601.8873)
@click.option("--cy", default=183.1104)
def determine_angles(img_w, img_h, fx, fy, cx, cy):
    """FOV calibration: min/max spherical angles of a camera's pixel grid
    (ref scenerf/scripts/determine_angles.py)."""
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    out = geo.determine_angles(np.linalg.inv(K), img_w, img_h)
    for k, v in out.items():
        print(f"{k}: {v:.4f}")
    return out
