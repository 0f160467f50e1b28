"""BundleFusion end-to-end coverage on a real synthetic scene tree.

Builds the on-disk layout the reference consumes (frame-XXXXXX.color.jpg /
.depth.png [16-bit mm] / .pose.txt + info.txt, ref
scenerf/data/bundlefusion/bundlefusion_dataset.py) via
scripts/make_fake_bf.write_fake_bf, then drives the BF dataset walk, the
GT-occupancy fusion, and the full eval/recon CLI chain
(save-depth-metrics-bf -> agg -> render-colors-bf -> eval-color-bf ->
generate-novel-depths-bf -> depth2tsdf-bf -> eval-sc-bf) exactly as a user
would (ref scenerf/scripts/evaluation/*_bf.py, reconstruction/*_bf.py).
"""
import os
import pickle

import jax
import numpy as np
import pytest
from click.testing import CliRunner

from scenerf_tpu import config as C

SIZE = (64, 48)  # matches C.tiny().img_size so one checkpoint drives the chain


@pytest.fixture(scope="module")
def bf_root(tmp_path_factory):
    from scripts.make_fake_bf import write_fake_bf

    root = str(tmp_path_factory.mktemp("bf"))
    write_fake_bf(root, frames=10, size=SIZE,
                  scenes=("apt0", "apt1", "apt2", "office0", "office1",
                          "office2", "office3", "copyroom"))
    return root


@pytest.fixture(scope="module")
def bf_ckpt(tmp_path_factory):
    from scenerf_tpu.parallel.mesh import make_mesh
    from scenerf_tpu.train import Trainer
    from scenerf_tpu.utils.checkpoint import CheckpointManager

    cfg = C.tiny()
    trainer = Trainer(cfg, mesh=make_mesh(jax.devices()[:1]),
                      with_depth_eval=False)
    state = trainer.create_state(jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path_factory.mktemp("bf_ckpt"))
    CheckpointManager(ckpt_dir).save(state, cfg,
                                     metrics={"depth/abs_rel": 0.5})
    return cfg, ckpt_dir


def test_bf_dataset_walk_and_item(bf_root):
    """Scan walk + item schema (ref bundlefusion_dataset.py:33-120)."""
    from scenerf_tpu.data.bundlefusion import BundlefusionDataset, to_model_batch

    ds = BundlefusionDataset("val", bf_root, n_sources=2, frame_interval=1,
                             n_frames=4, seed=0)
    # frames 0..9, half=2: infer ids {2, 4, 6} pass the window + %2 filters
    assert len(ds) == 3
    item = ds[0]
    W, H = SIZE
    assert item["sequence"] == "copyroom"
    assert item["img_input"].shape == (H, W, 3)
    assert item["infer_depth"].shape == (H, W)
    # depth PNGs are mm uint16 -> meters float
    assert 0.5 < item["infer_depth"].mean() < 6.0
    assert len(item["img_sources"]) == 2
    assert item["T_source2infers"][0].shape == (4, 4)
    # intrinsics scale with the shrunken tree
    assert abs(item["cam_K"][0, 2] - W / 2) < 1.0

    train_ds = BundlefusionDataset("train", bf_root, n_sources=2,
                                   frame_interval=1, n_frames=4, seed=0)
    assert len(train_ds) == 7 * 3  # 7 train scenes

    cfg = C.tiny()
    batch = to_model_batch([item], cfg)
    S, G = cfg.n_sources, cfg.n_gt_depth
    assert batch["img_input"].shape == (1, H, W, 3)
    assert batch["img_sources"].shape == (1, S, H, W, 3)
    assert batch["gt_depth"].shape == (1, S, G)
    assert batch["source_mask"].sum() == min(2, S)


def test_bf_sc_gt_fusion_and_eval(bf_root, tmp_path):
    """generate-sc-gt-bf fuses GT depth at native resolution; eval-sc-bf
    scores a prediction against it (ref generate_sc_gt_bf.py:60-95,
    eval_sc_bf.py:60-110)."""
    from scenerf_tpu.cli.evaluation import eval_sc_bf
    from scenerf_tpu.cli.reconstruction import generate_sc_gt_bf

    recon = str(tmp_path / "recon")
    r = CliRunner().invoke(generate_sc_gt_bf, [
        "--root", bf_root, "--recon_save_dir", recon,
        "--frame_interval", "1", "--n_frames", "4"])
    assert r.exit_code == 0, r.output
    gt_dir = os.path.join(recon, "sc_gt", "copyroom")
    names = sorted(os.listdir(gt_dir))
    assert names == ["000002.pkl", "000004.pkl", "000006.pkl"]
    with open(os.path.join(gt_dir, names[0]), "rb") as f:
        gt = pickle.load(f)
    assert gt["tsdf_grid"].shape == gt["occ"].shape
    assert set(np.unique(gt["occ"])) <= {0, 1, 255}
    assert (gt["occ"] == 1).any(), "GT fusion found no surface voxels"

    # a prediction equal to the GT tsdf must score a solid IoU
    tsdf_dir = os.path.join(recon, "tsdf", "copyroom")
    os.makedirs(tsdf_dir)
    for n in names:
        with open(os.path.join(gt_dir, n), "rb") as f:
            grid = pickle.load(f)["tsdf_grid"]
        with open(os.path.join(tsdf_dir, n), "wb") as f:
            pickle.dump({"tsdf_grid": grid}, f)
    r = CliRunner().invoke(eval_sc_bf, [
        "--root", bf_root, "--recon_save_dir", recon,
        "--frame_interval", "1", "--n_frames", "4"])
    assert r.exit_code == 0, r.output
    assert "Scene Completion" in r.output
    iou = float(r.output.splitlines()[-1].split()[0])
    assert 0.0 < iou <= 1.0


@pytest.mark.slow
def test_bf_eval_chain(bf_root, bf_ckpt, tmp_path):
    """The whole BF eval/recon chain through the console-script commands
    (SURVEY.md section 3.4-3.5, BF flavor)."""
    from scenerf_tpu.cli.evaluation import (agg_depth_metrics_bf, eval_color_bf,
                                            eval_sc_bf, render_colors_bf,
                                            save_depth_metrics_bf)
    from scenerf_tpu.cli.reconstruction import (depth2tsdf_bf,
                                                generate_novel_depths_bf,
                                                generate_sc_gt_bf)

    _, ckpt_dir = bf_ckpt
    eval_dir = str(tmp_path / "eval")
    recon = str(tmp_path / "recon")
    runner = CliRunner()
    win = ["--frame_interval", "1", "--n_frames", "4"]

    # 1. depth metrics at nonzero depth-PNG pixels (BF has no lidar)
    r = runner.invoke(save_depth_metrics_bf, [
        "--root", bf_root, "--model_path", ckpt_dir,
        "--eval_save_dir", eval_dir] + win)
    assert r.exit_code == 0, r.output
    metric_files = sorted(os.listdir(
        os.path.join(eval_dir, "depth_metrics", "copyroom")))
    assert metric_files == ["000002.npy", "000004.npy", "000006.npy"]

    r = runner.invoke(agg_depth_metrics_bf, ["--eval_save_dir", eval_dir])
    assert r.exit_code == 0, r.output
    assert "|All     |" in r.output

    # 2. novel-view colors + metrics
    r = runner.invoke(render_colors_bf, [
        "--root", bf_root, "--model_path", ckpt_dir,
        "--eval_save_dir", eval_dir] + win)
    assert r.exit_code == 0, r.output
    renders = os.listdir(os.path.join(eval_dir, "render_rgb", "copyroom"))
    assert len(renders) == 3 * 4  # 3 frames x 4 sources

    r = runner.invoke(eval_color_bf, ["--eval_save_dir", eval_dir])
    assert r.exit_code == 0, r.output
    assert "|All     |" in r.output
    all_row = [l for l in r.output.splitlines() if "All" in l][0]
    psnr = float(all_row.split("|")[2])
    assert np.isfinite(psnr) and psnr > 0

    # 3. pose-sweep renders -> TSDF -> scene-completion IoU
    sweep = ["--step", "1.0", "--angle", "30.0", "--max_distance", "2.1"]
    r = runner.invoke(generate_novel_depths_bf, [
        "--root", bf_root, "--model_path", ckpt_dir,
        "--recon_save_dir", recon, "--scale", "2"] + sweep + win)
    assert r.exit_code == 0, r.output
    depth_files = os.listdir(os.path.join(recon, "depth", "copyroom"))
    assert len(depth_files) == 3 * 9  # 3 frames x (3 steps x 3 angles)

    r = runner.invoke(depth2tsdf_bf, [
        "--root", bf_root, "--recon_save_dir", recon] + sweep + win)
    assert r.exit_code == 0, r.output
    with open(os.path.join(recon, "tsdf", "copyroom", "000002.pkl"),
              "rb") as f:
        pred = pickle.load(f)
    assert pred["tsdf_grid"].shape == (120, 120, 96)
    assert "verts" in pred and "faces" in pred

    r = runner.invoke(generate_sc_gt_bf, [
        "--root", bf_root, "--recon_save_dir", recon] + win)
    assert r.exit_code == 0, r.output
    r = runner.invoke(eval_sc_bf, [
        "--root", bf_root, "--recon_save_dir", recon] + win)
    assert r.exit_code == 0, r.output
    assert "Scene Completion" in r.output
