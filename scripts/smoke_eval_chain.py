"""End-to-end eval/recon chain on the smoke checkpoint + fake KITTI tree:
save_depth_metrics -> agg -> render_colors -> eval_color ->
generate_novel_depths -> depth2tsdf -> eval_sr.

Paths are env-overridable (SMOKE_ROOT/SMOKE_PREP/SMOKE_RUN/SMOKE_EVAL/
SMOKE_RECON) and every stage's wall-clock is printed and summarized, so one
hardware run records the whole pipeline's per-stage cost (VERDICT r4 next 7).
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.environ.get("SMOKE_ROOT", "/tmp/fake_kitti")
PREP = os.environ.get("SMOKE_PREP", "/tmp/fake_kitti_prep")
RUN = os.environ.get("SMOKE_RUN", "/tmp/fake_run")
CKPT = None
for d in os.listdir(os.path.join(RUN, "ckpts")):
    CKPT = os.path.join(RUN, "ckpts", d)
EVAL = os.environ.get("SMOKE_EVAL", "/tmp/fake_eval")
RECON = os.environ.get("SMOKE_RECON", "/tmp/fake_recon")

# ---- fake voxel GT: ground plane (road) + a wall (building) ----
# (sequence 08 = the KITTI val split the eval CLIs read, data/kitti.SPLITS)
vox_dir = os.path.join(ROOT, "dataset/sequences/08/voxels")
os.makedirs(vox_dir, exist_ok=True)
from scenerf_tpu.data import io_voxel

grid = np.zeros((256, 256, 32), np.uint16)
grid[:, :, 1:3] = 40          # road at z ~ -1.7m
grid[:, 168:173, 1:12] = 50   # building wall at y ~ +8m
labels = grid.reshape(-1)
invalid = np.zeros(256 * 256 * 32, np.uint8)
for i in range(0, 24, 5):
    labels.astype(np.uint16).tofile(f"{vox_dir}/{i:06d}.label")
    io_voxel.pack(invalid).tofile(f"{vox_dir}/{i:06d}.invalid")
    # .bin = packed occupancy; the val split anchors on voxels/*.bin
    io_voxel.pack((labels > 0).astype(np.uint8)).tofile(
        f"{vox_dir}/{i:06d}.bin")
print("wrote fake voxel GT", flush=True)

common_args = ["--root", ROOT, "--preprocess_root", PREP,
               "--model_path", CKPT, "--sequence_distance", "2.0",
               "--frames_interval", "0.4"]

stage_s = {}


def run(cmd, args):
    print(f"\n==== {cmd.name} ====", flush=True)
    t0 = time.time()
    cmd(args=args, standalone_mode=False)
    stage_s[cmd.name] = round(time.time() - t0, 1)
    print(f"==== {cmd.name}: {stage_s[cmd.name]}s ====", flush=True)


from scenerf_tpu.cli import evaluation as E
from scenerf_tpu.cli import reconstruction as Rc

run(E.save_depth_metrics, common_args + ["--eval_save_dir", EVAL])
run(E.agg_depth_metrics, ["--eval_save_dir", EVAL])
run(E.render_colors, common_args + ["--eval_save_dir", EVAL])
run(E.eval_color, ["--eval_save_dir", EVAL])
run(Rc.generate_novel_depths, common_args + [
    "--eval_save_dir", EVAL, "--recon_save_dir", RECON,
    "--scale", "2", "--angle", "10.0", "--step", "0.5",
    "--max_distance", "1.1"])
run(Rc.depth2tsdf, common_args + [
    "--eval_save_dir", EVAL, "--recon_save_dir", RECON,
    "--angle", "10.0", "--step", "0.5", "--max_distance", "1.1"])
run(E.eval_sr, common_args + ["--eval_save_dir", EVAL,
                              "--recon_save_dir", RECON])
print("\nSTAGE WALL-CLOCK: " + json.dumps(stage_s), flush=True)
print("\nEVAL CHAIN COMPLETE", flush=True)
