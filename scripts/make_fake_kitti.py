"""Generate a synthetic on-disk KITTI odometry tree for smoke training.

Textured images (so photometric losses are meaningful), forward-motion poses,
and structured LiDAR (ground plane + walls) so ICP and depth GT behave.
"""
import argparse
import os

import numpy as np
from PIL import Image

p = argparse.ArgumentParser()
p.add_argument("--root", default="/tmp/fake_kitti")
p.add_argument("--frames", type=int, default=24)
p.add_argument("--sequence", default="00")
p.add_argument("--val", action="store_true", help="also emit voxel files")
args = p.parse_args()

root = args.root
seq = os.path.join(root, "dataset", "sequences", args.sequence)
os.makedirs(os.path.join(seq, "image_2"), exist_ok=True)
os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
os.makedirs(os.path.join(root, "dataset", "poses"), exist_ok=True)

with open(os.path.join(seq, "calib.txt"), "w") as f:
    f.write("P0: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    f.write("P1: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    f.write("P2: 707.0912 0 601.8873 45.758 0 707.0912 183.1104 -0.345 0 0 1 0.005\n")
    f.write("P3: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    f.write("Tr: 0.0002 -0.9999 -0.0106 -0.0028 0.0104 0.0106 -0.9999 -0.0753 "
            "0.9999 0.0001 0.0105 -0.2721\n")

rng = np.random.default_rng(0)
lines = []
for i in range(args.frames):
    T = np.eye(4)
    T[2, 3] = 0.5 * i  # forward along cam z
    lines.append(" ".join(f"{v:.6f}" for v in T[:3].reshape(-1)))

    # scene texture that translates with the camera (crude parallax)
    yy, xx = np.mgrid[0:376, 0:1241].astype(np.float32)
    phase = i * 18.0
    img = np.stack([
        0.5 + 0.4 * np.sin((xx + phase) / 17.0),
        0.5 + 0.4 * np.sin((yy + phase * 0.5) / 23.0),
        0.5 + 0.4 * np.sin((xx + yy + phase) / 31.0),
    ], axis=-1)
    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img).save(os.path.join(seq, "image_2", f"{i:06d}.png"))

    # lidar: ground plane + two side walls + frontal clutter (velo frame:
    # x forward, y left, z up)
    n = 6000
    pts = np.zeros((n, 4), np.float32)
    ground = rng.uniform([2, -12, -1.75], [70, 12, -1.6], (n // 2, 3))
    wall_l = rng.uniform([2, 8, -1.6], [70, 9, 2.5], (n // 4, 3))
    clutter = rng.uniform([4, -8, -1.5], [40, 8, 1.5], (n - n // 2 - n // 4, 3))
    pts[:, :3] = np.concatenate([ground, wall_l, clutter])
    pts.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))

with open(os.path.join(root, "dataset", "poses", args.sequence + ".txt"), "w") as f:
    f.write("\n".join(lines))
print(f"wrote {args.frames} frames to {root}")
