"""Generate a synthetic BundleFusion scene tree for smoke runs."""
import argparse
import os

import numpy as np
from PIL import Image

p = argparse.ArgumentParser()
p.add_argument("--root", default="/tmp/fake_bf")
p.add_argument("--frames", type=int, default=40)
p.add_argument("--scenes", default="copyroom,apt0")
args = p.parse_args()

for scene in args.scenes.split(","):
    d = os.path.join(args.root, scene)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "info.txt"), "w") as f:
        f.write("m_versionNumber = 4\n")
        f.write("m_calibrationColorIntrinsic = 525 0 320 0  0 525 240 0  "
                "0 0 1 0  0 0 0 1\n")
        f.write("m_calibrationDepthIntrinsic = 525 0 320 0  0 525 240 0  "
                "0 0 1 0  0 0 0 1\n")

    for i in range(args.frames):
        fid = f"{i:06d}"
        yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
        ph = i * 7.0
        img = np.stack([
            0.5 + 0.4 * np.sin((xx + ph) / 13.0),
            0.5 + 0.4 * np.sin((yy + ph * 0.3) / 19.0),
            0.5 + 0.4 * np.sin((xx + yy + ph) / 29.0),
        ], -1)
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"frame-{fid}.color.jpg"))

        # depth: a room box ~2-5m, mm uint16
        depth = 2500 + 1500 * np.sin(xx / 160.0) * np.sin(yy / 120.0)
        depth_u16 = depth.astype(np.uint16)
        Image.fromarray(depth_u16, mode="I;16").save(
            os.path.join(d, f"frame-{fid}.depth.png"))

        T = np.eye(4)
        T[2, 3] = 0.05 * i
        with open(os.path.join(d, f"frame-{fid}.pose.txt"), "w") as f:
            for r in range(4):
                f.write(" ".join(f"{v:.6f}" for v in T[r]) + "\n")
print("wrote fake bundlefusion to", args.root)
