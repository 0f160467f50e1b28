"""Generate a synthetic BundleFusion scene tree for smoke runs.

Layout contract: ref scenerf/data/bundlefusion/bundlefusion_dataset.py
(frame-XXXXXX.color.jpg / .depth.png [16-bit mm] / .pose.txt + info.txt
with m_calibration*Intrinsic rows). Images default to the dataset's native
640x480; --width/--height shrink the scene (intrinsics scale with it) for
CPU-sized smoke tests (tests/test_bundlefusion.py builds its tree here).
"""
import argparse
import os

import numpy as np
from PIL import Image


def write_fake_bf(root, frames=40, scenes=("copyroom", "apt0"),
                  size=(640, 480)):
    W, H = size
    fx = 525.0 * W / 640.0
    fy = 525.0 * H / 480.0
    cx, cy = W / 2.0, H / 2.0
    for scene in scenes:
        d = os.path.join(root, scene)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "info.txt"), "w") as f:
            f.write("m_versionNumber = 4\n")
            intr = (f"{fx:g} 0 {cx:g} 0  0 {fy:g} {cy:g} 0  "
                    "0 0 1 0  0 0 0 1")
            f.write(f"m_calibrationColorIntrinsic = {intr}\n")
            f.write(f"m_calibrationDepthIntrinsic = {intr}\n")

        for i in range(frames):
            fid = f"{i:06d}"
            yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
            ph = i * 7.0
            img = np.stack([
                0.5 + 0.4 * np.sin((xx + ph) / 13.0),
                0.5 + 0.4 * np.sin((yy + ph * 0.3) / 19.0),
                0.5 + 0.4 * np.sin((xx + yy + ph) / 29.0),
            ], -1)
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(d, f"frame-{fid}.color.jpg"))

            # depth: a room box ~2-5m, mm uint16
            depth = 2500 + 1500 * np.sin(xx / (W / 4.0)) * np.sin(yy / (H / 4.0))
            depth_u16 = depth.astype(np.uint16)
            Image.fromarray(depth_u16, mode="I;16").save(
                os.path.join(d, f"frame-{fid}.depth.png"))

            T = np.eye(4)
            T[2, 3] = 0.05 * i
            with open(os.path.join(d, f"frame-{fid}.pose.txt"), "w") as f:
                for r in range(4):
                    f.write(" ".join(f"{v:.6f}" for v in T[r]) + "\n")
    print("wrote fake bundlefusion to", root)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/fake_bf")
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--scenes", default="copyroom,apt0")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    args = p.parse_args()
    write_fake_bf(args.root, args.frames, args.scenes.split(","),
                  (args.width, args.height))
