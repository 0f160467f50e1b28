"""Generate a synthetic on-disk KITTI odometry tree for smoke training.

All frames are renders of ONE fixed textured world (ground plane + side
walls + far wall) seen from the forward-moving camera, and the LiDAR samples
lie on the same surfaces — so reprojection losses have their optimum at the
true depth and depth-GT supervision is consistent with the photometric
signal (the property data/synthetic.make_geometric_batch establishes for the
in-memory fixture; random per-frame textures cannot converge below ~0.66
val abs_rel, docs/PERF.md round 3).

Layout matches the real tree the reference trains on (ref
scenerf/data/semantic_kitti/kitti_dm.py + kitti_dataset.py): calib.txt,
poses/<seq>.txt, image_2/*.png, velodyne/*.bin.
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

# real KITTI P2/Tr so calib parsing, vox2pix and ICP see realistic geometry
P2 = np.array([[707.0912, 0, 601.8873, 45.758],
               [0, 707.0912, 183.1104, -0.345],
               [0, 0, 1, 0.005]], np.float64)
Tr = np.array([[2e-4, -0.9999, -0.0106, -0.0028],
               [0.0104, 0.0106, -0.9999, -0.0753],
               [0.9999, 1e-4, 0.0105, -0.2721]], np.float64)

with open(os.path.join(seq, "calib.txt"), "w") as f:
    f.write("P0: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    f.write("P1: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    f.write("P2: " + " ".join(str(v) for v in P2.reshape(-1)) + "\n")
    f.write("P3: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    f.write("Tr: " + " ".join(str(v) for v in Tr.reshape(-1)) + "\n")

H, W = 376, 1241
fx, fy, cx, cy = P2[0, 0], P2[1, 1], P2[0, 2], P2[1, 2]
# P2 = [K | K b]: projecting cam0-frame X yields K(X + b) -- i.e. the image
# camera (cam2) sits at -b in the cam0 frame. The LOADER (data/calib.py
# T_cam0_2_cam2 + kitti.lidar_to_depth) models only the x component of b
# (the KITTI stereo baseline, P2[0,3]/fx) and projects through K, so render
# from the loader's camera model -- c - [P2[0,3]/fx, 0, 0] -- to make the
# images pixel-exact with the depth GT the loader produces (ADVICE r3:
# using the full K^-1 P2[:,3] here left a ~4 mm x / 5 mm z mismatch, up to
# ~1.5 px at the nearest GT depths).
K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
b_cam2 = np.array([P2[0, 3] / fx, 0.0, 0.0])

# world frame == cam frame of pose 0 (x right, y down, z forward); the world
# surfaces are FIXED while the camera advances along +z
GROUND_Y = 1.65       # ground plane y = +1.65 (below the camera)
WALL_X = (-10.0, 10.0)  # side walls
FAR_Z = 75.0          # back wall; inside eval_depth=80 so far-wall LiDAR
                      # returns survive the max-depth cut for ALL frames
                      # (ADVICE r3: at 90 the far 25% of each scan was
                      # filtered out of depth GT for frames 0-19)


def world_rgb(x, y, z, sx, sy, sz):
    """Texture of the world hit point with ANALYTIC anti-aliasing: each
    sinusoid sin(k*a) box/Gaussian-filtered over the pixel's world-space
    footprint sigma_a attenuates by exp(-(k*sigma_a)^2/2). Without this the
    grazing-angle ground is sampled far beyond Nyquist and distant texture is
    pure aliasing noise -- photometrically INconsistent across views."""
    def a(k, s):
        return np.exp(-0.5 * (k * s) ** 2)

    return np.stack([
        0.5 + 0.35 * a(1.3, sx) * a(0.9, sz) * np.sin(1.3 * x) * np.cos(0.9 * z),
        0.5 + 0.35 * a(0.7, sz) * a(1.7, sy) * np.sin(0.7 * z + 2.0) * np.sin(1.7 * y + 0.4),
        0.5 + 0.35 * a(1.1, sx) * a(0.5, sz) * np.cos(1.1 * x - 0.6) * np.cos(0.5 * z + 1.1),
    ], axis=-1)


def render(c):
    """(img [H,W,3] u8, depth [H,W] f32) of the world from camera center c."""
    vv, uu = np.mgrid[0:H, 0:W].astype(np.float64)
    dx = (uu + 0.5 - cx) / fx
    dy = (vv + 0.5 - cy) / fy
    lam = np.full((H, W), FAR_Z - c[2])          # back wall (d_z = 1)
    for wx in WALL_X:
        lw = (wx - c[0]) / np.where(np.abs(dx) < 1e-9, 1e-9, dx)
        lam = np.where((lw > 0.1) & (lw < lam), lw, lam)
    lg = (GROUND_Y - c[1]) / np.where(np.abs(dy) < 1e-9, 1e-9, dy)
    lam = np.where((lg > 0.1) & (lg < lam), lg, lam)
    x, y, z = c[0] + lam * dx, c[1] + lam * dy, c[2] + lam
    # world-space footprint of one pixel (finite differences over the grid)
    def footprint(w):
        gu = np.gradient(w, axis=1)
        gv = np.gradient(w, axis=0)
        return np.sqrt(gu * gu + gv * gv)
    img = np.clip(world_rgb(x, y, z, footprint(x), footprint(y), footprint(z)),
                  0, 1)
    return (img * 255).astype(np.uint8), lam.astype(np.float32)


# velo -> cam is Tr; build cam -> velo to express world-surface samples as
# LiDAR returns of each frame
R, t = Tr[:, :3], Tr[:, 3]
R_inv = np.linalg.inv(R)

rng = np.random.default_rng(0)
lines = []
for i in range(args.frames):
    T = np.eye(4)
    T[2, 3] = 0.5 * i  # forward along cam z
    lines.append(" ".join(f"{v:.6f}" for v in T[:3].reshape(-1)))

    c = np.array([0.0, 0.0, 0.5 * i])
    img, _ = render(c - b_cam2)
    Image.fromarray(img).save(os.path.join(seq, "image_2", f"{i:06d}.png"))

    # lidar returns ON the world surfaces, in this frame's velo coords
    n = 6000
    gx = rng.uniform(-9.5, 9.5, n // 2)
    gz = rng.uniform(2, 70, n // 2)
    ground = np.stack([gx, np.full(n // 2, GROUND_Y), gz], 1)
    wz = rng.uniform(2, 70, n // 4)
    wy = rng.uniform(-1.2, GROUND_Y, n // 4)
    wall = np.stack([np.full(n // 4, WALL_X[0]), wy, wz], 1)
    m = n - n // 2 - n // 4
    fxw = rng.uniform(-9.5, 9.5, m)
    fyw = rng.uniform(-1.2, GROUND_Y, m)
    far = np.stack([fxw, fyw, np.full(m, FAR_Z)], 1)
    p_world = np.concatenate([ground, wall, far])       # world == cam0 frame
    p_cam = p_world - c                                  # this frame's cam
    p_velo = (p_cam - t) @ R_inv.T
    pts = np.zeros((n, 4), np.float32)
    pts[:, :3] = p_velo
    pts.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))

with open(os.path.join(root, "dataset", "poses", args.sequence + ".txt"), "w") as f:
    f.write("\n".join(lines))
print(f"wrote {args.frames} frames to {root}")
