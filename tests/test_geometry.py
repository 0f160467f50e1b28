"""Golden-value tests for geometry against independent torch implementations.

torch (CPU) is used as the oracle for grid_sample parity; the projective math is
checked against straight numpy. This pins the behavior contract of
ref scenerf/models/utils.py:177-315 / spherical_mapping.py without copying it.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from scenerf_tpu import geometry as geo
from scenerf_tpu.config import SphereConfig


def make_K(fx=100.0, fy=110.0, cx=32.0, cy=24.0):
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)


def test_pix_cam_roundtrip(rng):
    K = make_K()
    inv_K = np.linalg.inv(K)
    pix = rng.uniform(0, 64, size=(50, 2)).astype(np.float32)
    depth = rng.uniform(0.5, 60, size=(50,)).astype(np.float32)
    cam = geo.pix_2_cam_pts(jnp.asarray(pix), jnp.asarray(inv_K), jnp.asarray(depth))
    # z coordinate equals depth
    np.testing.assert_allclose(np.asarray(cam[:, 2]), depth, rtol=1e-5)
    back = geo.cam_pts_2_pix(cam, jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(back), pix, rtol=1e-3, atol=1e-2)


def test_cam_pts_2_pix_behind_camera():
    K = make_K()
    pts = jnp.asarray([[0.0, 0.0, -1.0], [0.1, 0.1, 2.0]])
    pix = np.asarray(geo.cam_pts_2_pix(pts, jnp.asarray(K)))
    assert (pix[0] == -1.0).all()
    assert (pix[1] != -1.0).all()


def test_transform_points(rng):
    T = np.eye(4, dtype=np.float32)
    theta = 0.3
    T[:3, :3] = np.array(
        [[math.cos(theta), -math.sin(theta), 0],
         [math.sin(theta), math.cos(theta), 0],
         [0, 0, 1]], dtype=np.float32)
    T[:3, 3] = [1.0, -2.0, 3.0]
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    got = np.asarray(geo.transform_points(jnp.asarray(pts), jnp.asarray(T)))
    want = (T[:3, :3] @ pts.T).T + T[:3, 3]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("H,W,C", [(17, 23, 3), (45, 150, 8)])
def test_grid_sample_matches_torch(rng, H, W, C):
    img = rng.normal(size=(H, W, C)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(200, 2)).astype(np.float32)  # incl. OOB

    ours = np.asarray(geo.grid_sample_norm(jnp.asarray(img), jnp.asarray(grid)))

    timg = torch.from_numpy(img).permute(2, 0, 1).unsqueeze(0)  # [1,C,H,W]
    tgrid = torch.from_numpy(grid).reshape(1, 1, -1, 2)
    want = F.grid_sample(
        timg, tgrid, align_corners=False, mode="bilinear", padding_mode="zeros"
    )[0, :, 0, :].T.numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_sample_pix_features_matches_torch(rng):
    H, W, C = 37, 61, 3
    img = rng.uniform(size=(H, W, C)).astype(np.float32)
    pix = rng.uniform(0, [W - 1, H - 1], size=(100, 2)).astype(np.float32)

    ours = np.asarray(geo.sample_pix_features(jnp.asarray(pix), jnp.asarray(img)))

    # independent torch oracle replicating the reference's normalization
    timg = torch.from_numpy(img).permute(2, 0, 1)
    tp = torch.from_numpy(pix.copy())
    pix_t = torch.ones_like(tp)
    pix_t[:, 0] = (tp[:, 0] / (W - 1) - 0.5) * 2
    pix_t[:, 1] = (tp[:, 1] / (H - 1) - 0.5) * 2
    want = F.grid_sample(
        timg.unsqueeze(0), pix_t.unsqueeze(0).unsqueeze(2),
        align_corners=False, mode="bilinear", padding_mode="zeros",
    ).squeeze().T.numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_sphere_mapping_angles():
    # a point straight down the optical axis: v=90 (perpendicular to -y), h=90
    pts = jnp.asarray([[0.0, 0.0, 5.0]])
    v, h, d = geo.cam_pts_2_angles(pts)
    np.testing.assert_allclose(np.asarray(v), [90.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(h), [90.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(d), [5.0], atol=1e-5)
    # straight up (-y): v = 0
    v2, _, _ = geo.cam_pts_2_angles(jnp.asarray([[0.0, -1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(v2), [0.0], atol=1e-4)


def test_sphere_coords_round_and_range():
    sphere = SphereConfig(width=100, height=50, add_fov_hor=0.0, add_fov_ver=0.0,
                          v_angle_min=80.0, v_angle_max=100.0,
                          h_angle_min=70.0, h_angle_max=110.0)
    # h=70 -> x=0 ; h=110 -> x=W-1 ; v=80 -> y=0 ; v=100 -> y=H-1
    # choose cam pts with exact angles: h = 180 - atan2(z, x)*180/pi
    def pt(v_deg, h_deg):
        v = math.radians(v_deg)
        h = math.radians(180.0 - h_deg)
        y = -math.cos(v)
        r_xz = math.sin(v)
        return [r_xz * math.cos(h), y, r_xz * math.sin(h)]

    pts = jnp.asarray([pt(80, 70), pt(100, 110), pt(90, 90)])
    coords, dist = geo.cam_pts_2_sphere_coords(pts, sphere)
    np.testing.assert_allclose(np.asarray(coords),
                               [[0, 0], [99, 49], [49.0, 24.0]], atol=1.0)
    np.testing.assert_allclose(np.asarray(dist), [1, 1, 1], atol=1e-5)


def test_determine_angles_matches_sphere_coords():
    K = make_K()
    inv_K = np.linalg.inv(K)
    out = geo.determine_angles(inv_K, 64, 48)
    assert out["h_angle_min"] < 90.0 < out["h_angle_max"]
    assert out["v_angle_min"] < 90.0 < out["v_angle_max"]


def test_pose_sweeps():
    poses = geo.sample_rel_poses(step=0.5, angle=10.0, max_distance=10.1)
    assert len(poses) == 21 * 3
    p0 = poses[(0.0, 0.0)]
    np.testing.assert_allclose(p0, np.eye(4), atol=1e-6)
    p = poses[(0.5, 0.0)]
    np.testing.assert_allclose(p[2, 3], 0.5, atol=1e-6)
    # rotation applied after translation: translation gets rotated too
    p_rot = poses[(0.5, 10.0)]
    assert abs(p_rot[0, 3]) > 0.0

    bf = geo.sample_rel_poses_bf(angle=30.0, max_distance=2.1, step=0.2)
    assert len(bf) == 11 * 3
    stack = geo.rel_pose_stack(bf)
    assert stack.shape == (33, 4, 4)


def test_depth2disp_monotone():
    d = jnp.asarray([0.5, 1.0, 10.0, 90.0])
    disp = np.asarray(geo.depth2disp(d))
    assert (np.diff(disp) < 0).all()
