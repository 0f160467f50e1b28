"""Data-layer tests on a synthetic on-disk mini KITTI/BundleFusion tree."""
import os

import numpy as np
import pytest
from PIL import Image

from scenerf_tpu import config as C
from scenerf_tpu.data import calib as CAL
from scenerf_tpu.data import io_voxel
from scenerf_tpu.data.kitti import KittiDataset, to_model_batch
from scenerf_tpu.data.loader import DataLoader


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    seq_dir = root / "dataset" / "sequences" / "00"
    (seq_dir / "image_2").mkdir(parents=True)
    (seq_dir / "velodyne").mkdir()
    (root / "dataset" / "poses").mkdir(parents=True)

    rng = np.random.default_rng(0)
    n_frames = 8
    # calib: simple pinhole
    P2 = "P2: 200 0 610 0  0 200 185 0  0 0 1 0".replace("  ", " ")
    Tr = "Tr: 0 -1 0 0  0 0 -1 0  1 0 0 -0.1"
    (seq_dir / "calib.txt").write_text(
        "P0: 1 0 0 0 0 1 0 0 0 0 1 0\nP1: 1 0 0 0 0 1 0 0 0 0 1 0\n"
        + P2 + "\nP3: 1 0 0 0 0 1 0 0 0 0 1 0\n" + Tr + "\n")

    # poses: forward motion 0.5m/frame along cam0 z
    lines = []
    for i in range(n_frames):
        T = np.eye(4)
        T[2, 3] = 0.5 * i
        lines.append(" ".join(str(v) for v in T[:3].reshape(-1)))
    (root / "dataset" / "poses" / "00.txt").write_text("\n".join(lines))

    for i in range(n_frames):
        img = (rng.uniform(0, 255, size=(376, 1241, 3))).astype(np.uint8)
        Image.fromarray(img).save(seq_dir / "image_2" / f"{i:06d}.png")
        # forward-facing lidar points
        pts = np.zeros((500, 4), np.float32)
        pts[:, 0] = rng.uniform(2, 60, 500)       # forward
        pts[:, 1] = rng.uniform(-10, 10, 500)     # left
        pts[:, 2] = rng.uniform(-1.5, 2.0, 500)   # up
        pts.tofile(seq_dir / "velodyne" / f"{i:06d}.bin")
    return str(root)


def test_read_calib_and_poses(kitti_root):
    cal = CAL.read_calib(os.path.join(kitti_root, "dataset/sequences/00/calib.txt"))
    assert cal["P2"].shape == (3, 4)
    assert cal["Tr"].shape == (4, 4)
    poses = CAL.read_poses(os.path.join(kitti_root, "dataset/poses/00.txt"))
    assert len(poses) == 8
    np.testing.assert_allclose(poses[3][2, 3], 1.5)


def test_kitti_dataset_scans_and_item(kitti_root, tmp_path):
    ds = KittiDataset(
        "train", kitti_root, str(tmp_path / "prep"),
        frames_interval=0.4, sequence_distance=2.0, n_sources=2,
        n_rays=128, seed=0, sequences=["00"])
    assert len(ds) > 0
    scan = ds.scans[0]
    # frames 0.5m apart; within 2m -> up to 5 frames
    assert 2 <= len(scan["img_paths"]) <= 6

    item = ds[0]
    assert item["img_input"].shape == (370, 1220, 3)
    assert item["cam_K"].shape == (3, 3)
    assert len(item["img_sources"]) == 2
    assert item["T_source2infers"][0].shape == (4, 4)
    # source2infer ~ forward translation (ICP on random clouds may drift a bit,
    # but the odometry prior dominates the magnitude)
    t = item["T_source2infers"][0][:3, 3]
    assert np.abs(t).max() < 5.0
    assert len(item["lidar_depths"][0]) <= 128
    # ICP cache file written
    assert os.path.exists(os.path.join(str(tmp_path / "prep"), "transform",
                                       "00_0.4_all"))


def test_to_model_batch_shapes(kitti_root, tmp_path):
    cfg = C.kitti(n_sources=3, n_gt_depth=64)
    ds = KittiDataset("train", kitti_root, str(tmp_path / "prep2"),
                      sequence_distance=2.0, n_sources=2, n_rays=128, seed=0,
                      sequences=["00"])
    batch = to_model_batch([ds[0]], cfg)
    assert batch["img_input"].shape == (1, 370, 1220, 3)
    assert batch["img_sources"].shape == (1, 3, 370, 1220, 3)
    assert batch["source_mask"].sum() == 2  # 2 real, 1 padded
    assert batch["gt_pix"].shape == (1, 3, 64, 2)
    # padded source slots have identity poses
    np.testing.assert_allclose(batch["T_source2infer"][0, 2], np.eye(4))


def test_dataloader_iteration(kitti_root, tmp_path):
    cfg = C.kitti(n_sources=2, n_gt_depth=32)
    ds = KittiDataset("train", kitti_root, str(tmp_path / "prep3"),
                      sequence_distance=2.0, n_sources=1, n_rays=64, seed=0,
                      sequences=["00"])
    dl = DataLoader(ds, lambda items: to_model_batch(items, cfg),
                    batch_size=1, shuffle=True, limit_fraction=1.0)
    batches = list(dl)
    assert len(batches) == len(ds)
    assert batches[0]["img_input"].shape[0] == 1


def test_dataloader_multiprocess_slicing():
    """Per-process loaders must yield complementary contiguous slices of the
    single-process global batches (multi-host input feeding)."""
    items = [{"v": np.array([i], np.int64)} for i in range(17)]
    collate = lambda its: {"v": np.stack([it["v"] for it in its])}
    kw = dict(batch_size=4, shuffle=True, seed=5)
    global_batches = [b["v"][:, 0] for b in DataLoader(items, collate, **kw)]
    p0 = [b["v"][:, 0] for b in
          DataLoader(items, collate, process_index=0, process_count=2, **kw)]
    p1 = [b["v"][:, 0] for b in
          DataLoader(items, collate, process_index=1, process_count=2, **kw)]
    assert len(p0) == len(p1) == len(global_batches) == 4
    for g, a, b in zip(global_batches, p0, p1):
        np.testing.assert_array_equal(np.concatenate([a, b]), g)


def test_shard_batch_multihost_single_process_equivalence():
    """shard_batch_multihost (jax.make_array_from_process_local_data) must
    produce the same global array as the device_put path when there is one
    process (the only case runnable in CI)."""
    import jax
    from scenerf_tpu.parallel.mesh import (make_mesh, shard_batch,
                                           shard_batch_multihost)

    mesh = make_mesh(jax.devices()[:4])
    batch = {"x": np.arange(4 * 3, dtype=np.float32).reshape(4, 3)}
    a = shard_batch(batch, mesh)["x"]
    b = shard_batch_multihost(batch, mesh)["x"]
    assert b.sharding.spec == a.sharding.spec
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_voxel_io_roundtrip(rng):
    bits = rng.integers(0, 2, size=256).astype(np.uint8)
    packed = io_voxel.pack(bits)
    assert packed.shape == (32,)
    np.testing.assert_array_equal(io_voxel.unpack(packed), bits)


def test_remap_lut():
    lut = io_voxel.get_remap_lut()
    assert lut[0] == 0          # empty stays empty
    assert lut[10] == 1         # car
    assert lut[99] == 255       # unlabeled-ish -> invalid
    assert lut[252] == 1        # moving-car -> car
    assert lut[40] == 9         # road


def test_vox2pix_shapes():
    K = np.array([[200.0, 0, 610], [0, 200, 185], [0, 0, 1]])
    T = np.eye(4)
    pix, fov, dist = CAL.vox2pix(T, K, np.array([0, -25.6, -2]), 0.2,
                                 1220, 370, (51.2, 51.2, 6.4))
    assert pix.shape == (256 * 256 * 32, 2)
    assert fov.dtype == bool
    assert fov.sum() > 0
