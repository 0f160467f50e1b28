"""LPIPS(vgg) tests: weight port (torch state dicts -> flax), npz round-trip,
and metric sanity (zero distance on identical inputs, ordering on noise)."""
import numpy as np
import pytest
import torch

from scenerf_tpu.utils.lpips import _VGG_STAGES, LPIPS


def build_fake_vgg16_sd(seed=0):
    """torchvision vgg16 `features` layout (conv indices 0,2,5,...,28)."""
    rng = np.random.default_rng(seed)
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = []
    c_in = 3
    for ch, n in _VGG_STAGES:
        for _ in range(n):
            chans.append((ch, c_in))
            c_in = ch
    sd = {}
    for ti, (co, ci) in zip(conv_idx, chans):
        w = rng.normal(size=(co, ci, 3, 3)).astype(np.float32)
        sd[f"features.{ti}.weight"] = torch.from_numpy(w / np.sqrt(ci * 9))
        sd[f"features.{ti}.bias"] = torch.from_numpy(
            rng.normal(size=co).astype(np.float32) * 0.01)
    return sd


def build_fake_lpips_sd(seed=1):
    rng = np.random.default_rng(seed)
    sd = {}
    for i, (ch, _) in enumerate(_VGG_STAGES):
        w = np.abs(rng.normal(size=(1, ch, 1, 1))).astype(np.float32)
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(w)
    return sd


@pytest.fixture(scope="module")
def metric(tmp_path_factory):
    d = tmp_path_factory.mktemp("lpips")
    vgg_path = str(d / "vgg16.pth")
    lin_path = str(d / "lpips.pth")
    torch.save(build_fake_vgg16_sd(), vgg_path)
    torch.save(build_fake_lpips_sd(), lin_path)
    return LPIPS.from_torch_checkpoint(vgg_path, lin_path)


def test_lpips_zero_on_identical(metric, rng):
    img = rng.uniform(-1, 1, size=(32, 48, 3)).astype(np.float32)
    assert float(metric(img, img)) == pytest.approx(0.0, abs=1e-6)


def test_lpips_orders_by_distortion(metric, rng):
    img = rng.uniform(-1, 1, size=(32, 48, 3)).astype(np.float32)
    small = img + 0.01 * rng.normal(size=img.shape).astype(np.float32)
    big = img + 0.5 * rng.normal(size=img.shape).astype(np.float32)
    d_small = float(metric(img, small))
    d_big = float(metric(img, big))
    assert 0 < d_small < d_big


def test_lpips_npz_roundtrip(metric, tmp_path, rng):
    """scripts/convert_lpips_weights.py format: save -> load -> same metric."""
    path = str(tmp_path / "w.npz")
    metric.to_npz(path)
    loaded = LPIPS.from_npz(path)
    a = rng.uniform(-1, 1, size=(24, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(24, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(float(loaded(a, b)), float(metric(a, b)),
                               rtol=1e-6)
