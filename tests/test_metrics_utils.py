"""Tests for SSC metrics (vs a loop-based oracle), image metrics (vs direct
formula / torch), depth metrics, checkpointing round-trip, and logging names."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenerf_tpu import config as C
from scenerf_tpu.losses import depth_metrics
from scenerf_tpu.utils.checkpoint import (CheckpointManager, config_from_json,
                                          config_to_json)
from scenerf_tpu.utils.image_metrics import psnr, ssim
from scenerf_tpu.utils.logging_utils import scalar_name
from scenerf_tpu.utils.ssc_metrics import SSCMetrics


def ssc_oracle_completion(pred, target, mask):
    tp = fp = fn = 0
    for p, t, m in zip(pred.reshape(-1), target.reshape(-1), mask.reshape(-1)):
        if t == 255 or not m:
            continue
        bp, bt = p > 0, t > 0
        if bt and bp:
            tp += 1
        elif not bt and bp:
            fp += 1
        elif bt and not bp:
            fn += 1
    return tp, fp, fn


def test_ssc_metrics_vs_oracle(rng):
    n_classes = 5
    pred = rng.integers(0, n_classes, size=(2, 10, 10, 4))
    target = rng.integers(0, n_classes, size=(2, 10, 10, 4))
    target.reshape(-1)[rng.integers(0, target.size, 30)] = 255
    nonempty = rng.integers(0, 2, size=target.shape)

    m = SSCMetrics(n_classes)
    m.add_batch(pred, target, nonempty=nonempty)
    stats = m.get_stats()

    tp, fp, fn = ssc_oracle_completion(pred, target, nonempty)
    if tp:
        np.testing.assert_allclose(stats["iou"], tp / (tp + fp + fn), rtol=1e-9)
        np.testing.assert_allclose(stats["precision"], tp / (tp + fp), rtol=1e-9)
        np.testing.assert_allclose(stats["recall"], tp / (tp + fn), rtol=1e-9)
    # semantic per-class counts via loop
    for j in range(n_classes):
        keep = (target != 255) & nonempty.astype(bool)
        tpj = np.sum((target == j) & (pred == j) & keep)
        fpj = np.sum((target != j) & (pred == j) & keep)
        assert m.tps[j] == tpj
        assert m.fps[j] == fpj


def test_psnr_formula(rng):
    a = rng.uniform(size=(20, 30, 3))
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1)
    got = psnr(a, b)
    want = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_ssim_identity_and_degrade(rng):
    a = rng.uniform(size=(32, 48, 3)).astype(np.float32)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(a + rng.normal(scale=0.2, size=a.shape), 0, 1)
    v = ssim(a, noisy.astype(np.float32))
    assert 0.0 < v < 0.95


def test_depth_metrics_match_reference_formula(rng):
    gt = rng.uniform(1, 70, size=(100,)).astype(np.float32)
    pred = np.clip(gt + rng.normal(scale=3, size=gt.shape), 0.01, 100).astype(np.float32)
    out = depth_metrics(jnp.asarray(gt), jnp.asarray(pred), max_depth=80.0)
    p = np.clip(pred, 1e-3, 80.0)
    thresh = np.maximum(gt / p, p / gt)
    np.testing.assert_allclose(float(out["a1"]), (thresh < 1.25).mean(), rtol=1e-5)
    np.testing.assert_allclose(float(out["abs_rel"]), np.mean(np.abs(gt - p) / gt), rtol=1e-5)
    np.testing.assert_allclose(float(out["rmse"]), np.sqrt(np.mean((gt - p) ** 2)), rtol=1e-5)


def test_config_json_roundtrip():
    cfg = C.bundlefusion()
    cfg2 = config_from_json(config_to_json(cfg))
    assert cfg2 == cfg


def test_checkpoint_roundtrip(tmp_path):
    from scenerf_tpu.train import Trainer
    from scenerf_tpu.parallel.mesh import make_mesh

    cfg = C.tiny()
    trainer = Trainer(cfg, mesh=make_mesh(jax.devices()[:1]),
                      with_depth_eval=False)
    state = trainer.create_state(jax.random.PRNGKey(0))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, cfg, metrics={"depth/abs_rel": 0.5})
    mgr.save(state.replace(step=state.step + 1), cfg,
             metrics={"depth/abs_rel": 0.7})  # worse: best stays at step 0

    template = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    restored, cfg2 = mgr.restore(template, which="last")
    assert int(restored.step) == 1
    assert cfg2 == cfg
    best, _ = mgr.restore(template, which="best")
    assert int(best.step) == 0
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_scalar_namespace():
    assert scalar_name("loss_reprojection", "train") == "train/loss_reprojection"
    assert scalar_name("depth/abs_rel", "val") == "valdepth/abs_rel"
    assert scalar_name("min_stds", "train") == "train_som/closest_std"
    assert scalar_name("total_loss", "val") == "val/total_loss"
    # the reference logs dist2closest under BOTH names
    # (ref scenerf.py:233 and :297)
    from scenerf_tpu.utils.logging_utils import _ALIASES
    assert scalar_name("loss_dist2closest_gauss", "train") == \
        "train/loss_dist2closest_gauss"
    assert _ALIASES["loss_dist2closest_gauss"].format("val") == \
        "val_som/dist_2_closest_gaussian"
