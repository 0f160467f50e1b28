"""CLI smoke tests: imports, table formats, determine_angles, and a
checkpoint-save -> load_model -> render round trip on the tiny preset."""
import os

import jax
import numpy as np
import pytest
from click.testing import CliRunner

from scenerf_tpu import config as C


def test_cli_imports():
    from scenerf_tpu.cli import evaluation, reconstruction, train  # noqa: F401
    assert callable(train.train_kitti)
    assert callable(evaluation.save_depth_metrics)
    assert callable(reconstruction.depth2tsdf)


def test_every_console_script_applies_jax_setup():
    """Every click command behind a console script must be a SetupCommand:
    this image's sitecustomize preloads the axon TPU plugin, and a command
    that forgets the process-level setup silently claims the real device
    even under JAX_PLATFORMS=cpu (bit us in round 5: generate-sc-gt-bf hung
    on the device grant)."""
    from importlib import import_module

    from scenerf_tpu.cli.common import SetupCommand

    # parse entry_points from setup.py's console_scripts list (do NOT import
    # setup.py -- that would execute setuptools.setup())
    spec = []
    with open(os.path.join(os.path.dirname(__file__), "..", "setup.py")) as f:
        for line in f:
            line = line.strip().strip('",')
            if "=" in line and line.startswith("scenerf-"):
                spec.append(line)
    assert len(spec) >= 18, spec
    for entry in spec:
        name, target = entry.split("=", 1)
        mod_name, func_name = target.split(":")
        cmd = getattr(import_module(mod_name), func_name)
        assert isinstance(cmd, SetupCommand), \
            f"{name.strip()} ({target}) does not apply process-level JAX setup"


def test_determine_angles_cli():
    from scenerf_tpu.cli.reconstruction import determine_angles
    result = CliRunner().invoke(determine_angles, [])
    assert result.exit_code == 0
    # KITTI defaults reproduce the constants baked into the reference model
    # (ref scenerf.py:80-88)
    for key, want in [("v_angle_min", 75.48), ("v_angle_max", 104.73),
                      ("h_angle_min", 49.59), ("h_angle_max", 131.11)]:
        line = [l for l in result.output.splitlines() if l.startswith(key)][0]
        assert abs(float(line.split(":")[1]) - want) < 0.05, line


def test_depth_metrics_table_format(capsys):
    from scenerf_tpu.cli.common import print_depth_metrics_table
    agg = {1: np.arange(7, dtype=float), 3: np.arange(7, dtype=float) * 2}
    n = {1: 2, 3: 4}
    print_depth_metrics_table(agg, n)
    out = capsys.readouterr().out
    assert "|distance|abs_rel" in out
    assert "|00000001|" in out and "|00000003|" in out
    assert "|All     |" in out


def test_compute_depth_errors_np_matches_jnp(rng):
    from scenerf_tpu.cli.evaluation import compute_depth_errors_np
    from scenerf_tpu.losses import depth_metrics
    import jax.numpy as jnp
    gt = rng.uniform(1, 70, 200).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 4, 200), 0.05, 120).astype(np.float32)
    a = compute_depth_errors_np(gt, pred.copy())
    b = depth_metrics(jnp.asarray(gt), jnp.asarray(pred), max_depth=80.0)
    order = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    for i, k in enumerate(order):
        np.testing.assert_allclose(a[i], float(b[k]), rtol=1e-4, atol=1e-5)


def test_checkpoint_load_model_roundtrip(tmp_path):
    from scenerf_tpu.cli.common import encode_frame, load_model
    from scenerf_tpu.parallel.mesh import make_mesh
    from scenerf_tpu.train import Trainer
    from scenerf_tpu.utils.checkpoint import CheckpointManager
    from scenerf_tpu.data.synthetic import make_batch

    cfg = C.tiny()
    trainer = Trainer(cfg, mesh=make_mesh(jax.devices()[:1]),
                      with_depth_eval=False)
    state = trainer.create_state(jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ckpt")
    CheckpointManager(ckpt_dir).save(state, cfg, metrics={"depth/abs_rel": 0.3})

    model, state2, cfg2 = load_model(ckpt_dir)
    assert cfg2 == cfg
    batch = make_batch(cfg, batch_size=1)
    levels, _ = encode_frame(model, state2, batch["img_input"][0],
                             batch["cam_K"][0])
    assert levels["1_1"].shape[0] == 1
