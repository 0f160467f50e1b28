"""Integration test of cli/train.run_training: epochs, val, checkpointing, and
auto-resume on a fake in-memory dataset (tiny preset)."""
import os

import numpy as np
import pytest

from scenerf_tpu import config as C
from scenerf_tpu.data.synthetic import make_batch


class FakeScanDataset:
    """Items already in the fixed-shape batch schema (collate just stacks)."""

    def __init__(self, cfg, n=3, seed=0):
        self.items = []
        for i in range(n):
            b = make_batch(cfg, batch_size=1, seed=seed + i)
            self.items.append({k: v[0] for k, v in b.items()})

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def stack_collate(items):
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


@pytest.mark.slow
def test_run_training_epochs_and_resume(tmp_path, monkeypatch):
    from scenerf_tpu.cli.train import run_training
    from scenerf_tpu.utils.checkpoint import CheckpointManager

    cfg = C.tiny()
    ds = FakeScanDataset(cfg, n=2)
    logdir = str(tmp_path)

    state = run_training(
        cfg, ds, ds, stack_collate, exp_name="t", logdir=logdir,
        n_epochs=2, enable_log=False, limit_train_fraction=1.0,
        global_batch_size=1, max_steps_per_epoch=1,
    )
    assert int(np.asarray(state.step)) == 2
    ckpt_dir = os.path.join(logdir, "ckpts", "t")
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest() is not None
    assert mgr.best() is not None
    meta = mgr._read_meta()
    assert meta["last_step"] == 2
    assert "best_value" in meta

    # auto-resume: starting again with more epochs continues from step 2
    state2 = run_training(
        cfg, ds, ds, stack_collate, exp_name="t", logdir=logdir,
        n_epochs=3, enable_log=False, limit_train_fraction=1.0,
        global_batch_size=1, max_steps_per_epoch=1,
    )
    assert int(np.asarray(state2.step)) == 3


@pytest.mark.slow
def test_overfit_one_frame_converges():
    """Overfitting a geometrically consistent frame drives val abs_rel below
    0.3 (SURVEY section 4's convergence test; VERDICT r2 item 6). The batch is
    a textured slanted plane whose reprojection loss is minimized exactly at
    the analytic depth, so the full loss stack must actually converge -- not
    just descend -- to pass. scripts/overfit_probe.py reaches 0.167 by step
    250 with this seed/config."""
    import jax

    from scenerf_tpu.data.synthetic import make_geometric_batch
    from scenerf_tpu.parallel.mesh import make_mesh, shard_batch
    from scenerf_tpu.train import Trainer

    cfg = C.tiny(lr=1e-3, n_rays=256, ray_chunk=256)
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=250, with_depth_eval=True)
    state = trainer.create_state(jax.random.PRNGKey(0))
    batch = shard_batch(make_geometric_batch(cfg, seed=0), mesh)
    key = jax.random.PRNGKey(1)

    first = None
    best = np.inf
    for step in range(250):
        state, m = trainer.train_step(state, batch, key)
        if step == 0:
            first = float(m["depth/abs_rel"])
        elif (step + 1) % 25 == 0:
            best = min(best, float(m["depth/abs_rel"]))
    assert first > 0.25          # starts unconverged
    assert best < 0.28, best     # converges well below the 0.3 bar


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["ray_parallel", "ray_shard"])
def test_overfit_converges_in_parallel_modes(mode):
    """The parallel training modes must actually TRAIN, not just pass
    one-step parity: 200 steps of the overfit-one-frame task on a 2-device
    mesh drives val abs_rel below 0.3 in both ray_parallel (per-device ray
    samples, pmean grads) and ray_shard (bit-exact split of one ray batch).
    (VERDICT r2 item 6: training-quality evidence beyond one-step loss.)"""
    import jax

    from scenerf_tpu.data.synthetic import make_geometric_batch
    from scenerf_tpu.parallel.mesh import make_mesh, replicate
    from scenerf_tpu.train import Trainer

    cfg = C.tiny(lr=1e-3, n_rays=256, ray_chunk=128)
    mesh = make_mesh(jax.devices()[:2])
    trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=200,
                      with_depth_eval=True,
                      ray_parallel=(mode == "ray_parallel"),
                      ray_shard=(mode == "ray_shard"))
    state = trainer.create_state(jax.random.PRNGKey(0))
    batch = replicate(make_geometric_batch(cfg, seed=0), mesh)
    key = jax.random.PRNGKey(1)

    best = np.inf
    for step in range(200):
        state, m = trainer.train_step(state, batch, key)
        if (step + 1) % 25 == 0:
            best = min(best, float(m["depth/abs_rel"]))
    assert best < 0.3, (mode, best)
