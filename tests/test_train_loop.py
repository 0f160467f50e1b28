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
