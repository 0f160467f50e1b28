"""Orbax checkpointing: keep `last` + `best` (min valdepth/abs_rel), with the
config embedded so a checkpoint fully reconstructs the model.

Contract: ref train_kitti.py:110-140 (ModelCheckpoint(save_last=True,
monitor="valdepth/abs_rel", save_top_k=1, mode="min") + auto-resume) and
ref scenerf.py:94 (save_hyperparameters embedded in the ckpt).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from scenerf_tpu.config import SceneRFConfig, SphereConfig


def config_to_json(cfg: SceneRFConfig) -> str:
    d = dataclasses.asdict(cfg)
    return json.dumps(d, indent=2)


def config_from_json(s: str) -> SceneRFConfig:
    d = json.loads(s)
    sphere = SphereConfig(**d.pop("sphere"))
    # tuples serialized as lists
    for k in ("img_size", "scene_size", "vox_origin"):
        if k in d:
            d[k] = tuple(d[k])
    return SceneRFConfig(sphere=sphere, **d)


class CheckpointManager:
    """Minimal last+best checkpoint manager over orbax PyTreeCheckpointer."""

    def __init__(self, directory: str, monitor: str = "depth/abs_rel",
                 mode: str = "min"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self._ckptr = ocp.StandardCheckpointer()
        self._best_path = os.path.join(self.directory, "best")
        self._last_path = os.path.join(self.directory, "last")
        self._meta_path = os.path.join(self.directory, "meta.json")

    # ------------------------------------------------------------------ save
    def _read_meta(self) -> Dict[str, Any]:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {}

    def _write_meta(self, meta: Dict[str, Any]):
        with open(self._meta_path, "w") as f:
            json.dump(meta, f, indent=2)

    def save(self, state: Any, cfg: SceneRFConfig,
             metrics: Optional[Dict[str, float]] = None):
        """Save `last`; update `best` if the monitored metric improved."""
        state = jax.device_get(state)
        self._ckptr.save(self._last_path, state, force=True)
        meta = self._read_meta()
        meta["config"] = json.loads(config_to_json(cfg))
        meta["last_step"] = int(np.asarray(state.step))
        if metrics and self.monitor in metrics:
            value = float(metrics[self.monitor])
            best = meta.get("best_value")
            improved = (
                best is None
                or (self.mode == "min" and value < best)
                or (self.mode == "max" and value > best)
            )
            if improved:
                self._ckptr.save(self._best_path, state, force=True)
                meta["best_value"] = value
                meta["best_step"] = int(np.asarray(state.step))
        # orbax saves are async; barrier so `last`/`best` are durable on return
        self._ckptr.wait_until_finished()
        self._write_meta(meta)

    # --------------------------------------------------------------- restore
    def latest(self) -> Optional[str]:
        return self._last_path if os.path.exists(self._last_path) else None

    def best(self) -> Optional[str]:
        return self._best_path if os.path.exists(self._best_path) else None

    def restore(self, target: Any, which: str = "last") -> Tuple[Any, SceneRFConfig]:
        """Restore into the structure of `target` (a TrainState template).
        Returns (state, config)."""
        path = {"last": self._last_path, "best": self._best_path}[which]
        state = self._ckptr.restore(path, target)
        meta = self._read_meta()
        cfg = config_from_json(json.dumps(meta["config"]))
        return state, cfg
