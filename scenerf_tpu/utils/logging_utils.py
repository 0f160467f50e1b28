"""Metric logging: tensorboardX writer with the reference's scalar namespace
(SURVEY.md section 5): {train,val}/loss_*, {train,val}depth/*, {train,val}_som/*.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

try:
    from tensorboardX import SummaryWriter
except Exception:  # pragma: no cover
    SummaryWriter = None


# model metric key -> reference scalar name pattern ({} = step_type)
_NAMESPACE = {
    "loss_reprojection": "{}/loss_reprojection",
    "loss_color": "{}/loss_color",
    "loss_som_kl": "{}/loss_som_kl",
    "loss_dist2closest_gauss": "{}/loss_dist2closest_gauss",
    "total_loss": "{}/total_loss",
    "min_som_vars": "{}/min_som_vars",
    "min_stds": "{}_som/closest_std",
    "closest_pts_to_depth": "{}depth/closest_pts_to_depth",
    "weights_at_depth": "{}depth/weights_at_depth",
}

# keys the reference logs under a SECOND name as well
# (ref scenerf.py:233 logs {}/loss_dist2closest_gauss AND :297 logs
#  {}_som/dist_2_closest_gaussian from the same quantity)
_ALIASES = {
    "loss_dist2closest_gauss": "{}_som/dist_2_closest_gaussian",
}


def scalar_name(key: str, step_type: str) -> str:
    if key in _NAMESPACE:
        return _NAMESPACE[key].format(step_type)
    if key.startswith("depth/"):
        return f"{step_type}depth/{key.removeprefix('depth/')}"
    return f"{step_type}/{key}"


class MetricLogger:
    """Writes the reference's TB scalar namespace (ref train_kitti.py:108-109)
    AND an always-on JSONL record `{logdir}/metrics.jsonl` (one object per
    log() call: {"step", "step_type", scalars...}) so every run is auditable
    even when tensorboardX is not installed (it is absent in this image)."""

    def __init__(self, logdir: Optional[str] = None):
        self.writer = None
        self._jsonl = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self._jsonl = os.path.join(logdir, "metrics.jsonl")
            if SummaryWriter is not None:
                self.writer = SummaryWriter(logdir)

    def _append_jsonl(self, record: Dict):
        if self._jsonl is not None:
            with open(self._jsonl, "a") as f:
                f.write(json.dumps(record) + "\n")

    def log(self, metrics: Dict[str, float], step: int, step_type: str = "train"):
        record = {"step": int(step), "step_type": step_type}
        for k, v in metrics.items():
            v = float(np.asarray(v))
            record[scalar_name(k, step_type)] = v
            if self.writer is not None:
                self.writer.add_scalar(scalar_name(k, step_type), v, step)
                if k in _ALIASES:
                    self.writer.add_scalar(_ALIASES[k].format(step_type), v, step)
        self._append_jsonl(record)

    def log_lr(self, lr: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar("lr", float(lr), step)
        self._append_jsonl({"step": int(step), "lr": float(lr)})

    def flush(self):
        if self.writer is not None:
            self.writer.flush()
