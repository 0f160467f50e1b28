#!/usr/bin/env python
"""Import a published reference checkpoint into this framework.

The reference publishes Lightning checkpoints (scenerf_kitti.ckpt /
scenerf_bundlefusion.ckpt, ref README.md:215,294) with the model weights under
`state_dict` and the click flags under `hyper_parameters`
(ref scenerf/models/scenerf.py:94 save_hyperparameters). This script maps
every tensor into the flax variable tree (utils/port_reference.py), wraps it
in a fresh TrainState, and writes an Orbax checkpoint directory that every
eval/recon CLI accepts via --model_path.

Usage:
    python scripts/import_reference_ckpt.py \
        --ckpt scenerf_kitti.ckpt --preset kitti --out /path/to/ckpt_dir
    scenerf-save-depth-metrics --model_path /path/to/ckpt_dir ...
"""
from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="reference .ckpt path")
    ap.add_argument("--preset", default="kitti",
                    choices=["kitti", "bundlefusion"])
    ap.add_argument("--out", required=True, help="output checkpoint directory")
    args = ap.parse_args()

    import jax
    import torch

    from scenerf_tpu import config as C
    from scenerf_tpu.train import Trainer, TrainState
    from scenerf_tpu.utils.checkpoint import CheckpointManager
    from scenerf_tpu.utils.port_reference import (port_reference_state_dict,
                                                  validate_against_model)

    raw = torch.load(args.ckpt, map_location="cpu")
    hp = raw.get("hyper_parameters", {})
    overrides = {}
    # flags stored by save_hyperparameters that map onto our config
    # (ref scenerf.py:22-94 __init__ kwargs = save_hyperparameters keys)
    for k in ("n_rays", "n_gaussians", "n_pts_per_gaussian", "n_pts_uni",
              "std", "som_sigma", "lr", "weight_decay", "max_sample_depth",
              "max_infer_depth", "eval_depth", "sampling_method",
              "use_color", "use_reprojection", "batch_size"):
        if k in hp:
            overrides[k] = hp[k]
    if "img_size" in hp:
        overrides["img_size"] = tuple(hp["img_size"])
    cfg = C.PRESETS[args.preset](**overrides)
    if "sphere_W" in hp and "sphere_H" in hp:
        cfg = cfg.replace(sphere=cfg.sphere.__class__(
            width=int(hp["sphere_W"]), height=int(hp["sphere_H"]),
            add_fov_hor=float(hp.get("add_fov_hor", cfg.sphere.add_fov_hor)),
            add_fov_ver=float(hp.get("add_fov_ver", cfg.sphere.add_fov_ver))))

    ported = port_reference_state_dict(raw, n_blocks=cfg.n_blocks)

    cpu = jax.devices("cpu")[0]
    trainer = Trainer(cfg, steps_per_epoch=1000)
    with jax.default_device(cpu):
        template = trainer.model.init(jax.random.PRNGKey(0))
    validate_against_model(template, ported)

    with jax.default_device(cpu):
        params = {k: ported[k]["params"] for k in ported}
        state = TrainState.from_variables(ported, trainer.tx.init(params))
    mgr = CheckpointManager(args.out)
    mgr.save(state, cfg, metrics={"depth/abs_rel": 0.0})  # also writes `best`
    print(f"imported {args.ckpt} -> {args.out} (preset {args.preset}, "
          f"{len(raw.get('state_dict', raw))} tensors)")


if __name__ == "__main__":
    main()
