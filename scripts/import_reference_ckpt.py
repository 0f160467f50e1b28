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

    from scenerf_tpu.utils.port_reference import import_reference_checkpoint

    cfg, state = import_reference_checkpoint(args.ckpt, args.preset, args.out)
    n = len(jax.tree_util.tree_leaves(state.params))
    print(f"imported {args.ckpt} -> {args.out} (preset {args.preset}, "
          f"{n} param tensors)")


if __name__ == "__main__":
    main()
