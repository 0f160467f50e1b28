#!/usr/bin/env python
"""Training-quality comparison: f32 vs bf16 x 1 vs 2 sources.

Trains the full B7 KITTI model on the synthetic KITTI tree
(scripts/make_fake_kitti.py) for --steps steps per configuration, evaluating
val depth abs_rel on held-out lidar-GT frames every --val_every steps.
Publishes the trajectories as JSON (for docs/PERF.md) so the bench flagship
(bf16, n_sources) is justified on quality, not just throughput
(VERDICT round-1 item 3).

Usage (real TPU, ~4 x (compile + steps x ~0.5-0.7 s)):
    python scripts/make_fake_kitti.py --root /tmp/fq --frames 120 --sequence 00
    python scripts/make_fake_kitti.py --root /tmp/fq --frames 40 --sequence 08
    python scripts/quality_runs.py --root /tmp/fq --steps 300 --out /tmp/quality.json
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def write_val_voxel_anchors(root: str, sequence: str = "08", n: int = 40):
    """The val split anchors on voxels/*.bin; emit packed occupancy stubs."""
    from scenerf_tpu.data import io_voxel

    vox_dir = os.path.join(root, "dataset/sequences", sequence, "voxels")
    os.makedirs(vox_dir, exist_ok=True)
    labels = np.zeros((256 * 256 * 32,), np.uint16)
    labels[: 256 * 256 * 2] = 40
    invalid = np.zeros(256 * 256 * 32, np.uint8)
    for i in range(0, n, 5):
        labels.tofile(f"{vox_dir}/{i:06d}.label")
        io_voxel.pack(invalid).tofile(f"{vox_dir}/{i:06d}.invalid")
        io_voxel.pack((labels > 0).astype(np.uint8)).tofile(
            f"{vox_dir}/{i:06d}.bin")


def run_one(tag, cfg, root, prep, steps, val_every, seed=42, fused=False):
    import jax

    from scenerf_tpu.data.kitti import KittiDataset, to_model_batch
    from scenerf_tpu.data.loader import DataLoader
    from scenerf_tpu.parallel.mesh import make_mesh, shard_batch
    from scenerf_tpu.train import Trainer

    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=1000,
                      with_depth_eval=False)
    state = trainer.create_state(jax.random.PRNGKey(seed))
    # fused=False: val metrics come from the depth-eval-only program (no loss
    # renders). On TPU every loaded executable statically reserves its own
    # temp HBM, and even that smaller program cannot co-reside with the
    # 8-source train program (round-5 r5b_queue log: RESOURCE_EXHAUSTED on the
    # first train step after a green step-0 val). fused=True instead runs the
    # val render INSIDE the train program behind lax.cond
    # (train.train_step_with_val): one executable, temps reused, peak HBM =
    # the train step alone (parity: tests/test_train.py).

    train_ds = KittiDataset("train", root, prep, sequence_distance=10.0,
                            frames_interval=0.4, n_sources=cfg.n_sources,
                            n_rays=cfg.n_gt_depth, seed=seed, sequences=["00"])
    val_ds = KittiDataset("val", root, prep, sequence_distance=10.0,
                          frames_interval=0.4, n_sources=cfg.n_sources,
                          n_rays=cfg.n_gt_depth, seed=seed)
    collate = lambda items: to_model_batch(items, cfg)
    loader = DataLoader(train_ds, collate, batch_size=1, shuffle=True,
                        seed=seed)
    n_val = min(4, len(val_ds))
    if fused:
        # ONE stacked val batch (lax.map keeps memory constant in B_val) with
        # the never-read source/target images stubbed out to keep HBM flat
        vb = {k: np.concatenate([collate([val_ds[i]])[k] for i in range(n_val)])
              for k in collate([val_ds[0]])}
        B, S = vb["source_mask"].shape
        vb["img_sources"] = np.zeros((B, S, 1, 1, 3), np.float32)
        vb["img_targets"] = np.zeros((B, S, 1, 1, 3), np.float32)
        val_stack = shard_batch(vb, mesh)
        val_key = jax.random.PRNGKey(1000)
    else:
        val_batches = [shard_batch(collate([val_ds[i]]), mesh)
                       for i in range(n_val)]
    print(f"[{tag}] train scans={len(train_ds)} val scans={len(val_ds)}",
          flush=True)

    def run_val(state):
        accum = None
        for bi, vb in enumerate(val_batches):
            m = jax.device_get(trainer.depth_eval_step(
                state, vb, jax.random.PRNGKey(1000 + bi)))
            accum = m if accum is None else {k: accum[k] + m[k] for k in m}
        return {k: float(v) / len(val_batches) for k, v in accum.items()}

    key = jax.random.PRNGKey(seed + 1)
    hist = {"steps": [], "val_abs_rel": [], "val_rmse": [], "train_loss": []}
    step = 0
    t0 = time.time()
    it = iter(loader)
    if not fused:
        # the fused arms skip the step-0 val: a val-only call would need a
        # second resident program, which is exactly what OOMs at 8 sources
        v0 = run_val(state)
        hist["steps"].append(0)
        hist["val_abs_rel"].append(v0["depth/abs_rel"])
        hist["val_rmse"].append(v0["depth/rmse"])
        hist["train_loss"].append(float("nan"))
        print(f"[{tag}] step 0 val abs_rel {v0['depth/abs_rel']:.4f}",
              flush=True)
    while step < steps:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        do_val = (step + 1) % val_every == 0 or (step + 1) == steps
        if fused:
            state, metrics, vm = trainer.train_step_with_val(
                state, shard_batch(batch, mesh), key, val_stack, val_key,
                do_val=do_val)
        else:
            state, metrics = trainer.train_step(
                state, shard_batch(batch, mesh), key)
        step += 1
        if do_val:
            v = jax.device_get(vm) if fused else run_val(state)
            loss = float(np.asarray(metrics["total_loss"]))
            hist["steps"].append(step)
            hist["val_abs_rel"].append(float(v["depth/abs_rel"]))
            hist["val_rmse"].append(float(v["depth/rmse"]))
            hist["train_loss"].append(loss)
            print(f"[{tag}] step {step} loss {loss:.4f} "
                  f"val abs_rel {float(v['depth/abs_rel']):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    hist["wall_s"] = round(time.time() - t0, 1)
    return hist


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/fq")
    ap.add_argument("--prep", default="/tmp/fq_prep")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--val_every", type=int, default=50)
    ap.add_argument("--out", default="/tmp/quality.json")
    ap.add_argument("--configs", default="bf16x1,f32x1,bf16x2,f32x2")
    ap.add_argument("--seeds", default="42",
                    help="comma list; >1 seed appends @s<seed> to each tag "
                         "(VERDICT r2 item 6: multi-seed quality evidence)")
    args = ap.parse_args()

    from scenerf_tpu import config as C
    from scenerf_tpu.utils.jax_setup import setup_compilation_cache

    setup_compilation_cache()
    write_val_voxel_anchors(args.root)

    def make_cfg(dtype, n_sources):
        # remat_decoder=False matches the flagship's encoder-only remat
        # placement (docs/PERF.md round-4 remat-split probe), so the arms run
        # the exact bench-rung programs (remat placement is bit-identical
        # math -- split parity test in tests/test_model.py)
        return C.kitti(n_sources=n_sources, ray_chunk=1200, n_gt_depth=256,
                       compute_dtype=dtype,
                       remat_encoder=(n_sources > 1), remat_decoder=False)

    grid = {
        "bf16x1": make_cfg("bfloat16", 1),
        "f32x1": make_cfg("float32", 1).replace(remat_encoder=True),
        "bf16x2": make_cfg("bfloat16", 2),
        "f32x2": make_cfg("float32", 2).replace(remat_encoder=True),
        # 4-source arms: the config default (config.py n_sources=4) -- the
        # encoder amortizes over 2x the supervision rays of the 2-src flagship
        "bf16x4": make_cfg("bfloat16", 4),
        # f32 doubles activation HBM: the 4-source f32 train program does not
        # fit with encoder-only remat (round-5 run: compile RESOURCE_EXHAUSTED
        # after a green step-0 val -- the co-resident val program's static
        # temps make it worse). Like the 8-src arms it needs enc+dec remat and
        # the fused single-program val; remat placement is bit-identical math.
        "f32x4": make_cfg("float32", 4).replace(remat_encoder=True,
                                                remat_decoder=True),
        # 8-source arms: the render is a lax.scan over sources (constant
        # memory), so the only cost of more sources is step time -- probe
        # the far end of the encoder-amortization curve. The 8-src train
        # program does NOT fit with encoder-only remat (round-5 probes:
        # compile RESOURCE_EXHAUSTED; round 4 measured the same) -- these
        # arms need full enc+dec remat, the round-4 throughput-probe config
        # (1,476.8 ms serial). Remat placement is bit-identical math (split
        # parity test in tests/test_model.py), so quality transfers.
        "bf16x8": make_cfg("bfloat16", 8).replace(remat_decoder=True),
        "f32x8": make_cfg("float32", 8).replace(remat_encoder=True,
                                                remat_decoder=True),
    }
    seeds = [int(s) for s in args.seeds.split(",")]
    results = {}
    for tag in args.configs.split(","):
        for seed in seeds:
            k = tag if len(seeds) == 1 else f"{tag}@s{seed}"
            # 8-source arms: ONE fused train+val program (two co-resident
            # programs OOM at 8 sources; see run_one)
            results[k] = run_one(k, grid[tag], args.root, args.prep,
                                 args.steps, args.val_every, seed=seed,
                                 fused=tag.endswith("x8") or tag == "f32x4")
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
            print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
