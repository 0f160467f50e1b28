"""Measure the flagship train step on the real TPU: compile + timed steps.

    python scripts/probe_step.py --sources 2 --decoder_conv taps
"""
from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sources", type=int, default=2)
    ap.add_argument("--decoder_conv", default="conv")
    ap.add_argument("--featurize_gather", default="taps")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--remat_encoder", nargs="?", const=True, default=False,
                    help="flag => full encoder remat; an int k => partial "
                         "remat of backbone stages 0..k-1 only")
    ap.add_argument("--remat_decoder", default=None, choices=["0", "1"],
                    help="decouple decoder remat from --remat_encoder")
    ap.add_argument("--remat_field", action="store_true")
    ap.add_argument("--source_unroll", type=int, default=1)
    args = ap.parse_args()
    remat_decoder = None if args.remat_decoder is None else args.remat_decoder == "1"
    if isinstance(args.remat_encoder, str):
        args.remat_encoder = int(args.remat_encoder)

    from scenerf_tpu.utils.jax_setup import setup_compilation_cache
    setup_compilation_cache()

    import jax
    import numpy as np

    from scenerf_tpu import config as C
    from scenerf_tpu.data.synthetic import make_batch
    from scenerf_tpu.parallel.mesh import make_mesh, shard_batch
    from scenerf_tpu.train import Trainer

    cfg = C.kitti(n_sources=args.sources, ray_chunk=1200, n_gt_depth=256,
                  compute_dtype="bfloat16", remat_encoder=args.remat_encoder,
                  remat_decoder=remat_decoder,
                  remat_field=args.remat_field,
                  decoder_conv=args.decoder_conv,
                  featurize_gather=args.featurize_gather,
                  source_unroll=args.source_unroll)
    print(f"[probe] decoder_conv={args.decoder_conv} "
          f"featurize_gather={args.featurize_gather} sources={args.sources} "
          f"remat_encoder={args.remat_encoder} "
          f"remat_decoder={remat_decoder} remat_field={args.remat_field} "
          f"source_unroll={args.source_unroll} "
          f"backend={jax.default_backend()}", flush=True)

    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=1000,
                      with_depth_eval=False)
    state = trainer.create_state(jax.random.PRNGKey(0))
    batch = shard_batch(make_batch(cfg, batch_size=1), mesh)
    key = jax.random.PRNGKey(1)
    maps = trainer._sphere_maps_for(batch)

    t0 = time.time()
    compiled = trainer._train_step.lower(state, batch, key, maps).compile()
    print(f"[probe] COMPILED in {time.time() - t0:.1f}s", flush=True)
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        print(f"[probe] program flops={cost.get('flops', 0) / 1e12:.2f} TF",
              flush=True)
        ba = cost.get("bytes accessed", 0.0)
        if ba:
            # roofline datum: HBM floor = bytes / 819 GB/s (v5e)
            print(f"[probe] bytes accessed={ba / 1e9:.2f} GB "
                  f"(HBM floor ~{ba / 819e9 * 1e3:.0f} ms on v5e)", flush=True)
    except Exception:
        pass

    state, m = trainer.train_step(state, batch, key)
    jax.block_until_ready(m["total_loss"])
    times = []
    for _ in range(args.steps):
        t0 = time.time()
        state, m = trainer.train_step(state, batch, key)
        jax.block_until_ready(m["total_loss"])
        times.append(time.time() - t0)
    step = float(np.median(times))
    rays = cfg.n_rays * cfg.n_sources
    print(f"[probe] step={step * 1e3:.1f} ms  rays/s={rays / step:.0f}  "
          f"loss={float(m['total_loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
