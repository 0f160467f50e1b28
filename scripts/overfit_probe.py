"""Overfit-one-frame convergence probe (SURVEY section 4; VERDICT r2 weak 5).

Trains on a single geometrically CONSISTENT synthetic frame
(data/synthetic.make_geometric_batch: a textured slanted plane, analytic
gt depth) and tracks val abs_rel -- the loss stack should drive abs_rel
far below the ~0.66 floor seen on the inconsistent random-texture batch.

    JAX_PLATFORMS=cpu python scripts/overfit_probe.py --steps 300 --lr 1e-3
"""
from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval_every", type=int, default=25)
    ap.add_argument("--n_rays", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from scenerf_tpu import config as C
    from scenerf_tpu.data.synthetic import make_geometric_batch
    from scenerf_tpu.parallel.mesh import make_mesh, shard_batch
    from scenerf_tpu.train import Trainer

    cfg = C.tiny(lr=args.lr, n_rays=args.n_rays, ray_chunk=args.n_rays)
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=args.steps,
                      with_depth_eval=True)
    state = trainer.create_state(jax.random.PRNGKey(args.seed))
    batch = shard_batch(make_geometric_batch(cfg, seed=args.seed), mesh)
    key = jax.random.PRNGKey(args.seed + 1)

    t0 = time.time()
    best = np.inf
    for step in range(args.steps):
        state, m = trainer.train_step(state, batch, key)
        if (step + 1) % args.eval_every == 0 or step == 0:
            abs_rel = float(m["depth/abs_rel"])
            best = min(best, abs_rel)
            print(f"step {step + 1:4d}  loss={float(m['total_loss']):.4f}  "
                  f"reproj={float(m['loss_reprojection']):.4f}  "
                  f"abs_rel={abs_rel:.4f}  ({time.time() - t0:.0f}s)",
                  flush=True)
    print(f"BEST abs_rel={best:.4f}")


if __name__ == "__main__":
    main()
