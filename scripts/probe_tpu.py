"""Probe: compile + time the flagship train step on the real TPU chip."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

from scenerf_tpu import config as C
from scenerf_tpu.data.synthetic import make_batch
from scenerf_tpu.parallel.mesh import make_mesh, shard_batch
from scenerf_tpu.train import Trainer

p = argparse.ArgumentParser()
p.add_argument("--encoder", default="effnet-b7")
p.add_argument("--features", type=int, default=2560)
p.add_argument("--img_w", type=int, default=1220)
p.add_argument("--img_h", type=int, default=370)
p.add_argument("--sphere_w", type=int, default=1500)
p.add_argument("--sphere_h", type=int, default=452)
p.add_argument("--n_rays", type=int, default=1200)
p.add_argument("--n_sources", type=int, default=1)
p.add_argument("--ray_chunk", type=int, default=300)
p.add_argument("--n_gt", type=int, default=256)
p.add_argument("--depth_eval", action="store_true")
p.add_argument("--dtype", default="float32")
p.add_argument("--no_remat", action="store_true")
p.add_argument("--steps", type=int, default=5)
args = p.parse_args()

print("devices:", jax.devices())
cfg = C.kitti(
    encoder=args.encoder,
    encoder_features=args.features,
    img_size=(args.img_w, args.img_h),
    n_rays=args.n_rays,
    n_sources=args.n_sources,
    ray_chunk=args.ray_chunk,
    n_gt_depth=args.n_gt,
    compute_dtype=args.dtype,
    remat_encoder=not args.no_remat,
)
cfg = cfg.replace(sphere=cfg.sphere.__class__(width=args.sphere_w, height=args.sphere_h))
mesh = make_mesh(jax.devices()[:1])
trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=1000,
                  with_depth_eval=args.depth_eval)
t0 = time.time()
state = trainer.create_state(jax.random.PRNGKey(0))
n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(state.params))
print(f"init done in {time.time()-t0:.1f}s, params={n_params/1e6:.1f}M")

batch = shard_batch(make_batch(cfg, batch_size=1), mesh)
key = jax.random.PRNGKey(1)
t0 = time.time()
state, metrics = trainer.train_step(state, batch, key)
jax.block_until_ready(metrics["total_loss"])
print(f"first step (compile+run): {time.time()-t0:.1f}s loss={float(metrics['total_loss']):.4f}")

times = []
for i in range(args.steps):
    t0 = time.time()
    # RNG folding happens inside the step (keyed by state.step)
    state, metrics = trainer.train_step(state, batch, key)
    jax.block_until_ready(metrics["total_loss"])
    times.append(time.time() - t0)
t = float(np.median(times))
rays = cfg.n_rays * cfg.n_sources
print(f"step: {t*1000:.1f} ms; rays/sec/chip = {rays/t:,.0f}")
