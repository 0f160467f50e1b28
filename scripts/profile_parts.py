"""Decompose the flagship train-step time: encoder fwd, encoder fwd+bwd,
renderer fwd, renderer fwd+bwd, losses, full step."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

from scenerf_tpu import config as C
from scenerf_tpu import rendering as R
from scenerf_tpu.data.synthetic import make_batch
from scenerf_tpu.model import SceneRF

p = argparse.ArgumentParser()
p.add_argument("--dtype", default="float32")
p.add_argument("--ray_chunk", type=int, default=300)
p.add_argument("--n_rays", type=int, default=1200)
args = p.parse_args()

cfg = C.kitti(n_sources=1, ray_chunk=args.ray_chunk, n_rays=args.n_rays,
              n_gt_depth=256, compute_dtype=args.dtype)
model = SceneRF(cfg)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    variables = model.init(jax.random.PRNGKey(0))
variables = jax.device_put(variables, jax.devices()[0])
batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, 1).items()}
key = jax.random.PRNGKey(1)


def timeit(name, fn, *a, n=5):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name:32s} {np.median(ts)*1000:8.1f} ms")
    return out


cam_K = batch["cam_K"][0]

# ---- encoder ----
enc_fwd = jax.jit(lambda v, img: model.encode(v, img, cam_K, train=True)[0])
levels = timeit("encode fwd", enc_fwd, variables, batch["img_input"])

def enc_loss(v, img):
    lv, _ = model.encode(v, img, cam_K, train=True)
    return sum(jnp.sum(x) for x in lv.values())

enc_grad = jax.jit(jax.grad(enc_loss))
timeit("encode fwd+bwd", enc_grad, variables, batch["img_input"])

# ---- renderer (on fixed pyramid) ----
pyr = model.pyramid_for_item(levels, 0)
pixels = jnp.stack([jnp.linspace(2, cfg.img_size[0] - 2, cfg.n_rays),
                    jnp.linspace(2, cfg.img_size[1] - 2, cfg.n_rays)], -1)
T = jnp.eye(4).at[2, 3].set(0.5)

render_fwd = jax.jit(lambda v, lv: model.render_rays(
    v, R.FeaturePyramid(levels=lv), cam_K, T, pixels, key)["depth"].sum())
timeit("render fwd (1200 rays)", render_fwd, variables, pyr.levels)

def render_loss(v, lv):
    out = model.render_rays(v, R.FeaturePyramid(levels=lv), cam_K, T, pixels, key)
    return out["depth"].sum() + out["color"].sum() + out["loss_kl"].sum()

render_grad = jax.jit(jax.grad(render_loss))
timeit("render fwd+bwd (1200 rays)", render_grad, variables, pyr.levels)

# ---- full forward + grad ----
def full_loss(v):
    loss, _, _ = model.forward(v, batch, key, train=True, with_depth_eval=False)
    return loss

timeit("full fwd", jax.jit(full_loss), variables)
timeit("full fwd+bwd", jax.jit(jax.grad(full_loss)), variables)
