"""Encoder deep-dive: scatter-map cost, backbone vs decoder split, remat
settings, dtype."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

from scenerf_tpu import config as C
from scenerf_tpu import geometry as geo
from scenerf_tpu.data.synthetic import make_batch
from scenerf_tpu.encoder.sphere_decoder import build_sphere_maps
from scenerf_tpu.model import SceneRF

p = argparse.ArgumentParser()
p.add_argument("--dtype", default="float32")
p.add_argument("--remat", default="all", choices=["all", "none"])
args = p.parse_args()

cfg = C.kitti(n_sources=1, n_gt_depth=256, compute_dtype=args.dtype)
model = SceneRF(cfg)
if args.remat == "none":
    model.net_rgb = model.net_rgb.replace(remat=False) if hasattr(model.net_rgb, "replace") else model.net_rgb
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    variables = model.init(jax.random.PRNGKey(0))
variables = jax.device_put(variables, jax.devices()[0])
batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, 1).items()}
cam_K = batch["cam_K"][0]
inv_K = jnp.linalg.inv(cam_K)


def timeit(name, fn, *a, n=5):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name:34s} {np.median(ts)*1000:8.1f} ms", flush=True)
    return out


# 1. sphere map construction alone
@jax.jit
def maps_only(inv_K):
    pix, pix_sphere, _ = geo.sphere_coords_from_pixels(
        inv_K, cfg.sphere, img_size=cfg.img_size)
    return build_sphere_maps(pix, pix_sphere, cfg.sphere)

timeit("build_sphere_maps (6 scatters)", maps_only, inv_K)

# 2. backbone alone
bb_vars = {"params": variables["net_rgb"]["params"]["backbone"],
           "batch_stats": variables["net_rgb"]["batch_stats"]["backbone"]}
bb = model.net_rgb.backbone if hasattr(model.net_rgb, "backbone") else None
from scenerf_tpu.encoder.backbones import make_backbone
backbone = make_backbone(cfg.encoder, num_features=cfg.encoder_features,
                         dtype=cfg.dtype)

@jax.jit
def bb_fwd(v, img):
    taps, _ = backbone.apply(v, img.astype(cfg.dtype), train=True,
                             mutable=["batch_stats"])
    return taps["s32"].sum()

timeit("backbone fwd", bb_fwd, bb_vars, batch["img_input"])
timeit("backbone fwd+bwd", jax.jit(jax.grad(
    lambda v, img: bb_fwd(v, img))), bb_vars, batch["img_input"])

# 3. full encode fwd / fwd+bwd (for reference under this dtype)
enc_fwd = jax.jit(lambda v, img: jax.tree_util.tree_reduce(
    jnp.add, jax.tree_util.tree_map(jnp.sum,
        model.encode(v, img, cam_K, train=True)[0])))
timeit("encode fwd", enc_fwd, variables, batch["img_input"])
timeit("encode fwd+bwd", jax.jit(jax.grad(
    lambda v, img: enc_fwd(v, img))), variables, batch["img_input"])
