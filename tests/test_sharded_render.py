"""Sharded eval rendering: mesh-sharded result == single-device render.

The sharded renderers draw per-ray noise from the SHARED key with each
device's global row offset (sampling.row_noise), so sharding is a pure
wall-clock optimization: the gathered output is identical (up to f32
lowering noise) to rendering all pixels on one device.
"""
import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu import config as C
from scenerf_tpu.data.synthetic import make_batch
from scenerf_tpu.model import SceneRF
from scenerf_tpu.parallel.mesh import make_mesh
from scenerf_tpu.parallel.sharded_render import (
    make_sharded_pose_sweep,
    make_sharded_renderer,
)


def _setup():
    cfg = C.tiny()
    model = SceneRF(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, 1).items()}
    levels, _ = model.encode(variables, batch["img_input"], batch["cam_K"][0])
    lv = tuple(levels[k][0] for k in ("1_1", "1_2", "1_4", "1_8", "1_16"))
    return cfg, model, variables, batch, lv


def test_sharded_render_matches_single_device():
    cfg, model, variables, batch, lv = _setup()
    T = jnp.eye(4)
    key = jax.random.PRNGKey(3)

    mesh = make_mesh(jax.devices()[:4])
    render = make_sharded_renderer(model, mesh, ray_chunk=16)
    pixels = jnp.stack([jnp.linspace(1, 60, 128), jnp.linspace(1, 44, 128)], -1)
    out = render(variables, lv, batch["cam_K"][0], T, pixels, key)
    assert out["depth"].shape == (128,)

    # single-device render of the SAME pixels with the SAME key
    from scenerf_tpu.rendering import FeaturePyramid
    want = model.render_rays(variables, FeaturePyramid(levels=lv),
                             batch["cam_K"][0], T, pixels, key,
                             ray_chunk=32, remat=False)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(want["depth"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["color"]),
                               np.asarray(want["color"]),
                               rtol=1e-4, atol=1e-4)


def test_sharded_pose_sweep_matches_single_device():
    """Pose sweep with the pixel grid sharded over 4 devices == the model's
    unsharded render_pose_sweep (same keys per pose, shard-invariant noise)."""
    cfg, model, variables, batch, lv = _setup()
    key = jax.random.PRNGKey(5)
    poses = jnp.stack([jnp.eye(4),
                       jnp.eye(4).at[0, 3].set(0.5),
                       jnp.eye(4).at[2, 3].set(-0.3)])

    stride = 4
    mesh = make_mesh(jax.devices()[:4])
    sweep = make_sharded_pose_sweep(model, mesh, stride=stride, ray_chunk=16)
    out = sweep(variables, lv, batch["cam_K"][0], poses, key)

    W, H = cfg.img_size
    h, w = len(range(0, H, stride)), len(range(0, W, stride))
    assert out["depth"].shape == (3, h, w)
    assert out["color"].shape == (3, h, w, 3)

    # unsharded reference: render each pose's full grid on one device with
    # the same split key
    from scenerf_tpu.rendering import FeaturePyramid
    xs = np.arange(0, W, stride, dtype=np.float32)
    ys = np.arange(0, H, stride, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    pixels = jnp.asarray(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    keys = jax.random.split(key, 3)
    for p in range(3):
        ref = model.render_rays(variables, FeaturePyramid(levels=lv),
                                batch["cam_K"][0], poses[p], pixels, keys[p],
                                ray_chunk=pixels.shape[0], remat=False)
        # identical RNG per ray; residual diffs are f32 lowering noise
        # between the chunked lax.map and the single inline block (cf.
        # test_render_rays_chunk_invariant's tolerance)
        np.testing.assert_allclose(
            np.asarray(out["depth"][p]).reshape(-1),
            np.asarray(ref["depth"]), rtol=5e-4, atol=2e-3)
