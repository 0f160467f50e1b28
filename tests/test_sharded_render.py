"""Sharded eval rendering: 4-device mesh result == single-device blocks."""
import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu import config as C
from scenerf_tpu.data.synthetic import make_batch
from scenerf_tpu.model import SceneRF
from scenerf_tpu.parallel.mesh import make_mesh
from scenerf_tpu.parallel.sharded_render import make_sharded_renderer


def test_sharded_render_matches_blockwise():
    cfg = C.tiny()
    model = SceneRF(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, 1).items()}
    levels, _ = model.encode(variables, batch["img_input"], batch["cam_K"][0])
    lv = tuple(levels[k][0] for k in ("1_1", "1_2", "1_4", "1_8", "1_16"))
    T = jnp.eye(4)
    key = jax.random.PRNGKey(3)

    chunk = 16
    mesh = make_mesh(jax.devices()[:4])
    render = make_sharded_renderer(model, mesh, ray_chunk=chunk)
    pixels = jnp.stack([jnp.linspace(1, 60, 128), jnp.linspace(1, 44, 128)], -1)
    out = render(variables, lv, batch["cam_K"][0], T, pixels, key)
    assert out["depth"].shape == (128,)
    assert np.isfinite(np.asarray(out["depth"])).all()

    # manual: replicate each device's fold_in + per-shard rendering
    from scenerf_tpu.rendering import FeaturePyramid
    parts = []
    for d in range(4):
        kd = jax.random.fold_in(key, d)
        o = model.render_rays(variables, FeaturePyramid(levels=lv),
                              batch["cam_K"][0], T,
                              pixels[d * 32:(d + 1) * 32], kd,
                              ray_chunk=chunk, remat=False)
        parts.append(np.asarray(o["depth"]))
    want = np.concatenate(parts)
    np.testing.assert_allclose(np.asarray(out["depth"]), want, rtol=2e-3,
                               atol=2e-3)
