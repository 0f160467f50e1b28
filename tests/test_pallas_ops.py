"""Pallas fused ResnetFC kernel vs the flax reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu import config as C
from scenerf_tpu.fields import ResnetFC
from scenerf_tpu.ops.resnetfc_pallas import (make_pallas_field_fns,
                                             pack_resnetfc_params,
                                             resnetfc_pallas)


def test_resnetfc_pallas_matches_flax(rng):
    d_latent, d_in, H, n_blocks = 96, 42, 64, 3
    mlp = ResnetFC(d_out=4, n_blocks=n_blocks, d_hidden=H)
    z = jnp.asarray(rng.normal(size=(512, d_latent)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(512, d_in)).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(0), z, x)
    want = np.asarray(mlp.apply(params, z, x))

    packed = pack_resnetfc_params(params, n_blocks, dtype=jnp.float32)
    got = np.asarray(resnetfc_pallas(z, x, packed, n_blocks=n_blocks,
                                     tile_n=256, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_make_pallas_field_fns_with_padding(rng):
    cfg = C.tiny(d_hidden=32, n_blocks=2)
    d_latent = 62
    mlp = ResnetFC(d_out=4, n_blocks=cfg.n_blocks, d_hidden=cfg.d_hidden)
    mlp_g = ResnetFC(d_out=2, n_blocks=cfg.n_blocks, d_hidden=cfg.d_hidden)
    z = jnp.asarray(rng.normal(size=(300, d_latent)).astype(np.float32))  # pads
    x = jnp.asarray(rng.normal(size=(300, cfg.d_in)).astype(np.float32))
    variables = {
        "mlp": mlp.init(jax.random.PRNGKey(1), z, x),
        "mlp_gaussian": mlp_g.init(jax.random.PRNGKey(2), z, x),
    }
    field_fn, gauss_fn = make_pallas_field_fns(
        variables, cfg, dtype=jnp.float32, tile_n=256, interpret=True)
    out_f = np.asarray(field_fn(z, x))
    out_g = np.asarray(gauss_fn(z, x))
    assert out_f.shape == (300, 4) and out_g.shape == (300, 2)
    want = np.asarray(mlp.apply(variables["mlp"], z, x))
    np.testing.assert_allclose(out_f, want, rtol=1e-4, atol=1e-4)
