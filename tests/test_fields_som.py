"""Tests for the ResnetFC field and the vectorized RaySOM.

RaySOM is checked against an independent loop-based numpy oracle implementing
the published EM-update semantics (contract: ref scenerf/models/ray_som_kl.py).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu.fields import (ResnetFC, density_activation,
                                gaussian_params_from_offsets, radiance_outputs)
from scenerf_tpu.som import kl_gauss, ray_som


def test_resnetfc_shapes_and_latent_injection():
    mlp = ResnetFC(d_out=4, n_blocks=3, d_hidden=64)
    z = jnp.ones((10, 32))
    x = jnp.ones((10, 42))
    params = mlp.init(jax.random.PRNGKey(0), z, x)
    out = mlp.apply(params, z, x)
    assert out.shape == (10, 4)
    # latent must influence the output
    out2 = mlp.apply(params, z * 2.0, x)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # no-latent mode
    mlp0 = ResnetFC(d_out=2, n_blocks=2, d_hidden=32)
    p0 = mlp0.init(jax.random.PRNGKey(1), None, x)
    assert mlp0.apply(p0, None, x).shape == (10, 2)


def test_density_activation_softplus_shift():
    x = jnp.asarray([0.0, 1.0, 5.0])
    got = np.asarray(density_activation(x))
    want = np.log1p(np.exp(np.asarray(x) - 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_radiance_outputs_ranges(rng):
    out = jnp.asarray(rng.normal(size=(20, 4)).astype(np.float32))
    dens, rgb = radiance_outputs(out)
    assert dens.shape == (20,) and rgb.shape == (20, 3)
    assert (np.asarray(dens) >= 0).all()
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()


def test_gaussian_params_floors():
    offsets = jnp.asarray([[[-100.0, -100.0], [0.0, 0.0]]])  # [1, 2, 2]
    anchors = jnp.asarray([10.0, 30.0])
    means, stds = gaussian_params_from_offsets(offsets, anchors, base_std=2.5, floor=1.5)
    np.testing.assert_allclose(np.asarray(means[0]), [1.5, 31.5], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(stds[0]), [1.5, 4.0], rtol=1e-6)


def test_kl_gauss_floor_and_zero():
    # identical distributions with s >= floor -> KL = 0
    m = jnp.asarray([5.0])
    s = jnp.asarray([2.0])
    np.testing.assert_allclose(np.asarray(kl_gauss(m, m, s, s)), [0.0], atol=1e-6)
    # floored target std changes the result
    v = np.asarray(kl_gauss(m, m, jnp.asarray([0.5]), jnp.asarray([0.5])))
    assert v[0] != 0.0


# --------------------------------------------------------------------------- #
# RaySOM numpy oracle (independent, loop-based)
# --------------------------------------------------------------------------- #


def som_oracle(means, stds, sd, density, sigma, thr=0.1, floor=1.5):
    R, C = means.shape
    P = sd.shape[1]
    dens = density + 1e-8

    rel = np.zeros((R, C, C))
    for c2 in range(C):
        for c1 in range(C):
            rel[:, c2, c1] = np.exp(-((means[:, c2] - means[:, c1]) ** 2) / (2 * sigma**2))
    p_c1_c2 = rel / rel.sum(2, keepdims=True)

    var = stds**2
    dist = np.abs(means[:, None, :] - sd[:, :, None])
    p_z_c1 = np.exp(-dist**2 / (2 * var[:, None, :])) / (math.sqrt(2 * math.pi) * stds[:, None, :]) + 1e-5
    p_z_c1 = p_z_c1 * dens[:, :, None] + 1e-8

    temp = p_z_c1.reshape(R, P, 1, C) * p_c1_c2[:, None, :, :] + 1e-8
    p_z_c2 = temp.sum(-1)
    p_best = p_z_c2.max(2)
    best = p_z_c2.argmax(2)

    new_means = np.zeros((R, C))
    new_vars = np.zeros((R, C))
    for r in range(C):
        rel_w = np.take_along_axis(rel[:, r, :], best, axis=1)
        w = rel_w * p_z_c1[:, :, r] / p_best + 1e-5
        new_means[:, r] = (w * sd).sum(1) / w.sum(1)
        new_vars[:, r] = (w * (sd - new_means[:, r][:, None]) ** 2).sum(1) / w.sum(1)

    mean_mask = (np.abs(means - new_means) > thr) & (new_vars > 0)
    var_mask = (np.abs(np.sqrt(var) - np.sqrt(new_vars)) > thr) & (new_vars > 0)
    mask = (mean_mask & var_mask).astype(np.float64)

    s2 = np.maximum(np.sqrt(new_vars), floor)
    kl = np.log(s2 / stds + 1e-8) + (var + (means - new_means) ** 2) / (2 * s2**2) - 0.5
    return (kl * mask).mean(1), new_means, new_vars


def test_ray_som_matches_oracle(rng):
    R, C, P = 6, 4, 24
    means = rng.uniform(5, 90, size=(R, C)).astype(np.float32)
    # wide stds keep every likelihood well above underflow; exact-zero ties
    # would make argmax tie-breaking (unspecified in the reference too)
    # dominate the comparison
    stds = rng.uniform(12, 25, size=(R, C)).astype(np.float32)
    sd = np.sort(rng.uniform(0.2, 100, size=(R, P)).astype(np.float32), axis=1)
    dens = rng.uniform(0, 1, size=(R, P)).astype(np.float32)

    got = ray_som(jnp.asarray(means), jnp.asarray(stds), jnp.asarray(sd),
                  jnp.asarray(dens), som_sigma=2.0)
    want_loss, want_means, want_vars = som_oracle(means, stds, sd, dens, 2.0)

    np.testing.assert_allclose(np.asarray(got.new_means), want_means, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.new_vars), want_vars, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.loss_kl), want_loss, rtol=1e-3, atol=1e-5)


def test_ray_som_gradients_flow_only_to_predictions(rng):
    R, C, P = 3, 4, 16
    means = jnp.asarray(rng.uniform(5, 90, size=(R, C)).astype(np.float32))
    stds = jnp.asarray(rng.uniform(1.6, 6, size=(R, C)).astype(np.float32))
    sd = jnp.sort(jnp.asarray(rng.uniform(0.2, 100, size=(R, P)).astype(np.float32)), axis=1)
    dens = jnp.asarray(rng.uniform(0, 1, size=(R, P)).astype(np.float32))

    def loss(m, s, d):
        return ray_som(m, s, sd, d, som_sigma=2.0).loss_kl.sum()

    gm, gs, gd = jax.grad(loss, argnums=(0, 1, 2))(means, stds, dens)
    assert np.isfinite(np.asarray(gm)).all() and np.abs(np.asarray(gm)).sum() > 0
    assert np.isfinite(np.asarray(gs)).all()
    # density is fully detached inside the SOM
    np.testing.assert_allclose(np.asarray(gd), 0.0)
