"""Rendering-core tests: compositing parity vs a torch oracle, featurization
shapes, and chunked-vs-block consistency of render_rays."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from scenerf_tpu import config as C
from scenerf_tpu import rendering as R
from scenerf_tpu.fields import ResnetFC


def torch_composite_oracle(density, sd, dv, colors):
    """Independent torch implementation of the reference compositing math
    (contract: ref scenerf.py:704-748)."""
    sd = torch.clamp(sd, min=0)
    deltas = torch.zeros_like(sd)
    deltas[:, 0] = sd[:, 0]
    deltas[:, 1:] = sd[:, 1:] - sd[:, :-1]
    alphas = 1 - torch.exp(-deltas * density)
    shifted = torch.cat([torch.ones_like(alphas[:, :1]), 1 - alphas + 1e-10], -1)
    T = torch.cumprod(shifted, -1)
    weights = alphas * T[:, :-1]
    depth = torch.sum(weights * dv, -1)
    color = torch.sum(weights.unsqueeze(-1) * colors, -2)
    return depth, color, alphas, weights


def test_composite_matches_oracle(rng):
    Rn, P = 7, 20
    density = rng.uniform(0, 2, size=(Rn, P)).astype(np.float32)
    sd = np.sort(rng.uniform(0.2, 100, size=(Rn, P)).astype(np.float32), axis=1)
    dv = sd * 0.97
    colors = rng.uniform(0, 1, size=(Rn, P, 3)).astype(np.float32)

    out = R.composite(jnp.asarray(density), jnp.asarray(sd), jnp.asarray(dv),
                      jnp.asarray(colors))
    td, tc, ta, tw = torch_composite_oracle(
        torch.from_numpy(density), torch.from_numpy(sd),
        torch.from_numpy(dv), torch.from_numpy(colors))

    np.testing.assert_allclose(np.asarray(out["depth"]), td.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["color"]), tc.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alphas"]), ta.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["weights"]), tw.numpy(), rtol=1e-4, atol=1e-6)
    # weights_at_depth is the weight of the sample closest to the rendered depth
    idx = np.abs(out["depth"][:, None] - dv).argmin(1)
    np.testing.assert_allclose(
        np.asarray(out["weights_at_depth"]), tw.numpy()[np.arange(Rn), idx], rtol=1e-4)


def test_composite_opaque_wall():
    # huge density at one sample -> depth collapses to that sample
    sd = jnp.asarray([[1.0, 5.0, 10.0, 20.0]])
    dv = sd
    density = jnp.asarray([[0.0, 1000.0, 0.0, 0.0]])
    colors = jnp.zeros((1, 4, 3)).at[0, 1].set(jnp.asarray([1.0, 0.0, 0.0]))
    out = R.composite(density, sd, dv, colors)
    np.testing.assert_allclose(float(out["depth"][0]), 5.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["color"][0]), [1, 0, 0], atol=1e-3)


def _toy_setup(seed=0):
    cfg = C.tiny()
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    sphere = cfg.sphere
    levels = []
    chans = (8, 8, 16, 16, 32)
    for i, s in enumerate(R.SCALES):
        H, W = R.pyramid_level_size(sphere, s)
        levels.append(jax.random.normal(ks[i], (H, W, chans[i])) * 0.1)
    pyramid = R.FeaturePyramid(levels=tuple(levels))
    d_latent = sum(chans)

    K = jnp.asarray([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
    T = jnp.eye(4).at[2, 3].set(0.3)

    mlp = ResnetFC(d_out=4, n_blocks=cfg.n_blocks, d_hidden=cfg.d_hidden)
    mlp_g = ResnetFC(d_out=2, n_blocks=cfg.n_blocks, d_hidden=cfg.d_hidden)
    zd = jnp.zeros((1, d_latent))
    xd = jnp.zeros((1, cfg.d_in))
    p1 = mlp.init(ks[5], zd, xd)
    p2 = mlp_g.init(ks[6], zd, xd)
    field_fn = lambda z, x: mlp.apply(p1, z, x)
    gauss_fn = lambda z, x: mlp_g.apply(p2, z, x)
    return cfg, pyramid, K, T, field_fn, gauss_fn, ks[7]


def test_render_rays_shapes_and_sanity():
    cfg, pyramid, K, T, field_fn, gauss_fn, key = _toy_setup()
    pixels = jnp.stack(
        [jnp.linspace(2, 60, 32), jnp.linspace(2, 44, 32)], axis=-1)
    out = R.render_rays(key, pixels, pyramid, K, T, field_fn, gauss_fn, cfg,
                        ray_chunk=32)
    P = cfg.n_pts_per_ray
    assert out["depth"].shape == (32,)
    assert out["color"].shape == (32, 3)
    assert out["weights"].shape == (32, P)
    assert out["gaussian_means"].shape == (32, cfg.n_gaussians)
    assert out["loss_kl"].shape == (32,)
    d = np.asarray(out["depth"])
    assert np.isfinite(d).all()
    assert (d >= 0).all() and (d <= cfg.max_sample_depth * 1.1).all()
    # weights sum <= 1
    ws = np.asarray(out["weights"]).sum(-1)
    assert (ws <= 1 + 1e-5).all()


def test_render_rays_chunk_invariant():
    """Per-ray noise depends only on the global ray index: rendering is
    bit-identical across chunk layouts (the basis of ray_shard exactness)."""
    cfg, pyramid, K, T, field_fn, gauss_fn, key = _toy_setup()
    pixels = jnp.stack(
        [jnp.linspace(2, 60, 64), jnp.linspace(2, 44, 64)], axis=-1)
    out16 = R.render_rays(key, pixels, pyramid, K, T, field_fn, gauss_fn, cfg,
                          ray_chunk=16)
    out64 = R.render_rays(key, pixels, pyramid, K, T, field_fn, gauss_fn, cfg,
                          ray_chunk=64)
    # identical RNG per ray; residual diffs are pure f32 lowering noise
    # (lax.map+checkpoint vs inline compile variants), orders below the
    # ~meter-scale jitter that a key mismatch would cause
    np.testing.assert_allclose(np.asarray(out16["depth"]),
                               np.asarray(out64["depth"]),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out16["depth_volume"]),
                               np.asarray(out64["depth_volume"]),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out16["color"]),
                               np.asarray(out64["color"]),
                               rtol=1e-4, atol=1e-4)


def test_render_rays_row_slice_matches_full():
    """A caller rendering rows [off:off+n) of a larger ray batch via
    row_offset/total_rows reproduces exactly the full render's rows -- the
    rendering-level contract behind ray_shard."""
    cfg, pyramid, K, T, field_fn, gauss_fn, key = _toy_setup()
    pixels = jnp.stack(
        [jnp.linspace(2, 60, 64), jnp.linspace(2, 44, 64)], axis=-1)
    full = R.render_rays(key, pixels, pyramid, K, T, field_fn, gauss_fn, cfg,
                         ray_chunk=64)
    for off in (0, 16, 48):
        part = R.render_rays(key, pixels[off:off + 16], pyramid, K, T,
                             field_fn, gauss_fn, cfg, ray_chunk=16,
                             row_offset=off, total_rows=64)
        np.testing.assert_allclose(
            np.asarray(part["depth"]),
            np.asarray(full["depth"][off:off + 16]), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(part["loss_kl"]),
            np.asarray(full["loss_kl"][off:off + 16]), rtol=1e-4, atol=1e-5)


def test_render_rays_remat_field_identical():
    """remat_field checkpoints featurize+field-MLP (memory lever for high
    source counts); outputs and pyramid grads must match the uncheckpointed
    render (same ops recomputed -- only instruction scheduling may differ)."""
    cfg, pyramid, K, T, field_fn, gauss_fn, key = _toy_setup()
    pixels = jnp.stack([jnp.linspace(2, 60, 16), jnp.linspace(2, 44, 16)], -1)

    def loss_fn(levels, c):
        pyr = R.FeaturePyramid(levels=levels)
        out = R.render_rays(key, pixels, pyr, K, T, field_fn, gauss_fn, c,
                            ray_chunk=16)
        loss = out["depth"].mean() + out["color"].mean() + out["loss_kl"].mean()
        return loss, out

    (l0, out0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        pyramid.levels, cfg)
    (l1, out1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        pyramid.levels, cfg.replace(remat_field=True))

    np.testing.assert_array_equal(np.asarray(out0["depth"]),
                                  np.asarray(out1["depth"]))
    np.testing.assert_array_equal(np.asarray(out0["color"]),
                                  np.asarray(out1["color"]))
    np.testing.assert_allclose(float(l0), float(l1), rtol=0, atol=0)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_render_rays_gradients_finite():
    cfg, pyramid, K, T, field_fn, gauss_fn, key = _toy_setup()
    pixels = jnp.stack([jnp.linspace(2, 60, 16), jnp.linspace(2, 44, 16)], -1)

    def loss_fn(levels):
        pyr = R.FeaturePyramid(levels=levels)
        out = R.render_rays(key, pixels, pyr, K, T, field_fn, gauss_fn, cfg,
                            ray_chunk=16)
        return out["depth"].mean() + out["color"].mean() + out["loss_kl"].mean()

    g = jax.grad(loss_fn)(pyramid.levels)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


def test_pad_rays():
    pix = jnp.ones((10, 2))
    padded, mask = R.pad_rays(pix, 8)
    assert padded.shape == (16, 2)
    assert int(mask.sum()) == 10
