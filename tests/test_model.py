"""End-to-end model tests on the tiny preset: encoder shapes, forward loss,
gradient flow, and loss descent when overfitting one synthetic batch."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scenerf_tpu import config as C
from scenerf_tpu.data.synthetic import make_batch
from scenerf_tpu.encoder.sphere_decoder import (decoder_latent_dim,
                                                resize_bilinear_align_corners)
from scenerf_tpu.model import SceneRF
from scenerf_tpu.rendering import pyramid_level_size


@pytest.fixture(scope="module")
def setup():
    cfg = C.tiny()
    model = SceneRF(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, batch_size=1).items()}
    return cfg, model, variables, batch


def test_resize_align_corners_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    x = rng.normal(size=(2, 9, 13, 4)).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (17, 25)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(17, 25),
                         mode="bilinear", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_encode_level_shapes(setup):
    cfg, model, variables, batch = setup
    levels, _ = model.encode(variables, batch["img_input"], batch["cam_K"][0])
    F = cfg.encoder_features
    for key, scale, ch in [("1_1", 1, F // 32), ("1_2", 2, F // 16),
                           ("1_4", 4, F // 8), ("1_8", 8, F // 4),
                           ("1_16", 16, F // 2)]:
        H_s, W_s = pyramid_level_size(cfg.sphere, scale)
        assert levels[key].shape == (1, H_s, W_s, ch), key
    assert model.d_latent == decoder_latent_dim(F)
    # in-FOV cells must carry non-zero features
    assert float(jnp.abs(levels["1_1"]).sum()) > 0


def test_forward_loss_and_metrics(setup):
    cfg, model, variables, batch = setup
    loss, metrics, new_vars = model.forward(
        variables, batch, jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))
    for k in ("loss_reprojection", "loss_color", "loss_som_kl",
              "loss_dist2closest_gauss", "total_loss", "depth/abs_rel",
              "depth/a1", "min_som_vars", "weights_at_depth"):
        assert k in metrics, k
        assert np.isfinite(float(metrics[k])), k
    # batch stats must update in train mode
    old = jax.tree_util.tree_leaves(variables["net_rgb"]["batch_stats"])
    new = jax.tree_util.tree_leaves(new_vars["net_rgb"]["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_forward_source_mask_zeroes_contribution(setup):
    cfg, model, variables, batch = setup
    batch0 = dict(batch)
    batch0["source_mask"] = jnp.zeros_like(batch["source_mask"])
    loss, metrics, _ = model.forward(variables, batch0, jax.random.PRNGKey(1),
                                     train=False, with_depth_eval=False)
    assert float(loss) == 0.0


def test_overfit_one_batch_loss_decreases(setup):
    cfg, model, variables, batch = setup
    tx = optax.adamw(3e-4)

    params = {k: variables[k]["params"] for k in variables}

    def rebuild(params):
        v = {k: dict(variables[k]) for k in variables}
        for k in params:
            v[k] = {**v[k], "params": params[k]}
        return v

    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            loss, metrics, _ = model.forward(
                rebuild(p), batch, key, train=False, with_depth_eval=False)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    for i in range(10):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(100))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[5:]) < losses[0], losses


@pytest.mark.parametrize("bs", [2, 3])
def test_forward_lax_map_matches_item_loop(setup, bs):
    """The lax.map per-item path (B>1) must match the unrolled Python loop."""
    cfg, model, variables, _ = setup
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(cfg, batch_size=bs).items()}
    key = jax.random.PRNGKey(7)
    loss_a, met_a, _ = model.forward(variables, batch, key, train=False,
                                     with_depth_eval=True, item_loop=True)
    loss_b, met_b, _ = model.forward(variables, batch, key, train=False,
                                     with_depth_eval=True, item_loop=False)
    np.testing.assert_allclose(float(loss_a), float(loss_b),
                               rtol=1e-5, atol=1e-6)
    for k in met_a:
        np.testing.assert_allclose(np.asarray(met_a[k]), np.asarray(met_b[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_render_image(setup):
    cfg, model, variables, batch = setup
    levels, _ = model.encode(variables, batch["img_input"], batch["cam_K"][0])
    pyr = model.pyramid_for_item(levels, 0)
    T = jnp.eye(4)
    out = model.render_image(variables, pyr, batch["cam_K"][0], T,
                             jax.random.PRNGKey(3), stride=4)
    W, H = cfg.img_size
    assert out["depth"].shape == (H // 4, W // 4)
    assert out["color"].shape == (H // 4, W // 4, 3)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_source_unroll_is_identical(setup):
    """lax.scan unroll over the source loop is pure scheduling freedom: loss
    and grads must be bit-comparable to the unroll=1 program."""
    cfg, model, variables, batch = setup
    key = jax.random.PRNGKey(5)

    def loss_and_grads(c):
        m = SceneRF(c)

        def loss_fn(v):
            loss, _, _ = m.forward(v, batch, key, train=False)
            return loss

        return jax.value_and_grad(loss_fn)(variables)

    base_l, base_g = loss_and_grads(cfg)  # source_unroll=1
    l, g = loss_and_grads(cfg.replace(source_unroll=max(2, cfg.n_sources)))
    np.testing.assert_allclose(float(l), float(base_l), rtol=1e-6, atol=1e-7)
    for (pa, a), (pb, b) in zip(jax.tree_util.tree_leaves_with_path(base_g),
                                jax.tree_util.tree_leaves_with_path(g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6, err_msg=str(pa))


def test_remat_decoder_split_is_identical(setup):
    """remat placement (coupled vs decoder-only vs encoder-only) is a pure
    memory/replay trade: loss and grads must match across the splits."""
    cfg, model, variables, batch = setup
    key = jax.random.PRNGKey(3)

    def loss_and_grads(c):
        m = SceneRF(c)

        def loss_fn(v):
            loss, _, _ = m.forward(v, batch, key, train=False)
            return loss

        return jax.value_and_grad(loss_fn)(variables)

    base_l, base_g = loss_and_grads(cfg)  # remat_decoder=None follows encoder
    for c in (cfg.replace(remat_encoder=True, remat_decoder=False),
              cfg.replace(remat_encoder=False, remat_decoder=True)):
        l, g = loss_and_grads(c)
        np.testing.assert_allclose(float(l), float(base_l),
                                   rtol=1e-6, atol=1e-7)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(base_g),
                jax.tree_util.tree_leaves_with_path(g)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=str(pa))
