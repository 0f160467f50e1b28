"""Pallas decoder path vs XLA path: same params, same outputs/grads/stats."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenerf_tpu.encoder.sphere_decoder import BasicBlock, UpSampleBN


def _variants(cls, **kw):
    xla = cls(**kw, pallas=False)
    pal = cls(**kw, pallas=True, interpret=True)
    return xla, pal


@pytest.mark.parametrize("dilation", [1, 2, 3])
def test_basic_block_parity(dilation):
    xla, pal = _variants(BasicBlock, channels=8, dilation=dilation)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 20, 8))
    v = xla.init(jax.random.PRNGKey(1), x, True)
    v2 = pal.init(jax.random.PRNGKey(1), x, True)
    # identical parameter trees (names, shapes, values)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                 v, v2)

    ya, sa = xla.apply(v, x, True, mutable=["batch_stats"])
    yb, sb = pal.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(ya, yb, rtol=2e-4, atol=2e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                         atol=1e-5),
                 sa["batch_stats"], sb["batch_stats"])

    co = jax.random.normal(jax.random.PRNGKey(2), ya.shape)

    def loss(mod):
        def f(params, xx):
            y, _ = mod.apply({"params": params,
                              "batch_stats": v["batch_stats"]}, xx, True,
                             mutable=["batch_stats"])
            return jnp.sum(y * co)
        return f

    ga_p, ga_x = jax.grad(loss(xla), argnums=(0, 1))(v["params"], x)
    gb_p, gb_x = jax.grad(loss(pal), argnums=(0, 1))(v["params"], x)
    np.testing.assert_allclose(ga_x, gb_x, rtol=1e-3, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=1e-3, atol=2e-4), ga_p, gb_p)


def test_upsample_bn_parity():
    xla, pal = _variants(UpSampleBN, channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 10, 12))
    skip = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 20, 5))
    v = xla.init(jax.random.PRNGKey(2), x, skip, True)
    v2 = pal.init(jax.random.PRNGKey(2), x, skip, True)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                 v, v2)
    ya, _ = xla.apply(v, x, skip, True, mutable=["batch_stats"])
    yb, _ = pal.apply(v, x, skip, True, mutable=["batch_stats"])
    np.testing.assert_allclose(ya, yb, rtol=2e-4, atol=2e-4)


def test_upsample_bn_eval_mode_parity():
    """Eval mode (running stats) through the prologue path."""
    xla, pal = _variants(UpSampleBN, channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 10, 12))
    skip = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 20, 5))
    v = xla.init(jax.random.PRNGKey(2), x, skip, True)
    # perturb running stats away from init so eval actually uses them
    v = jax.tree.map(lambda a: a + 0.1, v)
    ya = xla.apply(v, x, skip, False)
    yb = pal.apply(v, x, skip, False)
    np.testing.assert_allclose(ya, yb, rtol=2e-4, atol=2e-4)
