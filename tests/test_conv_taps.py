"""ops/conv_taps: the im2col-matmul conv must match nn.Conv exactly
(values AND gradients), including dilation and batching -- it replaces
nn.Conv on every decoder stage (ref convs: unet2d_sphere.py:9-56)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenerf_tpu.ops import conv_taps


def _ref_conv(x, kernel, bias, d):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias


@pytest.mark.parametrize("variant", ["taps", "taps3"])
@pytest.mark.parametrize("dilation", [1, 2, 3])
def test_matches_xla_conv(rng, dilation, variant):
    B, H, W, Ci, Co = 2, 9, 13, 5, 7
    x = jnp.asarray(rng.normal(size=(B, H, W, Ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, Ci, Co)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    got = conv_taps.conv3x3(x, k, b, dilation, variant=variant)
    want = _ref_conv(x, k, b, dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("variant", ["taps", "taps3"])
@pytest.mark.parametrize("dilation", [1, 3])
def test_gradients_match_xla_conv(rng, dilation, variant):
    B, H, W, Ci, Co = 1, 8, 10, 4, 6
    x = jnp.asarray(rng.normal(size=(B, H, W, Ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, Ci, Co)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(B, H, W, Co)).astype(np.float32))

    def loss_taps(x, k, b):
        return (conv_taps.conv3x3(x, k, b, dilation, variant=variant) * cot).sum()

    def loss_ref(x, k, b):
        return (_ref_conv(x, k, b, dilation) * cot).sum()

    g_taps = jax.grad(loss_taps, argnums=(0, 1, 2))(x, k, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, w in zip(g_taps, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_bf16_accumulates_f32(rng):
    """bf16 inputs accumulate in f32 on the dot (preferred_element_type):
    the result must be far closer to the f32 conv than bf16 accumulation."""
    B, H, W, C = 1, 6, 6, 64
    xf = rng.normal(size=(B, H, W, C)).astype(np.float32)
    kf = (rng.normal(size=(3, 3, C, C)) * 0.1).astype(np.float32)
    x16, k16 = jnp.asarray(xf, jnp.bfloat16), jnp.asarray(kf, jnp.bfloat16)
    got = np.asarray(conv_taps.conv3x3(x16, k16, None, 1), np.float32)
    want = np.asarray(_ref_conv(
        jnp.asarray(np.asarray(x16, np.float32)),
        jnp.asarray(np.asarray(k16, np.float32)), jnp.zeros((C,)), 1))
    # bf16 inputs, f32 accumulation, bf16 output rounding
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("variant", ["taps", "taps3"])
def test_decoder_taps_matches_conv_end_to_end(rng, variant):
    """DecoderSphere conv_impl in ('taps', 'taps3') == 'conv' on identical
    params/stats (checkpoint interchangeability)."""
    from scenerf_tpu import config as C
    from scenerf_tpu.model import SceneRF

    cfg_t = C.tiny(decoder_conv=variant)
    cfg_c = cfg_t.replace(decoder_conv="conv")
    m_taps, m_conv = SceneRF(cfg_t), SceneRF(cfg_c)
    variables = m_taps.init(jax.random.PRNGKey(0))

    from scenerf_tpu.data.synthetic import make_batch
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg_t, 1).items()}
    lt, _ = m_taps.encode(variables, batch["img_input"], batch["cam_K"][0])
    lc, _ = m_conv.encode(variables, batch["img_input"], batch["cam_K"][0])
    for key in lt:
        np.testing.assert_allclose(np.asarray(lt[key]), np.asarray(lc[key]),
                                   rtol=1e-5, atol=1e-5)
