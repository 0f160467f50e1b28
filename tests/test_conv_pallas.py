"""fused_affine_conv3x3 (Pallas, interpret mode) vs XLA reference parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenerf_tpu.ops.conv_pallas import NEG_SLOPE, fused_affine_conv3x3


def ref_op(u, w, b, mul=None, add=None, dilation=1):
    t = u
    if mul is not None:
        t = u * mul + add
        t = jnp.where(t >= 0, t, NEG_SLOPE * t)
    h = jax.lax.conv_general_dilated(
        t[None], w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return h + b


CASES = [
    # H, W, Cin, Cout, dilation, prologue
    (20, 136, 8, 16, 1, False),
    (20, 136, 8, 16, 2, True),
    (19, 133, 8, 16, 3, True),   # non-divisible edge tiles
    (10, 17, 8, 8, 1, True),     # smaller than one tile
]


@pytest.mark.parametrize("H,W,Cin,Cout,d,prologue", CASES)
def test_forward_parity(H, W, Cin, Cout, d, prologue):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    u = jax.random.normal(ks[0], (H, W, Cin))
    w = jax.random.normal(ks[1], (3, 3, Cin, Cout)) * 0.1
    b = jax.random.normal(ks[2], (Cout,)) * 0.1
    mul = jax.random.normal(ks[3], (Cin,)) * 0.3 + 1.0 if prologue else None
    add = jax.random.normal(ks[4], (Cin,)) * 0.2 if prologue else None
    got = fused_affine_conv3x3(u, w, b, mul, add, dilation=d, interpret=True)
    want = ref_op(u, w, b, mul, add, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("H,W,Cin,Cout,d,prologue", CASES)
def test_grad_parity(H, W, Cin, Cout, d, prologue):
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    u = jax.random.normal(ks[0], (H, W, Cin))
    w = jax.random.normal(ks[1], (3, 3, Cin, Cout)) * 0.1
    b = jax.random.normal(ks[2], (Cout,)) * 0.1
    mul = jax.random.normal(ks[3], (Cin,)) * 0.3 + 1.0 if prologue else None
    add = jax.random.normal(ks[4], (Cin,)) * 0.2 if prologue else None
    co = jax.random.normal(ks[5], (H, W, Cout))

    if prologue:
        def loss_p(u, w, b, mul, add):
            return jnp.sum(fused_affine_conv3x3(
                u, w, b, mul, add, dilation=d, interpret=True) * co)

        def loss_r(u, w, b, mul, add):
            return jnp.sum(ref_op(u, w, b, mul, add, d) * co)

        ga = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(u, w, b, mul, add)
        gb = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(u, w, b, mul, add)
    else:
        def loss_p(u, w, b):
            return jnp.sum(fused_affine_conv3x3(
                u, w, b, dilation=d, interpret=True) * co)

        def loss_r(u, w, b):
            return jnp.sum(ref_op(u, w, b, None, None, d) * co)

        ga = jax.grad(loss_p, argnums=(0, 1, 2))(u, w, b)
        gb = jax.grad(loss_r, argnums=(0, 1, 2))(u, w, b)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=2e-4)
