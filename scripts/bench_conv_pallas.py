"""Micro-bench: fused_affine_conv3x3 (Pallas) vs XLA conv at decoder shapes.

Times fwd and fwd+bwd with chained in-jit iterations on the real TPU.
The runtime serves identical-input calls from a result cache, so the timed
call always gets freshly perturbed inputs.
"""
import time

import jax
import jax.numpy as jnp

from scenerf_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

from scenerf_tpu.ops.conv_pallas import NEG_SLOPE, fused_affine_conv3x3


def xla_op(u, w, b, mul, add, d):
    t = u
    if mul is not None:
        t = u * mul.astype(u.dtype) + add.astype(u.dtype)
        t = jnp.where(t >= 0, t, NEG_SLOPE * t)
    h = jax.lax.conv_general_dilated(
        t[None], w.astype(t.dtype), (1, 1), "SAME", rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return h + b.astype(t.dtype)


def timeit(chained, args, n):
    r = chained(*args)  # compile + warm
    jax.block_until_ready(r)
    a2 = [(a * (1.0 + 1e-4)).astype(a.dtype) for a in args]
    t0 = time.time()
    r = chained(*a2)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1e3


def bench_fwd(fn, args, n=20):
    @jax.jit
    def chained(u, w, b, mul, add):
        for _ in range(n):
            h = fn(u, w, b, mul, add)
            m = min(u.shape[-1], h.shape[-1])
            u = u.at[..., :m].add(
                h[..., :m].astype(u.dtype) * jnp.asarray(1e-6, u.dtype))
        return u

    return timeit(chained, args, n)


def bench_grad(fn, args, n=10):
    def loss(u, w, b, mul, add):
        h = fn(u, w, b, mul, add)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def chained(u, w, b, mul, add):
        for _ in range(n):
            du, dw = g(u, w, b, mul, add)
            u = (u + du.astype(u.dtype) * jnp.asarray(1e-8, u.dtype))
            w = (w + dw.astype(w.dtype) * jnp.asarray(1e-8, w.dtype))
        return u, w

    return timeit(chained, args, n)


SHAPES = [
    ("up1.conv0", 452, 1500, 163, 80, 1),
    ("up1.block", 452, 1500, 80, 80, 2),
    ("up2.conv0", 226, 750, 352, 160, 1),
    ("up2.block", 226, 750, 160, 160, 3),
]

for name, H, W, Cin, Cout, d in SHAPES:
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    u = jax.random.normal(ks[0], (H, W, Cin), jnp.bfloat16)
    w = (jax.random.normal(ks[1], (3, 3, Cin, Cout)) * 0.05).astype(jnp.bfloat16)
    b = jax.random.normal(ks[2], (Cout,)) * 0.01
    mul = jax.random.normal(ks[3], (Cin,)) * 0.3 + 1.0
    add = jax.random.normal(ks[4], (Cin,)) * 0.2

    def pall(u, w, b, mul, add, d=d):
        return fused_affine_conv3x3(u, w, b, mul, add, dilation=d)

    def xla(u, w, b, mul, add, d=d):
        return xla_op(u, w, b, mul, add, d)

    args = (u, w, b, mul, add)
    t_pf = bench_fwd(pall, args)
    t_xf = bench_fwd(xla, args)
    t_pg = bench_grad(pall, args)
    t_xg = bench_grad(xla, args)
    print(f"{name:10s} [{H}x{W}x{Cin}->{Cout} d={d}] "
          f"fwd pallas {t_pf:6.2f} ms  xla {t_xf:6.2f} ms | "
          f"fwd+bwd pallas {t_pg:6.2f} ms  xla {t_xg:6.2f} ms", flush=True)
