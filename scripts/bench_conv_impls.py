"""Per-stage decoder-conv microbench: nn.Conv (XLA conv emitter) vs
ops/conv_taps.py (one im2col matmul) at the spherical-decoder shapes.

Each timing jits a 10-iteration lax.scan whose carry is the activation
(output feeds the next input), so one program amortizes the ~30-50 ms remote
dispatch and defeats the identical-input result cache. fwd times the scan;
bwd times value_and_grad wrt (kernel, x0) through the scan.

    JAX_PLATFORMS=axon python scripts/bench_conv_impls.py
"""
from __future__ import annotations

import time

from scenerf_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp

from scenerf_tpu.ops import conv_taps

N_ITERS = 10
LEVELS = [  # (H, W, C) of the taps-eligible decoder stages + one bigger-C ref
    (452, 1500, 80),
    (226, 750, 160),
    (113, 375, 320),
]


def make_fns(impl: str, d: int):
    if impl == "taps3":
        def one(x, k):
            return conv_taps.conv3x3_taps3(x, k, d)
    elif impl == "conv":
        def one(x, k):
            # uniform dtype, no preferred_element_type: conv transpose can't
            # handle mixed bf16/f32 operands, and the TPU MXU accumulates in
            # f32 for bf16 convs regardless (matches the production nn.Conv)
            dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1), "SAME", rhs_dilation=(d, d),
                dimension_numbers=dn)
    else:
        def one(x, k):
            return conv_taps.conv3x3_taps(x, k, d)

    def chain(x0, k):
        def body(x, _):
            y = one(x, k)
            # keep magnitudes bounded so bf16 doesn't overflow over 10 iters
            y = y * jnp.float32(0.05).astype(y.dtype)
            return y, ()
        y, _ = jax.lax.scan(body, x0, None, length=N_ITERS)
        return jnp.sum(y.astype(jnp.float32))

    fwd = jax.jit(chain)
    bwd = jax.jit(jax.value_and_grad(chain, argnums=(0, 1)))
    return fwd, bwd


def timeit(f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    # force real completion with a scalar readback (remote enqueue-only risk)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = f(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0]))
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    print(f"[bench] backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    for (H, W, C) in LEVELS:
        for d in (1, 3):
            x0 = jax.random.normal(key, (1, H, W, C), jnp.bfloat16)
            k = jax.random.normal(key, (3, 3, C, C), jnp.float32) * 0.05
            row = f"{H}x{W}x{C} d={d}:"
            for impl in ("conv", "taps", "taps3"):
                fwd, bwd = make_fns(impl, d)
                tf = timeit(fwd, x0, k) / N_ITERS * 1e3
                tb = timeit(bwd, x0, k) / N_ITERS * 1e3
                row += f"  {impl}: f={tf:6.2f} fb={tb:6.2f}"
            print(row, flush=True)


if __name__ == "__main__":
    main()
