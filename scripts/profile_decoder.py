"""Decoder micro-benchmarks: isolate what makes the spherical decoder slow.

Times standalone conv stacks at the real level shapes under different
dilations, dtypes, and remat settings.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

import flax.linen as nn


def timeit(name, fn, *a, n=5):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name:44s} {np.median(ts)*1000:8.1f} ms", flush=True)


LEVELS = [  # (H, W, C) of the five decoder outputs
    (452, 1500, 80),
    (226, 750, 160),
    (113, 375, 320),
    (57, 188, 640),
    (29, 94, 1280),
]


class ConvStack(nn.Module):
    ch: int
    dilations: tuple
    dtype: any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            x = nn.Conv(self.ch, (3, 3), kernel_dilation=(d, d),
                        padding="SAME", dtype=self.dtype, name=f"c{i}")(x)
            x = nn.leaky_relu(x)
        return x


def bench_stack(tag, dilations, dtype):
    total_fwd = 0.0
    for (H, W, C) in LEVELS:
        m = ConvStack(C, dilations, dtype)
        x = jnp.ones((1, H, W, C), dtype)
        v = m.init(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda v, x: m.apply(v, x).sum())
        g = jax.jit(jax.grad(lambda v, x: m.apply(v, x).sum()))
        # fwd
        f(v, x).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.time(); f(v, x).block_until_ready(); ts.append(time.time()-t0)
        fwd = np.median(ts) * 1000
        g(v, x)  # warm
        jax.block_until_ready(g(v, x))
        ts = []
        for _ in range(5):
            t0 = time.time(); jax.block_until_ready(g(v, x)); ts.append(time.time()-t0)
        bwd = np.median(ts) * 1000
        flops = 2 * H * W * C * C * 9 * len(dilations)
        print(f"  {tag} L{C:4d} ({H}x{W}): fwd {fwd:7.1f} ms "
              f"bwd {bwd:7.1f} ms  ({flops/fwd/1e9:6.1f} TF/s fwd)", flush=True)
        total_fwd += fwd
    print(f"  {tag} TOTAL fwd {total_fwd:.1f} ms", flush=True)


print("== dilations (1,2,3)x2convs f32 (reference semantics) ==", flush=True)
bench_stack("d123-f32", (1, 1, 2, 2, 3, 3), jnp.float32)
print("== all dilation 1, f32 ==", flush=True)
bench_stack("d111-f32", (1, 1, 1, 1, 1, 1), jnp.float32)
print("== dilations (1,2,3), bf16 ==", flush=True)
bench_stack("d123-bf16", (1, 1, 2, 2, 3, 3), jnp.bfloat16)
