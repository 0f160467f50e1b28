"""Decoder conv micro-bench v2: varying inputs to defeat any caching."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

import flax.linen as nn


class ConvStack(nn.Module):
    ch: int
    dilations: tuple
    dtype: any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            x = nn.Conv(self.ch, (3, 3), kernel_dilation=(d, d), padding="SAME",
                        dtype=self.dtype, name=f"c{i}")(x)
            x = nn.leaky_relu(x)
        return x


LEVELS = [(452, 1500, 80), (226, 750, 160), (113, 375, 320), (57, 188, 640),
          (29, 94, 1280)]


def bench(tag, dilations, dtype):
    total = 0.0
    for (H, W, C) in LEVELS:
        m = ConvStack(C, dilations, dtype)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (1, H, W, C), dtype)
        v = m.init(key, x0)
        # remote backend: block_until_ready can be enqueue-only for small
        # programs -- force completion with a scalar host readback
        f = jax.jit(lambda v, x: m.apply(v, x).sum())
        g = jax.jit(lambda v, x: jax.tree_util.tree_reduce(
            jnp.add, jax.tree_util.tree_map(
                jnp.sum, jax.grad(lambda v: m.apply(v, x).sum())(v))))
        xs = [x0 * (1.0 + 0.001 * i) for i in range(4)]
        float(f(v, xs[0]))
        ts = []
        for i in range(4):
            t0 = time.time()
            float(f(v, xs[i]))
            ts.append(time.time() - t0)
        fwd = np.median(ts) * 1000
        float(g(v, xs[0]))
        ts = []
        for i in range(4):
            t0 = time.time()
            float(g(v, xs[i]))
            ts.append(time.time() - t0)
        bwd = np.median(ts) * 1000
        fl = 2 * H * W * C * C * 9 * len(dilations)
        print(f"  {tag} C{C:4d}: fwd {fwd:7.1f} ms  bwd {bwd:7.1f} ms "
              f"({fl/fwd/1e9:6.1f} TF/s)", flush=True)
        total += fwd
    print(f"  {tag} total fwd {total:.1f} ms", flush=True)


print("== d123 f32 ==", flush=True)
bench("d123-f32", (1, 1, 2, 2, 3, 3), jnp.float32)
print("== d111 f32 ==", flush=True)
bench("d111-f32", (1, 1, 1, 1, 1, 1), jnp.float32)
print("== d123 bf16 ==", flush=True)
bench("d123-bf16", (1, 1, 2, 2, 3, 3), jnp.bfloat16)
