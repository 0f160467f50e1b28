"""Fused batch normalization that keeps the feature grid in the compute dtype.

`flax.linen.BatchNorm` upcasts the *whole* input tensor to float32 to apply the
normalization ((x - mean) * rsqrt(var + eps) * scale + bias computed in f32,
cast back at the end). On the 452x1500 spherical decoder grids that f32
round-trip dominated the device profile: full-grid f32 subtracts, converts and
layout copies in both the forward and backward pass, and f32 cotangents turning
every conv weight-gradient into an f32 MXU op (4x slower than bf16).

FusedBatchNorm computes the statistics in f32 (converts fused into the
reductions -- nothing f32 is materialized at grid size), folds them into
per-channel `mul`/`add` vectors, and applies `x * mul + add` in the compute
dtype. XLA fuses that into the neighbouring conv epilogue, and backward
cotangents stay in the compute dtype end to end.

Drop-in for the nn.BatchNorm usage in this package: same constructor fields,
same variable tree ("params": scale/bias, "batch_stats": mean/var, f32), same
momentum/eps conventions and cross-device stat sync via `axis_name`
(sync-BN, ref train_kitti.py:130), so ported checkpoints are unaffected.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


class FusedBatchNorm(nn.Module):
    """BatchNorm over all axes but the last, fused scale/shift application.

    Statistics reduce in f32 (converts fuse into the reductions) but the
    folded per-channel scale/shift applies in `dtype`, keeping the big
    spherical-grid activations bf16 end to end (docs/PERF.md round 2).
    """

    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (C,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (C,))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # f32 accumulation; the converts fuse into the reductions so no
            # f32 tensor of grid size is ever materialized
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None and not self.is_initializing():
                mean = lax.pmean(mean, self.axis_name)
                mean2 = lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)

        mul = scale * lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        dt = jnp.asarray(x).dtype if self.dtype is None else self.dtype
        return x.astype(dt) * mul.astype(dt) + add.astype(dt)
