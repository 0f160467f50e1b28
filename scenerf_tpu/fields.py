"""Conditioned radiance-field MLP: pixelNeRF-style ResnetFC with per-block
latent injection (contract: ref scenerf/models/resnetfc.py:11-164).

TPU notes: every layer is a dense matmul over [N, d] with d_hidden=512 --
MXU-friendly as long as N is large (we evaluate all rays x samples of a chunk in
one batch). The 2480-d latent never gets concatenated with the positional input
the way the torch code does; instead each block applies its own latent
projection, which is mathematically identical and avoids materializing the
[N, 2519] concat.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# kaiming_normal(a=0, mode="fan_in") used throughout the reference
# (ref resnetfc.py:37-52, :90-118)
kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class ResnetBlockFC(nn.Module):
    """Fully-connected ResNet block: x + fc1(relu(fc0(relu(x))))
    (ref resnetfc.py:11-63). fc1 is zero-initialized so each block starts as
    the identity."""

    d_hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # profiler annotation parity: ref resnetfc.py:55 "resblock"
        with jax.named_scope("resblock"):
            h = nn.Dense(self.d_hidden, kernel_init=kaiming_normal,
                         dtype=self.dtype, name="fc_0")(nn.relu(x))
            dx = nn.Dense(self.d_hidden, kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name="fc_1")(nn.relu(h))
            return x + dx


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's tree (kernel/bias, same inits) so the
    batched lin_z projection shares checkpoints with per-block nn.Dense."""

    features: int

    @nn.compact
    def __call__(self, d_in: int):
        k = self.param("kernel", kaiming_normal, (d_in, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class ResnetFC(nn.Module):
    """ResnetFC(d_in -> d_out) with latent injected before every block.

    forward(z, x): h = lin_in(x); for each block: h = block(h + lin_z_i(z));
    out = lin_out(relu(h)). Matches ref resnetfc.py:133-164 for
    combine_layer > n_blocks, use_spade=False (the only mode SceneRF uses).

    All n_blocks latent projections run as ONE [N, d_latent] x
    [d_latent, n*d_hidden] matmul (kernels concatenated at apply time): the
    2480-wide latent is the hot operand (~380 MB bf16 per chunk at the
    flagship shapes) and this reads it once instead of n_blocks times.
    """

    d_out: int
    n_blocks: int = 3
    d_hidden: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Optional[jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
        # profiler annotation parity: ref resnetfc.py:140 "resnetfc_infer"
        with jax.named_scope("resnetfc_infer"):
            h = nn.Dense(self.d_hidden, kernel_init=kaiming_normal,
                         dtype=self.dtype, name="lin_in")(x)
            tzs = None
            if z is not None:
                kbs = [_DenseParams(self.d_hidden, name=f"lin_z_{i}")(z.shape[-1])
                       for i in range(self.n_blocks)]
                wcat = jnp.concatenate([k for k, _ in kbs], axis=1)
                bcat = jnp.concatenate([b for _, b in kbs])
                tzs = (z.astype(self.dtype) @ wcat.astype(self.dtype)
                       + bcat.astype(self.dtype))
            for i in range(self.n_blocks):
                if tzs is not None:
                    h = h + tzs[..., i * self.d_hidden:(i + 1) * self.d_hidden]
                h = ResnetBlockFC(self.d_hidden, dtype=self.dtype,
                                  name=f"block_{i}")(h)
            return nn.Dense(self.d_out, kernel_init=kaiming_normal,
                            dtype=self.dtype, name="lin_out")(nn.relu(h))


def density_activation(logit: jnp.ndarray, head: str = "softplus") -> jnp.ndarray:
    """Density head: softplus(x - 1) by default (ref scenerf.py:473-481)."""
    if head == "softplus":
        return jax.nn.softplus(logit - 1.0)
    if head == "relu":
        return nn.relu(logit)
    return logit


def radiance_outputs(mlp_out: jnp.ndarray, head: str = "softplus") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a d_out=4 field output into (density [N], rgb [N, 3])
    (ref scenerf.py:533-541)."""
    rgb = jax.nn.sigmoid(mlp_out[..., :3])
    density = density_activation(mlp_out[..., 3], head)
    return density, rgb


def gaussian_params_from_offsets(
    offsets: jnp.ndarray,       # [..., G, 2] raw mlp_gaussian output
    anchor_distances: jnp.ndarray,  # [G]
    base_std: float,
    floor: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor + offset -> per-ray Gaussian (mean, std), both floored
    (ref scenerf.py:585-596: mean = relu(anchor + dm) + floor,
    std = relu(ds + base_std) + floor; floor is 1.5 on KITTI, 0.5 on BF)."""
    means = nn.relu(anchor_distances + offsets[..., 0]) + floor
    stds = nn.relu(offsets[..., 1] + base_std) + floor
    return means, stds
