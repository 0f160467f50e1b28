"""NeRF positional encoding (ref scenerf/models/pe.py:8-43).

Output layout matches the reference exactly: for input x in R^3,
  [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]
where each sin/cos term is a 3-vector (coords innermost) and f_k = pi * 2^k.
d_out = 3 + 2 * num_freqs * 3 = 39 for num_freqs=6.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def positional_encoding_dim(num_freqs: int = 6, d_in: int = 3, include_input: bool = True) -> int:
    return num_freqs * 2 * d_in + (d_in if include_input else 0)


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int = 6,
    freq_factor: float = math.pi,
    include_input: bool = True,
) -> jnp.ndarray:
    """Apply NeRF sin/cos encoding to [..., d_in] points -> [..., d_out].

    The reference interleaves (sin, cos) per frequency via phase offsets
    (ref pe.py:22-43); reproduced with an explicit phase tensor so the feature
    ordering is bit-identical: block j in [0, 2F) covers coords c in [0, d_in)
    at flat position j * d_in + c, with even j = sin, odd j = cos.
    """
    d_in = x.shape[-1]
    freqs = freq_factor * (2.0 ** np.arange(num_freqs, dtype=np.float32))
    freqs = np.repeat(freqs, 2)  # f0 f0 f1 f1 ...
    phases = np.zeros(2 * num_freqs, dtype=np.float32)
    phases[1::2] = math.pi * 0.5  # sin(t + pi/2) = cos(t)

    # [..., 2F, d_in]
    scaled = x[..., None, :] * jnp.asarray(freqs)[:, None] + jnp.asarray(phases)[:, None]
    embed = jnp.sin(scaled).reshape(*x.shape[:-1], 2 * num_freqs * d_in)
    if include_input:
        embed = jnp.concatenate([x, embed], axis=-1)
    return embed
