"""Positional-encoding parity vs an independent torch oracle replicating the
reference layout (ref scenerf/models/pe.py:32-43)."""
import math

import jax.numpy as jnp
import numpy as np
import torch

from scenerf_tpu.encoding import positional_encoding, positional_encoding_dim


def torch_pe_oracle(x: torch.Tensor, num_freqs=6, include_input=True):
    freqs = math.pi * 2.0 ** torch.arange(0, num_freqs).float()
    _freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
    _phases = torch.zeros(2 * num_freqs)
    _phases[1::2] = math.pi * 0.5
    _phases = _phases.view(1, -1, 1)
    embed = x.unsqueeze(1).repeat(1, num_freqs * 2, 1)
    embed = torch.sin(torch.addcmul(_phases, embed, _freqs))
    embed = embed.view(x.shape[0], -1)
    if include_input:
        embed = torch.cat((x, embed), dim=-1)
    return embed


def test_pe_dim():
    assert positional_encoding_dim(6, 3, True) == 39
    assert positional_encoding_dim(6, 3, False) == 36


def test_pe_matches_oracle(rng):
    x = rng.normal(size=(40, 3)).astype(np.float32) * 20
    ours = np.asarray(positional_encoding(jnp.asarray(x), num_freqs=6))
    want = torch_pe_oracle(torch.from_numpy(x)).numpy()
    assert ours.shape == (40, 39)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)


def test_pe_batched_shape(rng):
    x = rng.normal(size=(4, 7, 3)).astype(np.float32)
    out = positional_encoding(jnp.asarray(x))
    assert out.shape == (4, 7, 39)
