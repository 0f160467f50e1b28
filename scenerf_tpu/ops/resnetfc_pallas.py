"""Pallas TPU kernel: fused conditioned-ResnetFC evaluation.

The radiance-field MLP (fields.ResnetFC) is the per-point hot op of every
render: 11 dense layers over ~100k points per render call. XLA evaluates it as
separate HLO dots with activations round-tripping through HBM between layers;
this kernel keeps every weight matrix AND all intermediate activations resident
in VMEM and streams only the per-point inputs (latent z tile + positional tile)
through the grid, so HBM traffic is exactly inputs + outputs.

Used on the no-grad evaluation path (eval/reconstruction renders); training
keeps the XLA path (which needs the autodiff graph). Numerics match
fields.ResnetFC bit-for-bit in f32 (tested), modulo MXU accumulation order.

VMEM budget (d_latent 2480, d_hidden 512, bf16 weights, TILE_N 256):
  weights ~7.6 MB (lin_z x3) + 3.1 MB (blocks) + I/O tiles ~1.5 MB -> fits the
  ~16 MB/core VMEM with double-buffered input tiles.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_blocks: int,
            z_ref, x_ref,          # [T, d_latent], [T, d_in]
            w_in_ref, b_in_ref,    # [d_in, H], [1, H]
            wz_ref, bz_ref,        # [n_blocks, d_latent, H], [n_blocks, 1, H]
            w0_ref, b0_ref,        # [n_blocks, H, H], [n_blocks, 1, H]
            w1_ref, b1_ref,        # [n_blocks, H, H], [n_blocks, 1, H]
            w_out_ref, b_out_ref,  # [H, d_out_padded], [1, d_out_padded]
            out_ref):              # [T, d_out_padded]
    f32 = jnp.float32
    x = x_ref[:]
    z = z_ref[:]
    h = jnp.dot(x, w_in_ref[:], preferred_element_type=f32) + b_in_ref[:]
    for i in range(n_blocks):
        tz = jnp.dot(z, wz_ref[i], preferred_element_type=f32) + bz_ref[i]
        h = h + tz
        a = jnp.maximum(h, 0.0)
        mid = jnp.dot(a, w0_ref[i], preferred_element_type=f32) + b0_ref[i]
        mid = jnp.maximum(mid, 0.0)
        dx = jnp.dot(mid, w1_ref[i], preferred_element_type=f32) + b1_ref[i]
        h = h + dx
    a = jnp.maximum(h, 0.0)
    out_ref[:] = jnp.dot(a, w_out_ref[:], preferred_element_type=f32) + b_out_ref[:]


def pack_resnetfc_params(params: Dict, n_blocks: int, dtype=jnp.float32):
    """flax fields.ResnetFC params -> flat stacked arrays for the kernel."""
    p = params["params"] if "params" in params else params
    w_in = p["lin_in"]["kernel"].astype(dtype)
    b_in = p["lin_in"]["bias"].reshape(1, -1).astype(jnp.float32)
    wz = jnp.stack([p[f"lin_z_{i}"]["kernel"] for i in range(n_blocks)]).astype(dtype)
    bz = jnp.stack([p[f"lin_z_{i}"]["bias"].reshape(1, -1)
                    for i in range(n_blocks)]).astype(jnp.float32)
    w0 = jnp.stack([p[f"block_{i}"]["fc_0"]["kernel"]
                    for i in range(n_blocks)]).astype(dtype)
    b0 = jnp.stack([p[f"block_{i}"]["fc_0"]["bias"].reshape(1, -1)
                    for i in range(n_blocks)]).astype(jnp.float32)
    w1 = jnp.stack([p[f"block_{i}"]["fc_1"]["kernel"]
                    for i in range(n_blocks)]).astype(dtype)
    b1 = jnp.stack([p[f"block_{i}"]["fc_1"]["bias"].reshape(1, -1)
                    for i in range(n_blocks)]).astype(jnp.float32)
    w_out = p["lin_out"]["kernel"].astype(dtype)
    b_out = p["lin_out"]["bias"].reshape(1, -1).astype(jnp.float32)
    return (w_in, b_in, wz, bz, w0, b0, w1, b1, w_out, b_out)


@functools.partial(jax.jit, static_argnames=("n_blocks", "tile_n", "interpret"))
def resnetfc_pallas(z: jnp.ndarray, x: jnp.ndarray, packed: Tuple,
                    n_blocks: int = 3, tile_n: int = 256,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused forward of the conditioned ResnetFC. z [N, d_latent], x [N, d_in];
    N must be a multiple of tile_n (pad with zeros if needed). Returns
    [N, d_out] float32."""
    (w_in, b_in, wz, bz, w0, b0, w1, b1, w_out, b_out) = packed
    N = z.shape[0]
    assert N % tile_n == 0, f"N={N} not a multiple of tile_n={tile_n}"
    d_out = w_out.shape[1]
    # pad the output dim to the 128-lane tile
    d_out_p = max(128, ((d_out + 127) // 128) * 128)
    if d_out_p != d_out:
        w_out = jnp.pad(w_out, ((0, 0), (0, d_out_p - d_out)))
        b_out = jnp.pad(b_out, ((0, 0), (0, d_out_p - d_out)))

    grid = (N // tile_n,)
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.ANY if False else pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, z.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, x.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const(*w_in.shape), const(*b_in.shape),
            const(*wz.shape), const(*bz.shape),
            const(*w0.shape), const(*b0.shape),
            const(*w1.shape), const(*b1.shape),
            const(*w_out.shape), const(*b_out.shape),
        ],
        out_specs=pl.BlockSpec((tile_n, d_out_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, d_out_p), jnp.float32),
        interpret=interpret,
    )(z, x, w_in, b_in, wz, bz, w0, b0, w1, b1, w_out, b_out)
    return out[:, :d_out]


def make_pallas_field_fns(variables: Dict, cfg, dtype=jnp.bfloat16,
                          tile_n: int = 256, interpret: bool = False):
    """(field_fn, gauss_fn) backed by the fused kernel, padding N as needed.
    Drop-in for model.field_fns on no-grad render paths."""
    packed_f = pack_resnetfc_params(variables["mlp"], cfg.n_blocks, dtype)
    packed_g = pack_resnetfc_params(variables["mlp_gaussian"], cfg.n_blocks, dtype)

    def run(packed, z, x):
        N = z.shape[0]
        pad = (-N) % tile_n
        if pad:
            z = jnp.concatenate([z, jnp.zeros((pad, z.shape[1]), z.dtype)])
            x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
        out = resnetfc_pallas(z.astype(dtype), x.astype(dtype), packed,
                              n_blocks=cfg.n_blocks, tile_n=tile_n,
                              interpret=interpret)
        return out[:N]

    return (lambda z, x: run(packed_f, z, x),
            lambda z, x: run(packed_g, z, x))
