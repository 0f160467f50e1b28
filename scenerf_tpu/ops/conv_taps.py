"""3x3 (dilated) conv as ONE explicit im2col matmul -- the TPU-fast path for
the decoder's large-grid / low-channel stages.

Why not conv_general_dilated: at the spherical-decoder shapes (e.g. up1:
452x1500 x 80ch) XLA's TPU conv emitter spends most of its time on
space-to-depth layout churn -- dozens of full-grid copies between {3,1,2,0}
and {0,3,2,1} blockings (docs/PERF.md round 2); the round-3 trace attributes
~240 ms/step of the flagship to decoder convs at ~10% MXU efficiency. A
Pallas fused-conv kernel beat XLA per-op but lost in-program (layout
conversions at kernel boundaries) and up1+up2 variants OOM-killed the remote
compile service (docs/PERF.md round 3 post-mortem).

This formulation never leaves the native [H*W, C] channel-minor layout:

    rows9 = concat of the 9 dilated taps   -> [B, H, W, 9C]  (pad + concat)
    out   = rows9 @ kernel.reshape(9C, Co) -> one MXU dot, K = 9*Cin

K = 9C (720 for an 80-channel stage) clears the small-K MXU wall that the
3-tap (K=3C) variants hit, and XLA fuses the producer elementwise chain (BN
affine + leaky-relu) straight into the im2col build.

The custom VJP keeps memory at parity with nn.Conv: only (x, kernel) are
saved; rows9 (9x the activation) is rebuilt in the backward, dx is the same
taps-matmul with the spatially-flipped, channel-transposed kernel, and dW is
a [9C, B*H*W] x [B*H*W, Co] dot (large-K, MXU-optimal).

Semantics match nn.Conv(features, (3, 3), kernel_dilation=(d, d),
padding="SAME") bit-for-bit in f32 (tests/test_conv_taps.py), and the
parameter tree ("kernel" [3,3,Cin,Co] + "bias" [Co]) is nn.Conv's, so
checkpoints are interchangeable (ref convs: unet2d_sphere.py:9-56).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _im2col(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W, 9C]: the 9 dilated 3x3 taps, channel-minor,
    (ky, kx, C) ordering to match kernel.reshape(9C, Co)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, :, 0:W], xp[:, :, d:d + W], xp[:, :, 2 * d:2 * d + W]], axis=-1
    )  # [B, H+2d, W, 3C]
    return jnp.concatenate(
        [cols[:, 0:H], cols[:, d:d + H], cols[:, 2 * d:2 * d + H]], axis=-1
    )  # [B, H, W, 9C]


def _forward(x, kernel, d):
    B, H, W, C = x.shape
    Co = kernel.shape[-1]
    rows9 = _im2col(x, d).reshape(B * H * W, 9 * C)
    wk = kernel.astype(x.dtype).reshape(9 * C, Co)
    out = jax.lax.dot_general(
        rows9, wk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, H, W, Co).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_taps(x: jnp.ndarray, kernel: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """SAME-padded (dilated) 3x3 conv of [B, H, W, C] as one im2col matmul.

    kernel: [3, 3, Cin, Cout] (nn.Conv layout). Returns [B, H, W, Cout] in
    x.dtype (f32 accumulation on the MXU).
    """
    return _forward(x, kernel, dilation)


def _fwd(x, kernel, d):
    return _forward(x, kernel, d), (x, kernel)


def _bwd(d, res, g):
    x, kernel = res
    B, H, W, C = x.shape
    Co = kernel.shape[-1]
    gf = g.astype(x.dtype)

    # dx: SAME conv of g with the spatially-flipped, channel-transposed kernel
    k_t = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)  # [3,3,Co,Cin]
    dx = _forward(gf, k_t.astype(x.dtype), d).astype(x.dtype)

    # dW: rebuild rows9 (cheap pad+concat) and contract over B*H*W
    rows9 = _im2col(x, d).reshape(B * H * W, 9 * C)
    dw = jax.lax.dot_general(
        rows9, gf.reshape(B * H * W, Co), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [9C, Co]
    dw = dw.reshape(3, 3, C, Co).astype(kernel.dtype)
    return dx, dw


conv3x3_taps.defvjp(_fwd, _bwd)


def conv3x3_taps3(x: jnp.ndarray, kernel: jnp.ndarray,
                  dilation: int = 1) -> jnp.ndarray:
    """SAME-padded (dilated) 3x3 conv as THREE K=3C row dots.

    Stages only the column taps ([B, H+2d, W, 3C] -- 3x the activation, vs
    9x for the full im2col) and contracts each kernel row against a row
    SLICE of that one buffer. No custom VJP: the autodiff backward is dots +
    slice/pad adds, all layout-friendly; nn.remat above keeps memory
    bounded. This is the compile-light variant: the full-im2col program
    stalls the remote TPU compile service despite identical StableHLO size
    (docs/PERF.md round 3), implicating the 9-operand-concat->dot pattern in
    backend pass blowup.
    """
    B, H, W, C = x.shape
    d = dilation
    Co = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    cols3 = jnp.concatenate(
        [xp[:, :, 0:W], xp[:, :, d:d + W], xp[:, :, 2 * d:2 * d + W]], axis=-1
    )  # [B, H+2d, W, 3C]
    wk = kernel.astype(x.dtype).reshape(3, 3 * C, Co)
    out = None
    for ky in range(3):
        rows = cols3[:, ky * d:ky * d + H].reshape(B * H * W, 3 * C)
        t = jax.lax.dot_general(
            rows, wk[ky], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = t if out is None else out + t
    return out.reshape(B, H, W, Co).astype(x.dtype)


def conv3x3(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
            dilation: int = 1, variant: str = "taps") -> jnp.ndarray:
    """taps conv + bias add, matching nn.Conv's output dtype promotion."""
    if variant == "taps3":
        out = conv3x3_taps3(x, kernel, dilation)
    else:
        out = conv3x3_taps(x, kernel, dilation)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
