"""Bilinear feature sampling with a windowed-gather / windowed-scatter VJP.

The point-featurization hot path (rendering.featurize_points, ref
scenerf.py:505-547) bilinearly samples 5 pyramid levels at ~77k points per
source. Autodiff of the 4-corner-tap formulation (geometry.bilinear_sample)
emits 4N single-row gathers forward and a 4N-row conflict-combining
scatter-add backward -- together ~45 ms of the flagship step (docs/PERF.md
round 3 trace).

This formulation exploits the corner structure: the (x0, x0+1) tap pair is
CONTIGUOUS in the flat [H*W, C] row index, so the forward runs 2 gathers of
[N, 2, C] windows (half the descriptor count) and the backward runs 2
windowed scatter-adds. Out-of-bounds corners are handled by zeroing the
corner WEIGHT (not the gathered value), so a window that straddles a row
boundary contributes exactly 0 where the 4-tap path masks.

Gradients flow to both the feature map and the sample coordinates (the
PrSamp/gaussian sample positions are network outputs); the backward
re-gathers the corner values instead of saving them, keeping residual
memory at (img, ix, iy) parity with the autodiff path.

Semantics match geometry.bilinear_sample bit-for-bit in f32
(tests/test_gather_scatter.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _corner_data(img, ix, iy):
    """Corner base rows, per-corner weights (OOB-masked), interp residuals."""
    H, W, _ = img.shape
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0).astype(img.dtype)
    wy = (iy - y0).astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def inb(xi, yi):
        return ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).astype(img.dtype)

    # weights with the OOB mask folded in (masked weight == masked value
    # because the contribution is weight * value either way)
    w00 = (1 - wx) * (1 - wy) * inb(x0i, y0i)
    w10 = wx * (1 - wy) * inb(x0i + 1, y0i)
    w01 = (1 - wx) * wy * inb(x0i, y0i + 1)
    w11 = wx * wy * inb(x0i + 1, y0i + 1)

    # clamp the window base so reads/writes stay in [0, H*W): fully-OOB
    # windows land on row 0 with zero weight
    xc = jnp.clip(x0i, 0, W - 2)
    r0 = jnp.clip(y0i, 0, H - 1) * W + xc
    r1 = jnp.clip(y0i + 1, 0, H - 1) * W + xc
    # when x0 is clamped the live corner shifts window slots: x0 == -1 ->
    # the live right corner (x == 0) is slot 0; x0 == W-1 -> the live left
    # corner is slot 1. Anything further out of bounds has both corners
    # masked to zero weight, so the slot assignment is irrelevant.
    off = x0i - xc  # 0 in-bounds; -1 / +1 (or beyond) when clamped

    def slot_weights(wl, wr):
        # map (left-corner weight, right-corner weight) onto window slots
        s0 = jnp.where(off == 0, wl, jnp.where(off == -1, wr, 0.0))
        s1 = jnp.where(off == 0, wr, jnp.where(off == 1, wl, 0.0))
        return s0, s1

    t00, t10 = slot_weights(w00, w10)  # top row (y0)
    t01, t11 = slot_weights(w01, w11)  # bottom row (y0+1)
    return r0, r1, (t00, t10, t01, t11), (wx, wy, x0i, y0i)


_GNUMS = lax.GatherDimensionNumbers(
    offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
_SNUMS = lax.ScatterDimensionNumbers(
    update_window_dims=(1, 2), inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0,))


def _gather_windows(flat, r0, r1):
    C = flat.shape[-1]
    g0 = lax.gather(flat, r0[:, None], _GNUMS, slice_sizes=(2, C),
                    mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    g1 = lax.gather(flat, r1[:, None], _GNUMS, slice_sizes=(2, C),
                    mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return g0, g1  # [N, 2, C] each


def _unslot(g0, g1, off):
    """Window slots -> (v00, v10, v01, v11) corner values (dead corners 0)."""
    def pick(s0, s1):
        vl = jnp.where((off == 0)[:, None], s0,
                       jnp.where((off == 1)[:, None], s1, 0.0))
        vr = jnp.where((off == 0)[:, None], s1,
                       jnp.where((off == -1)[:, None], s0, 0.0))
        return vl, vr

    v00, v10 = pick(g0[:, 0], g0[:, 1])
    v01, v11 = pick(g1[:, 0], g1[:, 1])
    return v00, v10, v01, v11


def _forward(img, ix, iy):
    """Bit-identical to geometry.bilinear_sample: same masked-value taps and
    the same (top, bot) association order -- only the gather shape differs
    (masking and where-selection multiply by exact 0/1)."""
    H, W, C = img.shape
    r0, r1, _, (wx, wy, x0i, y0i) = _corner_data(img, ix, iy)
    flat = img.reshape(H * W, C)
    g0, g1 = _gather_windows(flat, r0, r1)
    v00, v10, v01, v11 = _unslot(g0, g1, x0i - jnp.clip(x0i, 0, W - 2))

    def inb(xi, yi):
        return ((xi >= 0) & (xi < W) & (yi >= 0)
                & (yi < H)).astype(img.dtype)[:, None]

    v00 = v00 * inb(x0i, y0i)
    v10 = v10 * inb(x0i + 1, y0i)
    v01 = v01 * inb(x0i, y0i + 1)
    v11 = v11 * inb(x0i + 1, y0i + 1)
    wxc = wx[:, None]
    wyc = wy[:, None]
    top = v00 * (1 - wxc) + v10 * wxc
    bot = v01 * (1 - wxc) + v11 * wxc
    return top * (1 - wyc) + bot * wyc


@jax.custom_vjp
def bilinear_sample_w2(img: jnp.ndarray, ix: jnp.ndarray,
                       iy: jnp.ndarray) -> jnp.ndarray:
    """geometry.bilinear_sample with windowed gathers + a windowed-scatter
    VJP. img [H, W, C], ix/iy [N] -> [N, C]."""
    return _forward(img, ix, iy)


def _fwd(img, ix, iy):
    return _forward(img, ix, iy), (img, ix, iy)


def _bwd(res, g):
    img, ix, iy = res
    H, W, C = img.shape
    r0, r1, (t00, t10, t01, t11), (wx, wy, x0i, y0i) = _corner_data(img, ix, iy)
    flat = img.reshape(H * W, C)
    gf = g.astype(img.dtype)

    # --- d img: two windowed scatter-adds of weight-scaled cotangents ------
    up0 = jnp.stack([gf * t00[:, None], gf * t10[:, None]], axis=1)
    up1 = jnp.stack([gf * t01[:, None], gf * t11[:, None]], axis=1)
    z = jnp.zeros_like(flat)
    z = lax.scatter_add(z, r0[:, None], up0, _SNUMS,
                        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    z = lax.scatter_add(z, r1[:, None], up1, _SNUMS,
                        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    d_img = z.reshape(H, W, C)

    # --- d coords: re-gather corner values ---------------------------------
    g0, g1 = _gather_windows(flat, r0, r1)
    v00, v10, v01, v11 = _unslot(g0, g1, x0i - jnp.clip(x0i, 0, W - 2))

    def inb(xi, yi):
        return ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).astype(img.dtype)

    m00 = inb(x0i, y0i)[:, None]
    m10 = inb(x0i + 1, y0i)[:, None]
    m01 = inb(x0i, y0i + 1)[:, None]
    m11 = inb(x0i + 1, y0i + 1)[:, None]
    wxc = wx[:, None]
    wyc = wy[:, None]
    # out = sum_c w_c(ix, iy) * m_c * v_c; d w/d ix with masks on each term
    d_ix = jnp.sum(gf * ((1 - wyc) * (m10 * v10 - m00 * v00)
                         + wyc * (m11 * v11 - m01 * v01)), axis=-1)
    d_iy = jnp.sum(gf * ((1 - wxc) * (m01 * v01 - m00 * v00)
                         + wxc * (m11 * v11 - m10 * v10)), axis=-1)
    return d_img, d_ix.astype(ix.dtype), d_iy.astype(iy.dtype)


bilinear_sample_w2.defvjp(_fwd, _bwd)
