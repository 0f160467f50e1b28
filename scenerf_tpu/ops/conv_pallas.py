"""Fused (affine+leaky_relu) -> 3x3 dilated conv Pallas TPU kernels.

Why: the spherical decoder (ref scenerf/models/unet2d_sphere.py:9-56) runs
3x3 convs with BatchNorm/leaky-relu chains on huge low-channel grids
(452x1500x80, 226x750x160). XLA's conv handling at C<128 space-to-depth
blocks the grid and ping-pongs layouts, spending most of the step time on
full-grid copies and elementwise passes (device profile, docs/PERF.md).

This kernel computes

    h = conv3x3_dilated( leaky_relu(u * mul + add), W ) + b

in one pass: the per-channel affine (the folded BatchNorm of the *previous*
conv, see encoder/norm.py) and activation are applied on VMEM tiles as a
prologue, the nine taps are MXU dot_generals accumulated in f32, and the
only HBM traffic is one read of `u` and one write of `h`. The custom VJP
fuses the transposed conv, the prologue backward, and the weight/affine
gradient reductions into a single backward kernel (accumulating dW/db/dmul/
dadd across the sequential TPU grid).

BatchNorm statistics of `h` stay outside as plain XLA reductions, so
autodiff through the stats path (full training-BN backward) is untouched.

TPU mapping notes (each measured, see docs/PERF.md):
* full-width row strips: the last two block dims must be (8,128)-divisible
  or span the array, so blocks are [rows, W, C] with a dilation-sized row
  halo (`pl.Element` high padding over an XLA-prepadded top margin -- the
  toolchain rejects low Element padding).
* column taps are materialized once as a channel-concatenated [.., W, 3C]
  scratch (static slice+concat shifts; pltpu.roll has no bf16 path and
  sublane-dim dynamic slices need 8-aligned starts, which dilations 1..3
  aren't). This turns the nine K=C dots into three K=3C dots per strip --
  the decisive optimization: K=80 dots run the MXU at ~12 TF/s on v5e,
  K=240 at ~2x that, and shifts/masks/prologue are all noise (<5%).
* row taps are python-unrolled static ref slices (a fori_loop tap loop
  alone costs ~40% extra; a fully unrolled 9-tap loop with per-tap shift
  temporaries blows the Mosaic VMEM stack).
* halo rows outside the image are masked in-kernel (zero-padded SAME conv,
  torch Conv2d parity).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.01  # nn.leaky_relu / torch default

_VMEM_BUDGET = 12 * 1024 * 1024  # per-buffer-set budget (the Mosaic stack
                                 # holds several strip-sized temporaries, so
                                 # the real footprint is a small multiple)


def _pick_th(H, W, cin, cout, d, itemsize, bwd):
    """Rows per strip: biggest power-of-two strip whose working set fits.

    The channel-concatenated tap scratches (3*Cin / 3*Cout wide) plus a few
    strip-sized temporaries dominate the Mosaic VMEM stack.
    """
    mult = (5 * cin + 5 * cout) if bwd else (5 * cin + cout)
    for th in (32, 16, 8, 4):
        if (th + 2 * d) * W * mult * itemsize <= _VMEM_BUDGET or th == 4:
            return th
    return 4


def _shift_cols(x, s, W):
    """shifted[.., j, :] = x[.., j+s, :] (zeros where j+s is out of [0, W)).

    Static slice + concat: pltpu.roll has no bf16 path, but Mosaic handles
    unaligned static sublane slices.
    """
    if s == 0:
        return x
    z = jnp.zeros(x.shape[:1] + (abs(s),) + x.shape[2:], x.dtype)
    if s > 0:
        return jnp.concatenate([x[:, s:, :], z], axis=1)
    return jnp.concatenate([z, x[:, :s, :]], axis=1)


def _fwd_kernel(u_ref, mul_ref, add_ref, w_ref, b_ref, h_ref, t_ref,
                *, H, W, th, d, prologue):
    i = pl.program_id(0)
    blk = u_ref[:]  # [th+2d, W, Cin]
    gy = lax.broadcasted_iota(jnp.int32, blk.shape[:2] + (1,), 0) + i * th - d
    mask = (gy >= 0) & (gy < H)
    if prologue:
        t = blk * mul_ref[0][None, None, :] + add_ref[0][None, None, :]
        # sign test in f32: Mosaic has no bf16 comparison
        t = jnp.where(t.astype(jnp.float32) >= 0, t, NEG_SLOPE * t)
    else:
        t = blk
    t = jnp.where(mask, t, jnp.zeros_like(t))
    # stage the column taps channel-concatenated: the three column shifts
    # become one K=3*Cin contraction per row tap (small-K dots are the
    # bottleneck: K=C runs the MXU at a fraction of its K=3C rate)
    t_ref[:] = jnp.concatenate(
        [_shift_cols(t, -d, W), t, _shift_cols(t, d, W)], axis=-1)

    Cout = w_ref.shape[-1]
    acc = b_ref[0][None, None, :] * jnp.ones((th, 1, 1), jnp.float32)
    for ky in range(3):  # unrolled: fori_loop alone costs ~40% extra
        rows = t_ref[ky * d:ky * d + th, :, :]
        acc = acc + lax.dot_general(
            rows, w_ref[ky],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    h_ref[:] = acc.astype(h_ref.dtype)


def _bwd_kernel(dh_ref, u_ref, mul_ref, add_ref, wt_ref,
                du_ref, dw_ref, db_ref, dmul_ref, dadd_ref,
                t_ref, dp_ref,
                *, H, W, th, d, prologue):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dmul_ref[:] = jnp.zeros_like(dmul_ref)
        dadd_ref[:] = jnp.zeros_like(dadd_ref)

    ublk = u_ref[:]   # [th+2d, W, Cin]
    dblk = dh_ref[:]  # [th+2d, W, Cout]
    gy = lax.broadcasted_iota(jnp.int32, ublk.shape[:2] + (1,), 0) + i * th - d
    mask = (gy >= 0) & (gy < H)
    dp = jnp.where(mask, dblk, jnp.zeros_like(dblk))
    # channel-concatenated column taps (see _fwd_kernel): dcat block kx
    # holds dh shifted by -(kx-1)*d, matching wt_ref's [3*Cout, Cin] rows
    dp_ref[:] = jnp.concatenate(
        [_shift_cols(dp, d, W), dp, _shift_cols(dp, -d, W)], axis=-1)

    if prologue:
        pre = ublk * mul_ref[0][None, None, :] + add_ref[0][None, None, :]
        # sign test in f32: Mosaic has no bf16 comparison
        t = jnp.where(pre.astype(jnp.float32) >= 0, pre, NEG_SLOPE * pre)
    else:
        t = ublk
    t = jnp.where(mask, t, jnp.zeros_like(t))
    t_ref[:] = jnp.concatenate(
        [_shift_cols(t, -d, W), t, _shift_cols(t, d, W)], axis=-1)

    Cin = ublk.shape[-1]
    Cout = dblk.shape[-1]
    # interior mask from a fresh iota + ref reads: slicing a (*, W, 1) VALUE
    # trips a Mosaic compiler assert, so never slice the halo'd mask/values
    gy_int = lax.broadcasted_iota(jnp.int32, (th, W, 1), 0) + i * th
    m_int = gy_int < H
    dh_int = jnp.where(m_int, dh_ref[d:d + th, :, :], 0).astype(dblk.dtype)

    # input gradient: dt = conv_transpose(dh, W) at interior positions
    dt = jnp.zeros((th, W, Cin), jnp.float32)
    for ky in range(3):
        rows = dp_ref[(2 - ky) * d:(2 - ky) * d + th, :, :]
        dt = dt + lax.dot_general(
            rows, wt_ref[ky],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # the transposed conv produces nonzero cotangents in the zero-padding
    # ring (rows outside the image); padding has no gradient, so mask before
    # ANY use -- including the dmul/dadd reductions
    dt = jnp.where(m_int, dt, 0.0)
    if prologue:
        u_int_raw = u_ref[d:d + th, :, :]
        pre_int = (u_int_raw * mul_ref[0][None, None, :]
                   + add_ref[0][None, None, :])
        u_int = jnp.where(m_int, u_int_raw, 0.0).astype(jnp.float32)
        g = dt * jnp.where(pre_int.astype(jnp.float32) >= 0, 1.0, NEG_SLOPE)
        du = g * mul_ref[0][None, None, :].astype(jnp.float32)
        dmul_ref[:] += jnp.sum(g * u_int, axis=(0, 1))[None, :]
        dadd_ref[:] += jnp.sum(g, axis=(0, 1))[None, :]
    else:
        du = dt
    du_ref[:] = du.astype(du_ref.dtype)

    # weight gradient: dwcat[ky] += tcat_rows^T @ dh over this strip
    # (2-D reshape: Mosaic's matmul supports single contracting dims only)
    dh2 = dh_int.reshape(th * W, Cout)
    for ky in range(3):
        rows = t_ref[ky * d:ky * d + th, :, :]
        dw_ref[ky] += lax.dot_general(
            rows.reshape(th * W, 3 * Cin), dh2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dh_int, axis=(0, 1), dtype=jnp.float32)[None, :]


def _run_fwd(u, mul, add, w, b, d, prologue, interpret):
    H, W, Cin = u.shape
    Cout = w.shape[-1]
    th = _pick_th(H, W, Cin, Cout, d, u.dtype.itemsize, bwd=False)
    kern = functools.partial(_fwd_kernel, H=H, W=W, th=th, d=d,
                             prologue=prologue)
    # the TPU toolchain supports high Element padding only; shift the halo
    # window into an XLA-prepadded top margin instead of low padding
    u = jnp.pad(u, ((d, 0), (0, 0), (0, 0)))
    wcat = w.reshape(3, 3 * Cin, Cout)  # [ky, (kx, ci), co]
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(H, th),),
        in_specs=[
            pl.BlockSpec((pl.Element(th + 2 * d, (0, 2 * d)), pl.Element(W),
                          pl.Element(Cin)),
                         lambda i: (i * th, 0, 0)),
            pl.BlockSpec((1, Cin), lambda i: (0, 0)),
            pl.BlockSpec((1, Cin), lambda i: (0, 0)),
            pl.BlockSpec((3, 3 * Cin, Cout), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((th, W, Cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((H, W, Cout), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * d, W, 3 * Cin), u.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * H * W * Cin * Cout,
            bytes_accessed=u.size * u.dtype.itemsize + H * W * Cout * 2,
            transcendentals=0),
    )(u, mul[None, :], add[None, :], wcat, b[None, :])


def _run_bwd(dh, u, mul, add, w, d, prologue, interpret):
    H, W, Cin = u.shape
    Cout = w.shape[-1]
    th = _pick_th(H, W, Cin, Cout, d, u.dtype.itemsize, bwd=True)
    kern = functools.partial(_bwd_kernel, H=H, W=W, th=th, d=d,
                             prologue=prologue)
    # high Element padding only (see _run_fwd): prepad the top margin
    dh = jnp.pad(dh, ((d, 0), (0, 0), (0, 0)))
    u = jnp.pad(u, ((d, 0), (0, 0), (0, 0)))
    # wt[ky] = [w[ky,0]^T; w[ky,1]^T; w[ky,2]^T] matches dcat's kx blocks
    wt = jnp.transpose(w, (0, 1, 3, 2)).reshape(3, 3 * Cout, Cin)
    halo = pl.Element(th + 2 * d, (0, 2 * d))
    du, dwcat, db, dmul, dadd = pl.pallas_call(
        kern,
        grid=(pl.cdiv(H, th),),
        in_specs=[
            pl.BlockSpec((halo, pl.Element(W), pl.Element(Cout)),
                         lambda i: (i * th, 0, 0)),
            pl.BlockSpec((halo, pl.Element(W), pl.Element(Cin)),
                         lambda i: (i * th, 0, 0)),
            pl.BlockSpec((1, Cin), lambda i: (0, 0)),
            pl.BlockSpec((1, Cin), lambda i: (0, 0)),
            pl.BlockSpec((3, 3 * Cout, Cin), lambda i: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((th, W, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((3, 3 * Cin, Cout), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cin), lambda i: (0, 0)),
            pl.BlockSpec((1, Cin), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, W, Cin), u.dtype),
            jax.ShapeDtypeStruct((3, 3 * Cin, Cout), jnp.float32),
            jax.ShapeDtypeStruct((1, Cout), jnp.float32),
            jax.ShapeDtypeStruct((1, Cin), jnp.float32),
            jax.ShapeDtypeStruct((1, Cin), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * d, W, 3 * Cin), u.dtype),
            pltpu.VMEM((th + 2 * d, W, 3 * Cout), dh.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * 9 * H * W * Cin * Cout,
            bytes_accessed=2 * u.size * u.dtype.itemsize
            + 2 * H * W * Cout * 2,
            transcendentals=0),
    )(dh, u, mul[None, :], add[None, :], wt)
    return du, dwcat.reshape(3, 3, Cin, Cout), db[0], dmul[0], dadd[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_conv(u, mul, add, w, b, d, prologue, interpret):
    return _run_fwd(u, mul, add, w, b, d, prologue, interpret)


def _fused_conv_fwd(u, mul, add, w, b, d, prologue, interpret):
    return _run_fwd(u, mul, add, w, b, d, prologue, interpret), (u, mul, add, w)


def _fused_conv_bwd(d, prologue, interpret, res, dh):
    u, mul, add, w = res
    du, dw, db, dmul, dadd = _run_bwd(dh, u, mul, add, w, d, prologue,
                                      interpret)
    return (du, dmul.astype(mul.dtype), dadd.astype(add.dtype),
            dw.astype(w.dtype), db)


_fused_conv.defvjp(_fused_conv_fwd, _fused_conv_bwd)


def xla_reference(u, w, b, mul=None, add=None, *, dilation=1):
    """Same math via lax.conv_general_dilated -- used for module init on the
    host CPU (Pallas compiled mode is TPU-only) and as the test oracle."""
    t = u
    if mul is not None:
        t = u * mul.astype(u.dtype) + add.astype(u.dtype)
        t = jnp.where(t >= 0, t, NEG_SLOPE * t)
    h = lax.conv_general_dilated(
        t[None], w.astype(t.dtype), (1, 1), "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return h + b.astype(t.dtype)


def fused_affine_conv3x3(u: jnp.ndarray,
                         w: jnp.ndarray,
                         b: jnp.ndarray,
                         mul: jnp.ndarray | None = None,
                         add: jnp.ndarray | None = None,
                         *,
                         dilation: int = 1,
                         interpret: bool = False) -> jnp.ndarray:
    """h = conv3x3_dil(leaky_relu(u*mul+add), w) + b  on one [H, W, Cin] grid.

    When mul/add are None the prologue is skipped (h = conv(u) + b).
    w: [3, 3, Cin, Cout] (flax nn.Conv kernel layout), b: [Cout].
    """
    prologue = mul is not None
    if not prologue:
        mul = jnp.ones((u.shape[-1],), jnp.float32)
        add = jnp.zeros((u.shape[-1],), jnp.float32)
    return _fused_conv(u, mul.astype(u.dtype), add.astype(u.dtype),
                       w.astype(u.dtype), b.astype(jnp.float32),
                       dilation, prologue, interpret)
