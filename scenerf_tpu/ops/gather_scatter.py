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


# --------------------------------------------------------------------------- #
# "mm": taps forward + one-hot-matmul backward for small feature maps
# --------------------------------------------------------------------------- #
#
# The round-5 flagship device trace showed the d_img scatter-add backward of
# the pyramid featurize dominating the step: 4 x ~13.5 ms per step JUST for
# the bottleneck level ([2632, 1280] target, 76.8k samples) -- TPU scatters
# serialize, running at ~15 GB/s effective vs the 819 GB/s HBM. For a SMALL
# row space the scatter is algebraically a matmul:
#
#   d_flat[r, c] = sum_n W[r, n] * g[n, c],
#   W[r, n] = sum_tap w_tap[n] * [rows_tap[n] == r]
#
# which the MXU executes densely: 2*HW*N*C flops (~0.52 TF per source for the
# bottleneck level -- ~2.6 ms at v5e peak) plus the W-tile traffic. W is
# built blockwise inside a lax.scan so it never materializes beyond
# [HW, N_BLK]. The crossover is row count: W traffic scales with HW*N, so
# for the larger pyramid levels (HW >= 10k) the matmul loses to the scatter
# and this impl falls back to the same scatter-add the autodiff taps path
# emits. f32 accumulation over the scan is *more* precise than the bf16
# scatter chain it replaces.

MM_BWD_MAX_ROWS = 4096   # covers the bottleneck level; larger levels scatter
_MM_N_BLK = 4096


def _taps_data(img, ix, iy):
    """Clipped flat rows + OOB-masked weights of the 4 corner taps, plus the
    raw interp residuals (same tap semantics as geometry.bilinear_sample)."""
    H, W, _ = img.shape
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    taps = []
    for dx_, dy_, w in ((0, 0, (1 - wx) * (1 - wy)), (1, 0, wx * (1 - wy)),
                        (0, 1, (1 - wx) * wy), (1, 1, wx * wy)):
        xi = x0i + dx_
        yi = y0i + dy_
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        rows = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        taps.append((rows, (w * inb).astype(img.dtype), inb))
    return taps, (wx, wy)


@jax.custom_vjp
def bilinear_sample_mm(img: jnp.ndarray, ix: jnp.ndarray,
                       iy: jnp.ndarray) -> jnp.ndarray:
    """geometry.bilinear_sample (bit-identical forward) with a one-hot-matmul
    d_img backward for small maps (see the "mm" note above)."""
    from scenerf_tpu.geometry import bilinear_sample

    return bilinear_sample(img, ix, iy)


def _mm_fwd(img, ix, iy):
    return bilinear_sample_mm(img, ix, iy), (img, ix, iy)


def _mm_bwd(res, g):
    img, ix, iy = res
    H, W, C = img.shape
    HW = H * W
    taps, (wx, wy) = _taps_data(img, ix, iy)
    gf = g.astype(img.dtype)
    N = gf.shape[0]

    if HW <= MM_BWD_MAX_ROWS:
        nb = min(_MM_N_BLK, N)
        pad = (-N) % nb
        rows = jnp.stack([r for r, _, _ in taps])          # [4, N]
        wts = jnp.stack([w for _, w, _ in taps])           # [4, N]
        gp = gf
        if pad:
            rows = jnp.pad(rows, ((0, 0), (0, pad)), constant_values=-1)
            wts = jnp.pad(wts, ((0, 0), (0, pad)))
            gp = jnp.pad(gf, ((0, pad), (0, 0)))
        nblk = rows.shape[1] // nb
        rows = rows.reshape(4, nblk, nb).transpose(1, 0, 2)
        wts = wts.reshape(4, nblk, nb).transpose(1, 0, 2)
        gp = gp.reshape(nblk, nb, C)
        hw_iota = jnp.arange(HW, dtype=jnp.int32)[:, None]  # [HW, 1]

        def body(acc, xs):
            r, w, gb = xs  # [4, nb], [4, nb], [nb, C]
            wt = jnp.zeros((HW, nb), img.dtype)
            for t in range(4):
                wt = wt + jnp.where(hw_iota == r[t][None, :],
                                    w[t][None, :], 0)
            return acc + jnp.dot(wt, gb,
                                 preferred_element_type=jnp.float32), None

        acc0 = jnp.zeros((HW, C), jnp.float32)
        d_flat, _ = jax.lax.scan(body, acc0, (rows, wts, gp))
        d_img = d_flat.astype(img.dtype).reshape(H, W, C)
    else:
        # large maps: same scatter-add the autodiff taps backward emits
        # (rows are clipped in-bounds with weight 0, so a plain add is exact)
        d_flat = jnp.zeros((HW, C), img.dtype)
        for r, w, _ in taps:
            d_flat = d_flat.at[r].add(gf * w[:, None],
                                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        d_img = d_flat.reshape(H, W, C)

    # d coords: re-gather the masked corner values (cheap; scatters are the
    # expensive leg, gathers are not)
    flat = img.reshape(HW, C)
    vals = [jnp.take(flat, r, axis=0) * m[:, None].astype(img.dtype)
            for r, _, m in taps]
    v00, v10, v01, v11 = vals
    wxc = wx[:, None].astype(img.dtype)
    wyc = wy[:, None].astype(img.dtype)
    d_ix = jnp.sum(gf * ((1 - wyc) * (v10 - v00) + wyc * (v11 - v01)), axis=-1)
    d_iy = jnp.sum(gf * ((1 - wxc) * (v01 - v00) + wxc * (v11 - v10)), axis=-1)
    return d_img, d_ix.astype(ix.dtype), d_iy.astype(iy.dtype)


bilinear_sample_mm.defvjp(_mm_fwd, _mm_bwd)


# --------------------------------------------------------------------------- #
# "mmseg": mm + sorted-segment-sum backward for the LARGE pyramid levels
# --------------------------------------------------------------------------- #
#
# The large-map scatter-adds the mm impl leaves behind still cost ~122 ms of
# the 4-source step (round-5 trace). A scatter-add is a segment sum once the
# tap entries are sorted by target row:
#
#   perm   = argsort(rows_all)                       # [4N]
#   vals   = w[perm] * g[perm mod N]                 # [4N, C] gather+mul
#   cum    = concat(0, cumsum(f32(vals)))            # [4N+1, C]
#   d_flat = cum[searchsorted(rows_sorted, r + 1)]   # ends
#          - cum[searchsorted(rows_sorted, r)]       # starts,  r = 0..HW-1
#
# -- every op is a fast vectorized TPU primitive (sort, gather, cumsum,
# binary search) instead of a serialized scatter. Accumulation is f32
# (MORE precise than the bf16 scatter chain); the cumsum-difference loses
# ~|cum|/|segment| * eps_f32 ~ 3e-6 relative, far below bf16 grad noise.

_SEG_CUM_BYTES = 256 * 1024 * 1024  # cap the f32 cumsum transient


def _seg_d_flat(rows, wts, gf, HW):
    """Sorted-segment-sum d_flat [HW, C]: rows/wts [4, N], gf [N, C].

    The f32 cumsum over [4N, C] is the peak transient (786 MB at C=640,
    N=76.8k); channels are processed in chunks that keep it under
    _SEG_CUM_BYTES, with the sort/searchsorted hoisted out (C-independent)."""
    N, C = gf.shape
    keys = rows.reshape(-1)                       # [4N]
    perm = jnp.argsort(keys)
    keys_s = jnp.take(keys, perm)
    w_s = jnp.take(wts.reshape(-1), perm)
    gvals = jnp.take(gf, perm % N, axis=0) * w_s[:, None]   # [4N, C]
    r = jnp.arange(HW, dtype=keys_s.dtype)
    starts = jnp.searchsorted(keys_s, r)
    ends = jnp.searchsorted(keys_s, r + 1)

    c_chunk = max(1, min(C, _SEG_CUM_BYTES // (4 * (4 * N + 1))))
    while C % c_chunk:
        c_chunk -= 1

    def seg_chunk(gv):  # [4N, c_chunk] -> [HW, c_chunk]
        cum = jnp.cumsum(gv.astype(jnp.float32), axis=0)
        cum = jnp.concatenate(
            [jnp.zeros((1,) + cum.shape[1:], cum.dtype), cum])
        return jnp.take(cum, ends, axis=0) - jnp.take(cum, starts, axis=0)

    if c_chunk == C:
        out = seg_chunk(gvals)
    else:
        chunks = jnp.moveaxis(
            gvals.reshape(4 * N, C // c_chunk, c_chunk), 1, 0)
        # [n_chunks, HW, c_chunk] -> [HW, n_chunks * c_chunk] == [HW, C]
        out = jnp.moveaxis(jax.lax.map(seg_chunk, chunks), 0, 1).reshape(HW, C)
    return out.astype(gf.dtype)


@jax.custom_vjp
def bilinear_sample_mmseg(img: jnp.ndarray, ix: jnp.ndarray,
                          iy: jnp.ndarray) -> jnp.ndarray:
    """bilinear_sample_mm with the large-level scatter fallback replaced by
    the sorted-segment-sum backward (see the "mmseg" note above)."""
    from scenerf_tpu.geometry import bilinear_sample

    return bilinear_sample(img, ix, iy)


def _mmseg_fwd(img, ix, iy):
    return bilinear_sample_mmseg(img, ix, iy), (img, ix, iy)


def _mmseg_bwd(res, g):
    img, ix, iy = res
    H, W, C = img.shape
    HW = H * W
    if HW <= MM_BWD_MAX_ROWS:
        return _mm_bwd(res, g)
    taps, (wx, wy) = _taps_data(img, ix, iy)
    gf = g.astype(img.dtype)
    rows = jnp.stack([r for r, _, _ in taps])
    wts = jnp.stack([w for _, w, _ in taps])
    d_img = _seg_d_flat(rows, wts, gf, HW).reshape(H, W, C)

    flat = img.reshape(HW, C)
    vals = [jnp.take(flat, r, axis=0) * m[:, None].astype(img.dtype)
            for r, _, m in taps]
    v00, v10, v01, v11 = vals
    wxc = wx[:, None].astype(img.dtype)
    wyc = wy[:, None].astype(img.dtype)
    d_ix = jnp.sum(gf * ((1 - wyc) * (v10 - v00) + wyc * (v11 - v01)), axis=-1)
    d_iy = jnp.sum(gf * ((1 - wxc) * (v01 - v00) + wxc * (v11 - v10)), axis=-1)
    return d_img, d_ix.astype(ix.dtype), d_iy.astype(iy.dtype)


bilinear_sample_mmseg.defvjp(_mmseg_fwd, _mmseg_bwd)
