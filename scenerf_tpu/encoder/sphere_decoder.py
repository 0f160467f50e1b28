"""Spherical-grid U-Net decoder.

The reference decoder (ref scenerf/models/unet2d_sphere.py:59-206) resamples
every encoder skip level onto an equirectangular 'spherical' grid before
upsampling, so the radiance field can be conditioned by angle rather than by
pixel. The resampling works by building an inverse map sphere_cell -> source
pixel via scatter (last write wins, sentinel -10 marks out-of-FOV cells, which
then bilinear-sample zeros) and grid-sampling the feature map at the mapped
coords (ref :138-165).

TPU design notes:
* the scatter map depends only on the camera intrinsics and is built once per
  forward inside jit (a single jnp scatter; write order on duplicate cells is
  backend-defined, matching the reference's own unspecified scatter order)
* bilinear upsampling (align_corners=True, ref :49-54) is implemented as two
  small dense interpolation matmuls (separable), which XLA maps straight onto
  the MXU instead of a gather
* convs/BN run batched NHWC on the spherical grid; BatchNorm syncs across the
  data mesh axis via `axis_name` (the reference trains with sync BN,
  ref train_kitti.py:130)
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu.config import SphereConfig
from scenerf_tpu.encoder.norm import FusedBatchNorm
from scenerf_tpu.ops import conv_taps
from scenerf_tpu import geometry as geo

Levels = Dict[str, jnp.ndarray]

SCALES = (1, 2, 4, 8, 16, 32)


def level_hw(sphere: SphereConfig, scale: int) -> Tuple[int, int]:
    return int(round(sphere.height / scale)), int(round(sphere.width / scale))


def build_sphere_maps(
    pix: jnp.ndarray,         # [N, 2] full-res image pixel coords
    pix_sphere: jnp.ndarray,  # [N, 2] rounded full-res sphere coords
    sphere: SphereConfig,
) -> Dict[int, jnp.ndarray]:
    """Inverse maps sphere_cell -> source pixel coords at every pyramid scale.

    Returns {scale: [out_H, out_W, 2]} with sentinel -10 for unmapped cells
    (ref unet2d_sphere.py:138-148). Stored H-major so the gathered feature maps
    come out directly in NHWC layout -- the reference's W-major intermediate
    requires a full-tensor transpose per scale, which showed up as one of the
    largest copy costs in the device profile.
    """
    maps = {}
    for scale in SCALES:
        out_H, out_W = level_hw(sphere, scale)
        sx = jnp.clip(jnp.round(pix_sphere[:, 0] / scale).astype(jnp.int32), 0, out_W - 1)
        sy = jnp.clip(jnp.round(pix_sphere[:, 1] / scale).astype(jnp.int32), 0, out_H - 1)
        pix_scale = jnp.floor(pix / scale)  # ref uses float floor-division
        base = jnp.full((out_H * out_W, 2), -10.0, dtype=pix.dtype)
        maps[scale] = base.at[sy * out_W + sx].set(pix_scale).reshape(out_H, out_W, 2)
    return maps


def sphere_scatter_gather(feat: jnp.ndarray, sphere_map: jnp.ndarray,
                          impl: str = "taps") -> jnp.ndarray:
    """Resample an image-space feature map [h, w, C] onto the spherical grid.

    sphere_map: [out_H, out_W, 2] image pixel coords (sentinel -10 lands far
    outside [-1, 1] after normalization and samples zeros, exactly like the
    reference). Returns [out_H, out_W, C] with no transpose.
    """
    h, w, _ = feat.shape
    out_H, out_W, _ = sphere_map.shape
    flat = sphere_map.reshape(-1, 2)
    grid = jnp.stack([flat[:, 0] / w, flat[:, 1] / h], axis=-1) * 2.0 - 1.0
    vals = geo.grid_sample_norm(feat, grid, impl=impl)  # [out_H*out_W, C]
    return vals.reshape(out_H, out_W, -1)


def _interp_matrix_align_corners(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n_out, n_in] bilinear interpolation matrix with align_corners=True."""
    if n_out == 1 or n_in == 1:
        return jnp.ones((n_out, n_in), dtype) / n_in
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    M = np.zeros((n_out, n_in), dtype=np.float32)
    M[np.arange(n_out), lo] += 1.0 - frac
    M[np.arange(n_out), hi] += frac
    return jnp.asarray(M, dtype)


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (align_corners=True) of [..., H, W, C] via two matmuls."""
    H, W = x.shape[-3], x.shape[-2]
    out_H, out_W = out_hw
    My = _interp_matrix_align_corners(H, out_H, x.dtype)
    Mx = _interp_matrix_align_corners(W, out_W, x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", My, x)
    return jnp.einsum("pw,...hwc->...hpc", Mx, x)


class Conv3x3Params(nn.Module):
    """Parameter holder matching nn.Conv's tree (kernel/bias, same init) so
    the taps-matmul path shares checkpoints with the nn.Conv path."""

    features: int

    @nn.compact
    def __call__(self, c_in: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, c_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class BasicBlock(nn.Module):
    """Dilated residual conv block (ref unet2d_sphere.py:9-34).

    `taps=True` runs both convs as explicit im2col matmuls
    (ops/conv_taps.py): XLA's TPU conv emitter loses most of its time to
    layout churn at these large-grid/low-channel shapes, while the K=9C dot
    stays in the native channel-minor layout (docs/PERF.md round 3).
    Parameters and BatchNorm variables are identical between the paths.
    """

    channels: int
    dilation: int
    dtype: Any = jnp.float32
    axis_name: str | None = None
    taps: str = ""  # "" (nn.Conv) | "taps" (im2col matmul) | "taps3" (row dots)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(h, name):
            return FusedBatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=self.dtype,
                                  axis_name=self.axis_name if train else None,
                                  name=name)(h)

        d = self.dilation
        if self.taps:
            x = x.astype(self.dtype)
            k1, b1 = Conv3x3Params(self.channels, name="conv1")(x.shape[-1])
            h = conv_taps.conv3x3(x, k1, b1, d, variant=self.taps)
            h = nn.leaky_relu(bn(h, "bn1"))
            k2, b2 = Conv3x3Params(self.channels, name="conv2")(self.channels)
            h = conv_taps.conv3x3(h, k2, b2, d, variant=self.taps)
            h = bn(h, "bn2")
            return nn.leaky_relu(h + x)

        h = nn.Conv(self.channels, (3, 3), kernel_dilation=(d, d), padding="SAME",
                    dtype=self.dtype, name="conv1")(x)
        h = nn.leaky_relu(bn(h, "bn1"))
        h = nn.Conv(self.channels, (3, 3), kernel_dilation=(d, d), padding="SAME",
                    dtype=self.dtype, name="conv2")(h)
        h = bn(h, "bn2")
        return nn.leaky_relu(h + x)


class UpSampleBN(nn.Module):
    """Upsample-to-skip + concat + conv + 3 dilated residual blocks
    (ref unet2d_sphere.py:37-56)."""

    channels: int
    dtype: Any = jnp.float32
    axis_name: str | None = None
    taps: str = ""  # see BasicBlock

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        up = resize_bilinear_align_corners(x, (skip.shape[-3], skip.shape[-2]))
        h = jnp.concatenate([up, skip], axis=-1)
        if self.taps:
            k0, b0 = Conv3x3Params(self.channels, name="conv")(h.shape[-1])
            h = conv_taps.conv3x3(h.astype(self.dtype), k0, b0, 1,
                                  variant=self.taps)
        else:
            h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                        name="conv")(h)
        for i, d in enumerate((1, 2, 3)):
            h = BasicBlock(self.channels, d, dtype=self.dtype,
                           axis_name=self.axis_name, taps=self.taps,
                           name=f"block{i}")(h, train=train)
        return h


class DecoderSphere(nn.Module):
    """Scatter each tap onto the spherical grid, then upsample through the
    pyramid (ref unet2d_sphere.py:59-206).

    Produces levels {"1_1": F//32 ch, "1_2": F//16, "1_4": F//8, "1_8": F//4,
    "1_16": F//2} on the spherical grid (channel-last, batched).
    """

    num_features: int
    sphere: SphereConfig
    dtype: Any = jnp.float32
    axis_name: str | None = None
    remat: bool = True  # checkpoint each UpSampleBN: trades recompute for HBM
    gather_impl: str = "taps"   # bilinear resample impl (config.resample_gather)
                                # (shared with rendering.featurize_points --
                                # see ops/gather_scatter.py)
    conv_impl: str = "conv"     # "conv" (nn.Conv) | "taps" (im2col matmul,
                                # the TPU-fast path -- ops/conv_taps.py);
                                # "taps:N" overrides the channel gate below
    taps_max_ch: int = 160      # taps only for stages with channels <= this
                                # (up1+up2, ~2/3 of the decoder device time);
                                # bounding the count of custom-VJP conv
                                # subgraphs keeps the remote TPU compile
                                # helper within its memory budget

    @nn.compact
    def __call__(
        self,
        taps: Dict[str, jnp.ndarray],   # batched [B, h, w, C] per tap
        pix: jnp.ndarray,               # [N, 2]
        pix_sphere: jnp.ndarray,        # [N, 2]
        train: bool = False,
        maps: Dict[int, jnp.ndarray] | None = None,
    ) -> Levels:
        F = self.num_features
        if maps is None:
            # maps depend only on the camera intrinsics; callers on the hot
            # path precompute them (the in-graph scatter is the single
            # largest op of the train step otherwise, ~21 ms)
            maps = build_sphere_maps(pix, pix_sphere, self.sphere)

        x32 = nn.Conv(F, (1, 1), dtype=self.dtype, name="conv2")(taps["s32"])

        gather = jax.vmap(
            lambda f, m: sphere_scatter_gather(f, m, impl=self.gather_impl),
            in_axes=(0, None))
        sph = {
            1: gather(taps["s1"], maps[1]),
            2: gather(taps["s2"], maps[2]),
            4: gather(taps["s4"], maps[4]),
            8: gather(taps["s8"], maps[8]),
            16: gather(taps["s16"], maps[16]),
            32: gather(x32, maps[32]),
        }

        up_cls = nn.remat(UpSampleBN, static_argnums=(3,)) if self.remat else UpSampleBN

        impl, _, gate = self.conv_impl.partition(":")
        max_ch = int(gate) if gate else self.taps_max_ch

        def kw(ch):
            use = impl in ("taps", "taps3") and ch <= max_ch
            return dict(dtype=self.dtype, axis_name=self.axis_name,
                        taps=impl if use else "")

        x_1_16 = up_cls(F // 2, name="up16", **kw(F // 2))(sph[32], sph[16], train)
        x_1_8 = up_cls(F // 4, name="up8", **kw(F // 4))(x_1_16, sph[8], train)
        x_1_4 = up_cls(F // 8, name="up4", **kw(F // 8))(x_1_8, sph[4], train)
        x_1_2 = up_cls(F // 16, name="up2", **kw(F // 16))(x_1_4, sph[2], train)
        x_1_1 = up_cls(F // 32, name="up1", **kw(F // 32))(x_1_2, sph[1], train)

        return {"1_1": x_1_1, "1_2": x_1_2, "1_4": x_1_4, "1_8": x_1_8,
                "1_16": x_1_16}


def decoder_latent_dim(num_features: int) -> int:
    """Concat width of all five levels = d_latent of the field MLP
    (2480 for num_features=2560, ref scenerf.py:105)."""
    return sum(num_features // k for k in (2, 4, 8, 16, 32))
