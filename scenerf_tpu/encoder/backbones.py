"""Image backbones for the spherical U-Net encoder.

The reference taps intermediate features of a pretrained tf_efficientnet_b7_ns
(ref scenerf/models/unet2d_sphere.py:209-222, :250-269): the decoder consumes
  tap "s2"  = stage-0 output   (stride 2,  B7: 32 ch)
  tap "s4"  = stage-1 output   (stride 4,  B7: 48 ch)
  tap "s8"  = stage-2 output   (stride 8,  B7: 80 ch)
  tap "s16" = stage-4 output   (stride 16, B7: 224 ch)
  tap "s32" = conv_head output (stride 32, B7: 2560 ch, pre-BN)
plus the raw input image as the stride-1 skip.

Here EfficientNet is implemented natively in flax (NHWC, SAME padding like the
TF variants, BN eps 1e-3), parameterized by the standard width/depth
coefficients so any of B0..B7 drops in. Weight porting from a torch state dict
is in encoder/torch_port.py. TinyBackbone is a light CNN with the same tap
interface for tests and smoke runs.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from scenerf_tpu.encoder.norm import FusedBatchNorm

Taps = Dict[str, jnp.ndarray]

# (expand_ratio, kernel, stride, base_filters, base_repeats) per stage -- the
# standard EfficientNet-B0 stage table scaled by width/depth coefficients.
_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)

VARIANTS = {
    # name: (width_coeff, depth_coeff)
    "b0": (1.0, 1.0),
    "b1": (1.0, 1.1),
    "b2": (1.1, 1.2),
    "b3": (1.2, 1.4),
    "b4": (1.4, 1.8),
    "b5": (1.6, 2.2),
    "b6": (1.8, 2.6),
    "b7": (2.0, 3.1),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    filters_out: int
    expand_ratio: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(h, name):
            return FusedBatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
                name=name,
            )(h)

        c_in = x.shape[-1]
        c_mid = c_in * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(c_mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(h)
            h = nn.swish(bn(h, "expand_bn"))

        h = nn.Conv(
            c_mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding="SAME", feature_group_count=c_mid, use_bias=False,
            dtype=self.dtype, name="dw_conv",
        )(h)
        h = nn.swish(bn(h, "dw_bn"))

        if self.se_ratio > 0:
            c_se = max(1, int(c_in * self.se_ratio))
            se = jnp.mean(h, axis=(-3, -2), keepdims=True)
            se = nn.swish(nn.Conv(c_se, (1, 1), dtype=self.dtype, name="se_reduce")(se))
            se = jax.nn.sigmoid(nn.Conv(c_mid, (1, 1), dtype=self.dtype,
                                        name="se_expand")(se))
            h = h * se

        h = nn.Conv(self.filters_out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(h)
        h = bn(h, "project_bn")

        if self.stride == 1 and c_in == self.filters_out:
            h = h + x
        return h


class EfficientNet(nn.Module):
    """EfficientNet feature extractor returning the U-Net taps (no classifier).

    NHWC, float input normalized by the caller. `num_features` is the conv_head
    width (2560 for B7 with width 2.0).
    """

    width: float = 2.0
    depth: float = 3.1
    num_features: int = 2560
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    dtype: Any = jnp.float32
    axis_name: str | None = None
    remat: bool | int = True  # checkpoint MBConvs: trades recompute for HBM.
    # True = every stage; False = none; int k = only stages 0..k-1. The early
    # stages run at s2/s4/s8 resolution where the expand-ratio-6 activations
    # dominate HBM, while the late stages hold most of the FLOPs — partial
    # remat keeps the memory win and skips most of the backward replay cost.

    # stage index -> tap name (stage outputs the decoder consumes)
    TAP_STAGES = {0: "s2", 1: "s4", 2: "s8", 4: "s16"}

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Taps:
        def bn(h, name):
            return FusedBatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum, epsilon=self.bn_eps, dtype=self.dtype,
                axis_name=self.axis_name if train else None, name=name,
            )(h)

        taps: Taps = {"s1": x}
        h = nn.Conv(round_filters(32, self.width), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv_stem")(x)
        h = nn.swish(bn(h, "bn1"))

        # bool first: remat=1 == True in Python, but the two must not be
        # conflated (True = all stages, int k = stages 0..k-1)
        if isinstance(self.remat, bool):
            n_remat = len(_STAGES) if self.remat else 0
        else:
            n_remat = int(self.remat)
            if not 0 <= n_remat <= len(_STAGES):
                raise ValueError(
                    f"remat={self.remat!r}: int stage count must be in "
                    f"[0, {len(_STAGES)}]")
        remat_cls = nn.remat(MBConv, static_argnums=(2,))
        for si, (expand, kernel, stride, base_f, base_r) in enumerate(_STAGES):
            block_cls = remat_cls if si < n_remat else MBConv
            f_out = round_filters(base_f, self.width)
            for bi in range(round_repeats(base_r, self.depth)):
                h = block_cls(
                    filters_out=f_out,
                    expand_ratio=expand,
                    kernel=kernel,
                    stride=stride if bi == 0 else 1,
                    bn_momentum=self.bn_momentum,
                    bn_eps=self.bn_eps,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"stage{si}_block{bi}",
                )(h, train)
            if si in self.TAP_STAGES:
                taps[self.TAP_STAGES[si]] = h

        # conv_head output pre-BN: the reference taps features[11], which is the
        # raw conv_head activation (ref unet2d_sphere.py:167-177 with the
        # module enumeration of :214-222)
        taps["s32"] = nn.Conv(self.num_features, (1, 1), use_bias=False,
                              dtype=self.dtype, name="conv_head")(h)
        return taps

    @property
    def tap_channels(self) -> Dict[str, int]:
        return {
            "s1": 3,
            "s2": round_filters(_STAGES[0][3], self.width),
            "s4": round_filters(_STAGES[1][3], self.width),
            "s8": round_filters(_STAGES[2][3], self.width),
            "s16": round_filters(_STAGES[4][3], self.width),
            "s32": self.num_features,
        }


class TinyBackbone(nn.Module):
    """Small 5-level CNN with the same tap interface; for tests/smoke runs."""

    num_features: int = 64
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Taps:
        taps: Taps = {"s1": x}
        h = x
        widths = [8, 12, 16, 24]
        for i, (name, w) in enumerate(zip(("s2", "s4", "s8", "s16"), widths)):
            h = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
            taps[name] = h
        h = nn.Conv(self.num_features, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name="conv_bottleneck")(h)
        taps["s32"] = h
        return taps

    @property
    def tap_channels(self) -> Dict[str, int]:
        return {"s1": 3, "s2": 8, "s4": 12, "s8": 16, "s16": 24,
                "s32": self.num_features}


def make_backbone(name: str, num_features: int | None = None,
                  dtype=jnp.float32, axis_name: str | None = None,
                  remat: bool | int = True):
    """Build a backbone by config name: 'effnet-b{0..7}' or 'tiny'."""
    if name == "tiny":
        return TinyBackbone(num_features=num_features or 64, dtype=dtype,
                            axis_name=axis_name)
    if name.startswith("effnet-"):
        variant = name.split("-", 1)[1]
        width, depth = VARIANTS[variant]
        nf = num_features or round_filters(1280, width)
        return EfficientNet(width=width, depth=depth, num_features=nf,
                            dtype=dtype, axis_name=axis_name, remat=remat)
    raise ValueError(f"unknown backbone: {name}")
