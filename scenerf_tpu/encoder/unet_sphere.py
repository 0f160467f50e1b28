"""UNet2DSphere: backbone + spherical decoder (ref scenerf/models/unet2d_sphere.py:225-269).

forward(img [B, H, W, 3], pix, pix_sphere) -> five spherical feature levels.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from scenerf_tpu.config import SphereConfig
from scenerf_tpu.encoder.backbones import make_backbone
from scenerf_tpu.encoder.sphere_decoder import DecoderSphere, decoder_latent_dim


class UNet2DSphere(nn.Module):
    backbone_name: str = "effnet-b7"
    num_features: int = 2560
    sphere: SphereConfig = SphereConfig()
    dtype: Any = jnp.float32
    axis_name: str | None = None
    remat: bool | int = True  # int k: remat only the first k backbone stages
    remat_decoder: bool | None = None  # None follows bool(remat) — NOTE: an
    # int k>0 then still implies FULL decoder remat; set remat_decoder
    # explicitly when tuning k (partial encoder remat exists to cut backward
    # replay, which a coupled decoder remat would re-add)
    conv_impl: str = "conv"  # decoder convs: "conv" | "taps" (see DecoderSphere)
    gather_impl: str = "taps"  # sphere-resample bilinear impl: "taps" | "win2"

    def setup(self):
        self.backbone = make_backbone(
            self.backbone_name, num_features=self.num_features,
            dtype=self.dtype, axis_name=self.axis_name, remat=self.remat,
        )
        dec_remat = (bool(self.remat) if self.remat_decoder is None
                     else self.remat_decoder)
        self.decoder = DecoderSphere(
            num_features=self.num_features, sphere=self.sphere,
            dtype=self.dtype, axis_name=self.axis_name, remat=dec_remat,
            conv_impl=self.conv_impl, gather_impl=self.gather_impl,
        )

    def __call__(self, img: jnp.ndarray, pix: jnp.ndarray, pix_sphere: jnp.ndarray,
                 train: bool = False, maps=None) -> Dict[str, jnp.ndarray]:
        taps = self.backbone(img, train=train)
        return self.decoder(taps, pix, pix_sphere, train=train, maps=maps)

    @property
    def d_latent(self) -> int:
        return decoder_latent_dim(self.num_features)
