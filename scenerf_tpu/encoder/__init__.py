from scenerf_tpu.encoder.backbones import EfficientNet, TinyBackbone, make_backbone
from scenerf_tpu.encoder.unet_sphere import UNet2DSphere

__all__ = ["EfficientNet", "TinyBackbone", "make_backbone", "UNet2DSphere"]
