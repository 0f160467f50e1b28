"""LPIPS perceptual metric (vgg variant) in flax.

Contract: ref scenerf/scripts/evaluation/eval_color.py:16-27 uses
lpips.LPIPS(net='vgg') on inputs scaled to [-1, 1]. That package ships
pretrained VGG16 + linear calibration weights; this environment has no network
egress, so the architecture is implemented natively and weights are loaded from
a torch state dict on disk when available:

    metric = LPIPS.from_npz(npz_path)  # converted weights (preferred; see
                                       # scripts/convert_lpips_weights.py)
    metric = LPIPS.from_torch_checkpoint(vgg_path, lpips_path)  # ports weights
    metric = LPIPS.random_init(key)  # architecture only (NOT a valid metric)

Offline weight acquisition (on a machine with network access):
    python -c "import torchvision; torchvision.models.vgg16(pretrained=True)"
    pip install lpips && python -c "import lpips; lpips.LPIPS(net='vgg')"
then save the two state dicts and run scripts/convert_lpips_weights.py.

VGG16 feature taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3; per-tap
unit-normalize channels, squared diff, 1x1 calibration conv, spatial mean, sum.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per stage; taps after the last relu
# of each stage, pooling between stages.
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        ci = 0
        for si, (ch, n) in enumerate(_VGG_STAGES):
            for _ in range(n):
                x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                                    name=f"conv{ci}")(x))
                ci += 1
            taps.append(x)
            if si < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS:
    def __init__(self, vgg_params: Dict, lin_weights: Sequence[np.ndarray]):
        self.vgg = VGG16Features()
        self.vgg_params = vgg_params
        self.lin_weights = [jnp.asarray(w) for w in lin_weights]

    @staticmethod
    def _normalize(x: jnp.ndarray) -> jnp.ndarray:
        return (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        """img1/img2: [H, W, 3] in [-1, 1] (caller scales, as the reference
        does). Returns a scalar distance."""
        f1 = self.vgg.apply(self.vgg_params, self._normalize(img1)[None])
        f2 = self.vgg.apply(self.vgg_params, self._normalize(img2)[None])
        total = 0.0
        for a, b, w in zip(f1, f2, self.lin_weights):
            an = a / jnp.sqrt(jnp.sum(a ** 2, -1, keepdims=True) + 1e-10)
            bn = b / jnp.sqrt(jnp.sum(b ** 2, -1, keepdims=True) + 1e-10)
            d = (an - bn) ** 2  # [1, h, w, C]
            total = total + jnp.mean(jnp.sum(d * w[None, None, None, :], axis=-1))
        return total

    # ------------------------------------------------------------------ init
    @classmethod
    def random_init(cls, key: jax.Array) -> "LPIPS":
        vgg = VGG16Features()
        params = vgg.init(key, jnp.zeros((1, 64, 64, 3)))
        lins = [np.ones((ch,), np.float32) / ch for ch, _ in _VGG_STAGES]
        return cls(params, lins)

    # ------------------------------------------------------------ npz format
    def to_npz(self, path: str) -> None:
        """Save as a self-contained npz (conv{i}_kernel/bias + lin{i})."""
        arrs = {}
        p = self.vgg_params["params"]
        for ci in range(len(p)):
            arrs[f"conv{ci}_kernel"] = np.asarray(p[f"conv{ci}"]["kernel"])
            arrs[f"conv{ci}_bias"] = np.asarray(p[f"conv{ci}"]["bias"])
        for i, w in enumerate(self.lin_weights):
            arrs[f"lin{i}"] = np.asarray(w)
        np.savez(path, **arrs)

    @classmethod
    def from_npz(cls, path: str) -> "LPIPS":
        """Load weights converted by scripts/convert_lpips_weights.py."""
        z = np.load(path)
        n_convs = sum(1 for k in z.files if k.endswith("_kernel"))
        params = {"params": {
            f"conv{ci}": {"kernel": jnp.asarray(z[f"conv{ci}_kernel"]),
                          "bias": jnp.asarray(z[f"conv{ci}_bias"])}
            for ci in range(n_convs)}}
        lins = [z[f"lin{i}"] for i in range(len(_VGG_STAGES))]
        return cls(params, lins)

    @classmethod
    def from_torch_checkpoint(cls, vgg_state_path: str, lpips_state_path: str) -> "LPIPS":
        """Port torchvision VGG16 `features` weights + lpips linear weights.

        vgg_state_path: torch state dict of torchvision vgg16 (keys
        features.{idx}.weight/bias); lpips_state_path: state dict of the lpips
        package's LPIPS(net='vgg') (keys lin{i}.model.1.weight).
        """
        import torch

        vgg_sd = torch.load(vgg_state_path, map_location="cpu")
        conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        params = {"params": {}}
        for ci, ti in enumerate(conv_idx):
            w = vgg_sd[f"features.{ti}.weight"].numpy()  # [O, I, kh, kw]
            b = vgg_sd[f"features.{ti}.bias"].numpy()
            params["params"][f"conv{ci}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            }
        lp_sd = torch.load(lpips_state_path, map_location="cpu")
        lins = []
        for i in range(5):
            for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
                if k in lp_sd:
                    lins.append(lp_sd[k].numpy().reshape(-1))
                    break
            else:
                raise KeyError(f"no linear weight for tap {i} in {lpips_state_path}")
        return cls(params, lins)
