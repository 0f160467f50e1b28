"""Port pretrained torch EfficientNet weights into the flax backbone.

The reference conditions on a pretrained tf_efficientnet_b7_ns downloaded via
torch.hub (ref scenerf/models/unet2d_sphere.py:250-269). This environment has
no network egress, so porting is offline: given a torch state dict on disk
(timm / gen-efficientnet layout), remap it into the flax parameter tree of
encoder.backbones.EfficientNet.

Layout mapping (gen-efficientnet/timm -> flax):
  conv_stem.weight                    -> conv_stem.kernel (OIHW -> HWIO)
  bn1.{weight,bias,running_*}         -> bn1.{scale,bias}/batch_stats
  blocks.{s}.{b}.conv_pw.weight       -> stage{s}_block{b}.expand_conv.kernel
  blocks.{s}.{b}.bn1.*                -> ...expand_bn
  blocks.{s}.{b}.conv_dw.weight       -> ...dw_conv.kernel (depthwise OIHW:
                                         [C,1,kh,kw] -> HWIO [kh,kw,1,C])
  blocks.{s}.{b}.bn2.*                -> ...dw_bn
  blocks.{s}.{b}.se.conv_reduce/expand-> ...se_reduce / se_expand
  blocks.{s}.{b}.conv_pwl.weight      -> ...project_conv.kernel
  blocks.{s}.{b}.bn3.*                -> ...project_bn
  conv_head.weight                    -> conv_head.kernel
Stage 0 blocks (expand_ratio 1) have conv_dw/bn1/se/conv_pw/bn2 in timm --
handled by the no-expand branch below.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dw_conv(w: np.ndarray) -> np.ndarray:
    """Depthwise [C, 1, kh, kw] -> HWIO [kh, kw, 1, C]."""
    return np.transpose(w, (2, 3, 1, 0))


def _bn(sd: Dict[str, Any], prefix: str):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def port_efficientnet_state_dict(sd: Dict[str, Any], n_stages: int = 7,
                                 repeats_per_stage=None) -> Dict[str, Any]:
    """torch state dict -> {'params': ..., 'batch_stats': ...} for the flax
    EfficientNet backbone."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv_stem"] = {"kernel": _conv(sd["conv_stem.weight"])}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s

    # discover block structure from keys
    import re
    block_ids = sorted({
        tuple(map(int, m.groups()))
        for k in sd
        for m in [re.match(r"blocks\.(\d+)\.(\d+)\.", k)]
        if m
    })
    for (si, bi) in block_ids:
        t = f"blocks.{si}.{bi}"
        name = f"stage{si}_block{bi}"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        has_expand = f"{t}.conv_pw.weight" in sd and f"{t}.conv_pwl.weight" in sd
        if has_expand:
            bp["expand_conv"] = {"kernel": _conv(sd[f"{t}.conv_pw.weight"])}
            p, s = _bn(sd, f"{t}.bn1")
            bp["expand_bn"], bs["expand_bn"] = p, s
            bp["dw_conv"] = {"kernel": _dw_conv(sd[f"{t}.conv_dw.weight"])}
            p, s = _bn(sd, f"{t}.bn2")
            bp["dw_bn"], bs["dw_bn"] = p, s
            proj_key = f"{t}.conv_pwl"
            proj_bn = f"{t}.bn3"
        else:
            # expand_ratio == 1: dw first, then pointwise projection
            bp["dw_conv"] = {"kernel": _dw_conv(sd[f"{t}.conv_dw.weight"])}
            p, s = _bn(sd, f"{t}.bn1")
            bp["dw_bn"], bs["dw_bn"] = p, s
            proj_key = f"{t}.conv_pw"
            proj_bn = f"{t}.bn2"
        if f"{t}.se.conv_reduce.weight" in sd:
            bp["se_reduce"] = {
                "kernel": _conv(sd[f"{t}.se.conv_reduce.weight"]),
                "bias": np.asarray(sd[f"{t}.se.conv_reduce.bias"]),
            }
            bp["se_expand"] = {
                "kernel": _conv(sd[f"{t}.se.conv_expand.weight"]),
                "bias": np.asarray(sd[f"{t}.se.conv_expand.bias"]),
            }
        bp["project_conv"] = {"kernel": _conv(sd[f"{proj_key}.weight"])}
        p, s = _bn(sd, proj_bn)
        bp["project_bn"], bs["project_bn"] = p, s
        params[name] = bp
        stats[name] = bs

    params["conv_head"] = {"kernel": _conv(sd["conv_head.weight"])}
    return {"params": params, "batch_stats": stats}


def load_pretrained_backbone(path: str) -> Dict[str, Any]:
    """Load + port a torch EfficientNet checkpoint file."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return port_efficientnet_state_dict(sd)


def install_backbone_weights(variables: Dict[str, Any], ported: Dict[str, Any]) -> Dict[str, Any]:
    """Insert ported backbone weights into a full model variables tree
    (net_rgb/{params,batch_stats}/backbone/...). Shapes are validated."""
    import jax

    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow-ish copy
    for col in ("params", "batch_stats"):
        dst = out["net_rgb"][col]["backbone"]
        src = ported[col if col == "params" else "batch_stats"]
        for mod, tree in src.items():
            if mod not in dst:
                raise KeyError(f"backbone module {mod} missing in model tree")
            for sub, leaves in tree.items():
                if isinstance(leaves, dict):
                    for leaf_name, v in leaves.items():
                        want = dst[mod][sub][leaf_name].shape
                        if tuple(v.shape) != tuple(want):
                            raise ValueError(
                                f"{mod}.{sub}.{leaf_name}: {v.shape} != {want}")
                        dst[mod][sub][leaf_name] = v
                else:
                    dst[mod][sub] = leaves
    return out
