"""Import a reference SceneRF Lightning checkpoint into this framework.

The published checkpoints (scenerf_kitti.ckpt / scenerf_bundlefusion.ckpt,
ref README.md:215,294) are torch Lightning state dicts with modules
  net_rgb.encoder.original_model.*   (tf_efficientnet_b7_ns)
  net_rgb.decoder.*                  (conv2, up16..up1 with _net.0 conv +
                                      _net.{1,2,3} BasicBlocks)
  mlp.* / mlp_gaussian.*             (ResnetFC: lin_in, lin_out, blocks.{i},
                                      lin_z.{i})
This maps every tensor into the flax variable tree of model.SceneRF
(torch Linear [out,in] -> kernel [in,out]; Conv OIHW -> HWIO; BN weight/bias ->
scale/bias + running stats). The decoder's dead resize_* convs and the unused
encoder bn2/classifier are skipped, matching what the reference forward
actually exercises (ref unet2d_sphere.py:167-206).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from scenerf_tpu.encoder.torch_port import port_efficientnet_state_dict


def _np(v):
    return v.numpy() if hasattr(v, "numpy") else np.asarray(v)


def _linear(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv(sd, prefix):
    out = {"kernel": np.transpose(_np(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix):
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _resnetfc(sd, prefix, n_blocks=3):
    p = {"lin_in": _linear(sd, f"{prefix}.lin_in"),
         "lin_out": _linear(sd, f"{prefix}.lin_out")}
    for i in range(n_blocks):
        p[f"block_{i}"] = {
            "fc_0": _linear(sd, f"{prefix}.blocks.{i}.fc_0"),
            "fc_1": _linear(sd, f"{prefix}.blocks.{i}.fc_1"),
        }
        p[f"lin_z_{i}"] = _linear(sd, f"{prefix}.lin_z.{i}")
    return p


def _basic_block(sd, prefix):
    """torch BasicBlock (conv_block1.0/1, conv_block2.0/1, ref
    unet2d_sphere.py:9-34) -> flax BasicBlock (conv1/bn1/conv2/bn2)."""
    params, stats = {}, {}
    params["conv1"] = _conv(sd, f"{prefix}.conv_block1.0")
    p, s = _bn(sd, f"{prefix}.conv_block1.1")
    params["bn1"], stats["bn1"] = p, s
    params["conv2"] = _conv(sd, f"{prefix}.conv_block2.0")
    p, s = _bn(sd, f"{prefix}.conv_block2.1")
    params["bn2"], stats["bn2"] = p, s
    return params, stats


def _upsample_bn(sd, prefix):
    params, stats = {}, {}
    params["conv"] = _conv(sd, f"{prefix}._net.0")
    for i in range(3):
        p, s = _basic_block(sd, f"{prefix}._net.{i + 1}")
        params[f"block{i}"], stats[f"block{i}"] = p, s
    return params, stats


def port_reference_state_dict(sd: Dict[str, Any], n_blocks: int = 3) -> Dict[str, Any]:
    """Full reference state dict -> variables tree for model.SceneRF:
    {"net_rgb": {"params", "batch_stats"}, "mlp": {...}, "mlp_gaussian": {...}}.
    """
    if "state_dict" in sd:
        sd = sd["state_dict"]

    # encoder backbone (strip the torch.hub wrapper prefix)
    enc_prefix = "net_rgb.encoder.original_model."
    enc_sd = {k[len(enc_prefix):]: v for k, v in sd.items()
              if k.startswith(enc_prefix)}
    backbone = port_efficientnet_state_dict(enc_sd)

    dec_params: Dict[str, Any] = {"conv2": _conv(sd, "net_rgb.decoder.conv2")}
    dec_stats: Dict[str, Any] = {}
    for name in ("up16", "up8", "up4", "up2", "up1"):
        p, s = _upsample_bn(sd, f"net_rgb.decoder.{name}")
        dec_params[name], dec_stats[name] = p, s

    return {
        "net_rgb": {
            "params": {"backbone": backbone["params"], "decoder": dec_params},
            "batch_stats": {"backbone": backbone["batch_stats"],
                            "decoder": dec_stats},
        },
        "mlp": {"params": _resnetfc(sd, "mlp", n_blocks)},
        "mlp_gaussian": {"params": _resnetfc(sd, "mlp_gaussian", n_blocks)},
    }


def load_reference_checkpoint(path: str, n_blocks: int = 3) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu")
    return port_reference_state_dict(sd, n_blocks=n_blocks)


# Lightning `save_hyperparameters` keys (ref scenerf.py:24-43 __init__ kwargs)
# that map 1:1 onto SceneRFConfig fields of the same name.
_HPARAM_KEYS = (
    "n_rays", "n_gaussians", "n_pts_per_gaussian", "n_pts_uni", "std",
    "som_sigma", "lr", "weight_decay", "max_sample_depth", "max_infer_depth",
    "eval_depth", "sampling_method", "use_color", "use_reprojection",
    "batch_size",
)


def config_from_hparams(preset: str, hp: Dict[str, Any], **base):
    """Build a SceneRFConfig from a Lightning checkpoint's `hyper_parameters`.

    `hp` uses the reference's exact flag names (ref scenerf.py:24-43,
    persisted by save_hyperparameters at scenerf.py:94 and restored by
    load_from_checkpoint in every eval script, e.g.
    save_depth_metrics.py:57). `base` holds non-hparam config overrides
    (encoder size etc. — the reference hardcodes B7, so they are never in a
    real checkpoint; tests use them to shrink the model)."""
    from scenerf_tpu import config as C

    overrides = dict(base)
    overrides.update({k: hp[k] for k in _HPARAM_KEYS if k in hp})
    if "img_size" in hp:
        overrides["img_size"] = tuple(hp["img_size"])
    cfg = C.PRESETS[preset](**overrides)
    if "sphere_W" in hp and "sphere_H" in hp:
        cfg = cfg.replace(sphere=cfg.sphere.__class__(
            width=int(hp["sphere_W"]), height=int(hp["sphere_H"]),
            add_fov_hor=float(hp.get("add_fov_hor", cfg.sphere.add_fov_hor)),
            add_fov_ver=float(hp.get("add_fov_ver", cfg.sphere.add_fov_ver))))
    return cfg


def import_reference_checkpoint(ckpt_path: str, preset: str, out: str, **base):
    """torch Lightning .ckpt -> Orbax checkpoint dir that every eval/recon CLI
    accepts via --model_path. Returns (cfg, state)."""
    import jax
    import torch

    from scenerf_tpu.train import Trainer, TrainState
    from scenerf_tpu.utils.checkpoint import CheckpointManager

    raw = torch.load(ckpt_path, map_location="cpu")
    cfg = config_from_hparams(preset, raw.get("hyper_parameters", {}), **base)
    ported = port_reference_state_dict(raw, n_blocks=cfg.n_blocks)

    cpu = jax.devices("cpu")[0]
    trainer = Trainer(cfg, steps_per_epoch=1000)
    with jax.default_device(cpu):
        template = trainer.model.init(jax.random.PRNGKey(0))
        validate_against_model(template, ported)
        params = {k: ported[k]["params"] for k in ported}
        state = TrainState.from_variables(ported, trainer.tx.init(params))
    mgr = CheckpointManager(out)
    mgr.save(state, cfg, metrics={"depth/abs_rel": 0.0})  # also writes `best`
    return cfg, state


def validate_against_model(variables: Dict[str, Any], ported: Dict[str, Any]):
    """Assert the ported tree matches the model's shapes leaf by leaf."""
    import jax

    flat_m = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    flat_p = dict(jax.tree_util.tree_flatten_with_path(ported)[0])
    missing = set(map(jax.tree_util.keystr, flat_m)) - set(map(jax.tree_util.keystr, flat_p))
    extra = set(map(jax.tree_util.keystr, flat_p)) - set(map(jax.tree_util.keystr, flat_m))
    if missing or extra:
        raise ValueError(f"tree mismatch: missing={sorted(missing)[:5]} "
                         f"extra={sorted(extra)[:5]}")
    for k, v in jax.tree_util.tree_flatten_with_path(variables)[0]:
        pv = flat_p[k]
        if tuple(np.shape(pv)) != tuple(np.shape(v)):
            raise ValueError(
                f"{jax.tree_util.keystr(k)}: {np.shape(pv)} != {np.shape(v)}")
