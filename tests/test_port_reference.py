"""Reference-checkpoint porting test: synthesize a Lightning-layout state dict
(by inverse-mapping a small model's own init), port it, and check the tree is
bit-identical where mapped."""
import numpy as np
import pytest
import torch

import jax

from scenerf_tpu import config as C
from scenerf_tpu.model import SceneRF
from scenerf_tpu.utils.port_reference import (port_reference_state_dict,
                                              validate_against_model)


def build_fake_reference_sd(variables, n_blocks):
    """Emit torch-layout tensors whose port maps back onto `variables`."""
    rng = np.random.default_rng(0)
    sd = {}

    def linear(prefix, tree):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(tree["kernel"]).T.copy())
        if "bias" in tree:
            sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(tree["bias"]).copy())

    def conv(prefix, tree, bias=True):
        k = np.transpose(np.asarray(tree["kernel"]), (3, 2, 0, 1)).copy()
        sd[f"{prefix}.weight"] = torch.from_numpy(k)
        if bias and "bias" in tree:
            sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(tree["bias"]).copy())

    def bn(prefix, ptree, stree):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(ptree["scale"]).copy())
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(ptree["bias"]).copy())
        sd[f"{prefix}.running_mean"] = torch.from_numpy(np.asarray(stree["mean"]).copy())
        sd[f"{prefix}.running_var"] = torch.from_numpy(np.asarray(stree["var"]).copy())

    # --- field MLPs ---
    for mod in ("mlp", "mlp_gaussian"):
        p = variables[mod]["params"]
        linear(f"{mod}.lin_in", p["lin_in"])
        linear(f"{mod}.lin_out", p["lin_out"])
        for i in range(n_blocks):
            linear(f"{mod}.blocks.{i}.fc_0", p[f"block_{i}"]["fc_0"])
            linear(f"{mod}.blocks.{i}.fc_1", p[f"block_{i}"]["fc_1"])
            linear(f"{mod}.lin_z.{i}", p[f"lin_z_{i}"])

    # --- encoder backbone (timm layout) ---
    bp = variables["net_rgb"]["params"]["backbone"]
    bs = variables["net_rgb"]["batch_stats"]["backbone"]
    pre = "net_rgb.encoder.original_model"
    conv(f"{pre}.conv_stem", bp["conv_stem"], bias=False)
    bn(f"{pre}.bn1", bp["bn1"], bs["bn1"])
    import re
    for name in bp:
        m = re.match(r"stage(\d+)_block(\d+)", name)
        if not m:
            continue
        si, bi = m.groups()
        t = f"{pre}.blocks.{si}.{bi}"
        blk, blks = bp[name], bs[name]
        if "expand_conv" in blk:
            conv(f"{t}.conv_pw", blk["expand_conv"], bias=False)
            bn(f"{t}.bn1", blk["expand_bn"], blks["expand_bn"])
            dw = np.transpose(np.asarray(blk["dw_conv"]["kernel"]), (3, 2, 0, 1))
            sd[f"{t}.conv_dw.weight"] = torch.from_numpy(dw.copy())
            bn(f"{t}.bn2", blk["dw_bn"], blks["dw_bn"])
            conv(f"{t}.conv_pwl", blk["project_conv"], bias=False)
            bn(f"{t}.bn3", blk["project_bn"], blks["project_bn"])
        else:
            dw = np.transpose(np.asarray(blk["dw_conv"]["kernel"]), (3, 2, 0, 1))
            sd[f"{t}.conv_dw.weight"] = torch.from_numpy(dw.copy())
            bn(f"{t}.bn1", blk["dw_bn"], blks["dw_bn"])
            conv(f"{t}.conv_pw", blk["project_conv"], bias=False)
            bn(f"{t}.bn2", blk["project_bn"], blks["project_bn"])
        conv(f"{t}.se.conv_reduce", blk["se_reduce"])
        conv(f"{t}.se.conv_expand", blk["se_expand"])
    conv(f"{pre}.conv_head", bp["conv_head"], bias=False)

    # --- spherical decoder ---
    dp = variables["net_rgb"]["params"]["decoder"]
    ds = variables["net_rgb"]["batch_stats"]["decoder"]
    conv("net_rgb.decoder.conv2", dp["conv2"])
    for name in ("up16", "up8", "up4", "up2", "up1"):
        t = f"net_rgb.decoder.{name}"
        conv(f"{t}._net.0", dp[name]["conv"])
        for i in range(3):
            blk, blks = dp[name][f"block{i}"], ds[name][f"block{i}"]
            conv(f"{t}._net.{i+1}.conv_block1.0", blk["conv1"])
            bn(f"{t}._net.{i+1}.conv_block1.1", blk["bn1"], blks["bn1"])
            conv(f"{t}._net.{i+1}.conv_block2.0", blk["conv2"])
            bn(f"{t}._net.{i+1}.conv_block2.1", blk["bn2"], blks["bn2"])
    return sd


def test_port_reference_checkpoint_roundtrip():
    cfg = C.kitti(
        encoder="effnet-b0", encoder_features=128, img_size=(64, 48),
        n_rays=16, n_sources=1, n_gt_depth=8, d_hidden=32, n_blocks=3,
    )
    cfg = cfg.replace(sphere=cfg.sphere.__class__(width=80, height=56))
    model = SceneRF(cfg)
    variables = model.init(jax.random.PRNGKey(0))

    sd = build_fake_reference_sd(variables, cfg.n_blocks)
    ported = port_reference_state_dict({"state_dict": sd}, n_blocks=cfg.n_blocks)
    validate_against_model(variables, ported)

    flat_v = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_p = dict(jax.tree_util.tree_flatten_with_path(ported)[0])
    for k, v in flat_v:
        np.testing.assert_array_equal(np.asarray(flat_p[k]), np.asarray(v),
                                      err_msg=jax.tree_util.keystr(k))


def test_lightning_ckpt_import_full_roundtrip(tmp_path):
    """End-to-end import of a synthetic Lightning checkpoint (VERDICT r4 #6):
    torch.save a .ckpt with the reference's exact on-disk layout --
    `state_dict` + `hyper_parameters` with the save_hyperparameters key names
    (ref scenerf.py:24-43,94; consumed by load_from_checkpoint in
    ref scripts/evaluation/save_depth_metrics.py:57) -- run the import path
    the CLI uses, restore the written Orbax checkpoint, and assert (a) every
    hparam landed on the config, (b) the weights survive
    torch.save -> port -> Orbax -> restore bit-identically, and (c) a val
    render from the restored state equals one from the source variables."""
    from scenerf_tpu.data.synthetic import make_batch
    from scenerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from scenerf_tpu.train import Trainer, TrainState
    from scenerf_tpu.utils.checkpoint import CheckpointManager
    from scenerf_tpu.utils.port_reference import (config_from_hparams,
                                                  import_reference_checkpoint)

    # flag values exactly as Lightning stores them (img_size round-trips
    # through YAML/pickle as a list in real checkpoints)
    hp = {
        "som_sigma": 0.03, "lr": 2e-5, "weight_decay": 1e-6,
        "img_size": [64, 48], "n_rays": 16, "max_infer_depth": 12.0,
        "max_sample_depth": 10.0, "eval_depth": 8.0, "std": 0.3,
        "n_gaussians": 2, "n_pts_uni": 8, "n_pts_per_gaussian": 4,
        "sampling_method": "uniform", "batch_size": 1,
        "add_fov_hor": 5.0, "add_fov_ver": 3.0,
        "sphere_H": 56, "sphere_W": 80,
        "use_color": True, "use_reprojection": True,
    }
    # non-hparam shrink overrides (the reference hardcodes EfficientNet-B7;
    # encoder size is never in a real ckpt)
    base = dict(encoder="effnet-b0", encoder_features=128, n_sources=1,
                n_gt_depth=8, d_hidden=32, n_blocks=3)
    cfg = config_from_hparams("kitti", hp, **base)
    for k in ("som_sigma", "lr", "weight_decay", "n_rays", "std",
              "n_gaussians", "n_pts_uni", "n_pts_per_gaussian",
              "sampling_method", "batch_size", "use_color",
              "use_reprojection", "max_infer_depth", "max_sample_depth",
              "eval_depth"):
        assert getattr(cfg, k) == hp[k], k
    assert cfg.img_size == (64, 48)
    assert (cfg.sphere.width, cfg.sphere.height) == (80, 56)
    assert (cfg.sphere.add_fov_hor, cfg.sphere.add_fov_ver) == (5.0, 3.0)

    model = SceneRF(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    sd = build_fake_reference_sd(variables, cfg.n_blocks)
    ckpt_path = str(tmp_path / "scenerf_fake.ckpt")
    torch.save({"state_dict": sd, "hyper_parameters": hp,
                "epoch": 3, "global_step": 1234}, ckpt_path)

    out = str(tmp_path / "orbax")
    cfg2, _ = import_reference_checkpoint(ckpt_path, "kitti", out, **base)
    assert cfg2 == cfg

    # restore through the same path every eval CLI takes for --model_path
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(cfg2, mesh=mesh, steps_per_epoch=10,
                      with_depth_eval=True)
    template = trainer.create_state(jax.random.PRNGKey(1))
    restored, rcfg = CheckpointManager(out).restore(template, which="best")
    assert rcfg == cfg

    flat_v = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    flat_r = dict(jax.tree_util.tree_flatten_with_path(restored.variables())[0])
    assert set(map(jax.tree_util.keystr, flat_v)) == \
        set(map(jax.tree_util.keystr, flat_r))
    for k, v in flat_v.items():
        np.testing.assert_array_equal(np.asarray(flat_r[k]), np.asarray(v),
                                      err_msg=jax.tree_util.keystr(k))

    # one rendered val batch: restored ckpt == direct variables, bit-identical
    params = {k: variables[k]["params"] for k in variables}
    direct = replicate(
        TrainState.from_variables(variables, trainer.tx.init(params)), mesh)
    batch = shard_batch(make_batch(cfg, batch_size=1, seed=7), mesh)
    key = jax.random.PRNGKey(3)
    m_direct = trainer.val_step(direct, batch, key)
    m_restored = trainer.val_step(restored, batch, key)
    for name in m_direct:
        np.testing.assert_array_equal(
            np.asarray(m_direct[name]), np.asarray(m_restored[name]),
            err_msg=name)
    assert np.isfinite(float(m_restored["depth/abs_rel"]))
