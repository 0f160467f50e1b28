"""Weight-porting test: synthesize a timm-layout torch state dict for
EfficientNet-B0, port it, and verify the flax backbone consumes it exactly."""
import numpy as np
import pytest
import torch

from scenerf_tpu.encoder.backbones import (EfficientNet, _STAGES,
                                           round_filters, round_repeats)
from scenerf_tpu.encoder.torch_port import port_efficientnet_state_dict


def build_fake_timm_sd(width=1.0, depth=1.0, num_features=1280, seed=0):
    """Random state dict in gen-efficientnet/timm layout for the given scale."""
    rng = np.random.default_rng(seed)
    sd = {}

    def t(*shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.abs(t(c)) + 0.5

    stem = round_filters(32, width)
    sd["conv_stem.weight"] = t(stem, 3, 3, 3)
    bn("bn1", stem)

    c_in = stem
    for si, (expand, kernel, stride, base_f, base_r) in enumerate(_STAGES):
        f_out = round_filters(base_f, width)
        for bi in range(round_repeats(base_r, depth)):
            p = f"blocks.{si}.{bi}"
            c_mid = c_in * expand
            if expand != 1:
                sd[f"{p}.conv_pw.weight"] = t(c_mid, c_in, 1, 1)
                bn(f"{p}.bn1", c_mid)
                sd[f"{p}.conv_dw.weight"] = t(c_mid, 1, kernel, kernel)
                bn(f"{p}.bn2", c_mid)
                proj, proj_bn = "conv_pwl", "bn3"
            else:
                sd[f"{p}.conv_dw.weight"] = t(c_mid, 1, kernel, kernel)
                bn(f"{p}.bn1", c_mid)
                proj, proj_bn = "conv_pw", "bn2"
            c_se = max(1, int(c_in * 0.25))
            sd[f"{p}.se.conv_reduce.weight"] = t(c_se, c_mid, 1, 1)
            sd[f"{p}.se.conv_reduce.bias"] = t(c_se)
            sd[f"{p}.se.conv_expand.weight"] = t(c_mid, c_se, 1, 1)
            sd[f"{p}.se.conv_expand.bias"] = t(c_mid)
            sd[f"{p}.{proj}.weight"] = t(f_out, c_mid, 1, 1)
            bn(f"{p}.{proj_bn}", f_out)
            c_in = f_out
    sd["conv_head.weight"] = t(num_features, c_in, 1, 1)
    return sd


def test_port_b0_state_dict_shapes_and_values():
    import jax
    import jax.numpy as jnp

    sd = build_fake_timm_sd()
    ported = port_efficientnet_state_dict(sd)

    net = EfficientNet(width=1.0, depth=1.0, num_features=1280)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    # every flax param leaf must have a ported counterpart of identical shape
    flat_model = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_port = jax.tree_util.tree_flatten_with_path(ported["params"])[0]
    model_shapes = {jax.tree_util.keystr(k): v.shape for k, v in flat_model}
    port_shapes = {jax.tree_util.keystr(k): v.shape for k, v in flat_port}
    assert model_shapes == port_shapes

    # applying the ported weights runs and differs from random init
    out_rand = net.apply(variables, jnp.ones((1, 64, 64, 3)))
    out_port = net.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        jnp.ones((1, 64, 64, 3)))
    assert out_port["s32"].shape == out_rand["s32"].shape
    assert not np.allclose(np.asarray(out_port["s32"]),
                           np.asarray(out_rand["s32"]))
    # conv_stem kernel transposed correctly (OIHW -> HWIO)
    np.testing.assert_allclose(
        np.asarray(ported["params"]["conv_stem"]["kernel"]),
        sd["conv_stem.weight"].numpy().transpose(2, 3, 1, 0))
