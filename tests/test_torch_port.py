"""Weight-porting tests: synthesize timm-layout torch state dicts (B0 and the
full 55-block B7 tree), port them, and verify the flax backbone consumes them
exactly -- including forward parity against an independent torch
reimplementation of the gen-efficientnet semantics (TF same padding, swish,
SE, BN eval; ref scenerf/models/unet2d_sphere.py:209-222 tap indices)."""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

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


# --------------------------------------------------------------------------- #
# torch oracle: independent forward of the gen-efficientnet semantics
# --------------------------------------------------------------------------- #


def _conv2d_same(x, w, stride=1, groups=1):
    """TF-style SAME padding (asymmetric, extra on bottom/right) -- the `tf_`
    timm variants use Conv2dSame; flax padding="SAME" has the same rule."""
    ih, iw = x.shape[-2:]
    kh, kw = w.shape[-2:]
    ph = max((math.ceil(ih / stride) - 1) * stride + kh - ih, 0)
    pw = max((math.ceil(iw / stride) - 1) * stride + kw - iw, 0)
    x = tF.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
    return tF.conv2d(x, w, stride=stride, groups=groups)


def torch_effnet_forward(sd, x, depth):
    """Eval-mode forward of the timm-layout state dict; returns the tap dict
    the spherical decoder consumes (stage 0/1/2/4 outputs + conv_head pre-BN,
    ref unet2d_sphere.py:167-177 indexing features[0,4,5,6,8,11])."""
    def bn(h, p):
        return tF.batch_norm(h, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
                             sd[f"{p}.weight"], sd[f"{p}.bias"],
                             training=False, eps=1e-3)

    def swish(h):
        return h * torch.sigmoid(h)

    taps = {"s1": x}
    h = swish(bn(_conv2d_same(x, sd["conv_stem.weight"], stride=2), "bn1"))
    tap_names = {0: "s2", 1: "s4", 2: "s8", 4: "s16"}
    for si, (expand, kernel, stride, base_f, base_r) in enumerate(_STAGES):
        for bi in range(round_repeats(base_r, depth)):
            p = f"blocks.{si}.{bi}"
            s = stride if bi == 0 else 1
            inp = h
            if expand != 1:
                h = swish(bn(tF.conv2d(h, sd[f"{p}.conv_pw.weight"]),
                             f"{p}.bn1"))
                h = swish(bn(_conv2d_same(h, sd[f"{p}.conv_dw.weight"],
                                          stride=s, groups=h.shape[1]),
                             f"{p}.bn2"))
                proj, pbn = "conv_pwl", "bn3"
            else:
                h = swish(bn(_conv2d_same(h, sd[f"{p}.conv_dw.weight"],
                                          stride=s, groups=h.shape[1]),
                             f"{p}.bn1"))
                proj, pbn = "conv_pw", "bn2"
            se = h.mean((2, 3), keepdim=True)
            se = swish(tF.conv2d(se, sd[f"{p}.se.conv_reduce.weight"],
                                 sd[f"{p}.se.conv_reduce.bias"]))
            se = torch.sigmoid(tF.conv2d(se, sd[f"{p}.se.conv_expand.weight"],
                                         sd[f"{p}.se.conv_expand.bias"]))
            h = h * se
            h = bn(tF.conv2d(h, sd[f"{p}.{proj}.weight"]), f"{p}.{pbn}")
            if s == 1 and inp.shape[1] == h.shape[1]:
                h = h + inp
        if si in tap_names:
            taps[tap_names[si]] = h
    taps["s32"] = tF.conv2d(h, sd["conv_head.weight"])
    return taps


@pytest.mark.parametrize("variant,width,depth,nf", [
    ("b0", 1.0, 1.0, 1280),
    ("b7", 2.0, 3.1, 2560),   # the full 55-block reference tree
])
def test_ported_backbone_matches_torch_forward(variant, width, depth, nf):
    import jax
    import jax.numpy as jnp

    sd = build_fake_timm_sd(width=width, depth=depth, num_features=nf, seed=3)
    # He-ish scaling so 55 random blocks keep unit-ish activations (the fake
    # BN running stats are random, so unscaled convs would blow up to inf)
    sd = {k: v / math.sqrt(v[0].numel()) if v.dim() == 4 else v
          for k, v in sd.items()}

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_effnet_forward(
            sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), depth)

    ported = port_efficientnet_state_dict(sd)
    net = EfficientNet(width=width, depth=depth, num_features=nf, remat=False)
    got = net.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        jnp.asarray(x))

    for k in ("s2", "s4", "s8", "s16", "s32"):
        w = want[k].numpy().transpose(0, 2, 3, 1)
        g = np.asarray(got[k])
        assert np.isfinite(w).all() and np.isfinite(g).all(), k
        scale = np.abs(w).max() + 1e-6
        np.testing.assert_allclose(g / scale, w / scale, atol=2e-4,
                                   err_msg=f"{variant}:{k}")


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


def test_partial_remat_int_matches_full_remat_grads():
    """ADVICE r4: int remat (partial: stages 0..k-1) is identical math to
    full/no remat -- outputs and grads must agree; bool/int must not be
    conflated (remat=1 == True in Python) and out-of-range ints fail loudly."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))

    def loss_and_grads(remat):
        net = EfficientNet(width=1.0, depth=1.0, num_features=64, remat=remat)
        variables = net.init(jax.random.PRNGKey(0), x)

        def loss_fn(p):
            taps = net.apply({**variables, "params": p}, x)
            return sum(jnp.sum(t ** 2) for t in taps.values())

        return jax.value_and_grad(loss_fn)(variables["params"])

    base_l, base_g = loss_and_grads(True)
    for remat in (1, 3, False):
        l, g = loss_and_grads(remat)
        np.testing.assert_allclose(float(l), float(base_l), rtol=1e-6)
        for (pa, a), (pb, b) in zip(jax.tree_util.tree_leaves_with_path(base_g),
                                    jax.tree_util.tree_leaves_with_path(g)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6, err_msg=str(pa))

    with pytest.raises(ValueError, match="remat"):
        loss_and_grads(len(_STAGES) + 1)
    with pytest.raises(ValueError, match="remat"):
        loss_and_grads(-1)
