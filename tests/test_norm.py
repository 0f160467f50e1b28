"""FusedBatchNorm vs flax nn.BatchNorm parity (fwd, grad, stats, sync)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenerf_tpu.encoder.norm import FusedBatchNorm


def _pair(dtype, use_ra):
    fused = FusedBatchNorm(use_running_average=use_ra, momentum=0.9,
                           epsilon=1e-5, dtype=dtype)
    ref = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                       epsilon=1e-5, dtype=dtype)
    return fused, ref


def _init(mod, x):
    return mod.init(jax.random.PRNGKey(0), x)


def _rand_vars(key, C):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "params": {"scale": jax.random.normal(k1, (C,)) * 0.2 + 1.0,
                   "bias": jax.random.normal(k2, (C,)) * 0.1},
        "batch_stats": {"mean": jax.random.normal(k3, (C,)) * 0.5,
                        "var": jax.nn.softplus(jax.random.normal(k4, (C,))) + 0.3},
    }


@pytest.mark.parametrize("use_ra", [False, True])
def test_forward_parity_f32(use_ra):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 9, 5)) * 3 + 1
    fused, ref = _pair(jnp.float32, use_ra)
    v = _rand_vars(jax.random.PRNGKey(2), 5)
    kw = {} if use_ra else {"mutable": ["batch_stats"]}
    ya = fused.apply(v, x, **kw)
    yb = ref.apply(v, x, **kw)
    if not use_ra:
        (ya, sa), (yb, sb) = ya, yb
        np.testing.assert_allclose(sa["batch_stats"]["mean"],
                                   sb["batch_stats"]["mean"], rtol=1e-6)
        np.testing.assert_allclose(sa["batch_stats"]["var"],
                                   sb["batch_stats"]["var"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-5)


def test_grad_parity_f32():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 8, 4)) * 2
    fused, ref = _pair(jnp.float32, False)
    v = _rand_vars(jax.random.PRNGKey(4), 4)

    def loss(mod):
        def f(params, xx):
            y, _ = mod.apply({"params": params,
                              "batch_stats": v["batch_stats"]}, xx,
                             mutable=["batch_stats"])
            return jnp.sum(jnp.sin(y))
        return f

    ga_p, ga_x = jax.grad(loss(fused), argnums=(0, 1))(v["params"], x)
    gb_p, gb_x = jax.grad(loss(ref), argnums=(0, 1))(v["params"], x)
    np.testing.assert_allclose(ga_x, gb_x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ga_p["scale"], gb_p["scale"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ga_p["bias"], gb_p["bias"], rtol=1e-4, atol=1e-5)


def test_bf16_stays_bf16_and_close_to_f32():
    x = (jax.random.normal(jax.random.PRNGKey(5), (2, 6, 8, 4)) * 2).astype(jnp.bfloat16)
    fused, _ = _pair(jnp.bfloat16, False)
    v = _rand_vars(jax.random.PRNGKey(6), 4)
    y, st = fused.apply(v, x, mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    # batch stats still f32 and accurate
    assert st["batch_stats"]["mean"].dtype == jnp.float32
    f32fused, _ = _pair(jnp.float32, False)
    y32, _ = f32fused.apply(v, x.astype(jnp.float32), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y, np.float32), y32, atol=0.1)


def test_axis_name_sync_matches_global_batch():
    """Sync-BN over the mesh == BN over the concatenated batch."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()[:4]
    if len(devs) < 4:
        pytest.skip("needs >=4 devices")
    mesh = Mesh(np.array(devs), ("data",))
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 5, 6, 3)) * 2
    synced = FusedBatchNorm(use_running_average=False, momentum=0.9,
                            epsilon=1e-5, axis_name="data")
    v = _rand_vars(jax.random.PRNGKey(8), 3)

    def per_shard(xx):
        y, st = synced.apply(v, xx, mutable=["batch_stats"])
        return y, st["batch_stats"]["mean"], st["batch_stats"]["var"]

    y, m, s = jax.jit(shard_map(per_shard, mesh=mesh,
                                in_specs=P("data"),
                                out_specs=(P("data"), P(), P())))(x)
    plain = FusedBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    y_ref, st_ref = plain.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m, st_ref["batch_stats"]["mean"], rtol=1e-6)
    np.testing.assert_allclose(s, st_ref["batch_stats"]["var"], rtol=1e-5, atol=1e-6)
