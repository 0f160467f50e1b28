"""ops/gather_scatter.bilinear_sample_w2 vs geometry.bilinear_sample:
values and gradients (img AND coords) must match bit-for-bit in f32,
including out-of-bounds and exact-boundary coordinates."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenerf_tpu import geometry as geo
from scenerf_tpu.ops.gather_scatter import bilinear_sample_w2


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def coords_cases(H, W, rng, n=400):
    ix = rng.uniform(-2.5, W + 1.5, size=n).astype(np.float32)
    iy = rng.uniform(-2.5, H + 1.5, size=n).astype(np.float32)
    # exact boundary / integer / clamp-edge cases
    ix[:10] = [-1.0, -0.5, 0.0, 0.25, W - 2.0, W - 1.5, W - 1.0, W - 0.5,
               float(W), 3.0]
    iy[:10] = [0.0, -1.0, H - 1.0, H - 0.5, float(H), 2.0, -0.25, 1.5,
               H - 2.0, H - 1.25]
    return jnp.asarray(ix), jnp.asarray(iy)


def test_forward_matches_taps(rng):
    H, W, C = 13, 17, 5
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    ix, iy = coords_cases(H, W, rng)
    got = bilinear_sample_w2(img, ix, iy)
    want = geo.bilinear_sample(img, ix, iy)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gradients_match_taps(rng):
    H, W, C = 11, 9, 4
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    ix, iy = coords_cases(H, W, rng, n=200)
    cot = jnp.asarray(rng.normal(size=(200, C)).astype(np.float32))

    def loss_w2(img, ix, iy):
        return jnp.sum(bilinear_sample_w2(img, ix, iy) * cot)

    def loss_taps(img, ix, iy):
        return jnp.sum(geo.bilinear_sample(img, ix, iy) * cot)

    g_w2 = jax.grad(loss_w2, argnums=(0, 1, 2))(img, ix, iy)
    g_tp = jax.grad(loss_taps, argnums=(0, 1, 2))(img, ix, iy)
    np.testing.assert_allclose(np.asarray(g_w2[0]), np.asarray(g_tp[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_w2[1]), np.asarray(g_tp[1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_w2[2]), np.asarray(g_tp[2]),
                               rtol=1e-5, atol=1e-5)


def test_bf16_forward_close(rng):
    H, W, C = 12, 16, 8
    img = jnp.asarray(rng.normal(size=(H, W, C)), jnp.bfloat16)
    ix, iy = coords_cases(H, W, rng, n=100)
    got = np.asarray(bilinear_sample_w2(img, ix, iy), np.float32)
    want = np.asarray(geo.bilinear_sample(img, ix, iy), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_jit_and_vjp_compile(rng):
    H, W, C = 8, 8, 3
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    ix, iy = coords_cases(H, W, rng, n=50)
    f = jax.jit(lambda *a: jnp.sum(bilinear_sample_w2(*a)))
    g = jax.jit(jax.grad(lambda *a: jnp.sum(bilinear_sample_w2(*a))))
    assert np.isfinite(float(f(img, ix, iy)))
    assert np.isfinite(np.asarray(g(img, ix, iy)).sum())


def test_mm_forward_is_bit_identical(rng):
    """The mm forward IS geometry.bilinear_sample (same call)."""
    from scenerf_tpu.ops.gather_scatter import bilinear_sample_mm

    H, W, C = 13, 17, 5
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    ix, iy = coords_cases(H, W, rng)
    got = bilinear_sample_mm(img, ix, iy)
    want = geo.bilinear_sample(img, ix, iy)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("hw", ["small", "large"])
def test_mm_gradients_match_taps(rng, hw):
    """Both mm backward branches -- the one-hot matmul (HW <= threshold) and
    the scatter fallback -- must match autodiff of the taps path, including
    OOB and exact-boundary coords."""
    from scenerf_tpu.ops import gather_scatter as gs

    if hw == "small":
        H, W, C = 11, 9, 4          # HW = 99 <= MM_BWD_MAX_ROWS
        assert H * W <= gs.MM_BWD_MAX_ROWS
    else:
        H, W, C = 80, 64, 4         # HW = 5120 > MM_BWD_MAX_ROWS
        assert H * W > gs.MM_BWD_MAX_ROWS
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    ix, iy = coords_cases(H, W, rng, n=200)
    cot = jnp.asarray(rng.normal(size=(200, C)).astype(np.float32))

    def loss_mm(img, ix, iy):
        return jnp.sum(gs.bilinear_sample_mm(img, ix, iy) * cot)

    def loss_taps(img, ix, iy):
        return jnp.sum(geo.bilinear_sample(img, ix, iy) * cot)

    g_mm = jax.grad(loss_mm, argnums=(0, 1, 2))(img, ix, iy)
    g_tp = jax.grad(loss_taps, argnums=(0, 1, 2))(img, ix, iy)
    # d_img: the matmul branch accumulates in f32 through a different sum
    # order than the scatter chain -- allclose, not equal
    np.testing.assert_allclose(np.asarray(g_mm[0]), np.asarray(g_tp[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_mm[1]), np.asarray(g_tp[1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_mm[2]), np.asarray(g_tp[2]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", ["small", "large"])
def test_mmseg_gradients_match_taps(rng, hw):
    """mmseg: small maps take the mm matmul branch; large maps take the
    sorted-segment-sum backward. Both must match autodiff of taps."""
    from scenerf_tpu.ops import gather_scatter as gs

    if hw == "small":
        H, W, C = 11, 9, 4
    else:
        H, W, C = 80, 64, 4
        assert H * W > gs.MM_BWD_MAX_ROWS
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    ix, iy = coords_cases(H, W, rng, n=200)
    cot = jnp.asarray(rng.normal(size=(200, C)).astype(np.float32))

    g_sg = jax.grad(lambda *a: jnp.sum(gs.bilinear_sample_mmseg(*a) * cot),
                    argnums=(0, 1, 2))(img, ix, iy)
    g_tp = jax.grad(lambda *a: jnp.sum(geo.bilinear_sample(*a) * cot),
                    argnums=(0, 1, 2))(img, ix, iy)
    for a, b in zip(g_sg, g_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_seg_d_flat_heavy_duplicates(rng):
    """Segment sum with many entries hitting the same row (the cumsum-diff
    precision case) stays within f32 cancellation bounds."""
    from scenerf_tpu.ops.gather_scatter import _seg_d_flat

    N, C, HW = 4096, 8, 16
    rows = jnp.asarray(rng.integers(0, HW, (4, N)), jnp.int32)
    wts = jnp.asarray(rng.uniform(0, 1, (4, N)).astype(np.float32))
    gf = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    got = np.asarray(_seg_d_flat(rows, wts, gf, HW))
    want = np.zeros((HW, C), np.float64)
    gn = np.asarray(gf, np.float64)
    for t in range(4):
        for n in range(N):
            want[int(rows[t, n])] += float(wts[t, n]) * gn[n]
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_seg_c_chunking_matches_whole(rng):
    """The C-chunked cumsum path (memory cap) equals the single-shot path."""
    from scenerf_tpu.ops import gather_scatter as gs

    N, C, HW = 500, 12, 64
    rows = jnp.asarray(rng.integers(0, HW, (4, N)), jnp.int32)
    wts = jnp.asarray(rng.uniform(0, 1, (4, N)).astype(np.float32))
    gf = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    whole = np.asarray(gs._seg_d_flat(rows, wts, gf, HW))
    old = gs._SEG_CUM_BYTES
    gs._SEG_CUM_BYTES = 4 * (4 * N + 1) * 4  # force c_chunk = 4
    try:
        chunked = np.asarray(gs._seg_d_flat(rows, wts, gf, HW))
    finally:
        gs._SEG_CUM_BYTES = old
    np.testing.assert_allclose(chunked, whole, rtol=1e-6, atol=1e-6)


def test_mm_bwd_n_block_padding(rng):
    """N not divisible by the scan block still yields exact grads (padded
    rows carry weight 0 and row -1, matching no output row)."""
    from scenerf_tpu.ops import gather_scatter as gs

    H, W, C = 7, 9, 3
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    ix, iy = coords_cases(H, W, rng, n=37)
    cot = jnp.asarray(rng.normal(size=(37, C)).astype(np.float32))
    old = gs._MM_N_BLK
    gs._MM_N_BLK = 16   # force nblk > 1 with a ragged tail
    try:
        g_mm = jax.grad(lambda im: jnp.sum(
            gs.bilinear_sample_mm(im, ix, iy) * cot))(img)
    finally:
        gs._MM_N_BLK = old
    g_tp = jax.grad(lambda im: jnp.sum(
        geo.bilinear_sample(im, ix, iy) * cot))(img)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_tp),
                               rtol=1e-5, atol=1e-5)


def test_model_forward_mm_matches_taps():
    """Full SceneRF loss + grads match between taps and mm featurize
    (bit-identical forward; backward differs only in d_img sum order)."""
    from scenerf_tpu import config as C
    from scenerf_tpu.data.synthetic import make_batch
    from scenerf_tpu.model import SceneRF

    cfg_t = C.tiny()
    cfg_m = cfg_t.replace(featurize_gather="mm")
    m_t, m_m = SceneRF(cfg_t), SceneRF(cfg_m)
    variables = m_t.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg_t, 1).items()}
    key = jax.random.PRNGKey(1)

    def loss_fn(model):
        def f(params):
            v = dict(variables)
            v["mlp"] = params
            loss, _, _ = model.forward(v, batch, key, train=False,
                                       with_depth_eval=False)
            return loss
        return f

    lt, gt = jax.value_and_grad(loss_fn(m_t))(variables["mlp"])
    lm, gm = jax.value_and_grad(loss_fn(m_m))(variables["mlp"])
    np.testing.assert_allclose(float(lt), float(lm), rtol=1e-6)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(gt)[0],
            jax.tree_util.tree_flatten_with_path(gm)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(kp))


def test_model_forward_win2_matches_taps():
    """Full SceneRF forward loss matches between featurize_gather impls to
    float-ulp level (f32 tiny config; XLA's FMA/fusion choices differ between
    the two programs, so exact bit-equality only holds op-level)."""
    from scenerf_tpu import config as C
    from scenerf_tpu.data.synthetic import make_batch
    from scenerf_tpu.model import SceneRF

    cfg_t = C.tiny()
    cfg_w = cfg_t.replace(featurize_gather="win2")
    m_t, m_w = SceneRF(cfg_t), SceneRF(cfg_w)
    variables = m_t.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg_t, 1).items()}
    key = jax.random.PRNGKey(1)
    lt, mt, _ = m_t.forward(variables, batch, key, train=False,
                            with_depth_eval=False)
    lw, mw, _ = m_w.forward(variables, batch, key, train=False,
                            with_depth_eval=False)
    np.testing.assert_allclose(float(lt), float(lw), rtol=1e-6)
    for k in mt:
        np.testing.assert_allclose(np.asarray(mt[k]), np.asarray(mw[k]),
                                   rtol=1e-5, atol=1e-6)
