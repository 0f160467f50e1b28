"""Ray sampler tests: statistical + structural properties of the PrSamp samplers
(contract: ref scenerf/models/utils.py:52-229, scenerf.py:549-659)."""
import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu import sampling as S


def make_inv_K():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], dtype=np.float32)
    return jnp.asarray(np.linalg.inv(K))


def test_uniform_distances_stratified():
    key = jax.random.PRNGKey(0)
    sd = S.uniform_sensor_distances(key, 100, 32, 0.2, 100.0)
    assert sd.shape == (100, 32)
    step = (100.0 - 0.2) / 32
    base = np.linspace(0.2, 100.0, 32)
    d = np.asarray(sd) - base[None, :]
    assert (d >= 0).all() and (d <= step + 1e-5).all()


def test_row_noise_slice_is_bit_exact():
    """row_noise with full_rows/row_offset returns EXACTLY the rows of the
    full draw -- the RNG contract behind chunk/shard-invariant rendering."""
    key = jax.random.PRNGKey(3)
    full = np.asarray(S.row_noise(key, 64, 8))
    for off in (0, 16, 48):
        part = np.asarray(S.row_noise(key, 16, 8, full_rows=64, row_offset=off))
        np.testing.assert_array_equal(part, full[off:off + 16])
    # traced offset (the shard_map / lax.map case)
    part = np.asarray(jax.jit(
        lambda o: S.row_noise(key, 16, 8, full_rows=64, row_offset=o)
    )(jnp.int32(32)))
    np.testing.assert_array_equal(part, full[32:48])
    # normal-dist draws too (gaussian sampler + reprojection tie-break noise)
    fulln = np.asarray(S.row_noise(key, 64, 4, dist="normal"))
    partn = np.asarray(
        S.row_noise(key, 32, 4, full_rows=64, row_offset=16, dist="normal"))
    np.testing.assert_array_equal(partn, fulln[16:48])


def test_row_noise_prefix_property():
    """Threefry draws are counter-indexed flat: noise at global row r depends
    only on (key, r, n_cols), NOT on how many total rows are drawn. Eval
    sharding relies on this (different pad totals, same real-row noise);
    this guards the property across JAX upgrades."""
    key = jax.random.PRNGKey(7)
    small = np.asarray(S.row_noise(key, 16, 8))
    big = np.asarray(S.row_noise(key, 64, 8))
    np.testing.assert_array_equal(small, big[:16])


def test_uniform_distances_slice_matches_full():
    key = jax.random.PRNGKey(4)
    full = np.asarray(S.uniform_sensor_distances(key, 64, 8, 0.2, 50.0))
    part = np.asarray(S.uniform_sensor_distances(
        key, 16, 8, 0.2, 50.0, full_rows=64, row_offset=32))
    np.testing.assert_array_equal(part, full[32:48])


def test_log_distances_range():
    key = jax.random.PRNGKey(1)
    sd = np.asarray(S.log_sensor_distances(key, 50, 16, 0.2, 100.0))
    assert sd.min() >= -1.0 and sd.max() <= 100.0 + 1e-3


def test_weighted_uniform_focuses_mass():
    key = jax.random.PRNGKey(2)
    w = jnp.zeros((1, 10)).at[0, 7].set(100.0)  # all weight in bin 7
    sd = np.asarray(S.weighted_uniform_sensor_distances(key, w, 512, 0.0, 10.0))
    frac_in_bin = ((sd >= 7.0) & (sd < 8.0)).mean()
    assert frac_in_bin > 0.9


def test_weighted_uniform_shard_invariant():
    """weighted_uniform draws per-GLOBAL-ray noise like every other sampler
    (VERDICT r4 weak 5): a sharded slice equals the same rows of the full
    draw when given that shard's weights."""
    key = jax.random.PRNGKey(4)
    w = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1.0, (64, 10)))
    full = np.asarray(S.weighted_uniform_sensor_distances(
        key, w, 8, 0.0, 10.0, full_rows=64, row_offset=0))
    part = np.asarray(S.weighted_uniform_sensor_distances(
        key, w[32:48], 8, 0.0, 10.0, full_rows=64, row_offset=32))
    np.testing.assert_array_equal(part, full[32:48])


def test_sample_rays_uniform_shapes_and_frames():
    key = jax.random.PRNGKey(3)
    inv_K = make_inv_K()
    pix = jnp.asarray([[32.0, 24.0], [10.0, 5.0]])
    T = jnp.asarray(np.eye(4, dtype=np.float32)).at[2, 3].set(1.5)
    pts, dv, sd, viewdir = S.sample_rays_uniform(key, pix, inv_K, T, 8, 0.2, 50.0)
    assert pts.shape == (2, 8, 3) and dv.shape == (2, 8) and sd.shape == (2, 8)
    # principal-point ray: direction (0,0,1); depth_volume == sensor_distance
    np.testing.assert_allclose(np.asarray(dv[0]), np.asarray(sd[0]), rtol=1e-5)
    # infer-frame point = source point + (0,0,1.5)
    np.testing.assert_allclose(np.asarray(pts[0, :, 2]),
                               np.asarray(sd[0]) + 1.5, rtol=1e-5)
    # viewdir is unnormalized inv_K @ (x,y,1) rotated (identity rotation here)
    np.testing.assert_allclose(np.asarray(viewdir[0]), [0, 0, 1], atol=1e-6)


def test_gaussian_sampler_clamps_and_centers():
    key = jax.random.PRNGKey(4)
    unit_dir = jnp.asarray([[0.0, 0.0, 1.0]])
    means = jnp.asarray([[5.0, 50.0]])
    stds = jnp.asarray([[0.01, 0.01]])
    T = jnp.asarray(np.eye(4, dtype=np.float32))
    pts, dv, sd = S.sample_rays_gaussian(key, unit_dir, T, means, stds, 4)
    assert sd.shape == (1, 8)
    got = np.asarray(sd[0])
    np.testing.assert_allclose(got[:4], 5.0, atol=0.1)
    np.testing.assert_allclose(got[4:], 50.0, atol=0.1)
    # heavy negative mean clamps at 0.1
    pts, dv, sd = S.sample_rays_gaussian(
        key, unit_dir, T, jnp.asarray([[-5.0, -5.0]]), jnp.asarray([[0.1, 0.1]]), 4)
    assert (np.asarray(sd) == 0.1).all()


def test_gaussian_anchors():
    a = np.asarray(S.gaussian_anchor_distances(4, 100.0))
    np.testing.assert_allclose(a, [12.5, 37.5, 62.5, 87.5], rtol=1e-6)


def test_sort_samples():
    sd = jnp.asarray([[3.0, 1.0, 2.0]])
    dv = jnp.asarray([[30.0, 10.0, 20.0]])
    pts = jnp.asarray([[[3, 3, 3], [1, 1, 1], [2, 2, 2]]], dtype=jnp.float32)
    sd2, dv2, pts2 = S.sort_samples_by_distance(sd, dv, pts)
    np.testing.assert_allclose(np.asarray(sd2[0]), [1, 2, 3])
    np.testing.assert_allclose(np.asarray(dv2[0]), [10, 20, 30])
    np.testing.assert_allclose(np.asarray(pts2[0, :, 0]), [1, 2, 3])


def test_random_grid_pixels_on_stride_grid():
    key = jax.random.PRNGKey(5)
    pix = np.asarray(S.random_grid_pixels(key, 100, 64, 48, stride=2))
    assert pix.shape == (100, 2)
    assert (pix % 2 == 0).all()
    assert pix[:, 0].max() < 64 and pix[:, 1].max() < 48
    # no duplicate pixels (sampling without replacement)
    assert len({(x, y) for x, y in pix}) == 100


def test_random_grid_pixels_grid_cells():
    key = jax.random.PRNGKey(6)
    pix = np.asarray(S.random_grid_pixels(key, 64, 64, 64, stride=2, grid_size=2))
    assert pix.shape == (64, 2)
    # each quadrant gets 16 pixels
    quad = (pix[:, 0] >= 32).astype(int) * 2 + (pix[:, 1] >= 32).astype(int)
    counts = np.bincount(quad, minlength=4)
    assert (counts == 16).all()
