"""Encoding-layer tests: shapes, math oracles, reference-semantics parity."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_interpolation_tpu.encodings import (
    FrequencyEncoding,
    GaussianFourierEncoding,
    HashGridEncoding,
    PRIMES,
    spatial_hash,
)


class TestFrequency:
    def test_output_dim_and_layout(self):
        enc = FrequencyEncoding(dim=2, n_levels=3)
        assert enc.output_dim == 12
        x = jnp.array([[0.5, 0.25]])
        out = np.asarray(enc(x))[0]
        # dim-major layout: [sin(1*x0), sin(2*x0), sin(4*x0), cos(...), then x1]
        expected0 = [math.sin(0.5), math.sin(1.0), math.sin(2.0), math.cos(0.5), math.cos(1.0), math.cos(2.0)]
        np.testing.assert_allclose(out[:6], expected0, rtol=1e-6)
        expected1 = [math.sin(0.25), math.sin(0.5), math.sin(1.0), math.cos(0.25), math.cos(0.5), math.cos(1.0)]
        np.testing.assert_allclose(out[6:], expected1, rtol=1e-6)

    def test_batch_shapes(self):
        enc = FrequencyEncoding(dim=3, n_levels=4)
        out = enc(jnp.zeros((7, 5, 3)))
        assert out.shape == (7, 5, 24)


class TestGaussianFourier:
    def test_semantics(self):
        enc = GaussianFourierEncoding(dim=3, encoded_size=16, sigma=10.0)
        params = enc.init(jax.random.key(0))
        assert params["b"].shape == (16, 3)
        # b stddev ~ sigma
        assert 5.0 < np.std(np.asarray(params["b"])) < 15.0
        x = jnp.array([[0.1, 0.2, 0.3]])
        out = np.asarray(enc.apply(params, x))[0]
        proj = 2 * np.pi * np.asarray(params["b"]) @ np.array([0.1, 0.2, 0.3])
        np.testing.assert_allclose(out, np.concatenate([np.cos(proj), np.sin(proj)]), atol=1e-5)


def numpy_hash_oracle(corner, hashmap_size):
    """Independent uint64->uint32 implementation of the tcnn spatial hash."""
    corner = np.asarray(corner, dtype=np.uint64)
    d = corner.shape[-1]
    primes = np.array(PRIMES[:d], dtype=np.uint64)
    h = (corner * primes) & np.uint64(0xFFFFFFFF)
    out = h[..., 0]
    for i in range(1, d):
        out = out ^ h[..., i]
    return (out % np.uint64(hashmap_size)).astype(np.int64)


class TestSpatialHash:
    @pytest.mark.parametrize("dim", [2, 3, 4])
    def test_matches_numpy_oracle(self, dim, rng):
        corners = rng.integers(0, 1000, size=(100, dim)).astype(np.int32)
        size = 2**15
        got = np.asarray(spatial_hash(jnp.asarray(corners), jnp.asarray([size], dtype=jnp.uint32)))
        expected = numpy_hash_oracle(corners, size)
        np.testing.assert_array_equal(got, expected)

    def test_uint32_wraparound(self):
        # Large corner coords must wrap mod 2^32, matching `& 0xFFFFFFFF`.
        corner = np.array([[100000, 70000]], dtype=np.int32)
        got = np.asarray(spatial_hash(jnp.asarray(corner), jnp.asarray([2**23], dtype=jnp.uint32)))
        np.testing.assert_array_equal(got, numpy_hash_oracle(corner, 2**23))

    def test_dim0_prime_is_identity(self):
        # PRIMES[0] == 1 so 1-D hashing is just modulo.
        corner = np.array([[7], [129]], dtype=np.int32)
        got = np.asarray(spatial_hash(jnp.asarray(corner), jnp.asarray([100], dtype=jnp.uint32)))
        np.testing.assert_array_equal(got, [7, 29])


class TestHashGridGeometry:
    def test_isotropic_reference_growth(self):
        # encoding.py:168-176 semantics: b = exp((ln512 - ln16)/(16-1)).
        enc = HashGridEncoding(dim=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=15,
                               base_resolution=16, finest_resolution=512, storage="hashed")
        b = math.exp((math.log(512) - math.log(16)) / (16 - 1))
        expected = [math.floor(16 * b**l) for l in range(4)]
        np.testing.assert_array_equal(enc.level_resolutions[:, 0], expected)
        for l in range(4):
            assert enc.level_sizes[l] == min(expected[l] ** 3, 2**15)

    def test_anisotropic_v2_growth(self):
        # encoding.py:310-321 semantics, the reference's dyn-MRI config.
        enc = HashGridEncoding(dim=3, n_levels=4, n_features_per_level=1, log2_hashmap_size=23,
                               base_resolution=(64, 64, 5), finest_resolution=(352, 352, 15),
                               storage="hashed")
        bx = math.exp((math.log(352) - math.log(64)) / 63)
        bt = math.exp((math.log(15) - math.log(5)) / 4)
        for l in range(4):
            assert enc.level_resolutions[l, 0] == math.floor(64 * bx**l)
            assert enc.level_resolutions[l, 2] == math.floor(5 * bt**l)
            assert enc.level_sizes[l] == min(int(enc.level_resolutions[l].max()) ** 3, 2**23)

    def test_paper_growth_and_per_level_scale(self):
        paper = HashGridEncoding(dim=2, n_levels=4, base_resolution=16, finest_resolution=128,
                                 growth="paper", log2_hashmap_size=14)
        b = math.exp((math.log(128) - math.log(16)) / 3)
        np.testing.assert_array_equal(paper.level_resolutions[:, 0],
                                      [math.floor(16 * b**l) for l in range(4)])
        tcnn_style = HashGridEncoding(dim=2, n_levels=3, base_resolution=16,
                                      finest_resolution=None, per_level_scale=1.5,
                                      log2_hashmap_size=14)
        np.testing.assert_array_equal(tcnn_style.level_resolutions[:, 0], [16, 24, 36])

    def test_dim_mismatch_raises(self):
        with pytest.raises(ValueError, match="axes but dim"):
            HashGridEncoding(dim=4, n_levels=2, base_resolution=(64, 64, 5), finest_resolution=(352, 352, 15))

    def test_too_many_dims_raises(self):
        with pytest.raises(ValueError, match="at most"):
            HashGridEncoding(dim=8, n_levels=2)


class TestHashGridForward:
    def test_output_shape_and_init_range(self):
        enc = HashGridEncoding(dim=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=14,
                               base_resolution=4, finest_resolution=32)
        params = enc.init(jax.random.key(0))
        assert params["table"].shape == (enc.total_size, 2)
        t = np.asarray(params["table"])
        assert np.all(np.abs(t) <= 1e-4) and t.std() > 0
        out = enc.apply(params, jnp.zeros((10, 3)))
        assert out.shape == (10, 8)

    def test_interpolation_weights_sum_to_one(self):
        enc = HashGridEncoding(dim=3, n_levels=3, base_resolution=4, finest_resolution=16,
                               log2_hashmap_size=10)
        x = jax.random.uniform(jax.random.key(1), (50, 3))
        _, w = enc.corner_ids_and_weights(x)
        np.testing.assert_allclose(np.asarray(w.sum(axis=-1)), 1.0, atol=1e-5)

    def test_grid_point_exact_lookup_hashed(self):
        # At an exact grid point, output == the single hashed corner's feature.
        enc = HashGridEncoding(dim=2, n_levels=1, n_features_per_level=2,
                               base_resolution=4, finest_resolution=4, log2_hashmap_size=10,
                               storage="hashed")
        params = enc.init(jax.random.key(2))
        x = jnp.array([[0.5, 0.75]])  # scaled by res 4 -> corner (2, 3), exact
        expected_row = numpy_hash_oracle(np.array([[2, 3]]), int(enc.level_sizes[0]))[0]
        out = np.asarray(enc.apply(params, x))
        np.testing.assert_allclose(out[0], np.asarray(params["table"])[expected_row], rtol=1e-6)

    def test_grid_point_exact_lookup_dense(self):
        # Dense storage: direct row-major vertex indexing, no hashing.
        enc = HashGridEncoding(dim=2, n_levels=1, n_features_per_level=2,
                               base_resolution=4, finest_resolution=4, log2_hashmap_size=10,
                               storage="dense")
        assert enc.level_dense.all()
        assert enc.level_sizes[0] == 25  # (4+1)^2 vertices, not the 2^10 budget
        params = enc.init(jax.random.key(2))
        x = jnp.array([[0.5, 0.75]])  # corner (2, 3) in a 5x5 vertex grid
        out = np.asarray(enc.apply(params, x))
        np.testing.assert_allclose(out[0], np.asarray(params["table"])[2 * 5 + 3], rtol=1e-6)

    def test_auto_storage_selection(self):
        # small grids go dense; a level whose vertex grid exceeds the budget hashes
        enc = HashGridEncoding(dim=3, n_levels=4, base_resolution=16, finest_resolution=None,
                               per_level_scale=2.0, log2_hashmap_size=15)
        verts = np.prod(enc.level_resolutions.astype(np.int64) + 1, axis=1)
        np.testing.assert_array_equal(enc.level_dense, verts <= 2**15)
        assert enc.level_dense[0] and not enc.level_dense[-1]

    def test_dense_matches_corner_formula(self):
        # apply() must equal the explicit sum over corner_ids_and_weights.
        enc = HashGridEncoding(dim=3, n_levels=3, base_resolution=4, finest_resolution=16,
                               log2_hashmap_size=12)
        params = enc.init(jax.random.key(8))
        x = jax.random.uniform(jax.random.key(9), (40, 3))
        ids, w = enc.corner_ids_and_weights(x)
        expected = jnp.sum(jnp.take(params["table"], ids, axis=0) * w[..., None], axis=-2)
        got = enc.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected).reshape(40, -1), atol=1e-6)

    def test_hashed_matches_corner_formula(self):
        enc = HashGridEncoding(dim=3, n_levels=2, base_resolution=4, finest_resolution=16,
                               log2_hashmap_size=12, storage="hashed")
        params = enc.init(jax.random.key(8))
        x = jax.random.uniform(jax.random.key(9), (40, 3))
        ids, w = enc.corner_ids_and_weights(x)
        expected = jnp.sum(jnp.take(params["table"], ids, axis=0) * w[..., None], axis=-2)
        got = enc.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected).reshape(40, -1), atol=1e-6)

    def test_dense_boundary_in_bounds(self):
        # x == 1.0 exactly must stay in-bounds and interpolate to the far corner.
        enc = HashGridEncoding(dim=2, n_levels=1, n_features_per_level=1,
                               base_resolution=4, finest_resolution=4, log2_hashmap_size=10,
                               storage="dense")
        params = enc.init(jax.random.key(3))
        out = np.asarray(enc.apply(params, jnp.array([[1.0, 1.0]])))
        np.testing.assert_allclose(out[0, 0], np.asarray(params["table"])[4 * 5 + 4, 0], rtol=1e-5)

    def test_dense_force_overflow_raises(self):
        with pytest.raises(ValueError, match="exceeds"):
            HashGridEncoding(dim=3, n_levels=1, base_resolution=100, finest_resolution=100,
                             log2_hashmap_size=10, storage="dense")

    def test_continuity_between_grid_points(self):
        # Multilinear interp: moving epsilon in coords moves output ~linearly.
        enc = HashGridEncoding(dim=2, n_levels=2, base_resolution=4, finest_resolution=8,
                               log2_hashmap_size=12)
        params = enc.init(jax.random.key(3))
        x0 = jnp.array([[0.3, 0.6]])
        eps = 1e-4
        o0 = np.asarray(enc.apply(params, x0))
        o1 = np.asarray(enc.apply(params, x0 + eps))
        assert np.abs(o1 - o0).max() < 1e-5  # small step -> small change

    def test_gradients_flow_to_table(self):
        enc = HashGridEncoding(dim=2, n_levels=2, base_resolution=4, finest_resolution=8,
                               log2_hashmap_size=12)
        params = enc.init(jax.random.key(4))
        x = jax.random.uniform(jax.random.key(5), (20, 2))

        def loss(p):
            return jnp.sum(enc.apply(p, x) ** 2)

        g = jax.grad(loss)(params)["table"]
        assert np.asarray(jnp.abs(g).sum()) > 0
        # Only touched rows get gradient: at most 20 * 2 levels * 4 corners rows.
        assert int((np.asarray(g) != 0).any(axis=1).sum()) <= 20 * 2 * 4

    def test_4d_input(self):
        enc = HashGridEncoding(dim=4, n_levels=2, base_resolution=(8, 8, 4, 4),
                               finest_resolution=(16, 16, 6, 8), log2_hashmap_size=16)
        params = enc.init(jax.random.key(6))
        out = enc.apply(params, jax.random.uniform(jax.random.key(7), (11, 4)))
        assert out.shape == (11, 2 * 2)


class TestCellViewSplit:
    def test_big_dense_levels_match_cellview_path(self):
        """The per-corner gathered path for big dense levels is an execution
        detail: outputs must match the cell-view path exactly."""
        kw = dict(dim=3, n_levels=3, n_features_per_level=2, log2_hashmap_size=20,
                  base_resolution=(8, 8, 4), finest_resolution=(40, 40, 20), growth="paper")
        enc_view = HashGridEncoding(cell_view_max_cells=1 << 30, **kw)   # all cell-view
        enc_split = HashGridEncoding(cell_view_max_cells=4000, **kw)     # finest gathered
        assert enc_split.level_cellview.sum() < enc_split.n_levels
        assert enc_view.level_cellview.all()
        params = enc_view.init(jax.random.key(0))
        x = jax.random.uniform(jax.random.key(1), (777, 3))
        np.testing.assert_allclose(np.asarray(enc_split.apply(params, x)),
                                   np.asarray(enc_view.apply(params, x)), atol=1e-6)

    def test_big_dense_grads_match(self):
        kw = dict(dim=2, n_levels=2, n_features_per_level=2, log2_hashmap_size=16,
                  base_resolution=8, finest_resolution=64)
        enc_view = HashGridEncoding(cell_view_max_cells=1 << 30, **kw)
        enc_split = HashGridEncoding(cell_view_max_cells=100, **kw)
        params = enc_view.init(jax.random.key(2))
        x = jax.random.uniform(jax.random.key(3), (500, 2))
        y = jax.random.normal(jax.random.key(4), (500, enc_view.output_dim))
        g1 = jax.grad(lambda p: jnp.mean((enc_view.apply(p, x) - y) ** 2))(params)["table"]
        g2 = jax.grad(lambda p: jnp.mean((enc_split.apply(p, x) - y) ** 2))(params)["table"]
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)

    def test_flat_and_wide_scatter_layouts_give_identical_grads(self, monkeypatch):
        # the flat element-scatter backward (auto-selected for F>1, big
        # tables, big id counts — a measured TPU cliff workaround, round 5)
        # must be gradient-identical to the wide row-scatter
        kw = dict(dim=3, n_levels=2, n_features_per_level=2,
                  log2_hashmap_size=14, base_resolution=4, finest_resolution=24)
        enc = HashGridEncoding(cell_view_max_cells=10, **kw)
        assert not enc.level_cellview.all()
        params = enc.init(jax.random.key(5))
        x = jax.random.uniform(jax.random.key(6), (400, 3))
        y = jax.random.normal(jax.random.key(7), (400, enc.output_dim))

        def grad_with(layout):
            monkeypatch.setenv("MRI_TPU_SCATTER_LAYOUT", layout)
            return jax.grad(
                lambda p: jnp.mean((enc.apply(p, x) - y) ** 2))(params)["table"]

        g_wide, g_flat = grad_with("wide"), grad_with("flat")
        assert not np.allclose(np.asarray(g_wide), 0.0)
        np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_wide),
                                   atol=1e-7)


class TestPacked4D:
    @pytest.mark.slow
    def test_4d_mixed_levels_grads_and_values(self):
        """4D (C=16) packed path: values and grads match an all-cell-view
        reference encoder."""
        kw = dict(dim=4, n_levels=3, n_features_per_level=2, log2_hashmap_size=18,
                  base_resolution=(4, 4, 2, 2), finest_resolution=(14, 14, 5, 6),
                  growth="paper")
        enc_ref = HashGridEncoding(cell_view_max_cells=1 << 30, **kw)
        enc_split = HashGridEncoding(cell_view_max_cells=200, **kw)
        assert not enc_split.level_cellview.all()
        params = enc_ref.init(jax.random.key(0))
        x = jax.random.uniform(jax.random.key(1), (300, 4))
        np.testing.assert_allclose(np.asarray(enc_split.apply(params, x)),
                                   np.asarray(enc_ref.apply(params, x)), atol=1e-6)
        y = jax.random.normal(jax.random.key(2), (300, enc_ref.output_dim))
        g1 = jax.grad(lambda p: jnp.mean((enc_ref.apply(p, x) - y) ** 2))(params)["table"]
        g2 = jax.grad(lambda p: jnp.mean((enc_split.apply(p, x) - y) ** 2))(params)["table"]
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)

    def test_4d_hashed_packed_matches_reference_storage(self):
        enc = HashGridEncoding(dim=4, n_levels=2, n_features_per_level=1,
                               log2_hashmap_size=8, base_resolution=4,
                               finest_resolution=16, storage="hashed")
        params = enc.init(jax.random.key(3))
        x = jax.random.uniform(jax.random.key(4), (200, 4))
        out = enc.apply(params, x)
        assert out.shape == (200, 2)
        # independent check of one (voxel, level, corner) contribution
        ids, w = enc.corner_ids_and_weights(x)
        table = np.asarray(params["table"])
        manual = (table[np.asarray(ids[0, 0])][:, 0] * np.asarray(w[0, 0])).sum()
        np.testing.assert_allclose(float(out[0, 0]), manual, rtol=1e-5)


@pytest.mark.slow
class TestApplyGrid:
    """Separable regular-grid evaluation must equal the per-voxel oracle."""

    @pytest.mark.parametrize("cfg", [
        dict(dim=2, n_levels=3, n_features_per_level=2, log2_hashmap_size=12,
             base_resolution=(3, 2), finest_resolution=(17, 9)),
        dict(dim=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=17,
             base_resolution=(4, 4, 2), finest_resolution=(20, 20, 10)),
        dict(dim=4, n_levels=2, n_features_per_level=1, log2_hashmap_size=14,
             base_resolution=(3, 3, 2, 2), finest_resolution=(9, 9, 5, 6)),
    ])
    def test_matches_apply_on_grid_coords(self, cfg):
        from mri_interpolation_tpu.io import flat_coords

        enc = HashGridEncoding(storage="dense", **cfg)
        assert enc.supports_grid_path()
        params = enc.init(jax.random.key(0))
        shape = tuple(5 + i for i in range(cfg["dim"]))
        got = np.asarray(enc.apply_grid(params, shape))
        want = np.asarray(enc.apply(params, jnp.asarray(flat_coords(shape))))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_upsampled_grid(self):
        from mri_interpolation_tpu.io import flat_coords

        enc = HashGridEncoding(dim=3, n_levels=3, n_features_per_level=2,
                               log2_hashmap_size=14, base_resolution=(4, 4, 2),
                               finest_resolution=(16, 16, 8), storage="dense")
        params = enc.init(jax.random.key(1))
        shape = (23, 31, 17)  # finer than every level resolution
        got = np.asarray(enc.apply_grid(params, shape))
        want = np.asarray(enc.apply(params, jnp.asarray(flat_coords(shape))))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rejects_hashed_levels(self):
        enc = HashGridEncoding(dim=3, n_levels=2, n_features_per_level=1,
                               log2_hashmap_size=6, base_resolution=4,
                               finest_resolution=32, storage="hashed")
        assert not enc.supports_grid_path()
        with pytest.raises(ValueError, match="dense"):
            enc.apply_grid(enc.init(jax.random.key(0)), (8, 8, 8))
