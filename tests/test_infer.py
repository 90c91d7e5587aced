"""Inference tests: on-device coordinate synthesis, grid eval, classical baseline."""

import jax.numpy as jnp
import numpy as np
import pytest

from mri_interpolation_tpu.infer import (
    evaluate_grid,
    flat_index_to_coords,
    linear_interpolate_volume,
    predict_batched,
)
from mri_interpolation_tpu.io import flat_coords, synthetic_volume
from mri_interpolation_tpu.models import make_siren
import jax


class TestFlatIndexToCoords:
    @pytest.mark.parametrize("shape", [(5, 7), (4, 3, 6), (3, 4, 2, 5)])
    def test_matches_meshgrid(self, shape):
        n = int(np.prod(shape))
        got = np.asarray(flat_index_to_coords(jnp.arange(n), shape))
        expected = flat_coords(shape)
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_custom_range(self):
        got = np.asarray(flat_index_to_coords(jnp.arange(6), (2, 3), lo=-1.0, hi=1.0))
        expected = flat_coords((2, 3), lo=-1.0)
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestEvaluateGrid:
    def test_matches_direct_apply(self):
        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        params, state = model.init(jax.random.key(0))
        shape = (9, 10, 11)
        vol = evaluate_grid(model, params, state, shape, chunk_size=128)
        assert vol.shape == shape
        coords = flat_coords(shape)
        direct, _ = model.apply(params, state, jnp.asarray(coords))
        np.testing.assert_allclose(vol.reshape(-1), np.asarray(direct)[:, 0], atol=1e-5)

    def test_nondivisible_chunking(self):
        model = make_siren(dim_in=2, dim_hidden=8, n_layers=2)
        params, state = model.init(jax.random.key(1))
        vol = evaluate_grid(model, params, state, (7, 13), chunk_size=32)  # 91 % 32 != 0
        assert vol.shape == (7, 13)

    def test_predict_batched_matches(self):
        model = make_siren(dim_in=2, dim_hidden=8, n_layers=2)
        params, state = model.init(jax.random.key(2))
        coords = flat_coords((6, 6))
        out = predict_batched(model, params, state, coords, chunk_size=10)
        direct, _ = model.apply(params, state, jnp.asarray(coords))
        np.testing.assert_allclose(out, np.asarray(direct), atol=1e-6)


class TestClassicalBaseline:
    def test_identity_resample(self):
        vol = synthetic_volume((6, 6, 6), seed=0)
        out = linear_interpolate_volume(vol, (6, 6, 6))
        np.testing.assert_allclose(out, vol, atol=1e-5)

    def test_upsample_endpoints_exact(self):
        vol = synthetic_volume((4, 4), seed=1)
        out = linear_interpolate_volume(vol, (7, 7))
        np.testing.assert_allclose(out[0, 0], vol[0, 0], atol=1e-6)
        np.testing.assert_allclose(out[-1, -1], vol[-1, -1], atol=1e-6)
        # odd midpoints are averages of neighbors along the axis
        np.testing.assert_allclose(out[1, 0], (vol[0, 0] + vol[1, 0]) / 2, atol=1e-6)

    def test_temporal_doubling_hits_source_frames(self):
        # The reference protocol: even output frames == source frames.
        vol = synthetic_volume((5, 5, 4), seed=2)
        out = linear_interpolate_volume(vol, (5, 5, 7))
        np.testing.assert_allclose(out[..., 0], vol[..., 0], atol=1e-6)
        np.testing.assert_allclose(out[..., 2], vol[..., 1], atol=1e-6)
        np.testing.assert_allclose(out[..., 6], vol[..., 3], atol=1e-6)

    def test_rank_mismatch_raises(self):
        with pytest.raises(ValueError, match="rank"):
            linear_interpolate_volume(np.zeros((4, 4)), (4, 4, 4))


class TestClassicalTemporalMethods:
    def test_cubic_exact_on_quadratic_trajectories(self):
        # intensity quadratic in t: cubic Hermite (finite-difference tangents)
        # reproduces interior midpoints exactly; linear does not.
        from mri_interpolation_tpu.infer import cubic_interpolate_frames

        rng = np.random.default_rng(0)
        a, b, c = (rng.random((5, 5), dtype=np.float32) for _ in range(3))
        t_keep = np.linspace(0.0, 1.0, 6)
        frames = np.stack([a + b * t + c * t * t for t in t_keep], axis=-1)
        t_eval = (t_keep[:-1] + t_keep[1:]) / 2
        got = cubic_interpolate_frames(frames, t_keep, t_eval)
        want = np.stack([a + b * t + c * t * t for t in t_eval], axis=-1)
        # interior segments exact; end segments use one-sided tangents
        np.testing.assert_allclose(got[..., 1:-1], want[..., 1:-1], atol=1e-5)
        lin = 0.5 * (frames[..., 1:-2] + frames[..., 2:-1])
        assert np.abs(lin - want[..., 1:-1]).max() > 1e-3

    def test_cubic_matches_stacking_family_cache_semantics(self):
        # the stacking protocol's `cubic` family is this function
        from mri_interpolation_tpu.infer import cubic_interpolate_frames
        from mri_interpolation_tpu.train.stacking import _cubic_family

        frames = synthetic_volume((4, 4, 5), seed=3)
        t_keep = np.asarray([0.0, 0.2, 0.5, 0.7, 1.0])
        t_eval = np.asarray([0.1, 0.35, 0.9])
        np.testing.assert_array_equal(
            _cubic_family()(frames, t_keep, t_eval),
            cubic_interpolate_frames(frames, t_keep, t_eval))

    def test_upsample_dispatch_linear_and_cubic(self):
        from mri_interpolation_tpu.infer import temporal_upsample_classical

        src = synthetic_volume((5, 5, 4), seed=2)
        for method in ("linear", "cubic"):
            out = temporal_upsample_classical(src, 7, method=method)
            assert out.shape == (5, 5, 7)
            # observed frames pass through (cubic/linear both endpoint-exact)
            np.testing.assert_allclose(out[..., ::2], src, atol=1e-5)
        with pytest.raises(ValueError, match="unknown method"):
            temporal_upsample_classical(src, 7, method="nope")

    def test_upsample_registration_smoke(self):
        from mri_interpolation_tpu.infer import temporal_upsample_classical

        src = synthetic_volume((8, 8, 3), seed=4)
        out = temporal_upsample_classical(src, 5, method="registration")
        assert out.shape == (8, 8, 5) and np.isfinite(out).all()
        np.testing.assert_allclose(out[..., ::2], src, atol=1e-6)


class TestEvalCacheBound:
    @pytest.mark.slow
    def test_lru_eviction(self):
        from mri_interpolation_tpu.infer import grid as g
        from mri_interpolation_tpu.models import make_siren

        g._EVAL_CACHE.clear()
        model = make_siren(dim_in=2, dim_hidden=4, n_layers=2)
        params, state = model.init(jax.random.key(0))
        for i in range(g._EVAL_CACHE_MAX + 4):
            g.evaluate_grid(model, params, state, (3, 3 + i), chunk_size=8)
        assert len(g._EVAL_CACHE) == g._EVAL_CACHE_MAX

    def test_hit_reuses_runner(self):
        from mri_interpolation_tpu.infer import grid as g
        from mri_interpolation_tpu.models import make_siren

        g._EVAL_CACHE.clear()
        model = make_siren(dim_in=2, dim_hidden=4, n_layers=2)
        params, state = model.init(jax.random.key(0))
        a = g.evaluate_grid(model, params, state, (4, 4), chunk_size=8)
        assert len(g._EVAL_CACHE) == 1
        b = g.evaluate_grid(model, params, state, (4, 4), chunk_size=8)
        assert len(g._EVAL_CACHE) == 1
        np.testing.assert_array_equal(a, b)


class TestServingExport:
    def test_export_roundtrip_matches_evaluate_grid(self, tmp_path):
        from mri_interpolation_tpu.infer import evaluate_grid, load_evaluator, save_evaluator
        from mri_interpolation_tpu.models import make_hash_mlp

        model = make_hash_mlp(dim_in=3, n_levels=2, n_features_per_level=2,
                              log2_hashmap_size=10, base_resolution=(4, 4, 2),
                              finest_resolution=(12, 12, 6), dim_hidden=16, n_layers=2,
                              decoder="relu_plain")
        params, state = model.init(jax.random.key(0))
        shape = (10, 11, 12)
        ref = evaluate_grid(model, params, state, shape, chunk_size=1 << 15)
        path = save_evaluator(str(tmp_path / "eval.bin"), model, params, state, shape)
        vol = load_evaluator(path)()
        assert vol.shape == shape
        np.testing.assert_allclose(vol, ref, atol=1e-6)

    def test_bf16_table_quantization(self, tmp_path):
        """Serving-side table quantization: half the artifact, tiny error
        (bf16 keeps f32's exponent with 8 mantissa bits — quantization noise
        sits far below reconstruction error)."""
        import jax.numpy as jnp

        from mri_interpolation_tpu.infer import (
            evaluate_grid, load_evaluator, quantize_tables, save_evaluator)
        from mri_interpolation_tpu.io import dataset_from_array, synthetic_volume
        from mri_interpolation_tpu.models import make_hash_mlp
        from mri_interpolation_tpu.train import TrainConfig, Trainer

        model = make_hash_mlp(dim_in=3, n_levels=3, n_features_per_level=2,
                              log2_hashmap_size=12, base_resolution=(4, 4, 2),
                              finest_resolution=(16, 16, 8), dim_hidden=16,
                              n_layers=2, decoder="relu_plain")
        ds = dataset_from_array(synthetic_volume((12, 12, 8), seed=0))
        r = Trainer(TrainConfig(batch_size=512, epochs=3, lr=1e-2, seed=0)).fit(
            model, ds.coords, ds.values)

        qp = quantize_tables(r.params)
        assert qp["encoder"]["table"].dtype == jnp.bfloat16
        # decoder weights untouched
        assert jax.tree_util.tree_leaves(
            {k: v for k, v in qp.items() if k != "encoder"})[0].dtype == jnp.float32

        shape = (12, 12, 8)
        ref = evaluate_grid(model, r.params, r.state, shape, chunk_size=1 << 12)
        got = evaluate_grid(model, qp, r.state, shape, chunk_size=1 << 12)
        err = float(np.max(np.abs(got - ref)))
        assert err < 5e-3, err  # bf16 relative step ~0.4%

        # exported artifact: quantized constants halve the table bytes
        p32 = save_evaluator(str(tmp_path / "f32.bin"), model, r.params, r.state, shape)
        p16 = save_evaluator(str(tmp_path / "bf16.bin"), model, r.params, r.state,
                             shape, table_dtype=jnp.bfloat16)
        import os
        table_bytes = np.asarray(r.params["encoder"]["table"]).nbytes
        assert os.path.getsize(p32) - os.path.getsize(p16) > 0.4 * table_bytes
        vol = load_evaluator(p16)()
        np.testing.assert_allclose(vol, ref, atol=5e-3)

    def test_exported_artifact_is_self_contained(self, tmp_path):
        """The artifact must execute without the model object (params baked)."""
        from mri_interpolation_tpu.infer import load_evaluator, save_evaluator
        from mri_interpolation_tpu.models import make_siren

        model = make_siren(dim_in=2, dim_hidden=8, n_layers=2)
        params, state = model.init(jax.random.key(1))
        path = save_evaluator(str(tmp_path / "s.bin"), model, params, state, (6, 7))
        del model, params, state
        vol = load_evaluator(path)()
        assert vol.shape == (6, 7)
        assert np.isfinite(vol).all()


class TestHashModelGridEval:
    """The hash families route through the hoisted encode/decode split in
    evaluate_grid (the dense cell-view is built once per call, not per
    chunk) — outputs must equal the plain model.apply path."""

    def _model(self):
        from mri_interpolation_tpu.models import make_hash_mlp

        return make_hash_mlp(
            dim_in=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=10,
            base_resolution=(4, 4, 2), finest_resolution=(24, 24, 12),
            dim_hidden=16, n_layers=2, decoder="relu_plain", fused="off")

    @pytest.mark.slow

    def test_hoisted_path_matches_direct_apply(self):
        model = self._model()
        params, state = model.init(jax.random.key(0))
        shape = (9, 10, 11)
        vol = evaluate_grid(model, params, state, shape, chunk_size=128)
        coords = flat_coords(shape)
        direct, _ = model.apply(params, state, jnp.asarray(coords))
        np.testing.assert_allclose(vol.reshape(-1, 1), np.asarray(direct), atol=1e-6)

    def test_return_latents(self):
        """Latent capture parity: reference predict_step collects encoder
        features during prediction (models.py:640-646,746-751)."""
        model = self._model()
        enc = model.hparams["encoder"]
        params, state = model.init(jax.random.key(1))
        shape = (6, 7, 5)
        vol, lat = evaluate_grid(model, params, state, shape, chunk_size=64,
                                 return_latents=True)
        assert vol.shape == shape
        assert lat.shape == shape + (enc.output_dim,)
        coords = flat_coords(shape)
        want = np.asarray(enc.apply(params["encoder"], jnp.asarray(coords)))
        np.testing.assert_allclose(lat.reshape(-1, enc.output_dim), want, atol=1e-6)

    def test_return_latents_requires_split_model(self):
        model = make_siren(dim_in=3, dim_hidden=8, n_layers=2)
        params, state = model.init(jax.random.key(0))
        with pytest.raises(ValueError, match="encode/decode"):
            evaluate_grid(model, params, state, (4, 4, 4), return_latents=True)

    def test_predict_batched_hoisted_matches_apply(self):
        model = self._model()
        params, state = model.init(jax.random.key(2))
        coords = flat_coords((7, 7, 6))
        got = predict_batched(model, params, state, coords, chunk_size=100)
        want, _ = model.apply(params, state, jnp.asarray(coords))
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)


class TestU16Transport:
    def test_quantized_transport_matches_f32(self):
        from mri_interpolation_tpu.models import make_hash_mlp

        model = make_hash_mlp(
            dim_in=3, n_levels=3, n_features_per_level=2, log2_hashmap_size=12,
            base_resolution=(4, 4, 2), finest_resolution=(16, 16, 8),
            dim_hidden=16, n_layers=2, decoder="relu_plain", fused="off")
        params, state = model.init(jax.random.key(0))
        shape = (9, 9, 7)
        f32 = evaluate_grid(model, params, state, shape)
        u16 = evaluate_grid(model, params, state, shape, transport="u16")
        rng = f32.max() - f32.min()
        # one quantization step against the volume's dynamic range
        assert np.abs(u16 - f32).max() <= rng / 65535.0 + 1e-7

    def test_rejects_unknown_transport(self):
        model = make_siren(dim_in=3, dim_hidden=8, n_layers=2)
        params, state = model.init(jax.random.key(0))
        with pytest.raises(ValueError, match="transport"):
            evaluate_grid(model, params, state, (4, 4, 4), transport="f8")


class TestAnnealedModelInference:
    """A level-annealed model evaluated MID-ramp must produce the same output
    through every inference path as through model.apply — the hoisted
    encode/decode split paths (evaluate_grid, predict_batched) must reapply
    the curriculum weighting (hparams['anneal_weights']), or a short run /
    periodic eval evaluates a different function than the one being trained."""

    def _annealed(self, log2=10, finest=(24, 24, 12)):
        from mri_interpolation_tpu.models import make_hash_mlp

        return make_hash_mlp(
            dim_in=3, n_levels=3, n_features_per_level=2,
            log2_hashmap_size=log2, base_resolution=(4, 4, 2),
            finest_resolution=finest, dim_hidden=16, n_layers=2,
            decoder="relu_plain", fused="off", level_anneal_steps=8)

    @pytest.mark.parametrize("step", [0, 3, 8])
    def test_evaluate_grid_matches_apply_mid_ramp(self, step):
        model = self._annealed()
        params, state = model.init(jax.random.key(0))
        state = dict(state, anneal_step=jnp.asarray(step, jnp.int32))
        shape = (9, 10, 11)
        vol = evaluate_grid(model, params, state, shape, chunk_size=128)
        direct, _ = model.apply(params, state, jnp.asarray(flat_coords(shape)),
                                train=False, rng=None)
        np.testing.assert_allclose(vol.reshape(-1, 1), np.asarray(direct), atol=1e-6)

    @pytest.mark.slow

    def test_grid_fast_path_matches_apply_mid_ramp(self):
        # all-dense config -> the separable grid path; weighting must apply
        # there too (it decodes hoisted whole-grid features)
        model = self._annealed(log2=14, finest=(12, 12, 6))
        enc = model.hparams["encoder"]
        if not getattr(enc, "supports_grid_path", lambda: False)():
            pytest.skip("config did not select the all-dense grid path")
        params, state = model.init(jax.random.key(1))
        state = dict(state, anneal_step=jnp.asarray(2, jnp.int32))
        shape = (12, 12, 6)
        vol = evaluate_grid(model, params, state, shape, chunk_size=256)
        direct, _ = model.apply(params, state, jnp.asarray(flat_coords(shape)),
                                train=False, rng=None)
        np.testing.assert_allclose(vol.reshape(-1, 1), np.asarray(direct), atol=1e-5)

    def test_predict_batched_matches_apply_mid_ramp(self):
        model = self._annealed()
        params, state = model.init(jax.random.key(2))
        state = dict(state, anneal_step=jnp.asarray(5, jnp.int32))
        coords = flat_coords((7, 7, 6))
        got = predict_batched(model, params, state, coords, chunk_size=100)
        direct, _ = model.apply(params, state, jnp.asarray(coords),
                                train=False, rng=None)
        np.testing.assert_allclose(got, np.asarray(direct), atol=1e-6)
