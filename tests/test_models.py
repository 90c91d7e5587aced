"""Model zoo tests: shapes, init statistics, semantics, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_interpolation_tpu.models import (
    REGISTRY,
    get_model_factory,
    make_freq_mlp,
    make_gabor_net,
    make_hash_mlp,
    make_hash_siren,
    make_mlp,
    make_modulated_siren,
    make_multi_hash_mlp,
    make_multi_siren,
    make_psf_siren,
    make_rff_net,
    make_siren,
)
from mri_interpolation_tpu.models.siren import psf_offsets_and_weights

KEY = jax.random.key(0)
X3 = jax.random.uniform(jax.random.key(1), (32, 3))


def _smoke(model, x=X3, **apply_kw):
    params, state = model.init(KEY)
    y, new_state = model.apply(params, state, x, train=True, rng=jax.random.key(2), **apply_kw)
    assert y.shape == (x.shape[0], model.dim_out)
    assert np.all(np.isfinite(np.asarray(y)))
    return params, state, y


class TestSiren:
    def test_forward_shape(self):
        _smoke(make_siren(dim_in=3, dim_hidden=64, n_layers=4))

    def test_init_distributions(self):
        # First layer U(-1/d, 1/d); later U(-sqrt(6/d)/w0, ...) (models.py:144-151).
        model = make_siren(dim_in=3, dim_hidden=256, n_layers=4, w0=30.0)
        params, _ = model.init(KEY)
        w0_bound = 1.0 / 3
        first = np.asarray(params["layers"][0]["w"])
        assert np.abs(first).max() <= w0_bound
        assert np.abs(first).max() > 0.8 * w0_bound  # actually fills the range
        later_bound = np.sqrt(6.0 / 256) / 30.0
        later = np.asarray(params["layers"][1]["w"])
        assert np.abs(later).max() <= later_bound
        assert np.abs(later).max() > 0.8 * later_bound

    def test_sine_activation_semantics(self):
        # One layer, identity-check sin(w0 (Wx+b)).
        model = make_siren(dim_in=2, dim_hidden=8, n_layers=1, w0_initial=30.0)
        params, state = model.init(KEY)
        x = jnp.array([[0.3, -0.2]])
        z = x @ params["layers"][0]["w"] + params["layers"][0]["b"]
        hidden = np.sin(30.0 * np.asarray(z))
        expected = hidden @ np.asarray(params["last"]["w"]) + np.asarray(params["last"]["b"])
        y, _ = model.apply(params, state, x)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5)

    def test_gradients(self):
        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        params, state = model.init(KEY)

        def loss(p):
            y, _ = model.apply(p, state, X3)
            return jnp.mean(y**2)

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))


class TestModulatedSiren:
    def test_forward(self):
        _smoke(make_modulated_siren(dim_in=3, dim_hidden=32, n_layers=3))

    def test_modulation_changes_output(self):
        model = make_modulated_siren(dim_in=3, dim_hidden=16, n_layers=2)
        params, state = model.init(KEY)
        y1, _ = model.apply(params, state, X3)
        # zero the modulator -> ReLU(0 @ w + b)... output must differ
        params2 = jax.tree.map(lambda p: p, params)
        params2["modulator"] = jax.tree.map(jnp.zeros_like, params["modulator"])
        y2, _ = model.apply(params2, state, X3)
        assert np.abs(np.asarray(y1 - y2)).max() > 0


class TestHashSiren:
    def test_forward(self):
        _smoke(make_hash_siren(dim_in=3, dim_hidden=16, n_layers=2, n_levels=2,
                               base_resolution=4, per_level_scale=1.5, log2_hashmap_size=10))


class TestMlpFamily:
    def test_mlp_final_activation_applied(self):
        # Reference BaseMLP appends ReLU after the last Linear (models.py:46-56).
        model = make_mlp(dim_in=2, dim_hidden=8, n_layers=2)
        params, state = model.init(KEY)
        y, _ = model.apply(params, state, jax.random.normal(jax.random.key(3), (64, 2)))
        assert np.asarray(y).min() >= 0.0

    def test_rff_net(self):
        model = make_rff_net(dim_in=3, dim_hidden=16, n_layers=2, n_frequencies=8)
        params, _, _ = _smoke(model)
        assert params["encoder"]["b"].shape == (8, 3)


class TestHashMLP:
    @pytest.mark.slow
    def test_forward_and_bn_state_updates(self):
        model = make_hash_mlp(dim_in=3, n_levels=2, base_resolution=(8, 8, 4),
                              finest_resolution=(16, 16, 8), log2_hashmap_size=12,
                              dim_hidden=16, n_layers=2)
        params, state = model.init(KEY)
        y, new_state = model.apply(params, state, X3, train=True)
        assert y.shape == (32, 1)
        # running stats must move in train mode
        assert np.abs(np.asarray(new_state["bn"][0]["mean"])).sum() > 0
        # eval mode: state unchanged
        y2, eval_state = model.apply(params, new_state, X3, train=False)
        assert eval_state["bn"][0] is new_state["bn"][0]

    @pytest.mark.slow

    def test_tcnn_style_decoder(self):
        model = make_hash_mlp(dim_in=3, n_levels=4, base_resolution=16,
                              finest_resolution=None, per_level_scale=1.4,
                              log2_hashmap_size=14, dim_hidden=32, n_layers=2,
                              decoder="relu_plain")
        params, state = model.init(KEY)
        assert "bn" not in params
        y, _ = model.apply(params, state, X3, train=True)
        # identity output head: values need not be >= 0... but finite
        assert np.isfinite(np.asarray(y)).all()

    def test_dropout_active_in_train(self):
        model = make_hash_mlp(dim_in=3, n_levels=2, base_resolution=8, finest_resolution=16,
                              log2_hashmap_size=10, dim_hidden=64, n_layers=2, dropout_rate=0.5)
        params, state = model.init(KEY)
        y1, _ = model.apply(params, state, X3, train=True, rng=jax.random.key(10))
        y2, _ = model.apply(params, state, X3, train=True, rng=jax.random.key(11))
        assert np.abs(np.asarray(y1 - y2)).max() > 0


class TestGabor:
    def test_real_gabor_semantics(self):
        model = make_gabor_net(dim_in=2, dim_hidden=8, n_layers=1, w0=30.0, sigma=10.0)
        params, state = model.init(KEY)
        x = jnp.array([[0.1, 0.2]])
        lyr = params["layers"][0]
        omega = 30.0 * (np.asarray(x) @ np.asarray(lyr["freqs"]["w"]) + np.asarray(lyr["freqs"]["b"]))
        scale = (np.asarray(x) @ np.asarray(lyr["scale"]["w"]) + np.asarray(lyr["scale"]["b"])) * 10.0
        expected = np.cos(omega) * np.exp(-(scale**2))
        y, _ = model.apply(params, state, x)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-6)

    def test_complex_gabor_real_output(self):
        model = make_gabor_net(dim_in=3, dim_hidden=8, n_layers=2, kind="complex", w0=10.0, sigma=1.0)
        params, state = model.init(KEY)
        y, _ = model.apply(params, state, X3)
        assert y.dtype == jnp.float32


class TestPsfSiren:
    def test_offsets_and_weights(self):
        offsets, w = psf_offsets_and_weights((0.1, 0.2, 0.3), n_sample=5)
        assert offsets.shape == (125, 3) and w.shape == (125,)
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
        # extremes at +-spacing
        np.testing.assert_allclose(offsets[0], [-0.1, -0.2, -0.3], rtol=1e-6)
        np.testing.assert_allclose(offsets[-1], [0.1, 0.2, 0.3], rtol=1e-6)
        # center weight is the max
        assert w[62] == w.max()

    def test_loss_fn(self):
        model = make_psf_siren(dim_in=3, dim_hidden=16, n_layers=2,
                               coordinates_spacing=(0.01, 0.01, 0.05), n_sample=3)
        params, state = model.init(KEY)
        batch = (X3, jnp.zeros((32, 1)))
        loss, _ = model.loss_fn(params, state, batch, None, True)
        assert np.isfinite(float(loss)) and float(loss) >= 0

    def test_requires_spacing(self):
        with pytest.raises(ValueError, match="coordinates_spacing"):
            make_psf_siren(dim_in=3)


class TestFreqMLP:
    @pytest.mark.parametrize("enc", ["siren", "gabor", "rff", "frequency"])
    def test_encoder_families(self, enc):
        model = make_freq_mlp(dim_in=3, dim_hidden=16, n_layers=2, encoder_type=enc,
                              n_frequencies=8, n_frequencies_t=4, skip_connections=(1,))
        _smoke(model)

    def test_skip_reinjects_encoding(self):
        m_skip = make_freq_mlp(dim_in=3, dim_hidden=16, n_layers=3, encoder_type="siren",
                               n_frequencies=8, n_frequencies_t=4, skip_connections=(1,))
        params, state = m_skip.init(KEY)
        # layer 1 input width = enc_dim + hidden
        assert params["layers"][1]["w"].shape[0] == 12 + 16

    def test_spectral_norm_state_updates(self):
        model = make_freq_mlp(dim_in=3, dim_hidden=8, n_layers=2, encoder_type="siren",
                              n_frequencies=4, n_frequencies_t=2)
        params, state = model.init(KEY)
        _, new_state = model.apply(params, state, X3, train=True)
        moved = np.abs(np.asarray(new_state["sn"][0]["u"]) - np.asarray(state["sn"][0]["u"])).max()
        assert moved > 0

    def test_unknown_encoder_raises(self):
        with pytest.raises(ValueError, match="encoder_type"):
            make_freq_mlp(encoder_type="nope")


@pytest.mark.slow
class TestMultiFrame:
    def test_multi_siren_frame_routing(self):
        model = make_multi_siren(dim_in=2, dim_hidden=8, n_layers=2, n_frames=3)
        params, state = model.init(KEY)
        x = jax.random.uniform(jax.random.key(5), (16, 2))
        y0, _ = model.apply(params, state, x, frame_idx=0)
        y1, _ = model.apply(params, state, x, frame_idx=1)
        assert np.abs(np.asarray(y0 - y1)).max() > 0  # different per-frame encoders

    def test_multi_siren_stacked_params(self):
        model = make_multi_siren(dim_in=2, dim_hidden=8, n_layers=2, n_frames=3)
        params, _ = model.init(KEY)
        assert params["encoders"]["layers"][0]["w"].shape[0] == 3  # leading frame axis

    def test_multi_hash_mlp(self):
        model = make_multi_hash_mlp(dim_in=2, n_frames=3, n_levels=2, base_resolution=4,
                                    per_level_scale=1.5, log2_hashmap_size=8, dim_hidden=8, n_layers=2)
        params, state = model.init(KEY)
        x = jax.random.uniform(jax.random.key(6), (16, 2))
        y, _ = model.apply(params, state, x, frame_idx=2)
        assert y.shape == (16, 1)

    def test_frame_idx_traceable(self):
        # frame routing must work under jit with a traced index
        model = make_multi_siren(dim_in=2, dim_hidden=8, n_layers=2, n_frames=3)
        params, state = model.init(KEY)
        x = jax.random.uniform(jax.random.key(7), (4, 2))

        @jax.jit
        def f(idx):
            y, _ = model.apply(params, state, x, frame_idx=idx)
            return y

        y = f(jnp.int32(1))
        assert y.shape == (4, 1)


class TestRegistry:
    def test_all_names_resolve(self):
        for name in REGISTRY:
            assert callable(get_model_factory(name))

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_model_factory("DoesNotExist")


class TestGaborAutoInit:
    def test_auto_init_envelope_near_one(self):
        # SIREN-scaled init: the Gaussian envelope must start near-transparent
        # (that's what makes 3D convergence possible; collapse to ~0 was the
        # torch-init failure mode).
        model = make_gabor_net(dim_in=3, dim_hidden=64, n_layers=3, init_scheme="auto")
        params, state = model.init(KEY)
        x = jax.random.uniform(jax.random.key(9), (256, 3), minval=-1.0, maxval=1.0)
        lyr = params["layers"][0]
        scale = (x @ lyr["scale"]["w"] + lyr["scale"]["b"]) * 10.0
        env = np.asarray(jnp.exp(-(scale**2)))
        assert env.mean() > 0.8

    def test_torch_init_scheme_still_available(self):
        model = make_gabor_net(dim_in=3, dim_hidden=8, n_layers=2, init_scheme="torch")
        params, _ = model.init(KEY)
        assert len(params["layers"]) == 2

    def test_converges_on_small_3d(self):
        from mri_interpolation_tpu.io import dataset_from_array, synthetic_volume
        from mri_interpolation_tpu.train import TrainConfig, Trainer

        ds = dataset_from_array(synthetic_volume((10, 10, 10), seed=3), zero_centered=True)
        model = make_gabor_net(dim_in=3, dim_hidden=32, n_layers=3)
        res = Trainer(TrainConfig(batch_size=500, epochs=30, lr=3e-4, seed=0)).fit(
            model, ds.coords, ds.values)
        assert res.losses[-1] < res.losses[0] * 0.2


@pytest.mark.slow
class TestFusedWiring:
    def test_siren_fused_interpret_matches_off(self):
        m_off = make_siren(dim_in=3, dim_hidden=16, n_layers=2, fused="off")
        m_int = make_siren(dim_in=3, dim_hidden=16, n_layers=2, fused="interpret")
        params, state = m_off.init(KEY)
        y_off, _ = m_off.apply(params, state, X3)
        y_int, _ = m_int.apply(params, state, X3)
        np.testing.assert_allclose(np.asarray(y_int), np.asarray(y_off), atol=1e-6)

    def test_siren_auto_resolves_off_here(self):
        # this environment has no Mosaic-capable backend -> auto == off
        m = make_siren(dim_in=3, dim_hidden=8, n_layers=2, fused="auto")
        assert m.hparams["fused"] == "off"

    def test_hash_mlp_fused_interpret_matches_off(self):
        kw = dict(dim_in=3, n_levels=3, n_features_per_level=2, log2_hashmap_size=10,
                  base_resolution=(6, 6, 3), finest_resolution=(20, 20, 9),
                  dim_hidden=16, n_layers=2, decoder="relu_plain")
        m_off = make_hash_mlp(fused="off", **kw)
        m_int = make_hash_mlp(fused="interpret", **kw)
        params, state = m_off.init(KEY)
        x = jax.random.uniform(jax.random.key(12), (300, 3))
        y_off, _ = m_off.apply(params, state, x)
        y_int, _ = m_int.apply(params, state, x)
        np.testing.assert_allclose(np.asarray(y_int), np.asarray(y_off), atol=1e-5)

    def test_hash_mlp_fused_grads_match(self):
        kw = dict(dim_in=2, n_levels=2, n_features_per_level=2, log2_hashmap_size=8,
                  base_resolution=4, finest_resolution=16,
                  dim_hidden=8, n_layers=2, decoder="relu_plain")
        m_off = make_hash_mlp(fused="off", **kw)
        m_int = make_hash_mlp(fused="interpret", **kw)
        params, state = m_off.init(KEY)
        x = jax.random.uniform(jax.random.key(13), (200, 2))
        y = jax.random.normal(jax.random.key(14), (200, 1))

        def loss(m):
            return lambda p: jnp.mean((m.apply(p, state, x)[0] - y) ** 2)

        g_off = jax.grad(loss(m_off))(params)
        g_int = jax.grad(loss(m_int))(params)
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_off, g_int)
        assert jax.tree.reduce(max, diffs) < 1e-5

    def test_fused_mlp_relu_gelu_match_oracle(self):
        from mri_interpolation_tpu.models.core import dense, dense_init
        from mri_interpolation_tpu.ops.pallas import fused_mlp_apply

        keys = jax.random.split(KEY, 3)
        layers = [dense_init(keys[0], 8, 16), dense_init(keys[1], 16, 16), dense_init(keys[2], 16, 2)]
        x = jax.random.normal(jax.random.key(15), (150, 8))
        for act_name, act in [("relu", jax.nn.relu), ("gelu", jax.nn.gelu)]:
            z = x
            for i, l in enumerate(layers):
                z = dense(l, z)
                if i < len(layers) - 1:
                    z = act(z)
            out = fused_mlp_apply(layers, x, act_name, tile=128, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(z), atol=1e-5)


class TestNormProperDecoder:
    def test_final_block_plain(self):
        kw = dict(dim_in=3, n_levels=2, n_features_per_level=2, log2_hashmap_size=10,
                  base_resolution=(4, 4, 2), finest_resolution=(12, 12, 6),
                  dim_hidden=16, n_layers=3)
        m = make_hash_mlp(decoder="norm_proper", **kw)
        params, state = m.init(KEY)
        assert len(params["bn"]) == 2          # hidden blocks only
        m_ref = make_hash_mlp(decoder="norm", **kw)
        p_ref, _ = m_ref.init(KEY)
        assert len(p_ref["bn"]) == 3           # reference quirk: final block too
        x = jax.random.uniform(jax.random.key(7), (100, 3))
        y, new_state = m.apply(params, state, x, train=True, rng=None)
        # unnormalized final linear: output not forced through GELU
        assert np.asarray(y).min() < 0 or np.asarray(y).max() > 0
        assert len(new_state["bn"]) == 2

    def test_unknown_decoder_raises(self):
        with pytest.raises(ValueError, match="decoder"):
            make_hash_mlp(dim_in=3, decoder="bogus")


class TestWarpInr:
    @pytest.mark.slow
    def test_identity_warp_at_init(self):
        from mri_interpolation_tpu.models import make_warp_inr

        m = make_warp_inr(dim_in=3, n_levels=2, log2_hashmap_size=10,
                          base_resolution=(4, 4), finest_resolution=(16, 16),
                          dim_hidden=16, n_layers=2, warp_hidden=16, warp_layers=2)
        params, state = m.init(KEY)
        # zero-initialized deformation head: warp layer last weights are zero
        assert np.abs(np.asarray(params["warp"][-1]["w"])).max() == 0
        x = jax.random.uniform(jax.random.key(5), (50, 3))
        y, _ = m.apply(params, state, x)
        # at init the output must be time-invariant (identity warp)
        x_t2 = x.at[:, -1].set(x[:, -1] * 0.0 + 0.9)
        x_t1 = x.at[:, -1].set(x[:, -1] * 0.0 + 0.1)
        y1, _ = m.apply(params, state, x_t1)
        y2, _ = m.apply(params, state, x_t2)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)

    def test_fits_translating_blob(self):
        """A moving gaussian blob: the warp model must fit it and interpolate
        an intermediate frame better than frame cross-fading would."""
        from mri_interpolation_tpu.io.volume import flat_coords
        from mri_interpolation_tpu.models import make_warp_inr
        from mri_interpolation_tpu.train import TrainConfig, Trainer

        n, T = 24, 5
        xs = np.linspace(0, 1, n, dtype=np.float32)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        def frame(cx):
            return np.exp(-(((X - cx) ** 2 + (Y - 0.5) ** 2) / 0.02)).astype(np.float32)
        centers = np.linspace(0.3, 0.7, T)
        vol = np.stack([frame(c) for c in centers], axis=-1)  # (n, n, T)
        coords = flat_coords(vol.shape)
        values = vol.reshape(-1, 1)
        m = make_warp_inr(dim_in=3, n_levels=2, log2_hashmap_size=12,
                          base_resolution=(6, 6), finest_resolution=(24, 24),
                          dim_hidden=16, n_layers=2, warp_hidden=32, warp_layers=3,
                          warp_scale=0.3)
        cfg = TrainConfig(batch_size=1024, epochs=60, lr=5e-3, optimizer="adam_tcnn",
                          lr_schedule="cosine", cosine_t_max=60, seed=0)
        res = Trainer(cfg).fit(m, coords, values)
        assert res.losses[-1] < res.losses[0] * 0.1


@pytest.mark.slow
class TestWarpRegularizers:
    """The r3 sweep knobs: accel/smooth priors enter via loss_fn and must
    train finitely and differ from the unregularized loss."""

    def _fit(self, **kw):
        from mri_interpolation_tpu.io import dataset_from_array, synthetic_volume
        from mri_interpolation_tpu.models import make_warp_inr
        from mri_interpolation_tpu.train import TrainConfig, Trainer

        vol = synthetic_volume((10, 10, 6), seed=4)
        ds = dataset_from_array(vol)
        model = make_warp_inr(dim_in=3, n_levels=2, n_features_per_level=2,
                              log2_hashmap_size=10, base_resolution=(4, 4),
                              finest_resolution=(10, 10), dim_hidden=8, n_layers=2,
                              warp_hidden=8, warp_layers=2, residual_scale=0.05, **kw)
        cfg = TrainConfig(batch_size=200, epochs=2, lr=5e-3, seed=0)
        return Trainer(cfg).fit(model, ds.coords, ds.values)

    def test_priors_compose_through_loss_fn(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mri_interpolation_tpu.models import make_warp_inr
        from mri_interpolation_tpu.train.losses import mse_loss

        kw = dict(dim_in=3, n_levels=2, n_features_per_level=2,
                  log2_hashmap_size=10, base_resolution=(4, 4),
                  finest_resolution=(10, 10), dim_hidden=8, n_layers=2,
                  warp_hidden=8, warp_layers=2, residual_scale=0.05)
        plain = make_warp_inr(**kw)
        reg = make_warp_inr(warp_accel=1.0, warp_smooth=1e-2, residual_accel=1.0, **kw)
        assert plain.loss_fn is None and reg.loss_fn is not None
        params, state = reg.init(jax.random.key(0))
        # perturb the (zero-initialized) warp head so d is nonzero and its
        # curvature/gradient penalties are strictly positive
        params["warp"][-1]["w"] = 0.3 * jnp.ones_like(params["warp"][-1]["w"])
        x = jax.random.uniform(jax.random.key(1), (64, 3))
        y = jnp.zeros((64, 1))
        y_pred, _ = reg.apply(params, state, x, train=True, rng=None)
        base = float(mse_loss(y_pred, y))
        total, _ = reg.loss_fn(params, state, (x, y), None, True)
        assert float(total) > base + 1e-8, (float(total), base)

    def test_t_scale_changes_field(self):
        import numpy as np

        a = self._fit(warp_t_scale=1.0)
        b = self._fit(warp_t_scale=0.5)
        assert np.isfinite(b.losses).all()
        assert not np.allclose(np.asarray(a.params["warp"][0]["w"]),
                               np.asarray(b.params["warp"][0]["w"]))


@pytest.mark.slow
class TestEnsembledWarpProtocol:
    def test_ensemble_runs_and_reports(self):
        import numpy as np

        from mri_interpolation_tpu.io import synthetic_volume
        from mri_interpolation_tpu.models import make_warp_inr
        from mri_interpolation_tpu.train import TrainConfig
        from mri_interpolation_tpu.train.protocols import ensembled_warp_fit_eval

        vol = synthetic_volume((8, 8, 6), seed=1)
        vol = (vol - vol.min()) / (vol.max() - vol.min())
        q = ensembled_warp_fit_eval(
            lambda: make_warp_inr(dim_in=3, n_levels=2, n_features_per_level=2,
                                  log2_hashmap_size=8, base_resolution=(3, 3),
                                  finest_resolution=(8, 8), dim_hidden=8, n_layers=2,
                                  warp_hidden=8, warp_layers=2),
            vol, TrainConfig(batch_size=100, epochs=2, lr=5e-3),
            seeds=(0, 1), linear_blend=0.2)
        assert len(q["per_seed_odd_psnr"]) == 2
        assert np.isfinite(q["odd"]["psnr"])


def test_level_anneal_curriculum():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_interpolation_tpu.models import make_hash_mlp

    kw = dict(dim_in=3, n_levels=3, n_features_per_level=2,
              log2_hashmap_size=8, base_resolution=(4, 4, 2),
              finest_resolution=(16, 16, 8), dim_hidden=16, n_layers=2,
              decoder="relu_plain")
    plain = make_hash_mlp(**kw)
    annealed = make_hash_mlp(**kw, level_anneal_steps=4)
    params, state = annealed.init(jax.random.key(0))
    assert int(state["anneal_step"]) == 0
    x = jnp.asarray(np.random.default_rng(0).random((32, 3), np.float32))

    # step 0: only level 0 contributes (alpha=0 -> weights [1,0,0]); the
    # output must differ from the full model on the same params
    y0, s1 = annealed.apply(params, state, x, train=True, rng=None)
    y_full, _ = plain.apply({k: v for k, v in params.items()}, {}, x,
                            train=False, rng=None)
    assert int(s1["anneal_step"]) == 1
    assert not np.allclose(np.asarray(y0), np.asarray(y_full))

    # eval applies do NOT advance the counter
    _, s_eval = annealed.apply(params, s1, x, train=False, rng=None)
    assert int(s_eval["anneal_step"]) == 1

    # counter past the ramp: bit-identical to the unannealed model
    s_done = dict(s1)
    s_done["anneal_step"] = jnp.asarray(4, jnp.int32)
    y_done, _ = annealed.apply(params, s_done, x, train=False, rng=None)
    np.testing.assert_allclose(np.asarray(y_done), np.asarray(y_full),
                               rtol=0, atol=0)

    # intermediate alpha: level weights ramp coarse-to-fine — level-2
    # features still silent at step 2 of 4 (alpha=0.5 -> w=[1, .5, 0]^T)
    s_mid = dict(s1)
    s_mid["anneal_step"] = jnp.asarray(2, jnp.int32)
    z = annealed.hparams["encode"](params, x)
    w = np.asarray([1.0, 0.5, 0.0])
    zw = (np.asarray(z).reshape(32, 3, 2).astype(np.float32)
          * w[:, None].astype(np.float32)).reshape(32, 6)
    y_mid, _ = annealed.apply(params, s_mid, x, train=False, rng=None)
    y_ref, _ = annealed.hparams["decode"](params, {}, jnp.asarray(zw),
                                          train=False, rng=None)
    np.testing.assert_allclose(np.asarray(y_mid), np.asarray(y_ref), atol=1e-4)


def test_level_anneal_trains_through_trainer():
    import jax
    import numpy as np

    from mri_interpolation_tpu.io import dataset_from_array, synthetic_volume
    from mri_interpolation_tpu.models import make_hash_mlp
    from mri_interpolation_tpu.train import TrainConfig, Trainer

    ds = dataset_from_array(synthetic_volume((12, 12, 6), seed=0))
    model = make_hash_mlp(dim_in=3, n_levels=2, n_features_per_level=2,
                          log2_hashmap_size=8, base_resolution=(4, 4, 2),
                          finest_resolution=(12, 12, 6), dim_hidden=16,
                          n_layers=2, decoder="relu_plain",
                          level_anneal_steps=10)
    res = Trainer(TrainConfig(batch_size=128, epochs=4, lr=1e-2, seed=0)).fit(
        model, ds.coords, ds.values)
    assert np.isfinite(res.losses).all()
    # the scan threads state: the counter advanced once per train step
    assert int(res.state["anneal_step"]) == res.steps
    assert res.losses[-1] < res.losses[0]


def test_warp_level_anneal():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_interpolation_tpu.io import dataset_from_array, synthetic_volume
    from mri_interpolation_tpu.models import make_warp_inr
    from mri_interpolation_tpu.train import TrainConfig, Trainer

    kw = dict(dim_in=3, n_levels=2, n_features_per_level=2,
              log2_hashmap_size=8, base_resolution=(4, 4),
              finest_resolution=(12, 12), dim_hidden=16, n_layers=2,
              warp_hidden=8, warp_layers=2, warp_accel=1.0)
    plain = make_warp_inr(**kw)
    annealed = make_warp_inr(**kw, level_anneal_steps=5)
    params, state = annealed.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(1).random((16, 3), np.float32))

    # past the ramp: bit-identical to the unannealed model on the same params
    y_done, _ = annealed.apply(params, {"anneal_step": jnp.asarray(5, jnp.int32)},
                               x, train=False, rng=None)
    y_full, _ = plain.apply(params, {}, x, train=False, rng=None)
    np.testing.assert_array_equal(np.asarray(y_done), np.asarray(y_full))
    # at step 0 the fine level is silent -> different output
    y0, s1 = annealed.apply(params, state, x, train=True, rng=None)
    assert int(s1["anneal_step"]) == 1
    assert not np.allclose(np.asarray(y0), np.asarray(y_full))

    # the warp loss_fn (accel prior) threads the counter through the Trainer
    ds = dataset_from_array(synthetic_volume((8, 8, 6), seed=0))
    res = Trainer(TrainConfig(batch_size=64, epochs=2, lr=1e-2, seed=0)).fit(
        annealed, ds.coords, ds.values)
    assert np.isfinite(res.losses).all()
    assert int(res.state["anneal_step"]) == res.steps
