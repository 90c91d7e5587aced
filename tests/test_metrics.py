"""Metrics tests: PSNR/SSIM correctness against closed-form cases."""

import jax.numpy as jnp
import numpy as np
import pytest

from mri_interpolation_tpu.metrics import evaluate_reconstruction, mse, param_count, psnr, ssim


class TestPsnr:
    def test_identical_images_high(self):
        x = jnp.ones((8, 8))
        assert float(psnr(x, x)) > 150

    def test_known_value(self):
        x = jnp.zeros((4, 4))
        y = jnp.full((4, 4), 0.1)
        # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
        np.testing.assert_allclose(float(psnr(x, y)), 20.0, rtol=1e-5)

    def test_data_range(self):
        x = jnp.zeros((4, 4))
        y = jnp.full((4, 4), 0.1)
        np.testing.assert_allclose(float(psnr(x, y, data_range=2.0)), 20.0 + 10 * np.log10(4), rtol=1e-5)


@pytest.mark.slow
class TestSsim:
    def test_identical(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((16, 16)), dtype=jnp.float32)
        np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)

    def test_uncorrelated_low(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.random((32, 32)), dtype=jnp.float32)
        b = jnp.asarray(rng.random((32, 32)), dtype=jnp.float32)
        assert float(ssim(a, b)) < 0.2

    def test_3d_supported(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((10, 10, 10)), dtype=jnp.float32)
        noisy = x + 0.05 * jnp.asarray(rng.standard_normal((10, 10, 10)), dtype=jnp.float32)
        v = float(ssim(x, noisy))
        assert 0.3 < v < 1.0

    def test_window_too_big_raises(self):
        with pytest.raises(ValueError, match="win_size"):
            ssim(jnp.ones((4, 4)), jnp.ones((4, 4)))

    def test_near_exact_reconstruction_stays_below_one(self):
        # f32 cancellation regression guard: with large means, E[x^2]-E[x]^2
        # used to blow past 1.0 for near-exact reconstructions; the mean-shifted
        # moment computation must keep SSIM <= 1 (+ float32 rounding).
        rng = np.random.default_rng(7)
        x = jnp.asarray(0.9 + 0.1 * rng.random((64, 64, 9)), dtype=jnp.float32)
        y = x + jnp.asarray(1e-4 * rng.standard_normal((64, 64, 9)), dtype=jnp.float32)
        v = float(ssim(y, x))
        assert 0.999 < v <= 1.0 + 1e-6

    def test_matches_skimage_reference_case(self):
        # Hand-verified oracle: constant-vs-shifted-constant image.
        x = jnp.full((16, 16), 0.5)
        y = jnp.full((16, 16), 0.7)
        # zero variance: s = (2*ux*uy + c1)/(ux^2 + uy^2 + c1); c2 terms cancel (v=0)
        c1 = 0.01**2
        expected = (2 * 0.5 * 0.7 + c1) / (0.5**2 + 0.7**2 + c1)
        np.testing.assert_allclose(float(ssim(x, y)), expected, rtol=1e-4)


class TestMisc:
    def test_param_count(self):
        params = {"a": jnp.ones((3, 4)), "b": [jnp.ones((5,)), jnp.ones((2, 2))]}
        assert param_count(params) == 12 + 5 + 4

    @pytest.mark.slow

    def test_evaluate_reconstruction_keys(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.random((8, 8)), dtype=jnp.float32)
        out = evaluate_reconstruction(x, x)
        assert set(out) == {"mse", "psnr", "ssim"}
        # adaptive window: a (3,3) image gets a 3-wide SSIM window now
        out_small = evaluate_reconstruction(jnp.ones((3, 3)), jnp.ones((3, 3)))
        assert "ssim" in out_small
        # 4D thin-axis volumes (the full ankle sample) get an SSIM too
        vol4d = jnp.asarray(rng.random((9, 9, 6, 8)), dtype=jnp.float32)
        assert np.isfinite(evaluate_reconstruction(vol4d, vol4d)["ssim"])
        out_tiny = evaluate_reconstruction(jnp.ones((2, 2)), jnp.ones((2, 2)))
        assert "ssim" not in out_tiny
