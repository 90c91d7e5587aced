"""Tests for imaging utils, MNIST datamodule, and named training protocols."""

import os

import jax
import numpy as np
import pytest

from mri_interpolation_tpu.io.mnist import load_idx, mnist_digit_dataset, synthetic_digit
from mri_interpolation_tpu.models import make_hash_mlp, make_siren
from mri_interpolation_tpu.train import TrainConfig
from mri_interpolation_tpu.train.protocols import (
    even_frame_fit_eval,
    key_frame_subset,
    two_phase_hash_fit,
)
from mri_interpolation_tpu.utils.imaging import (
    apply_psf,
    create_rn_mask,
    psf_kernel,
    show,
    show_slices,
    tensor_visualisation,
)
from mri_interpolation_tpu.io import dataset_from_array, synthetic_volume


class TestImagingUtils:
    def test_psf_kernel_normalized(self):
        for dim in (2, 3):
            k = psf_kernel(dim=dim)
            assert k.shape == (5,) * dim
            np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
            # center is the max
            assert k[(2,) * dim] == k.max()

    def test_apply_psf_smooths(self):
        rng = np.random.default_rng(0)
        img = rng.random((12, 12)).astype(np.float32)
        out = apply_psf(img.reshape(-1, 1), psf_kernel(2), (12, 12))
        assert out.shape == (144, 1)
        assert out.reshape(12, 12).std() < img.std()  # smoothing reduces variance

    def test_create_rn_mask(self):
        mask, kept = create_rn_mask((50, 50), percentage=30, key=0)
        assert mask.shape == (50, 50)
        frac = mask.mean()
        assert 0.2 < frac < 0.4
        assert len(kept) == int(mask.sum())

    def test_viewers_write_files(self, tmp_path):
        vol = synthetic_volume((8, 8, 8))
        show_slices(vol, save_path=str(tmp_path / "s.png"))
        show(vol[..., 0], save_path=str(tmp_path / "f.png"))
        show(vol.astype(np.complex64), save_path=str(tmp_path / "c.png"))
        tensor_visualisation(vol[:3], save_path=str(tmp_path / "t.png"))
        for n in ("s.png", "f.png", "c.png", "t.png"):
            assert os.path.getsize(tmp_path / n) > 0


class TestMnist:
    def test_synthetic_digit_deterministic(self):
        a, b = synthetic_digit(3), synthetic_digit(3)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (28, 28) and 0 <= a.min() and a.max() <= 1

    def test_modes(self):
        for mode in ("single", "mean"):
            coords, values = mnist_digit_dataset(targets=(2,), mode=mode)
            assert coords.shape == (784, 2) and values.shape == (784, 1)
            assert coords.min() == -1 and coords.max() == 1
            assert values.min() >= -1 and values.max() <= 1
        coords, values = mnist_digit_dataset(targets=(2, 7), mode="random")
        assert len(coords) == len(values) and len(coords) % 784 == 0

    def test_unknown_mode_raises(self):
        with pytest.raises(ValueError):
            mnist_digit_dataset(mode="nope")

    def test_idx_roundtrip(self, tmp_path):
        import struct

        arr = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
        raw = struct.pack(">I", 0x00000803) + struct.pack(">3I", 2, 3, 4) + arr.tobytes()
        p = tmp_path / "test-idx3-ubyte"
        p.write_bytes(raw)
        np.testing.assert_array_equal(load_idx(str(p)), arr)

    def test_digit_fit_sanity(self):
        # A SIREN should fit a single digit fast — the reference's test recipe.
        coords, values = mnist_digit_dataset(targets=(2,), mode="single")
        from mri_interpolation_tpu.train import Trainer

        model = make_siren(dim_in=2, dim_hidden=32, n_layers=3)
        res = Trainer(TrainConfig(batch_size=784, epochs=60, lr=1e-3)).fit(model, coords, values)
        assert res.losses[-1] < res.losses[0] * 0.2


class TestProtocols:
    def test_key_frame_subset(self):
        img = synthetic_volume((4, 4, 6))
        ds = dataset_from_array(img)
        kc, kv = key_frame_subset(ds.coords, ds.values, img.shape, key_frames=[1, 3])
        assert len(kc) == 4 * 4 * 2
        # every selected row's time coordinate maps to frames 1 or 3
        t_coords = np.unique(np.round(kc[:, -1] * 5).astype(int))
        np.testing.assert_array_equal(t_coords, [1, 3])

    def test_two_phase_freezes_decoder(self):
        img = synthetic_volume((8, 8, 6))
        ds = dataset_from_array(img)
        model = make_hash_mlp(dim_in=3, n_levels=2, base_resolution=(4, 4, 3),
                              finest_resolution=(8, 8, 6), log2_hashmap_size=10,
                              dim_hidden=16, n_layers=2)
        p1, p2 = two_phase_hash_fit(
            model, ds.coords, ds.values, img.shape, key_frames=(1, 4),
            pretrain_config=TrainConfig(batch_size=64, epochs=2, lr=5e-3),
            train_config=TrainConfig(batch_size=128, epochs=2, lr=5e-3),
        )
        # decoder unchanged in phase 2
        for a, b in zip(jax.tree.leaves(p1.params["layers"]), jax.tree.leaves(p2.params["layers"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # encoder trained in phase 2
        diff = np.abs(np.asarray(p2.params["encoder"]["table"]) - np.asarray(p1.params["encoder"]["table"])).max()
        assert diff > 0

    def test_even_frame_fit_eval(self):
        img = synthetic_volume((8, 8, 8))
        img = (img - img.min()) / (img.max() - img.min())
        model = make_siren(dim_in=3, dim_hidden=32, n_layers=3)
        res, q = even_frame_fit_eval(model, img, TrainConfig(batch_size=256, epochs=20, lr=1e-3))
        assert "odd" in q and "full" in q
        assert np.isfinite(q["odd"]["psnr"])


class TestClassicalCli:
    def test_cli_runs(self, tmp_path, monkeypatch):
        from mri_interpolation_tpu.infer import classical
        from mri_interpolation_tpu.io import nifti

        vol = synthetic_volume((10, 10, 4, 6))
        src = str(tmp_path / "v.nii.gz")
        nifti.save(vol, src)
        out = str(tmp_path / "out.nii.gz")
        classical.main([src, "--out", out, "--slice_z", "2"])
        img = nifti.load(out)
        assert img.shape == (10, 10, 6)

    def test_all_frames_mode_rejects_non_linear_methods(self, tmp_path):
        """--no-even_frames resamples onto the SAME grid; it must refuse
        other --method values instead of silently running linear under
        their name (mislabeled output)."""
        from mri_interpolation_tpu.infer import classical
        from mri_interpolation_tpu.io import nifti

        src = str(tmp_path / "v.nii.gz")
        nifti.save(synthetic_volume((8, 8, 4, 6)), src)
        with pytest.raises(SystemExit):
            classical.main([src, "--out", str(tmp_path / "o.nii.gz"),
                            "--no-even_frames", "--method", "registration"])


class TestProfiling:
    def test_capture_trace_writes_artifact(self, tmp_path):
        import jax.numpy as jnp

        from mri_interpolation_tpu.utils import capture_trace

        out = capture_trace(lambda x: jnp.sum(x * 2), str(tmp_path / "trace"),
                            jnp.ones((64, 64)), iters=2)
        assert float(out) == 64 * 64 * 2
        import os
        files = [os.path.join(dp, f) for dp, _, fs in os.walk(tmp_path / "trace") for f in fs]
        assert files, "no trace artifact written"

    def test_time_fn_returns_positive_ms(self):
        import jax.numpy as jnp

        from mri_interpolation_tpu.utils import time_fn

        ms = time_fn(lambda x: x @ x, jnp.ones((128, 128)), iters=3)
        assert ms > 0


@pytest.mark.slow
class TestUndersampledProtocol:
    def test_fit_from_sparse_voxels_beats_zero_filled(self):
        """Sparse-acquisition protocol (VERDICT r2 Next #7): fitting an INR
        from 50% of voxels must reconstruct the full grid far better than the
        zero-filled baseline."""
        from mri_interpolation_tpu.io import synthetic_volume
        from mri_interpolation_tpu.models import make_hash_mlp
        from mri_interpolation_tpu.train import TrainConfig
        from mri_interpolation_tpu.train.protocols import undersampled_fit_eval

        vol = synthetic_volume((16, 16, 8), seed=3)
        vol = (vol - vol.min()) / (vol.max() - vol.min())  # [0,1] like load_volume
        model = make_hash_mlp(
            dim_in=3, n_levels=3, n_features_per_level=2, log2_hashmap_size=10,
            base_resolution=(4, 4, 2), finest_resolution=(16, 16, 8),
            dim_hidden=16, n_layers=2, decoder="relu_plain", fused="off")
        cfg = TrainConfig(batch_size=256, epochs=200, lr=5e-3, seed=0,
                          lr_schedule="cosine", cosine_t_max=200)
        _, report = undersampled_fit_eval(model, vol, percentage=50.0, config=cfg)
        assert 0.4 < report["kept_fraction"] < 0.6
        assert report["recon"]["psnr"] > report["zero_filled"]["psnr"] + 3.0

    def test_launcher_undersample_flag(self, tmp_path):
        from mri_interpolation_tpu.configs import RunConfig
        from mri_interpolation_tpu.io import nifti, synthetic_volume
        from mri_interpolation_tpu.launcher import run

        vol_path = str(tmp_path / "vol.nii.gz")
        nifti.save(synthetic_volume((10, 10, 6), seed=1).astype("float32"), vol_path)
        cfg = RunConfig(
            image_path=vol_path, model_class="hash_mlp", batch_size=200, epochs=1,
            dim_hidden=8, n_layers=2, n_levels=2, log2_hashmap_size=8,
            interp_shapes=(), output_root=str(tmp_path / "runs"),
            save_checkpoint=False, undersample_pct=30.0,
        )
        summary = run(cfg)
        # 30% of 600 voxels, one batch of <=200 -> steps reflect the subset
        assert summary["steps"] >= 1
        assert np.isfinite(summary["psnr"])
