"""NIfTI codec + volume dataset tests."""

import gzip

import numpy as np
import pytest

from mri_interpolation_tpu.io import nifti, volume


class TestNiftiRoundtrip:
    @pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64])
    def test_roundtrip_dtypes(self, tmp_path, dtype, rng):
        data = (rng.standard_normal((5, 7, 3)) * 50).astype(dtype)
        path = str(tmp_path / "vol.nii")
        nifti.save(data, path)
        img = nifti.load(path)
        assert img.shape == (5, 7, 3)
        np.testing.assert_array_equal(np.asarray(img.dataobj), data)

    def test_roundtrip_gzip(self, tmp_path, rng):
        data = rng.standard_normal((4, 4, 4, 3)).astype(np.float32)
        path = str(tmp_path / "vol.nii.gz")
        nifti.save(data, path)
        with open(path, "rb") as f:
            assert f.read(2) == b"\x1f\x8b"
        img = nifti.load(path)
        np.testing.assert_array_equal(img.get_fdata(np.float32), data)

    def test_pixdim_and_affine_preserved(self, tmp_path):
        data = np.zeros((2, 3, 4), dtype=np.float32)
        aff = np.diag([0.5, 0.5, 2.0, 1.0])
        path = str(tmp_path / "v.nii")
        nifti.save(data, path, affine=aff, pixdim=(0.5, 0.5, 2.0))
        img = nifti.load(path)
        np.testing.assert_allclose(img.affine, aff)
        np.testing.assert_allclose(img.pixdim, (0.5, 0.5, 2.0))

    def test_fortran_order_layout(self, tmp_path):
        # First axis must vary fastest on disk (NIfTI convention).
        data = np.arange(6, dtype=np.int16).reshape(2, 3, order="F")
        raw = nifti.nifti_bytes(data)
        on_disk = np.frombuffer(raw[352:], dtype="<i2")
        np.testing.assert_array_equal(on_disk, np.arange(6))

    def test_scl_slope_applied(self, tmp_path):
        data = np.array([[[1, 2]]], dtype=np.int16)
        raw = bytearray(nifti.nifti_bytes(data))
        import struct

        struct.pack_into("<2f", raw, 112, 2.0, 10.0)  # slope=2, inter=10
        img = nifti.from_bytes(bytes(raw))
        np.testing.assert_allclose(img.get_fdata(), [[[12.0, 14.0]]])


class TestSampleVolume:
    def test_reads_reference_sample(self, sample_volume_path):
        img = nifti.load(sample_volume_path)
        assert img.shape == (352, 352, 6, 15)
        np.testing.assert_allclose(img.pixdim[:2], (0.568182, 0.568182), atol=1e-4)
        data = img.get_fdata(np.float32)
        assert data.dtype == np.float32
        assert data.max() > data.min()


class TestVolumeDataset:
    def test_mgrid_matches_reference_semantics(self):
        g = volume.make_mgrid((3, 4))
        assert g.shape == (3, 4, 2)
        np.testing.assert_allclose(g[0, 0], [0.0, 0.0])
        np.testing.assert_allclose(g[-1, -1], [1.0, 1.0])
        np.testing.assert_allclose(g[1, 0], [0.5, 0.0])  # 'ij' indexing

    def test_flat_coords_pairing(self):
        # Coordinate k must pair with C-flattened voxel k.
        img = np.arange(12, dtype=np.float32).reshape(3, 4)
        ds = volume.dataset_from_array(img)
        k = 7  # (1, 3)
        np.testing.assert_allclose(ds.coords[k], [1 / 2, 3 / 3])
        assert ds.values[k, 0] == pytest.approx(7 / 11)

    def test_normalization_ranges(self, rng):
        v = rng.standard_normal(100).astype(np.float32)
        n01 = volume.normalize_intensity(v)
        n11 = volume.normalize_intensity(v, zero_centered=True)
        assert n01.min() == 0.0 and n01.max() == 1.0
        assert n11.min() == -1.0 and n11.max() == 1.0

    def test_zero_centered_coords(self, rng):
        ds = volume.dataset_from_array(rng.standard_normal((4, 4)), zero_centered=True)
        assert ds.coords.min() == -1.0 and ds.coords.max() == 1.0

    def test_even_frame_split(self):
        img = np.arange(24).reshape(2, 3, 4)
        even, odd = volume.even_frame_split(img)
        assert even.shape == (2, 3, 2) and odd.shape == (2, 3, 2)
        np.testing.assert_array_equal(even[0, 0], [0, 2])
        np.testing.assert_array_equal(odd[0, 0], [1, 3])

    def test_synthetic_volume_deterministic(self):
        a = volume.synthetic_volume((8, 8), seed=3)
        b = volume.synthetic_volume((8, 8), seed=3)
        np.testing.assert_array_equal(a, b)


class TestScaleSemantics:
    def test_slope_zero_ignores_inter(self):
        from mri_interpolation_tpu.io.nifti import NiftiImage

        img = NiftiImage(dataobj=np.arange(4, dtype=np.int16), scl_slope=0.0, scl_inter=5.0)
        # nibabel semantics: slope==0 means "no scaling stored" -> inter ignored
        np.testing.assert_array_equal(img.get_fdata(), np.arange(4, dtype=np.float64))

    def test_slope_one_inter_applied(self):
        from mri_interpolation_tpu.io.nifti import NiftiImage

        img = NiftiImage(dataobj=np.arange(4, dtype=np.int16), scl_slope=1.0, scl_inter=2.0)
        np.testing.assert_array_equal(img.get_fdata(), np.arange(4) + 2.0)


class TestMemmap:
    def test_load_memmap_matches_load(self, tmp_path):
        from mri_interpolation_tpu.io import nifti
        from mri_interpolation_tpu.io.volume import synthetic_volume

        vol = synthetic_volume((9, 7, 5), seed=2)
        path = str(tmp_path / "v.nii")
        nifti.save(vol, path)
        mm = nifti.load_memmap(path)
        assert isinstance(mm.dataobj, np.memmap)
        assert mm.shape == (9, 7, 5)
        np.testing.assert_array_equal(np.asarray(mm.dataobj),
                                      nifti.load(path).dataobj)

    def test_load_memmap_rejects_gzip(self, tmp_path):
        from mri_interpolation_tpu.io import nifti
        from mri_interpolation_tpu.io.volume import synthetic_volume

        path = str(tmp_path / "v.nii.gz")
        nifti.save(synthetic_volume((4, 4, 4), seed=0), path)
        with pytest.raises(ValueError, match="memory-mapped"):
            nifti.load_memmap(path)

    def test_fortran_host_shard_value_parity(self, tmp_path):
        """The F-order index re-folding must fetch the same voxels as the
        C-order path on the equivalent in-memory array."""
        from mri_interpolation_tpu.io import nifti
        from mri_interpolation_tpu.io.volume import synthetic_volume
        from mri_interpolation_tpu.train.trainer import (
            flatten_volume_source, make_host_shard_fn)

        vol = synthetic_volume((6, 5, 4), seed=3)
        path = str(tmp_path / "v.nii")
        nifti.save(vol, path)
        mm = nifti.load_memmap(path).dataobj

        fc, oc = flatten_volume_source(vol)
        ff, of = flatten_volume_source(mm)
        assert (oc, of) == ("C", "F")
        idx = np.random.default_rng(0).permutation(vol.size)[:50]
        c_coords, c_vals = make_host_shard_fn(vol.shape, 0.0, 1.0, fc, 0.0, 1.0, oc)(idx)
        f_coords, f_vals = make_host_shard_fn(vol.shape, 0.0, 1.0, ff, 0.0, 1.0, of)(idx)
        np.testing.assert_array_equal(c_vals, f_vals)
        np.testing.assert_array_equal(c_coords, f_coords)

    def test_streaming_fit_from_memmapped_nifti(self, tmp_path):
        from mri_interpolation_tpu.io import nifti
        from mri_interpolation_tpu.io.volume import synthetic_volume
        from mri_interpolation_tpu.models import make_siren
        from mri_interpolation_tpu.train import TrainConfig, Trainer

        vol = synthetic_volume((10, 10, 6), seed=1)
        path = str(tmp_path / "v.nii")
        nifti.save(vol, path)
        mm = nifti.load_memmap(path)
        cfg = TrainConfig(batch_size=150, epochs=2, lr=1e-3, seed=0)
        r = Trainer(cfg).fit_streaming(make_siren(dim_in=3, dim_hidden=8, n_layers=2),
                                       mm.dataobj, shard_voxels=300)
        assert np.isfinite(r.losses).all() and r.losses[-1] < r.losses[0]
