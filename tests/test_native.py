"""Native C++ IO runtime tests (built on demand; NumPy modules are the oracle)."""

import numpy as np
import pytest

from mri_interpolation_tpu import native
from mri_interpolation_tpu.io import nifti, volume


@pytest.fixture(scope="module", autouse=True)
def built():
    try:
        native.build()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    assert native.available()


class TestNativeCodec:
    @pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
    def test_decode_matches_numpy(self, tmp_path, dtype, rng):
        data = (rng.standard_normal((7, 5, 4)) * 40).astype(dtype)
        path = str(tmp_path / "v.nii.gz")
        nifti.save(data, path)
        out, shape, pixdim = native.load_volume_native(path)
        ref = volume.normalize_intensity(data.astype(np.float32))
        assert shape == (7, 5, 4)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_zero_centered(self, tmp_path, rng):
        data = rng.standard_normal((6, 6)).astype(np.float32)
        path = str(tmp_path / "v.nii")
        nifti.save(data, path)
        out, _, _ = native.load_volume_native(path, zero_centered=True)
        assert out.min() == pytest.approx(-1.0) and out.max() == pytest.approx(1.0)

    def test_scl_slope_applied(self, tmp_path):
        import struct

        data = np.array([[0, 1], [2, 3]], dtype=np.int16)
        raw = bytearray(nifti.nifti_bytes(data))
        struct.pack_into("<2f", raw, 112, 3.0, 1.0)
        path = str(tmp_path / "s.nii")
        with open(path, "wb") as f:
            f.write(bytes(raw))
        out, _, _ = native.load_volume_native(path)
        # scaled values 1,4,7,10 -> minmax normalized
        np.testing.assert_allclose(out, (data.astype(np.float32) * 3 + 1 - 1) / 9, atol=1e-6)

    def test_bad_file_raises(self, tmp_path):
        p = tmp_path / "junk.nii"
        p.write_bytes(b"nope" * 100)
        with pytest.raises(ValueError):
            native.load_volume_native(str(p))

    def test_coords_match_numpy(self):
        got = native.make_coords_native((4, 5, 3), lo=-1.0)
        ref = volume.flat_coords((4, 5, 3), lo=-1.0)
        np.testing.assert_allclose(got, ref, atol=1e-6)

    @pytest.mark.slow

    def test_sample_volume(self, sample_volume_path):
        out, shape, pixdim = native.load_volume_native(sample_volume_path)
        assert shape == (352, 352, 6, 15)
        ref = volume.normalize_intensity(nifti.load(sample_volume_path).get_fdata(np.float32))
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestLoadVolumeIntegration:
    def test_native_and_numpy_paths_agree(self, tmp_path, rng):
        data = (rng.standard_normal((8, 8, 5)) * 100).astype(np.int16)
        path = str(tmp_path / "v.nii.gz")
        nifti.save(data, path, pixdim=(1.0, 1.0, 2.0))
        ds_native = volume.load_volume(path, use_native=True)
        ds_numpy = volume.load_volume(path, use_native=False)
        np.testing.assert_allclose(ds_native.values, ds_numpy.values, atol=1e-6)
        np.testing.assert_allclose(ds_native.coords, ds_numpy.coords, atol=1e-6)
        assert ds_native.shape == ds_numpy.shape


class TestNativeEncode:
    def test_roundtrip_native_to_numpy(self, tmp_path, rng):
        data = rng.standard_normal((6, 5, 4)).astype(np.float32)
        path = str(tmp_path / "enc.nii.gz")
        native.save_volume_native(path, data, pixdim=(0.5, 0.5, 2.0))
        img = nifti.load(path)
        np.testing.assert_allclose(np.asarray(img.get_fdata(np.float32)), data, atol=0)
        assert img.shape == (6, 5, 4)
        np.testing.assert_allclose(img.pixdim[:3], (0.5, 0.5, 2.0), rtol=1e-6)

    def test_roundtrip_native_to_native(self, tmp_path, rng):
        data = rng.random((4, 4, 3, 5)).astype(np.float32)
        path = str(tmp_path / "enc4d.nii.gz")
        native.save_volume_native(path, data)
        out, shape, _ = native.load_volume_native(path)
        assert shape == (4, 4, 3, 5)
        # native loader min-max normalizes; compare against normalized input
        ref = volume.normalize_intensity(data)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_numpy_saver_reads_native_file(self, tmp_path, rng):
        # cross-check against the NumPy encoder's output layout
        data = rng.random((3, 7, 2)).astype(np.float32)
        p1, p2 = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
        native.save_volume_native(p1, data)
        nifti.save(data, p2)
        a = nifti.load(p1).get_fdata(np.float32)
        b = nifti.load(p2).get_fdata(np.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
