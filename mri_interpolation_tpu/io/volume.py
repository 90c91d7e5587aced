"""Volume -> (coordinates, intensities) dataset construction.

TPU-native replacement for the reference's data layer
(reference: ``datamodules.py:123-252``, ``utils.py:14-23``). Unlike the
reference — which wraps the flattened volume in a PyTorch DataLoader with CPU
worker processes and per-batch host->device copies — we materialize the whole
normalized dataset once as NumPy arrays and keep it **device-resident** for the
entire fit: the sample 4D volume is only ~45 MB as (coords, values) fp32, so
batching becomes an on-device gather instead of a host round-trip.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

from . import nifti

__all__ = [
    "make_mgrid",
    "flat_coords",
    "normalize_intensity",
    "VoxelDataset",
    "load_volume",
    "dataset_from_array",
    "even_frame_split",
    "synthetic_volume",
]


def make_mgrid(shape: Sequence[int], lo: float = 0.0, hi: float = 1.0, dtype=np.float32) -> np.ndarray:
    """Dense coordinate grid over ``shape``: linspace(lo, hi, s) per axis,
    'ij' indexing, stacked on the last axis.

    Parity: ``utils.create_mgrid`` (utils.py:14-23) / ``MriImage.__init__``
    (datamodules.py:140-148). ``lo=-1`` gives the SIREN convention.
    """
    axes = [np.linspace(lo, hi, s, dtype=dtype) for s in shape]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    return grid


def flat_coords(shape: Sequence[int], lo: float = 0.0, hi: float = 1.0, dtype=np.float32) -> np.ndarray:
    """(prod(shape), ndim) flattened coordinate matrix in C order.

    C-order flatten of an 'ij' meshgrid matches the reference's
    ``coords.reshape(len(pixels), dim_in)`` pairing with the flattened volume.
    """
    return make_mgrid(shape, lo, hi, dtype).reshape(-1, len(tuple(shape)))


def normalize_intensity(values: np.ndarray, zero_centered: bool = False) -> np.ndarray:
    """Min-max normalize to [0,1], or [-1,1] when ``zero_centered``.

    Parity: datamodules.py:154-161 (``norm_siren`` selects the [-1,1] branch).
    """
    values = np.asarray(values, dtype=np.float32)
    vmin, vmax = values.min(), values.max()
    out = (values - vmin) / (vmax - vmin)
    if zero_centered:
        out = out * 2.0 - 1.0
    return out


@dataclass
class VoxelDataset:
    """Flattened (coords, values) pairs for one volume plus its metadata."""

    coords: np.ndarray  # (N, dim_in) float32
    values: np.ndarray  # (N, 1) float32
    shape: Tuple[int, ...]
    pixdim: Tuple[float, ...] = ()

    def __post_init__(self):
        assert len(self.coords) == len(self.values), "coords/values length mismatch"

    @property
    def dim_in(self) -> int:
        return self.coords.shape[-1]

    def __len__(self) -> int:
        return len(self.values)

    def image(self) -> np.ndarray:
        """The normalized volume back in grid shape."""
        return self.values.reshape(self.shape)


def dataset_from_array(
    image: np.ndarray,
    zero_centered: bool = False,
    pixdim: Tuple[float, ...] = (),
) -> VoxelDataset:
    """Build the (coords, values) regression dataset from a dense array."""
    image = np.asarray(image, dtype=np.float32)
    lo = -1.0 if zero_centered else 0.0
    coords = flat_coords(image.shape, lo=lo, hi=1.0)
    values = normalize_intensity(image.reshape(-1), zero_centered=zero_centered)[:, None]
    return VoxelDataset(coords=coords, values=values, shape=tuple(image.shape), pixdim=pixdim)


def load_volume(
    path: str,
    zero_centered: bool = False,
    slice_axes: Optional[Tuple] = None,
    use_native: bool = True,
) -> VoxelDataset:
    """Load a NIfTI file into a VoxelDataset.

    Parity: ``MriImage.__init__`` (datamodules.py:134-166). ``slice_axes`` is
    an optional tuple of slices applied to the raw volume before gridding —
    e.g. ``(slice(None), slice(None), 3, slice(None))`` reproduces the
    reference scripts' (x, y, t) slice at z=3 (test_script.py:20,
    interp.py:27).

    When the C++ runtime (mri_interpolation_tpu.native) is built, whole-volume
    loads use its fused decode+normalize+coords path (~3x faster); slicing or
    ``use_native=False`` selects the NumPy path.
    """
    if use_native and slice_axes is None:
        try:
            from .. import native

            if native.available():
                data, shape, pixdim = native.load_volume_native(path, zero_centered=zero_centered)
                lo = -1.0 if zero_centered else 0.0
                coords = native.make_coords_native(shape, lo=lo, hi=1.0)
                values = data.reshape(-1, 1)
                return VoxelDataset(coords=coords, values=values, shape=shape, pixdim=pixdim)
        except Exception:
            pass  # fall back to the NumPy oracle path
    img = nifti.load(path)
    data = img.get_fdata(dtype=np.float32)
    if slice_axes is not None:
        data = data[slice_axes]
    return dataset_from_array(data, zero_centered=zero_centered, pixdim=img.pixdim)


def even_frame_split(image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split a (..., T) volume into (even frames, odd frames) along time.

    The reference's interpolation-quality protocol: train on ``data[..., ::2]``,
    evaluate reconstruction of the held-out odd frames
    (legacy_code/hash_experimentation.py:313-317, implementation_paper.py:567).
    """
    return image[..., ::2], image[..., 1::2]


def synthetic_volume(
    shape: Sequence[int] = (16, 16, 16),
    seed: int = 0,
    kind: str = "smooth",
) -> np.ndarray:
    """Deterministic synthetic test volumes (the reference's embryonic random
    16^3 fixture, models.py:1033, made real).

    kind='smooth' is a band-limited signal every model family can fit in a few
    hundred steps; kind='random' is white noise.
    """
    rng = np.random.default_rng(seed)
    if kind == "random":
        return rng.standard_normal(tuple(shape)).astype(np.float32)
    grid = make_mgrid(shape, 0.0, 1.0)
    phases = rng.uniform(0, 2 * np.pi, size=(3, grid.shape[-1]))
    freqs = rng.uniform(1.0, 3.0, size=(3, grid.shape[-1]))
    out = np.zeros(tuple(shape), dtype=np.float32)
    for k in range(3):
        out += np.prod(np.sin(2 * np.pi * freqs[k] * grid + phases[k]), axis=-1)
    return out.astype(np.float32)
