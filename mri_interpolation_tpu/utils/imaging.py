"""Imaging utilities: viewers, PSF kernels, undersampling masks.

Parity targets (reference utils.py):
- ``create_mgrid`` (utils.py:14-23) — re-exported from io.volume;
- ``show_slices`` / ``show`` / ``tensor_visualisation`` (utils.py:26-88) —
  mid-slice orthogonal viewers (Agg backend, save-to-file variants since this
  framework is headless-first);
- ``psf_kernel`` / ``apply_psf`` (utils.py:107-151) — separable Gaussian PSF
  (sigma = 1/2.3548) and its application to a volume, vectorized in JAX
  instead of scipy.ndimage.convolve;
- ``create_rn_mask`` (utils.py:91-104) — random undersampling mask for
  simulated sparse-acquisition experiments, with an explicit PRNG key.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..io.volume import make_mgrid as create_mgrid

__all__ = [
    "create_mgrid",
    "show_slices",
    "show",
    "tensor_visualisation",
    "psf_kernel",
    "apply_psf",
    "create_rn_mask",
]


def _mid_slices(data: np.ndarray):
    xm, ym, zm = (s // 2 for s in data.shape[:3])
    return [data[xm, :, :], data[:, ym, :], data[:, :, zm]]


def show_slices(image, save_path: Optional[str] = None):
    """Orthogonal mid-slice viewer for a 3D array or NiftiImage
    (parity: utils.py:26-51)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..io.nifti import NiftiImage

    if isinstance(image, NiftiImage):
        data = np.asarray(image.get_fdata(np.float32))
        data = data.reshape(image.shape[0:3])
    else:
        data = np.asarray(image)
    slices = _mid_slices(data)
    fig, axes = plt.subplots(1, len(slices))
    for ax, sl in zip(axes, slices):
        ax.imshow(sl.T, cmap="gray", origin="lower")
        ax.axis("off")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
    return fig


def show(array: np.ndarray, save_path: Optional[str] = None):
    """2D/3D viewer; takes the real part of complex arrays
    (parity: utils.py:54-74)."""
    array = np.asarray(array)
    if np.iscomplexobj(array):
        array = array.real
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if array.ndim == 2:
        fig, ax = plt.subplots()
        ax.imshow(array.T, cmap="gray", origin="lower")
        ax.axis("off")
    elif array.ndim == 3:
        fig, axes = plt.subplots(1, 3)
        for ax, sl in zip(axes, _mid_slices(array)):
            ax.imshow(sl.T, cmap="gray", origin="lower")
            ax.axis("off")
    else:
        raise ValueError(f"show() supports 2D/3D arrays, got {array.ndim}D")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
    return fig


def tensor_visualisation(tensor: np.ndarray, save_path: str = "debug.png"):
    """Debug dump of a (n, h, w) stack as a PNG row (parity: utils.py:77-88)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tensor = np.asarray(tensor)
    fig, axes = plt.subplots(1, len(tensor))
    for ax, sl in zip(np.atleast_1d(axes), tensor):
        ax.imshow(sl.T, origin="lower")
        ax.axis("off")
    fig.savefig(save_path)
    plt.close(fig)
    return save_path


def psf_kernel(dim: int = 2, n_samples: int = 5, sigma: float = 1.0 / 2.3548) -> np.ndarray:
    """Normalized separable Gaussian PSF on linspace(-0.5, 0.5, n)^dim
    (parity: utils.py:120-151)."""
    unit = np.linspace(-0.5, 0.5, n_samples)
    grids = np.meshgrid(*([unit] * dim), indexing="ij")
    psf = np.ones_like(grids[0])
    for g in grids:
        psf = psf * np.exp(-g * g / (2 * sigma * sigma))
    return (psf / psf.sum()).astype(np.float32)


def apply_psf(values: np.ndarray, kernel: np.ndarray, image_shape: Sequence[int]) -> np.ndarray:
    """Convolve a flat intensity vector (reshaped to image_shape) with a PSF
    kernel; returns the flattened result (parity: utils.py:107-117, replacing
    scipy.ndimage.convolve with a jitted lax convolution, edge-replicated)."""
    image_shape = tuple(int(s) for s in image_shape)
    image = jnp.asarray(values, jnp.float32).reshape(image_shape)
    k = jnp.asarray(kernel, jnp.float32)
    pad = [(s // 2, s // 2) for s in k.shape]
    padded = jnp.pad(image, pad, mode="edge")  # scipy mode="nearest"

    out = jax.lax.conv_general_dilated(
        padded[None, None],
        k[::-1, ::-1][None, None] if k.ndim == 2 else jnp.flip(k, axis=tuple(range(k.ndim)))[None, None],
        window_strides=(1,) * k.ndim,
        padding="VALID",
    )[0, 0]
    return np.asarray(out).reshape(-1)[:, None]


def create_rn_mask(
    shape: Sequence[int],
    percentage: float,
    key: Union[jax.Array, int] = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random undersampling mask keeping ``percentage`` % of voxels.

    Returns (mask, None) semantics adapted: (mask of {0,1}, indices of kept
    voxels). Parity: utils.py:91-104's np.random.choice mask, with an explicit
    PRNG key instead of global numpy state.
    """
    if isinstance(key, int):
        key = jax.random.key(key)
    p = percentage * 0.01
    mask = jax.random.bernoulli(key, p, tuple(int(s) for s in shape))
    mask_np = np.asarray(mask, dtype=np.float32)
    kept = np.flatnonzero(mask_np.reshape(-1))
    return mask_np, kept
