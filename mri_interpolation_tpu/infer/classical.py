"""Classical linear-interpolation baseline.

Parity target: ``interp.py`` — the reference's ITK baseline, which loops a
Python ``np.nditer`` over every output voxel calling
``LinearInterpolateImageFunction.EvaluateAtContinuousIndex`` (interp.py:46-50,
pathologically slow). Here: one vectorized, jit-compiled
``jax.scipy.ndimage.map_coordinates`` (order=1) over the whole output grid —
same math, no ITK, no Python loop.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["linear_interpolate_volume"]


def linear_interpolate_volume(volume: np.ndarray, out_shape: Sequence[int]) -> np.ndarray:
    """Resample ``volume`` to ``out_shape`` by multilinear interpolation.

    Output voxel j on axis k samples continuous source index
    j * (S_k - 1) / (O_k - 1) — endpoints map to endpoints, matching the
    linspace-[0,1] coordinate convention used throughout the framework (and
    the reference's frame-doubling evaluation where output frame 2t hits
    source frame t exactly).
    """
    volume = jnp.asarray(volume, dtype=jnp.float32)
    out_shape = tuple(int(s) for s in out_shape)
    if len(out_shape) != volume.ndim:
        raise ValueError(f"out_shape {out_shape} rank != volume rank {volume.ndim}")

    axes = [
        jnp.linspace(0.0, volume.shape[k] - 1.0, out_shape[k])
        for k in range(volume.ndim)
    ]
    grid = jnp.meshgrid(*axes, indexing="ij")
    coords = [g.reshape(-1) for g in grid]

    @jax.jit
    def _interp(vol):
        return jax.scipy.ndimage.map_coordinates(vol, coords, order=1, mode="nearest")

    out = _interp(volume)
    return np.asarray(out).reshape(out_shape)


def main(argv=None):
    """CLI parity with the reference's interp.py protocol: load a 4D volume,
    normalize by max, take the (x, y, t) slice at z, drop to even frames,
    linearly re-interpolate the full temporal grid, save as NIfTI
    (interp.py:22-52)."""
    import argparse

    from ..io import nifti

    p = argparse.ArgumentParser(description="classical linear-interpolation baseline")
    p.add_argument("image_path")
    p.add_argument("--out", default="itk_interpolated.nii.gz")
    p.add_argument("--slice_z", type=int, default=3)
    p.add_argument("--even_frames", action=argparse.BooleanOptionalAction, default=True,
                   help="interpolate from even frames only (--no-even_frames uses all frames)")
    args = p.parse_args(argv)

    img = nifti.load(args.image_path)
    data = img.get_fdata(np.float32)
    data = data / data.max()
    if data.ndim == 4 and args.slice_z is not None:
        data = data[:, :, args.slice_z, :]
    full_shape = data.shape
    src = data[..., ::2] if args.even_frames else data
    out = linear_interpolate_volume(src, full_shape)
    nifti.save(out.astype(np.float32), args.out)
    print(f"wrote {args.out} shape={out.shape}")


if __name__ == "__main__":
    main()
