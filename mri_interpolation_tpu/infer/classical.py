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

__all__ = ["linear_interpolate_volume", "cubic_interpolate_frames",
           "temporal_upsample_classical"]


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


def cubic_interpolate_frames(
    frames: np.ndarray,
    t_keep: Sequence[float],
    t_eval: Sequence[float],
) -> np.ndarray:
    """Per-voxel non-uniform cubic Hermite (finite-difference tangents;
    Catmull-Rom on uniform spacing) across the last axis of ``frames`` —
    the data-space intensity-curvature baseline of the stacking protocol
    (train/stacking.py uses this same math as the ``cubic`` family).
    ``frames``: (spatial..., T); returns (spatial..., len(t_eval))."""
    frames = np.asarray(frames, np.float32)
    t_keep = np.asarray(t_keep, np.float64)
    T = frames.shape[-1]
    out = []
    for t in np.asarray(t_eval, np.float64):
        j = int(np.searchsorted(t_keep, t) - 1)
        j = min(max(j, 0), T - 2)
        t1, t2 = t_keep[j], t_keep[j + 1]
        h = t2 - t1
        s = float((t - t1) / h)
        f1, f2 = frames[..., j], frames[..., j + 1]
        m1 = ((f2 - frames[..., j - 1]) * (h / (t2 - t_keep[j - 1]))
              if j > 0 else f2 - f1)
        m2 = ((frames[..., j + 2] - f1) * (h / (t_keep[j + 2] - t1))
              if j + 2 < T else f2 - f1)
        h00 = 2 * s**3 - 3 * s**2 + 1
        h10 = s**3 - 2 * s**2 + s
        h01 = -2 * s**3 + 3 * s**2
        h11 = s**3 - s**2
        out.append(h00 * f1 + h10 * m1 + h01 * f2 + h11 * m2)
    return np.stack(out, axis=-1).astype(np.float32)


def temporal_upsample_classical(
    src: np.ndarray,
    t_full: int,
    method: str = "linear",
) -> np.ndarray:
    """Rebuild a ``t_full``-frame temporal grid from the frames of ``src``
    (observed frames land on every other output frame, reference protocol
    layout) with a classical — non-INR, training-free at the model level —
    interpolator:

    - ``linear``: multilinear resampling (the reference's ITK baseline).
    - ``cubic``: per-voxel cubic Hermite in intensity space.
    - ``registration``: pairwise symmetric-diffeomorphic midpoint synthesis
      (infer/registration.py) — motion-compensated, no cross-fade ghosting.
    - ``registration_group``: group temporal registration; in-between motion
      interpolated from one coherent trajectory (Catmull-Rom over fields).

    The observed-frames-on-even-outputs layout requires
    ``t_full in (2*T - 1, 2*T)`` for a T-frame ``src`` (the registration
    methods already enforce it); other ratios raise rather than silently
    placing kept frames off-grid.
    """
    T = src.shape[-1]
    if method != "linear" and t_full not in (2 * T - 1, 2 * T):
        raise ValueError(
            f"t_full={t_full} incompatible with {T} source frames for "
            f"method={method!r} (expected 2T-1 or 2T; observed frames land "
            f"on every other output frame)")
    if method == "linear":
        return linear_interpolate_volume(src, src.shape[:-1] + (t_full,))
    if method == "cubic":
        t_keep = [min(2 * j, t_full - 1) / (t_full - 1) for j in range(T)]
        t_eval = [i / (t_full - 1) for i in range(t_full)]
        return cubic_interpolate_frames(src, t_keep, t_eval)
    if method == "registration":
        from .registration import motion_compensated_upsample

        return motion_compensated_upsample(src, t_full)
    if method == "registration_group":
        from .registration import group_motion_upsample

        return group_motion_upsample(src, t_full)
    raise ValueError(
        f"unknown method {method!r}; expected linear | cubic | registration "
        f"| registration_group"
    )


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
    p.add_argument("--method", default="linear",
                   choices=["linear", "cubic", "registration", "registration_group"],
                   help="temporal interpolator (see temporal_upsample_classical)")
    args = p.parse_args(argv)

    img = nifti.load(args.image_path)
    data = img.get_fdata(np.float32)
    data = data / data.max()
    if data.ndim == 4 and args.slice_z is not None:
        data = data[:, :, args.slice_z, :]
    full_shape = data.shape
    src = data[..., ::2] if args.even_frames else data
    if args.even_frames:
        out = temporal_upsample_classical(src, full_shape[-1], method=args.method)
    else:
        # all-frames mode resamples onto the SAME grid (reference interp.py
        # parity) — only the linear resampler applies; refuse rather than
        # silently run linear under another method's name
        if args.method != "linear":
            p.error("--no-even_frames supports --method linear only "
                    "(the motion/cubic methods synthesize NEW frames)")
        out = linear_interpolate_volume(src, full_shape)
    nifti.save(out.astype(np.float32), args.out)
    print(f"wrote {args.out} shape={out.shape} method={args.method}")


if __name__ == "__main__":
    main()
