"""Quality metrics: MSE / PSNR / SSIM, plus parameter counting.

The reference only ever had these as a commented-out block importing
``skimage.metrics`` (legacy_code/hash_experimentation.py:445-459). Here they
are first-class, in JAX, since they gate the benchmark north star
(BASELINE.md): PSNR parity on the ankle volume.

SSIM follows Wang et al. 2004 with skimage's default configuration
(uniform 7^d window, K1=0.01, K2=0.03, no gaussian weighting) so numbers are
comparable to what the reference's intended `skimage.metrics` calls would
have produced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mse", "psnr", "ssim", "param_count", "evaluate_reconstruction"]


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB."""
    err = mse(pred, target)
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(err, 1e-20))


def _uniform_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable mean filter ('valid' windows) over all axes of x.

    precision=HIGHEST is load-bearing: TPU lowers convolve to a dot whose
    default precision truncates inputs to bf16 (~0.4% relative error — far
    above SSIM's c2=9e-4 stabilizer, enough to push near-exact
    reconstructions' SSIM several percent past 1.0)."""
    for axis in range(x.ndim):
        x = jnp.moveaxis(x, axis, -1)
        kernel = jnp.ones((size,), dtype=x.dtype) / size
        shape = x.shape
        flat = x.reshape(-1, shape[-1])
        out = jax.vmap(
            lambda row: jnp.convolve(row, kernel, mode="valid", precision=jax.lax.Precision.HIGHEST)
        )(flat)
        x = out.reshape(*shape[:-1], out.shape[-1])
        x = jnp.moveaxis(x, -1, axis)
    return x


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean structural similarity over an n-D image (skimage-default flavor).

    Uses the uniform filter with skimage's sample-covariance normalization
    (cov_norm = NP/(NP-1)). Computed in float32 (JAX x64 is off on TPU);
    second moments are taken on globally mean-shifted images — variance and
    covariance are shift-invariant, and shifting removes the O(mean^2)
    catastrophic cancellation in ``E[x^2] - E[x]^2`` that otherwise lets a
    near-exact reconstruction read above 1.0 in f32 (skimage sidesteps this
    only by running in f64). The luminance term uses the raw (unshifted)
    window means, so the result is mathematically identical to skimage's.
    """
    if any(s < win_size for s in pred.shape):
        raise ValueError(f"image shape {pred.shape} smaller than win_size {win_size}")
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    np_ = win_size**x.ndim
    cov_norm = np_ / (np_ - 1)

    ux = _uniform_filter(x, win_size)
    uy = _uniform_filter(y, win_size)
    # shift-invariant second moments on conditioned values
    mx = jnp.mean(x)
    my = jnp.mean(y)
    xc = x - mx
    yc = y - my
    uxc = ux - mx
    uyc = uy - my
    uxx = _uniform_filter(xc * xc, win_size)
    uyy = _uniform_filter(yc * yc, win_size)
    uxy = _uniform_filter(xc * yc, win_size)
    vx = cov_norm * (uxx - uxc * uxc)
    vy = cov_norm * (uyy - uyc * uyc)
    vxy = cov_norm * (uxy - uxc * uyc)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return jnp.mean(s)


def param_count(params) -> int:
    """Trainable parameter count (the reference's commented metric,
    hash_experimentation.py:457)."""
    return sum(int(p.size) for p in jax.tree.leaves(params))


def evaluate_reconstruction(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> dict:
    """The full quality block: MSE / PSNR / SSIM as python floats."""
    out = {
        "mse": float(mse(pred, target)),
        "psnr": float(psnr(pred, target, data_range)),
    }
    # Adapt the window to the smallest axis (largest odd size <= 7 that
    # fits) so thin-axis volumes — e.g. the 4D (352,352,6,15) sample — get
    # an SSIM instead of a silent skip.
    win = min(7, min(int(s) for s in pred.shape))
    win -= (win + 1) % 2
    if win >= 3:
        out["ssim"] = float(ssim(pred, target, data_range, win_size=win))
    return out
