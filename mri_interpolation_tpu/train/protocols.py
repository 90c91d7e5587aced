"""Named training protocols from the reference's experiments.

- ``two_phase_hash_fit``: pretrain on key frames, freeze the decoder, then
  train on the full data — decoder-frozen temporal completion
  (legacy_code/hash_experimentation.py:330-384).
- ``even_frame_fit_eval``: train on even frames, evaluate reconstruction of
  the held-out odd frames — the repo's interpolation-quality protocol
  (hash_experimentation.py:313-317, implementation_paper.py:567-568).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from ..infer import evaluate_grid
from ..io.volume import even_frame_split, flat_coords
from ..metrics import evaluate_reconstruction
from ..models.core import Model
from .trainer import TrainConfig, Trainer, TrainResult

__all__ = ["two_phase_hash_fit", "even_frame_fit_eval", "key_frame_subset",
           "undersampled_fit_eval", "ensembled_warp_fit_eval",
           "registration_interp_eval"]


def registration_interp_eval(image: np.ndarray, **reg_kwargs) -> Tuple[np.ndarray, dict]:
    """Even-frame protocol scored for the pairwise-registration interpolator
    (infer/registration.py): observed even frames pass through exactly, each
    held-out odd frame is the motion-compensated midpoint of its neighbors.
    Returns (reconstruction, {"full": metrics, "odd": metrics}) on the same
    metric basis as :func:`even_frame_fit_eval`."""
    from ..infer.registration import motion_compensated_upsample

    train_img, odd_img = even_frame_split(image)
    recon = motion_compensated_upsample(train_img, image.shape[-1], **reg_kwargs)
    full_q = evaluate_reconstruction(
        jax.numpy.asarray(recon), jax.numpy.asarray(image), data_range=1.0)
    odd_pred = recon[..., 1::2]
    odd_q = evaluate_reconstruction(
        jax.numpy.asarray(odd_pred[..., : odd_img.shape[-1]]),
        jax.numpy.asarray(odd_img), data_range=1.0)
    return recon, {"full": full_q, "odd": odd_q}


def key_frame_subset(
    coords: np.ndarray, values: np.ndarray, image_shape: Sequence[int], key_frames: Sequence[int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Rows of (coords, values) belonging to the given time frames.

    Assumes time is the last axis of ``image_shape`` and coords were built
    C-ordered over that shape, so frame f owns every row with
    index % T == f. Default key frames in the reference: [3, 7, 13]
    (hash_experimentation.py:330).
    """
    t = int(image_shape[-1])
    idx = np.arange(len(values))
    mask = np.isin(idx % t, list(key_frames))
    return coords[mask], values[mask]


def two_phase_hash_fit(
    model: Model,
    coords: np.ndarray,
    values: np.ndarray,
    image_shape: Sequence[int],
    key_frames: Sequence[int] = (3, 7, 13),
    pretrain_config: Optional[TrainConfig] = None,
    train_config: Optional[TrainConfig] = None,
) -> Tuple[TrainResult, TrainResult]:
    """Phase 1: fit on key frames only. Phase 2: freeze every decoder layer
    (parameters whose top-level key is not 'encoder') and fit on the full
    data. Returns (phase1, phase2) results."""
    pretrain_config = pretrain_config or TrainConfig(batch_size=5000, epochs=10, lr=5e-3)
    train_config = train_config or TrainConfig(batch_size=10000, epochs=10, lr=5e-3)

    kc, kv = key_frame_subset(coords, values, image_shape, key_frames)
    phase1 = Trainer(pretrain_config).fit(model, kc, kv)

    def freeze_decoder(params):
        # True = trainable: only the hash/encoding tables keep training.
        return {
            k: jax.tree.map(lambda _: (k == "encoder"), v) for k, v in params.items()
        }

    phase2 = Trainer(train_config, freeze_mask_fn=freeze_decoder).fit(
        model, coords, values, params=phase1.params, state=phase1.state, donate=False
    )
    return phase1, phase2


def even_frame_fit_eval(
    model: Model,
    image: np.ndarray,
    config: TrainConfig,
    zero_centered: bool = False,
) -> Tuple[TrainResult, dict]:
    """Train on even frames (time remapped to full-volume positions),
    reconstruct the full grid, and report quality on the held-out odd frames.
    Returns (result, {"full": metrics, "odd": metrics})."""
    lo = -1.0 if zero_centered else 0.0
    train_img, odd_img = even_frame_split(image)
    coords = flat_coords(train_img.shape, lo=lo)
    t_full, t_even = image.shape[-1], train_img.shape[-1]
    scale = 2.0 * (t_even - 1) / max(t_full - 1, 1)
    coords[:, -1] = lo + (coords[:, -1] - lo) * scale
    values = train_img.reshape(-1, 1)

    result = Trainer(config).fit(model, coords, values)
    recon = evaluate_grid(model, result.params, result.state, image.shape, lo=lo)
    rng = 2.0 if zero_centered else 1.0
    full_q = evaluate_reconstruction(jax.numpy.asarray(recon), jax.numpy.asarray(image), data_range=rng)
    odd_pred = recon[..., 1::2]
    odd_q = evaluate_reconstruction(
        jax.numpy.asarray(odd_pred[..., : odd_img.shape[-1]]), jax.numpy.asarray(odd_img), data_range=rng
    )
    return result, {"full": full_q, "odd": odd_q}


def undersampled_fit_eval(
    model: Model,
    image: np.ndarray,
    percentage: float,
    config: TrainConfig,
    zero_centered: bool = False,
    mask_seed: int = 0,
) -> Tuple[TrainResult, dict]:
    """Sparse-acquisition protocol: fit from ``percentage``% randomly-kept
    voxels (``utils.create_rn_mask`` — parity: reference utils.py:91-104, the
    mask's stated purpose), reconstruct the FULL grid, and report quality vs
    the full volume alongside the zero-filled baseline (kept voxels as-is,
    missing voxels at the background level).

    Returns (result, {"recon": metrics, "zero_filled": metrics,
    "kept_fraction": f}).
    """
    from ..utils.imaging import create_rn_mask

    lo = -1.0 if zero_centered else 0.0
    mask, kept = create_rn_mask(image.shape, percentage, key=mask_seed)
    coords = flat_coords(image.shape, lo=lo)[kept]
    values = image.reshape(-1, 1)[kept]

    result = Trainer(config).fit(model, coords, values)
    recon = evaluate_grid(model, result.params, result.state, image.shape, lo=lo)
    rng = 2.0 if zero_centered else 1.0
    q = evaluate_reconstruction(jax.numpy.asarray(recon), jax.numpy.asarray(image), data_range=rng)
    zero_filled = image * mask.reshape(image.shape) + lo * (1.0 - mask.reshape(image.shape))
    zf_q = evaluate_reconstruction(
        jax.numpy.asarray(zero_filled), jax.numpy.asarray(image), data_range=rng
    )
    return result, {
        "recon": q,
        "zero_filled": zf_q,
        "kept_fraction": float(len(kept)) / float(np.prod(image.shape)),
    }


def ensembled_warp_fit_eval(
    make_model,
    image: np.ndarray,
    config: TrainConfig,
    seeds: Sequence[int] = (1337, 7, 23, 99),
    linear_blend: float = 0.0,
    zero_centered: bool = False,
) -> dict:
    """Seed-ensembled even-frame protocol: fit ``make_model()`` once per seed,
    AVERAGE the full-grid reconstructions, optionally blend with the classical
    linear resampler (``pred = (1-b)*ensemble + b*linear``).

    The warp-INR sweep (results.json "warp_sweep") found single-model held-out
    quality saturates ~25.9 dB on the 2D+t ankle workload while seeds
    decorrelate — a 4-seed ensemble adds ~+0.2 dB and +0.01 SSIM on top of
    the best single model. Returns {"odd": metrics, "full": metrics,
    "per_seed_odd_psnr": [...]}.
    """
    from ..infer import linear_interpolate_volume

    lo = -1.0 if zero_centered else 0.0
    rng = 2.0 if zero_centered else 1.0
    train_img, _ = even_frame_split(image)
    coords = flat_coords(train_img.shape, lo=lo)
    t_full, t_even = image.shape[-1], train_img.shape[-1]
    scale = 2.0 * (t_even - 1) / max(t_full - 1, 1)
    coords[:, -1] = lo + (coords[:, -1] - lo) * scale
    values = train_img.reshape(-1, 1)

    recons, per_seed = [], []
    for seed in seeds:
        import dataclasses

        model = make_model()
        cfg = dataclasses.replace(config, seed=seed)
        result = Trainer(cfg).fit(model, coords, values)
        recon = evaluate_grid(model, result.params, result.state, image.shape, lo=lo)
        q = evaluate_reconstruction(
            jax.numpy.asarray(recon[..., 1::2]), jax.numpy.asarray(image[..., 1::2]), data_range=rng
        )
        per_seed.append(float(q["psnr"]))
        recons.append(recon)
    pred = np.mean(recons, axis=0)
    if linear_blend > 0.0:
        lin = linear_interpolate_volume(image[..., ::2], image.shape)
        pred = (1.0 - linear_blend) * pred + linear_blend * lin
    odd_q = evaluate_reconstruction(
        jax.numpy.asarray(pred[..., 1::2]), jax.numpy.asarray(image[..., 1::2]), data_range=rng
    )
    full_q = evaluate_reconstruction(jax.numpy.asarray(pred), jax.numpy.asarray(image), data_range=rng)
    return {"odd": odd_q, "full": full_q, "per_seed_odd_psnr": per_seed}
