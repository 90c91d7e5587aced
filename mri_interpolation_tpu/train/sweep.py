"""Hyperparameter search over run configurations.

The reference gestures at this without shipping it: ``GaborNet`` tracks
``final_loss`` "used for optuna" (/root/reference/models.py:879) but no
search harness exists in-tree. This module is the working equivalent —
deterministic random/grid search over any trial function, with a crash-safe
JSONL trial log (the same resumable-measurement discipline as the stacked
protocol's caches: a killed sweep resumes where it stopped, re-running
nothing).

Design notes (TPU-first): trials run SEQUENTIALLY in-process — on a single
chip the fit itself saturates the device, so trial-level parallelism buys
nothing; on a pod slice, run one sweep process per host with disjoint
``seed`` values and merge the JSONL logs. No external dependency (optuna is
not in the image and random search at these trial counts is within noise of
TPE for 2-6 dimensional spaces).

Space grammar (plain data, JSON-serializable):

    {"lr": ("log", 1e-4, 1e-1),        # log-uniform float
     "dim_hidden": ("int", 32, 128),   # uniform integer (inclusive)
     "sigma": ("lin", 1.0, 20.0),      # uniform float
     "decoder": ["norm", "relu_plain"]}  # categorical (list)

Usage (library):

    from mri_interpolation_tpu.train.sweep import sweep

    def trial(params):
        model = make_hash_mlp(dim_in=3, dim_hidden=params["dim_hidden"], ...)
        res = Trainer(TrainConfig(lr=params["lr"], ...)).fit(model, c, v)
        return psnr_of(model, res)        # higher is better

    result = sweep(trial, space, n_trials=16, log_path="runs/sweep.jsonl")
    print(result.best)

Usage (CLI — reconstruction-PSNR objective, flagship HashMLP family):

    python -m mri_interpolation_tpu.train.sweep \
        --image_path sample.nii.gz --slice_z 3 --trials 8 --epochs 10 \
        --space '{"lr": ["log", 1e-3, 3e-2], "n_levels": ["int", 2, 6]}'

Usage (CLI — the HEADLINE objective: held-out odd-frame PSNR of the
4-seed-ensembled warp INR, sweeping its measured levers):

    python -m mri_interpolation_tpu.train.sweep \
        --image_path sample.nii.gz --slice_z 3 --model_class warp_inr \
        --objective odd_frames --ens_seeds 4 --trials 12 --epochs 100 \
        --log_path runs/sweep_warp.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Mapping, Optional, Sequence

import numpy as np

__all__ = ["sample_space", "sweep", "SweepResult", "main"]


def _is_range_spec(spec) -> bool:
    """A 3-element ``[kind, lo, hi]`` with NUMERIC bounds is a range spec;
    anything else (including a categorical whose first element happens to be
    'log'/'lin'/'int', e.g. a mode-name choice) is a categorical list —
    advisor round 4."""
    return (len(spec) == 3 and spec[0] in ("log", "lin", "int")
            and all(isinstance(v, (int, float)) and not isinstance(v, bool)
                    for v in spec[1:]))


def _sample_one(rng: np.random.Generator, spec) -> object:
    """Sample one value from a space entry (see module docstring grammar)."""
    if isinstance(spec, list) and not _is_range_spec(spec):
        return spec[int(rng.integers(len(spec)))]
    kind, lo, hi = spec
    if kind == "log":
        return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
    if kind == "lin":
        return float(rng.uniform(lo, hi))
    if kind == "int":
        return int(rng.integers(int(lo), int(hi) + 1))
    raise ValueError(f"unknown space spec {spec!r}")


def sample_space(space: Mapping[str, object], trial_idx: int,
                 seed: int = 0) -> Dict[str, object]:
    """Deterministic sample for trial ``trial_idx``: the (seed, index) pair
    fully determines the draw, so a resumed sweep re-proposes IDENTICAL
    parameters for every trial index — the resume check can match on index
    alone."""
    rng = np.random.default_rng((seed, trial_idx))
    return {k: _sample_one(rng, spec) for k, spec in sorted(space.items())}


@dataclass
class SweepResult:
    trials: List[dict] = field(default_factory=list)

    @property
    def best(self) -> Optional[dict]:
        done = [t for t in self.trials if t.get("score") is not None]
        return max(done, key=lambda t: t["score"]) if done else None


def sweep(
    trial_fn: Callable[[Dict[str, object]], float],
    space: Mapping[str, object],
    n_trials: int = 16,
    seed: int = 0,
    log_path: Optional[str] = None,
    resume: bool = True,
) -> SweepResult:
    """Run ``n_trials`` of deterministic random search, maximizing
    ``trial_fn``'s return value (use ``-loss`` to minimize).

    ``log_path``: JSONL trial log, one line per finished trial
    ``{"trial": i, "params": {...}, "score": s}``. With ``resume=True``
    (default), already-logged trial indices are skipped on restart — a
    crashed 16-trial sweep re-runs only the missing trials (sampling is a
    pure function of (seed, index), so the skipped trials' parameters are
    provably the ones already logged). A trial that RAISES is logged with
    ``score: null`` and the exception string, and the sweep continues —
    one diverged fit must not lose the night's other fifteen.
    """
    result = SweepResult()
    done_idx = set()
    if log_path and resume and os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                result.trials.append(rec)
                done_idx.add(rec["trial"])
    log_f = open(log_path, "a") if log_path else None
    try:
        for i in range(n_trials):
            if i in done_idx:
                continue
            params = sample_space(space, i, seed)
            rec = {"trial": i, "params": params}
            try:
                rec["score"] = float(trial_fn(params))
            except Exception as e:  # log + continue: see docstring
                rec["score"] = None
                rec["error"] = repr(e)[:300]
            result.trials.append(rec)
            if log_f is not None:
                log_f.write(json.dumps(rec) + "\n")
                log_f.flush()
    finally:
        if log_f is not None:
            log_f.close()
    result.trials.sort(key=lambda t: t["trial"])
    return result


# ---------------------------------------------------------------------------
# CLI: PSNR objectives on a volume
#
# --objective recon       reconstruction PSNR of the full fitted volume
# --objective odd_frames  the framework's HEADLINE number: train on even
#                         frames, score the held-out odd frames
#                         (train.protocols.even_frame_fit_eval /
#                         ensembled_warp_fit_eval — the reference protocol at
#                         hash_experimentation.py:313-317)
# --model_class hash_mlp | warp_inr

_WARP_SPACE = {
    "lr": ["log", 3e-3, 3e-2],
    "warp_accel": ["lin", 0.0, 3.0],
    "level_anneal_steps": ["int", 0, 1800],
    "residual_scale": ["lin", 0.0, 0.15],
}

_HASH_SPACE = {
    "lr": ["log", 1e-3, 3e-2],
    "n_levels": ["int", 3, 6],
    "n_features_per_level": [1, 2, 4],
    "dim_hidden": [32, 64, 128],
}


def main(argv: Optional[Sequence[str]] = None) -> None:
    ap = argparse.ArgumentParser(
        description="deterministic random search over model hyperparameters")
    ap.add_argument("--image_path", required=True)
    ap.add_argument("--slice_z", type=int, default=None,
                    help="take one z slice of a 4D volume (2D+t workload)")
    ap.add_argument("--model_class", default="hash_mlp",
                    choices=["hash_mlp", "warp_inr"])
    ap.add_argument("--objective", default="recon",
                    choices=["recon", "odd_frames"])
    ap.add_argument("--ens_seeds", type=int, default=1,
                    help="with odd_frames: seed-ensemble width per trial "
                         "(the headline warp rows are 4-seed ensembles)")
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_path", default="runs/sweep.jsonl")
    ap.add_argument("--space", default=None,
                    help="JSON space spec (module-docstring grammar); "
                         "default: a per-model-class space over its "
                         "measured levers")
    args = ap.parse_args(argv)

    import jax

    from ..infer import evaluate_grid
    from ..io import load_volume
    from ..metrics import evaluate_reconstruction
    from ..models import make_hash_mlp, make_warp_inr
    from .protocols import ensembled_warp_fit_eval, even_frame_fit_eval
    from .trainer import TrainConfig, Trainer

    slice_axes = None
    if args.slice_z is not None:
        slice_axes = (slice(None), slice(None), args.slice_z, slice(None))
    ds = load_volume(args.image_path, slice_axes=slice_axes)
    img = ds.image()
    if args.space is not None:
        space = json.loads(args.space)
    else:
        space = _WARP_SPACE if args.model_class == "warp_inr" else _HASH_SPACE
    # JSON has no tuples: a 3-list ["log", lo, hi] with numeric bounds is a
    # range spec (the _sample_one check)

    def make_model(params):
        if args.model_class == "warp_inr":
            # the stacked protocol's hand-tuned base (train/stacking.py
            # default_interp_families) with the sweepable levers on top
            return make_warp_inr(
                dim_in=ds.coords.shape[-1], n_levels=4,
                n_features_per_level=4, log2_hashmap_size=23,
                base_resolution=tuple(min(64, s) for s in ds.shape[:-1]),
                finest_resolution=tuple(ds.shape[:-1]),
                dim_hidden=64, n_layers=2, warp_hidden=64, warp_layers=3,
                warp_w0=float(params.get("warp_w0", 5.0)),
                warp_scale=0.05,
                warp_accel=float(params.get("warp_accel", 1.0)),
                warp_smooth=float(params.get("warp_smooth", 0.0)),
                residual_scale=float(params.get("residual_scale", 0.05)),
                level_anneal_steps=int(params.get("level_anneal_steps", 0)),
            )
        return make_hash_mlp(
            dim_in=ds.coords.shape[-1],
            n_levels=int(params.get("n_levels", 4)),
            n_features_per_level=int(params.get("n_features_per_level", 1)),
            log2_hashmap_size=int(params.get("log2_hashmap_size", 23)),
            base_resolution=16,
            finest_resolution=max(ds.shape),
            dim_hidden=int(params.get("dim_hidden", 64)),
            n_layers=int(params.get("n_layers", 2)),
        )

    def config(params, seed=1337):
        if args.model_class == "warp_inr":
            return TrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                               lr=float(params.get("lr", 1e-2)), seed=seed,
                               optimizer="adam_tcnn", lr_schedule="cosine",
                               cosine_t_max=args.epochs, weight_decay=1e-5)
        return TrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                           lr=float(params.get("lr", 5e-3)), seed=seed)

    def trial(params):
        if args.objective == "odd_frames":
            if args.ens_seeds > 1:
                seeds = (1337, 7, 23, 99, 3, 17, 41, 71)[:args.ens_seeds]
                q = ensembled_warp_fit_eval(lambda: make_model(params), img,
                                            config(params), seeds=seeds)
            else:
                _, q = even_frame_fit_eval(make_model(params), img,
                                           config(params))
            return q["odd"]["psnr"]
        model = make_model(params)
        res = Trainer(config(params)).fit(model, ds.coords, ds.values)
        recon = evaluate_grid(model, res.params, res.state, ds.shape)
        q = evaluate_reconstruction(jax.numpy.asarray(recon),
                                    jax.numpy.asarray(img),
                                    data_range=1.0)
        return q["psnr"]

    result = sweep(trial, space, n_trials=args.trials, seed=args.seed,
                   log_path=args.log_path)
    print(json.dumps({"best": result.best,
                      "n_trials": len(result.trials)}))


if __name__ == "__main__":
    main()
