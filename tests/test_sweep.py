"""Tests for train/sweep.py — the hyperparameter-search harness (the
reference's Optuna gesture, /root/reference/models.py:879, made real)."""

import json

import numpy as np
import pytest

from mri_interpolation_tpu.train.sweep import SweepResult, sample_space, sweep

SPACE = {
    "lr": ["log", 1e-4, 1e-1],
    "width": ["int", 8, 64],
    "sigma": ["lin", 1.0, 20.0],
    "decoder": ["norm", "relu_plain"],
}


def test_sampling_deterministic_and_in_range():
    a = sample_space(SPACE, 3, seed=7)
    b = sample_space(SPACE, 3, seed=7)
    assert a == b                                     # pure in (seed, index)
    assert a != sample_space(SPACE, 4, seed=7)        # varies across trials
    assert 1e-4 <= a["lr"] <= 1e-1
    assert 8 <= a["width"] <= 64 and isinstance(a["width"], int)
    assert 1.0 <= a["sigma"] <= 20.0
    assert a["decoder"] in ("norm", "relu_plain")


def test_log_sampling_spans_decades():
    vals = [sample_space(SPACE, i, seed=0)["lr"] for i in range(64)]
    assert min(vals) < 1e-3 and max(vals) > 1e-2     # not clumped linearly


def test_categorical_of_range_keywords_is_not_a_range():
    # a 3-element categorical whose first element is 'log'/'lin'/'int' must
    # sample as a categorical, not crash as a misparsed range spec
    # (advisor round 4)
    space = {"mode": ["log", "lin", "int"],
             "pair": ["int", "a", "b"]}
    vals = [sample_space(space, i, seed=1) for i in range(40)]
    assert all(v["mode"] in ("log", "lin", "int") for v in vals)
    assert all(v["pair"] in ("int", "a", "b") for v in vals)
    assert len({v["mode"] for v in vals}) == 3       # all arms reachable
    # bool bounds are not numeric bounds
    assert sample_space({"x": ["int", True, False]}, 0, seed=0)["x"] in (
        "int", True, False)


def test_sweep_maximizes_and_orders():
    def trial(p):
        return -abs(np.log10(p["lr"]) + 2.0)          # best near lr=1e-2

    res = sweep(trial, SPACE, n_trials=12, seed=0)
    assert len(res.trials) == 12
    assert res.best["score"] == max(t["score"] for t in res.trials)
    assert [t["trial"] for t in res.trials] == list(range(12))


def test_sweep_resumes_from_jsonl(tmp_path):
    log = str(tmp_path / "sweep.jsonl")
    calls = []

    def trial(p):
        calls.append(p)
        return p["sigma"]

    first = sweep(trial, SPACE, n_trials=4, seed=1, log_path=log)
    assert len(calls) == 4
    # resumed run with a larger budget re-runs ONLY the new trials...
    second = sweep(trial, SPACE, n_trials=6, seed=1, log_path=log)
    assert len(calls) == 6
    assert len(second.trials) == 6
    # ...and the replayed records carry the identical parameters the
    # deterministic sampler would re-propose
    for t in second.trials[:4]:
        assert t["params"] == sample_space(SPACE, t["trial"], seed=1)
    assert second.best["score"] == max(t["score"] for t in second.trials)
    assert first.best["score"] <= second.best["score"]


def test_sweep_survives_raising_trial(tmp_path):
    log = str(tmp_path / "sweep.jsonl")

    def trial(p):
        if p["decoder"] == "norm":
            raise RuntimeError("diverged")
        return 1.0

    res = sweep(trial, SPACE, n_trials=8, seed=2, log_path=log)
    assert len(res.trials) == 8
    failed = [t for t in res.trials if t["score"] is None]
    assert failed and all("diverged" in t["error"] for t in failed)
    assert res.best is not None and res.best["score"] == 1.0
    with open(log) as f:
        assert len(f.readlines()) == 8


def test_empty_result_best_is_none():
    assert SweepResult().best is None


@pytest.mark.slow
def test_cli_end_to_end_on_synthetic_volume(tmp_path):
    from mri_interpolation_tpu.io import synthetic_volume
    from mri_interpolation_tpu.io.nifti import save as nifti_save
    from mri_interpolation_tpu.train.sweep import main

    vol = np.asarray(synthetic_volume((12, 12, 12)), np.float32)
    path = str(tmp_path / "vol.nii.gz")
    nifti_save(vol, path)
    log = str(tmp_path / "sweep.jsonl")
    main(["--image_path", path, "--trials", "2", "--epochs", "2",
          "--batch_size", "256", "--log_path", log,
          "--space", json.dumps({"lr": ["log", 1e-3, 1e-2],
                                 "dim_hidden": [16]})])
    with open(log) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 2
    assert all(r["score"] is not None for r in recs)


@pytest.mark.slow
def test_cli_warp_odd_frames_objective(tmp_path):
    # the headline objective (held-out odd-frame PSNR) on the warp INR:
    # tiny synthetic 2D+t volume, 1 trial, single seed
    from mri_interpolation_tpu.io import synthetic_volume
    from mri_interpolation_tpu.io.nifti import save as nifti_save
    from mri_interpolation_tpu.train.sweep import main

    vol = np.asarray(synthetic_volume((10, 10, 7)), np.float32)
    path = str(tmp_path / "vol.nii.gz")
    nifti_save(vol, path)
    log = str(tmp_path / "sweep_warp.jsonl")
    main(["--image_path", path, "--model_class", "warp_inr",
          "--objective", "odd_frames", "--trials", "1", "--epochs", "2",
          "--batch_size", "128", "--log_path", log,
          "--space", json.dumps({"lr": ["log", 5e-3, 2e-2],
                                 "warp_accel": ["lin", 0.0, 2.0]})])
    with open(log) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 1 and recs[0]["score"] is not None
    assert "warp_accel" in recs[0]["params"]


@pytest.mark.slow
def test_cli_warp_ensembled_objective(tmp_path):
    from mri_interpolation_tpu.io import synthetic_volume
    from mri_interpolation_tpu.io.nifti import save as nifti_save
    from mri_interpolation_tpu.train.sweep import main

    vol = np.asarray(synthetic_volume((8, 8, 5)), np.float32)
    path = str(tmp_path / "vol.nii.gz")
    nifti_save(vol, path)
    log = str(tmp_path / "sweep_we.jsonl")
    main(["--image_path", path, "--model_class", "warp_inr",
          "--objective", "odd_frames", "--ens_seeds", "2",
          "--trials", "1", "--epochs", "2", "--batch_size", "64",
          "--log_path", log,
          "--space", json.dumps({"lr": ["log", 5e-3, 2e-2]})])
    with open(log) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 1 and recs[0]["score"] is not None
