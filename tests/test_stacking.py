"""Tests for train/stacking.py — LOO-stacked temporal interpolation."""

import numpy as np
import pytest

from mri_interpolation_tpu.train import TrainConfig
from mri_interpolation_tpu.train.stacking import (
    loo_fold_predictions,
    simplex_lstsq,
    stacked_interp_eval,
)
from mri_interpolation_tpu.train.stacking import (
    _cubic_family,
    _linear_family,
    _registration_family,
)

pytestmark = pytest.mark.slow  # full-pipeline/protocol layer (run with -m slow; excluded from the fast unit run)


def test_cubic_family_exact_on_quadratic_trajectories():
    # Catmull-Rom with finite-difference tangents reproduces quadratic
    # per-voxel intensity trajectories exactly on interior intervals.
    rng = np.random.default_rng(3)
    a, b, c = (rng.normal(size=(6, 6)).astype(np.float32) for _ in range(3))
    t_keep = np.linspace(0.0, 1.0, 6)
    frames = np.stack([a * t * t + b * t + c for t in t_keep], axis=-1)
    t_eval = np.asarray([0.3, 0.5, 0.7])      # interior (one-sided ends excluded)
    pred = _cubic_family()(frames, t_keep, t_eval)
    want = np.stack([a * t * t + b * t + c for t in t_eval], axis=-1)
    np.testing.assert_allclose(pred, want, atol=1e-5)
    # and it degrades to linear interpolation on linear trajectories
    frames_lin = np.stack([b * t + c for t in t_keep], axis=-1)
    pred_lin = _cubic_family()(frames_lin, t_keep, t_eval)
    want_lin = np.stack([b * t + c for t in t_eval], axis=-1)
    np.testing.assert_allclose(pred_lin, want_lin, atol=1e-5)


def test_cubic_family_nonuniform_knots_linear_exact():
    # Non-uniform spacing (the LOO folds' layout): linear trajectories are
    # still reproduced exactly — the scaled finite-difference tangents equal
    # the true slope, and linears lie in the cubic Hermite space.
    rng = np.random.default_rng(4)
    b, c = (rng.normal(size=(5, 5)).astype(np.float32) for _ in range(2))
    t_keep = np.asarray([0.0, 0.15, 0.5, 0.6, 1.0])
    frames = np.stack([b * t + c for t in t_keep], axis=-1)
    t_eval = np.asarray([0.3, 0.55, 0.8])
    pred = _cubic_family()(frames, t_keep, t_eval)
    want = np.stack([b * t + c for t in t_eval], axis=-1)
    np.testing.assert_allclose(pred, want, atol=1e-5)


def _blob(shape, center, sigma=0.12):
    axes = [np.linspace(0.0, 1.0, s, dtype=np.float32) for s in shape]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    d2 = np.sum((grid - np.asarray(center, np.float32)) ** 2, axis=-1)
    return np.exp(-d2 / (2.0 * sigma**2)).astype(np.float32)


def _moving_sequence(t_full=9, shape=(48, 48)):
    return np.stack([_blob(shape, (0.3 + 0.04 * t, 0.5)) for t in range(t_full)], axis=-1)


def test_simplex_lstsq_recovers_mixture():
    rng = np.random.default_rng(0)
    basis = rng.normal(size=(3, 500))
    w_true = np.asarray([0.6, 0.4, 0.0])
    target = w_true @ basis
    w = simplex_lstsq(basis, target)
    assert np.all(w >= -1e-9) and abs(w.sum() - 1.0) < 1e-6
    np.testing.assert_allclose(w, w_true, atol=0.05)


def test_simplex_lstsq_prefers_better_predictor():
    rng = np.random.default_rng(1)
    target = rng.normal(size=1000)
    good = target + 0.01 * rng.normal(size=1000)
    bad = target + 1.0 * rng.normal(size=1000)
    w = simplex_lstsq(np.stack([good, bad]), target)
    assert w[0] > 0.9


def test_loo_fold_predictions_shapes():
    img = _moving_sequence()
    even = img[..., ::2]
    t_keep = np.asarray([2 * j / (img.shape[-1] - 1) for j in range(even.shape[-1])])
    fams = {"linear": _linear_family()}
    folds, names = loo_fold_predictions(even, t_keep, fams)
    assert names == ["linear"]
    assert len(folds) == even.shape[-1] - 2
    for t_held, preds, target in folds:
        assert preds.shape == (1,) + even.shape[:-1]
        assert target.shape == even.shape[:-1]


def test_default_interp_families_include_subset():
    from mri_interpolation_tpu.train.stacking import default_interp_families

    fams = default_interp_families(
        TrainConfig(epochs=1), (16, 16, 9),
        include=("registration", "registration_group", "linear"))
    assert list(fams) == ["registration", "registration_group", "linear"]


def test_cache_dir_resumes_without_recomputation(tmp_path):
    # Family predictions are disk-memoized: a second run must reload the
    # cached arrays (bit-identical result) and never call the family again.
    img = _moving_sequence(t_full=7)
    calls = {"n": 0}
    lin = _linear_family()

    def counting(train_frames, t_keep, t_eval):
        calls["n"] += 1
        return lin(train_frames, t_keep, t_eval)

    fams = {"linear": counting}
    cache = str(tmp_path / "stack_cache")
    recon1, q1 = stacked_interp_eval(img, TrainConfig(epochs=1), families=fams,
                                     cache_dir=cache)
    n_first = calls["n"]
    assert n_first > 0
    recon2, q2 = stacked_interp_eval(img, TrainConfig(epochs=1), families=fams,
                                     cache_dir=cache)
    assert calls["n"] == n_first  # everything served from cache
    np.testing.assert_array_equal(recon1, recon2)
    assert q1["odd"]["psnr"] == q2["odd"]["psnr"]


def test_stacked_temporal_upsample_passthrough_and_quality():
    from mri_interpolation_tpu.train.stacking import stacked_temporal_upsample

    img = _moving_sequence(t_full=9)
    even = img[..., ::2]                      # 5 observed frames
    fams = {
        "registration": _registration_family(ctrl_sizes=(4, 8), pyramid=(2, 1), steps=120),
        "linear": _linear_family(),
    }
    out, weights = stacked_temporal_upsample(even, t_factor=2,
                                             config=TrainConfig(epochs=1),
                                             families=fams)
    assert out.shape == img.shape
    np.testing.assert_allclose(out[..., ::2], even, atol=0)
    assert abs(sum(weights["global"].values()) - 1.0) < 1e-6
    # fused in-between frames beat the cross-fade against the true sequence
    fade = 0.5 * (even[..., :-1] + even[..., 1:])
    mse_f = float(np.mean((out[..., 1::2] - img[..., 1::2]) ** 2))
    mse_l = float(np.mean((fade - img[..., 1::2]) ** 2))
    assert mse_f < mse_l, (mse_f, mse_l)


def test_stacking_cli_writes_nifti(tmp_path):
    from mri_interpolation_tpu.io import nifti
    from mri_interpolation_tpu.train.stacking import _main

    img = _moving_sequence(t_full=5, shape=(24, 24))
    src = str(tmp_path / "seq.nii.gz")
    nifti.save(img[:, :, None, :], src)       # (24,24,1,5) 4D volume
    dst = str(tmp_path / "sr.nii.gz")
    _main([src, "--out", dst, "--factor", "2", "--epochs", "1",
           "--families", "linear", "--slice_z", "0"])
    got = nifti.load(dst)
    assert got.shape == (24, 24, 9)


def test_stacked_interp_eval_picks_registration_on_motion():
    # On a translating blob, registration crushes cross-fade; the honest
    # LOO-stacked fusion must discover that and score near the best family.
    img = _moving_sequence()
    fams = {
        "registration": _registration_family(ctrl_sizes=(4, 8), pyramid=(2, 1), steps=120),
        "linear": _linear_family(),
    }
    recon, q = stacked_interp_eval(img, TrainConfig(epochs=1), families=fams)
    assert recon.shape == img.shape
    np.testing.assert_allclose(recon[..., ::2], img[..., ::2], atol=0)
    w = q["weights"]["global"]
    assert abs(sum(w.values()) - 1.0) < 1e-6
    assert w["registration"] > 0.6, w
    # fused prediction at least as good as the linear baseline
    lin = fams["linear"](img[..., ::2],
                         np.asarray([2 * j / 8 for j in range(5)]),
                         np.asarray([(2 * j + 1) / 8 for j in range(4)]))
    mse_f = float(np.mean((recon[..., 1::2] - img[..., 1::2]) ** 2))
    mse_l = float(np.mean((lin - img[..., 1::2]) ** 2))
    assert mse_f < mse_l


def test_stacked_interp_eval_4d_include_subset():
    """The --stacked4d configuration shape: a 4-D (x,y,z,t) volume, an
    ``include`` subset riding the warp kwargs, and a base_resolution
    override for the warp family's canonical encoder."""
    rng = np.random.default_rng(5)
    base = rng.random((6, 6, 3), dtype=np.float32)
    drift = rng.random((6, 6, 3), dtype=np.float32) * 0.1
    img = np.stack([base + t / 6.0 * drift for t in range(7)], axis=-1)

    cfg = TrainConfig(batch_size=256, epochs=1, lr=1e-2, seed=0)
    recon, q = stacked_interp_eval(
        img, cfg, seeds=(0,),
        include=("warp", "cubic", "linear"),
        base_resolution=(4, 4, 2),
        warp_hidden=8, warp_layers=2, dim_hidden=8, n_layers=2,
        n_levels=2, n_features_per_level=1, log2_hashmap_size=8,
        finest_resolution=(6, 6, 3))
    assert recon.shape == img.shape
    np.testing.assert_allclose(recon[..., ::2], img[..., ::2], atol=0)
    assert set(q["weights"]["global"]) == {"warp", "cubic", "linear"}
    assert np.isfinite(q["odd"]["psnr"])

def test_fusion_uncertainty_zero_on_agreement_and_weighted():
    from mri_interpolation_tpu.train.stacking import fusion_uncertainty

    rng = np.random.default_rng(7)
    base = rng.random((5, 5, 3), dtype=np.float32)
    # identical families -> zero disagreement everywhere
    preds = np.stack([base, base])
    w = np.full((3, 2), 0.5)
    sigma = fusion_uncertainty(preds, w)
    np.testing.assert_allclose(sigma, 0.0, atol=1e-7)
    # two families offset by +/- d with equal weight -> sigma == d
    d = 0.25
    preds = np.stack([base + d, base - d])
    sigma = fusion_uncertainty(preds, w)
    np.testing.assert_allclose(sigma, d, atol=1e-5)
    # weight w on one family: std of a 2-point distribution at distance 2d is
    # 2d*sqrt(w(1-w)), with w floored toward uniform by eps
    w2 = np.stack([np.full(3, 0.9), np.full(3, 0.1)], axis=-1)
    w_eff = 0.9 * 0.9 + 0.1 * 0.5
    sigma = fusion_uncertainty(preds, w2, eps=0.1)
    np.testing.assert_allclose(sigma, 2 * d * np.sqrt(w_eff * (1 - w_eff)), atol=1e-5)
    # one-hot weights (the LOO solver's common output) must NOT silence the
    # disagreement signal — the eps floor keeps sigma > 0
    w1h = np.stack([np.ones(3), np.zeros(3)], axis=-1)
    assert float(fusion_uncertainty(preds, w1h).min()) > 0.0


def test_uncertainty_calibration_detects_informative_sigma():
    from mri_interpolation_tpu.train.stacking import uncertainty_calibration

    rng = np.random.default_rng(8)
    sigma = rng.random(4000)
    err = sigma * rng.normal(size=4000)       # |err| scales with sigma
    cal = uncertainty_calibration(sigma, err)
    assert cal["pearson_r"] > 0.4
    assert cal["spearman_rho"] > 0.4
    rc = cal["risk_coverage"]
    assert rc["rmse"][0] < rc["rmse"][-1]     # low-sigma subset has lower risk
    assert len(rc["coverage"]) == len(rc["rmse"]) == 10
    # uninformative sigma: correlations near zero, flat-ish risk curve
    cal0 = uncertainty_calibration(rng.random(4000), err)
    assert abs(cal0["pearson_r"]) < 0.1


def test_stacked_interp_eval_reports_uncertainty():
    img = _moving_sequence(t_full=7, shape=(24, 24))
    fams = {"cubic": _cubic_family(), "linear": _linear_family()}
    _, q = stacked_interp_eval(img, TrainConfig(epochs=1), families=fams)
    unc = q["uncertainty"]
    assert unc["sigma_mean"] >= 0.0
    assert unc["sigma_p95"] >= unc["sigma_mean"] >= 0.0
    assert "pearson_r" in unc["calibration"]
    assert "_components" not in q["weights"]  # private channel must not leak


def test_stacked_temporal_upsample_uncertainty_surface():
    from mri_interpolation_tpu.train.stacking import stacked_temporal_upsample

    img = _moving_sequence(t_full=9, shape=(24, 24))
    even = img[..., ::2]
    fams = {"cubic": _cubic_family(), "linear": _linear_family()}
    out, weights, sigma = stacked_temporal_upsample(
        even, t_factor=2, config=TrainConfig(epochs=1), families=fams,
        return_uncertainty=True)
    assert sigma.shape == out.shape
    np.testing.assert_allclose(sigma[..., ::2], 0.0, atol=0)   # observed frames
    assert float(sigma[..., 1::2].max()) > 0.0                 # synthesized ones
    assert "_components" not in weights


def test_warp_and_transfer_families_share_fits(monkeypatch):
    """warp and warp_transfer train identical models on identical data —
    the fit memo must make the pair cost ONE ensemble. Count Trainer.fit
    calls across both families' deployments."""
    import mri_interpolation_tpu.train.stacking as stk
    from mri_interpolation_tpu.train.trainer import Trainer

    stk._FIT_MEMO.clear()
    calls = {"n": 0}
    orig_fit = Trainer.fit

    def counting_fit(self, *a, **k):
        calls["n"] += 1
        return orig_fit(self, *a, **k)

    monkeypatch.setattr(Trainer, "fit", counting_fit)

    rng = np.random.default_rng(3)
    img = rng.random((8, 8, 5), dtype=np.float32)
    even = img[..., ::2]
    t_keep = np.asarray([0.0, 0.5, 1.0])
    t_eval = np.asarray([0.25, 0.75])
    cfg = TrainConfig(batch_size=64, epochs=1, lr=1e-2)
    kw = dict(n_levels=2, n_features_per_level=1, log2_hashmap_size=8,
              base_resolution=(4, 4), finest_resolution=(8, 8),
              warp_hidden=8, warp_layers=2, dim_hidden=8, n_layers=2,
              warp_w0=5.0, warp_accel=1.0, warp_scale=0.05)
    warp = stk._warp_family(cfg, (0, 1), (8, 8, 5), **kw)
    transfer = stk._warp_transfer_family(cfg, (0, 1), **kw)
    warp(even, t_keep, t_eval)
    assert calls["n"] == 2
    transfer(even, t_keep, t_eval)
    assert calls["n"] == 2, "warp_transfer retrained instead of reusing fits"
    stk._FIT_MEMO.clear()


def test_warp_fit_disk_cache_survives_memo_eviction(monkeypatch, tmp_path):
    """The disk layer under the fit memo: after the in-process memo is
    cleared (a new process, a VM reset), re-deploying the same family must
    load params from disk instead of refitting, and predict identically."""
    import mri_interpolation_tpu.train.stacking as stk
    from mri_interpolation_tpu.train.trainer import Trainer

    stk._FIT_MEMO.clear()
    monkeypatch.setattr(stk, "_FIT_DISK_DIR", str(tmp_path / "fit_cache"))
    calls = {"n": 0}
    orig_fit = Trainer.fit

    def counting_fit(self, *a, **k):
        calls["n"] += 1
        return orig_fit(self, *a, **k)

    monkeypatch.setattr(Trainer, "fit", counting_fit)

    rng = np.random.default_rng(4)
    img = rng.random((8, 8, 5), dtype=np.float32)
    even = img[..., ::2]
    t_keep = np.asarray([0.0, 0.5, 1.0])
    t_eval = np.asarray([0.25, 0.75])
    cfg = TrainConfig(batch_size=64, epochs=1, lr=1e-2)
    kw = dict(n_levels=2, n_features_per_level=1, log2_hashmap_size=8,
              base_resolution=(4, 4), finest_resolution=(8, 8),
              warp_hidden=8, warp_layers=2, dim_hidden=8, n_layers=2,
              warp_w0=5.0, warp_accel=1.0, warp_scale=0.05)
    fam = stk._warp_transfer_family(cfg, (0,), **kw)
    first = fam(even, t_keep, t_eval)
    assert calls["n"] == 1
    stk._FIT_MEMO.clear()                       # simulate a fresh process
    second = fam(even, t_keep, t_eval)
    assert calls["n"] == 1, "refit despite a valid disk cache entry"
    np.testing.assert_allclose(second, first, rtol=0, atol=1e-6)
    stk._FIT_MEMO.clear()


def test_warp_transfer_avg_single_seed_matches_per_seed():
    """With ONE seed, consensus-motion transfer (average_motion=True) and the
    per-seed transfer are the same computation — predictions must agree to
    float tolerance. (With multiple seeds they differ by design: fields are
    averaged before the resample.)"""
    import mri_interpolation_tpu.train.stacking as stk

    stk._FIT_MEMO.clear()
    rng = np.random.default_rng(5)
    img = rng.random((8, 8, 5), dtype=np.float32)
    even = img[..., ::2]
    t_keep = np.asarray([0.0, 0.5, 1.0])
    t_eval = np.asarray([0.25, 0.75])
    cfg = TrainConfig(batch_size=64, epochs=2, lr=1e-2)
    kw = dict(n_levels=2, n_features_per_level=1, log2_hashmap_size=8,
              base_resolution=(4, 4), finest_resolution=(8, 8),
              warp_hidden=8, warp_layers=2, dim_hidden=8, n_layers=2,
              warp_w0=5.0, warp_accel=1.0, warp_scale=0.05)
    per_seed = stk._warp_transfer_family(cfg, (0,), use_residual=True, **kw)
    avg = stk._warp_transfer_family(cfg, (0,), use_residual=True,
                                    average_motion=True, **kw)
    a = per_seed(even, t_keep, t_eval)
    b = avg(even, t_keep, t_eval)
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-5)
    stk._FIT_MEMO.clear()


def test_warp_transfer_avg_in_default_families():
    from mri_interpolation_tpu.train.stacking import default_interp_families

    fams = default_interp_families(TrainConfig(epochs=1), (16, 16, 9),
                                   include="all")
    assert "warp_transfer_avg" in fams


def test_warp_transfer_res_cubic_in_default_families():
    from mri_interpolation_tpu.train.stacking import default_interp_families

    fams = default_interp_families(TrainConfig(epochs=1), (16, 16, 9),
                                   include="all")
    assert "warp_transfer_res_cubic" in fams


def test_warp_distill_fused_in_default_families():
    from mri_interpolation_tpu.train.stacking import default_interp_families

    fams = default_interp_families(TrainConfig(epochs=1), (16, 16, 9))
    assert "warp_distill_fused" in fams


def test_fused_teacher_is_mean_of_members_and_reuses_fits(monkeypatch):
    """The second-generation distill teacher must (a) equal the pointwise
    mean of its three member families and (b) reuse the warp fits through
    the memo — distilling must cost exactly len(seeds) NEW fits (the
    pseudo-labels change the training bytes), never a second teacher
    ensemble."""
    import mri_interpolation_tpu.train.stacking as stk
    from mri_interpolation_tpu.train.trainer import Trainer

    stk._FIT_MEMO.clear()
    calls = {"n": 0}
    orig_fit = Trainer.fit

    def counting_fit(self, *a, **k):
        calls["n"] += 1
        return orig_fit(self, *a, **k)

    monkeypatch.setattr(Trainer, "fit", counting_fit)

    rng = np.random.default_rng(5)
    img = rng.random((8, 8, 5), dtype=np.float32)
    even = img[..., ::2]
    t_keep = np.asarray([0.0, 0.5, 1.0])
    t_eval = np.asarray([0.25, 0.75])
    cfg = TrainConfig(batch_size=64, epochs=1, lr=1e-2)
    kw = dict(n_levels=2, n_features_per_level=1, log2_hashmap_size=8,
              base_resolution=(4, 4), finest_resolution=(8, 8),
              warp_hidden=8, warp_layers=2, dim_hidden=8, n_layers=2,
              warp_w0=5.0, warp_accel=1.0, warp_scale=0.05)
    seeds = (0, 1)
    teacher = stk._fused_teacher_family(cfg, seeds, **kw)
    got = teacher(even, t_keep, t_eval)
    assert calls["n"] == len(seeds)              # one transfer ensemble
    members = [
        stk._warp_transfer_family(cfg, seeds, use_residual=True, **kw),
        stk._registration_group_family(),
        stk._cubic_family(),
    ]
    want = np.mean([m(even, t_keep, t_eval) for m in members], axis=0)
    assert calls["n"] == len(seeds)              # memo hit, no refits
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    distilled = stk._warp_family(cfg, seeds, (8, 8, 5), distill=True,
                                 distill_teacher="fused", **kw)
    distilled(even, t_keep, t_eval)
    # exactly len(seeds) new fits (pseudo-labeled data); the teacher inside
    # reused the cached transfer fits
    assert calls["n"] == 2 * len(seeds)
    stk._FIT_MEMO.clear()


def test_default_families_accept_w0_accel_passthrough():
    """The documented **warp_kwargs passthrough must accept warp_w0 /
    warp_accel (previously a 'multiple values for keyword' TypeError that
    crashed the protocol before any fit)."""
    from mri_interpolation_tpu.train.stacking import default_interp_families

    fams = default_interp_families(TrainConfig(epochs=1), (16, 16, 9),
                                   include="all", warp_w0=4.0, warp_accel=2.0)
    assert "warp" in fams and "warp_noaccel" in fams


def test_spatial_weight_field_localizes_competence():
    # family A is accurate in the LEFT half, family B in the RIGHT half;
    # the pooled-smoothed-error field must weight each where it is good.
    from mri_interpolation_tpu.train.stacking import spatial_weight_field

    rng = np.random.default_rng(0)
    X = 64
    folds = []
    for k in range(4):
        target = rng.normal(size=(X, X)).astype(np.float64)
        a = target + np.where(np.arange(X)[:, None] < X // 2, 0.01, 1.0) * \
            rng.normal(size=(X, X))
        b = target + np.where(np.arange(X)[:, None] < X // 2, 1.0, 0.01) * \
            rng.normal(size=(X, X))
        folds.append((k / 4.0, np.stack([a, b]), target))
    w = spatial_weight_field(folds, sigma=4.0, temp=1.0)
    assert w.shape == (X, X, 2)
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-6)
    assert w[: X // 2 - 8, :, 0].mean() > 0.8       # A dominates left
    assert w[X // 2 + 8:, :, 1].mean() > 0.8        # B dominates right


def test_stacked_fuse_spatial_beats_temporal_on_split_competence():
    # With spatially-split family competence, the per-voxel field must beat
    # the temporal-only weights; the nested selector must also KEEP the
    # field (the structure transfers across folds by construction).
    from mri_interpolation_tpu.train.stacking import stacked_fuse

    rng = np.random.default_rng(1)
    X, T = 48, 9
    base = rng.normal(size=(X, X, T)).astype(np.float64)
    img = np.cumsum(base, axis=-1) * 0.05
    left = np.arange(X)[:, None] < X // 2

    def make_family(good_left):
        scale = np.where(left, 0.02 if good_left else 0.6,
                         0.6 if good_left else 0.02)
        def family(train_frames, t_keep, t_eval, scale=scale):
            out = []
            for t in np.asarray(t_eval):
                truth = np.stack([np.interp(t, np.linspace(0, 1, T), img[i, j])
                                  for i in range(X) for j in range(X)]
                                 ).reshape(X, X)
                noise = np.random.default_rng(int(t * 1e6) % 2**31).normal(size=(X, X))
                out.append(truth + scale * noise)
            return np.stack(out, axis=-1)
        return family

    fams = {"a": make_family(True), "b": make_family(False)}
    even = img[..., ::2]
    t_keep = np.asarray([2 * j / (T - 1) for j in range(even.shape[-1])])
    t_odd = np.asarray([(2 * j + 1) / (T - 1) for j in range((T - 1) // 2)])
    odd = img[..., 1::2]

    def mse(x):
        return float(np.mean((x - odd) ** 2))

    fused_t, w_t = stacked_fuse(even, t_keep, t_odd, fams, spatial="off")
    fused_s, w_s = stacked_fuse(even, t_keep, t_odd, fams, spatial="nested")
    w_t.pop("_components"); w_s.pop("_components")
    assert w_s["spatial"]["sigma"] > 0.0            # nested KEPT the field
    assert mse(fused_s) < mse(fused_t) * 0.5
    # forced hyperparameters follow the same path
    fused_f, w_f = stacked_fuse(even, t_keep, t_odd, fams,
                                spatial=(8.0, 1.0, 0.2))
    w_f.pop("_components")
    assert w_f["spatial"] == {"sigma": 8.0, "temp": 1.0, "spatial_shrink": 0.2}
    assert mse(fused_f) < mse(fused_t)


def test_fusion_uncertainty_accepts_weight_field():
    from mri_interpolation_tpu.train.stacking import fusion_uncertainty

    rng = np.random.default_rng(2)
    preds = rng.normal(size=(3, 8, 8, 5)).astype(np.float32)
    w_time = np.full((5, 3), 1 / 3, np.float32)
    w_field = np.full((8, 8, 5, 3), 1 / 3, np.float32)
    s_time = fusion_uncertainty(preds, w_time)
    s_field = fusion_uncertainty(preds, w_field)
    assert s_time.shape == s_field.shape == (8, 8, 5)
    np.testing.assert_allclose(s_time, s_field, atol=1e-6)


def test_fusion_oracles_orders_and_bounds():
    from mri_interpolation_tpu.train.stacking import fusion_oracles

    rng = np.random.default_rng(3)
    target = rng.normal(size=(16, 16, 4)).astype(np.float64)
    deploy = np.stack([target + 0.3 * rng.normal(size=target.shape)
                       for _ in range(3)])
    o = fusion_oracles(deploy, target)
    # each oracle is at least as strong as the previous constraint level
    assert o["per_time_simplex"] >= o["global_simplex"] - 1e-6
    assert o["per_time_unconstrained"] >= o["per_time_simplex"] - 1e-6
    assert o["per_voxel_best_family"] >= o["global_simplex"] - 1e-6


def test_stacked_fuse_robust_median_shrink_on_outlier_family():
    # One family is a heavy-tailed per-voxel outlier: the median shrink must
    # be KEPT by the nested selector and reduce deployment error; a forced
    # lam follows the same path; lam is recorded in weights["robust"].
    from mri_interpolation_tpu.train.stacking import stacked_fuse

    rng = np.random.default_rng(5)
    X, T = 32, 9
    base = rng.normal(size=(X, X, T)).astype(np.float64)
    img = np.cumsum(base, axis=-1) * 0.05

    def make_family(kind, seed):
        def family(train_frames, t_keep, t_eval):
            out = []
            for t in np.asarray(t_eval):
                truth = np.stack([np.interp(t, np.linspace(0, 1, T), img[i, j])
                                  for i in range(X) for j in range(X)]
                                 ).reshape(X, X)
                r = np.random.default_rng((seed + int(t * 1e6)) % 2**31)
                if kind == "good":
                    out.append(truth + 0.05 * r.normal(size=(X, X)))
                else:  # sparse gross outliers the simplex weights can't fix
                    noise = np.where(r.random((X, X)) < 0.05,
                                     r.normal(size=(X, X)) * 3.0, 0.0)
                    out.append(truth + noise)
            return np.stack(out, axis=-1)
        return family

    fams = {"a": make_family("good", 1), "b": make_family("good", 2),
            "c": make_family("outlier", 3)}
    even = img[..., ::2]
    t_keep = np.asarray([2 * j / (T - 1) for j in range(even.shape[-1])])
    t_odd = np.asarray([(2 * j + 1) / (T - 1) for j in range((T - 1) // 2)])
    odd = img[..., 1::2]

    def mse(x):
        return float(np.mean((x - odd) ** 2))

    fused0, w0 = stacked_fuse(even, t_keep, t_odd, fams, robust="off")
    fusedr, wr = stacked_fuse(even, t_keep, t_odd, fams,
                              robust="median_nested")
    w0.pop("_components"); wr.pop("_components")
    assert "robust" not in w0
    assert wr["robust"]["mode"] == "median_shrink"
    assert wr["robust"]["lam"] > 0.0                # nested KEPT the shrink
    assert mse(fusedr) < mse(fused0)
    fusedf, wf = stacked_fuse(even, t_keep, t_odd, fams, robust=0.5)
    wf.pop("_components")
    assert wf["robust"]["lam"] == 0.5


def test_median_shrink_selected_against_deployed_predictor():
    # When a spatial field is kept, lam must be scored against the
    # spatial-fused held-fold predictor, not the temporal-only one (advisor
    # round 4): with a strong left/right competence split, the spatial field
    # already fixes most of what the median would — the two selections may
    # legitimately differ, but both must be valid candidates and the
    # spatial-conditioned path must run end to end.
    from mri_interpolation_tpu.train.stacking import (
        _heldout_fused_preds, _select_median_shrink_nested)

    rng = np.random.default_rng(11)
    sp = (16, 16)
    folds = []
    for k in range(4):
        tgt = rng.normal(size=sp)
        p0 = tgt + 0.03 * rng.normal(size=sp)
        p0[:, 8:] += 0.6 * rng.normal(size=(16, 8))     # bad on the right
        p1 = tgt + 0.03 * rng.normal(size=sp)
        p1[:, :8] += 0.6 * rng.normal(size=(16, 8))     # bad on the left
        p2 = tgt + 0.8 * rng.normal(size=sp)            # outlier family
        folds.append((k / 4.0, np.stack([p0, p1, p2]), tgt))

    lam_t = _select_median_shrink_nested(folds, 0.5)
    lam_s = _select_median_shrink_nested(folds, 0.5,
                                         spatial_params=(2.0, 1.0, 0.3))
    assert lam_t in (0.0, 0.25, 0.5, 0.75, 1.0)
    assert lam_s in (0.0, 0.25, 0.5, 0.75, 1.0)
    # the spatial-conditioned held-fold predictor must beat the
    # temporal-only one on these folds (that's what conditioning means)
    pred_t = _heldout_fused_preds(folds, 0.5)
    pred_s = _heldout_fused_preds(folds, 0.5, (2.0, 1.0, 0.3))
    mse_t = np.mean([np.mean((p - f[2]) ** 2) for p, f in zip(pred_t, folds)])
    mse_s = np.mean([np.mean((p - f[2]) ** 2) for p, f in zip(pred_s, folds)])
    assert mse_s < mse_t


def test_stacked_fuse_robust_warns_without_loo():
    import pytest as _pytest

    from mri_interpolation_tpu.train.stacking import stacked_fuse

    img = np.random.default_rng(0).normal(size=(8, 8, 2)).astype(np.float64)

    def fam(train_frames, t_keep, t_eval):
        return np.repeat(train_frames[..., :1], len(t_eval), axis=-1)

    with _pytest.warns(UserWarning, match="robust"):
        fused, w = stacked_fuse(img, np.asarray([0.0, 1.0]),
                                np.asarray([0.5]), {"a": fam},
                                robust="median_nested")
    assert "robust" not in w


# ---------------------------------------------------------------------------
# slice4d_families — through-plane (z-context) adapters (round 5)


def test_slice_affine_norm_exact_map():
    from mri_interpolation_tpu.io.volume import normalize_intensity
    from mri_interpolation_tpu.train.stacking import slice_affine_norm

    rng = np.random.default_rng(0)
    raw = rng.uniform(100.0, 900.0, size=(6, 6, 4, 5))
    raw[0, 0, 0, 0] = 1000.0          # global max off the z=2 slice
    vol_n = normalize_intensity(raw)
    slc_n = normalize_intensity(raw[:, :, 2, :])
    a, b = slice_affine_norm(vol_n, slc_n, 2)
    np.testing.assert_allclose(a * vol_n[:, :, 2, :] + b, slc_n, atol=1e-5)
    assert a > 1.0                     # slice has narrower raw range


def test_slice_affine_norm_rejects_mismatched_data():
    from mri_interpolation_tpu.train.stacking import slice_affine_norm

    rng = np.random.default_rng(1)
    vol = rng.random((5, 5, 3, 4))
    with pytest.raises(AssertionError):
        slice_affine_norm(vol, rng.random((5, 5, 4)), 1)


def _fake_4d_family_env(tmp_path):
    """A tiny synthetic 4D setup: T=5 frames, slice z=1, a recording family."""
    rng = np.random.default_rng(2)
    vol = rng.random((6, 6, 3, 5)).astype(np.float32)
    calls = []

    def fake_builder(config, eval_shape, seeds, include=None, **kw):
        def family(train_frames, t_keep, t_eval):
            calls.append((train_frames.shape, tuple(np.round(t_keep, 3)),
                          tuple(np.round(t_eval, 3))))
            # prediction = mean of the kept frames, broadcast over t_eval
            m = train_frames.mean(axis=-1, keepdims=True)
            return np.repeat(m, len(t_eval), axis=-1)

        return {n: family for n in (include or ("warp",))}

    return vol, calls, fake_builder


def test_slice4d_family_protocol_alignment_and_honesty(tmp_path, monkeypatch):
    from mri_interpolation_tpu.train import stacking

    vol, calls, fake_builder = _fake_4d_family_env(tmp_path)
    monkeypatch.setattr(stacking, "default_interp_families", fake_builder)
    fams = stacking.slice4d_families(
        TrainConfig(epochs=1), vol, z=1, include=("warp",),
        cache4d_dir=str(tmp_path / "c4d"))
    assert list(fams) == ["z4d_warp"]
    T = vol.shape[-1]                  # 5 frames; even keep = 0,2,4
    t_keep = np.asarray([0.0, 0.5, 1.0])
    t_odd = np.asarray([0.25, 0.75])
    train2d = vol[:, :, 1, ::2]

    # deploy call: full even set -> odd times; caches under deploy_warp
    pred = fams["z4d_warp"](train2d, t_keep, t_odd)
    assert pred.shape == (6, 6, 2)
    # the 4D family saw the 4D even-frame volume, not the slice
    assert calls[-1][0] == (6, 6, 3, 3)
    assert stacking.has_cached_prediction(str(tmp_path / "c4d"), "deploy_warp")
    # expected value: z-slice of the kept-frames mean (affine = identity)
    want = np.repeat(vol[:, :, :, ::2].mean(axis=-1, keepdims=True)[:, :, 1],
                     2, axis=-1)
    np.testing.assert_allclose(pred, want, atol=1e-3)  # fp16 cache roundtrip

    # LOO fold call: held even frame 2 (t=0.5) -> fold1 key, squeezed layout
    n_call = len(calls)
    pred_f = fams["z4d_warp"](vol[:, :, 1, [0, 4]], np.asarray([0.0, 1.0]),
                              np.asarray([0.5]))
    assert pred_f.shape == (6, 6, 1)
    assert stacking.has_cached_prediction(str(tmp_path / "c4d"), "fold1_warp")
    # replay from cache: no new family call
    fams["z4d_warp"](vol[:, :, 1, [0, 4]], np.asarray([0.0, 1.0]),
                     np.asarray([0.5]))
    assert len(calls) == n_call + 1

    # honesty: odd kept frames are rejected
    with pytest.raises(AssertionError, match="even-frame-only"):
        fams["z4d_warp"](vol[:, :, 1, [1, 3]], np.asarray([0.25, 0.75]),
                         np.asarray([0.5]))


def test_slice4d_applies_affine_norm(tmp_path, monkeypatch):
    from mri_interpolation_tpu.train import stacking

    vol, _, fake_builder = _fake_4d_family_env(tmp_path)
    monkeypatch.setattr(stacking, "default_interp_families", fake_builder)
    fams = stacking.slice4d_families(
        TrainConfig(epochs=1), vol, z=1, include=("warp",),
        slice_norm=(2.0, -0.5))
    pred = fams["z4d_warp"](vol[:, :, 1, ::2], np.asarray([0.0, 0.5, 1.0]),
                            np.asarray([0.25]))
    want = 2.0 * vol[:, :, :, ::2].mean(axis=-1)[:, :, 1] - 0.5
    np.testing.assert_allclose(pred[..., 0], want, atol=1e-6)
