"""Tests for infer/registration.py — motion-compensated temporal interpolation.

New capability beyond the reference (whose temporal tools are the ITK linear
resampler, reference interp.py:46-50, and direct INR fits): symmetric pairwise
/ group registration of frames with midpoint synthesis.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mri_interpolation_tpu.infer.registration import (

    warp_frame,
    register_pair,
    synthesize_frame,
    register_even_frames,
    motion_compensated_upsample,
    register_group_temporal,
    group_motion_upsample,
)

pytestmark = pytest.mark.slow  # full-pipeline/protocol layer (run with -m slow; excluded from the fast unit run)


def _blob(shape, center, sigma=0.12):
    """Smooth Gaussian blob on a [0,1]^d grid (registration-friendly)."""
    axes = [np.linspace(0.0, 1.0, s, dtype=np.float32) for s in shape]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    d2 = np.sum((grid - np.asarray(center, np.float32)) ** 2, axis=-1)
    return np.exp(-d2 / (2.0 * sigma**2)).astype(np.float32)


def test_warp_zero_displacement_is_identity():
    frame = _blob((32, 32), (0.4, 0.6))
    disp = jnp.zeros((32, 32, 2), jnp.float32)
    out = np.asarray(warp_frame(jnp.asarray(frame), disp))
    np.testing.assert_allclose(out, frame, atol=1e-6)


def test_warp_constant_shift_moves_blob():
    # Displacement +0.25 along axis 0: output(x) = frame(x + 0.25) — the
    # blob APPEARS shifted toward smaller indices.
    frame = _blob((64, 64), (0.5, 0.5))
    disp = jnp.zeros((64, 64, 2), jnp.float32).at[..., 0].set(0.25)
    out = np.asarray(warp_frame(jnp.asarray(frame), disp))
    expected = _blob((64, 64), (0.25, 0.5))
    assert np.mean((out - expected) ** 2) < 1e-4


def test_synthesize_frame_endpoints():
    a = _blob((48, 48), (0.35, 0.5))
    b = _blob((48, 48), (0.65, 0.5))
    ctrl = register_pair(a, b, ctrl_sizes=(4, 8), pyramid=(2, 1), steps=60)
    at_0 = np.asarray(synthesize_frame(a, b, ctrl, tau=0.0))
    at_1 = np.asarray(synthesize_frame(a, b, ctrl, tau=1.0))
    np.testing.assert_allclose(at_0, a, atol=1e-5)
    np.testing.assert_allclose(at_1, b, atol=1e-5)


def test_register_pair_beats_crossfade_on_translation():
    # Midpoint of a moving blob: motion-compensated synthesis must beat the
    # 50/50 cross-fade (which ghosts two half-intensity blobs).
    a = _blob((64, 64), (0.38, 0.5))
    b = _blob((64, 64), (0.62, 0.5))
    true_mid = _blob((64, 64), (0.5, 0.5))
    ctrl = register_pair(a, b, ctrl_sizes=(4, 8), pyramid=(2, 1), steps=150)
    mid = np.asarray(synthesize_frame(a, b, ctrl, tau=0.5))
    mse_reg = float(np.mean((mid - true_mid) ** 2))
    mse_fade = float(np.mean((0.5 * (a + b) - true_mid) ** 2))
    assert mse_reg < 0.3 * mse_fade, (mse_reg, mse_fade)


def _moving_sequence(t_full=9, shape=(48, 48)):
    centers = [(0.3 + 0.04 * t, 0.5) for t in range(t_full)]
    return np.stack([_blob(shape, c) for c in centers], axis=-1)


def test_motion_compensated_upsample_passthrough_and_quality():
    img = _moving_sequence()
    even = img[..., ::2]
    recon = motion_compensated_upsample(
        even, img.shape[-1], ctrl_sizes=(4, 8), pyramid=(2, 1), steps=120)
    assert recon.shape == img.shape
    # observed frames pass through exactly
    np.testing.assert_allclose(recon[..., ::2], even, atol=0)
    # held-out frames: compensated midpoint beats the cross-fade
    fade = 0.5 * (even[..., :-1] + even[..., 1:])
    mse_reg = float(np.mean((recon[..., 1::2] - img[..., 1::2]) ** 2))
    mse_fade = float(np.mean((fade - img[..., 1::2]) ** 2))
    assert mse_reg < 0.5 * mse_fade, (mse_reg, mse_fade)


def test_group_motion_upsample_matches_api_and_beats_fade():
    img = _moving_sequence()
    even = img[..., ::2]
    ctrl = register_group_temporal(
        even, ctrl_sizes=(4, 8), pyramid=(2, 1), steps=150)
    assert ctrl.shape[0] == even.shape[-1]
    recon = group_motion_upsample(even, img.shape[-1], ctrl=ctrl)
    assert recon.shape == img.shape
    np.testing.assert_allclose(recon[..., ::2], even, atol=0)
    fade = 0.5 * (even[..., :-1] + even[..., 1:])
    mse_reg = float(np.mean((recon[..., 1::2] - img[..., 1::2]) ** 2))
    mse_fade = float(np.mean((fade - img[..., 1::2]) ** 2))
    assert mse_reg < mse_fade, (mse_reg, mse_fade)


def test_group_synthesize_at_matches_uniform_upsample_interior():
    # On the uniform even/odd-midpoint layout, the generalized Hermite
    # synthesis must reproduce group_motion_upsample's Catmull-Rom odd
    # frames exactly on interior segments (end segments use one-sided
    # tangents and may differ).
    from mri_interpolation_tpu.infer.registration import group_synthesize_at

    img = _moving_sequence()
    even = img[..., ::2]
    ctrl = register_group_temporal(
        even, ctrl_sizes=(4, 8), pyramid=(2, 1), steps=120)
    recon = group_motion_upsample(even, img.shape[-1], ctrl=ctrl)
    T = even.shape[-1]
    t_knots = np.asarray([2 * j / (img.shape[-1] - 1) for j in range(T)])
    t_mid = np.asarray([(2 * j + 1) / (img.shape[-1] - 1) for j in range(1, T - 2)])
    out = group_synthesize_at(even, t_knots, t_mid, ctrl=ctrl)
    ref = np.stack([recon[..., 2 * j + 1] for j in range(1, T - 2)], axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_group_synthesize_at_nonuniform_knots_track_motion():
    # Drop one interior even frame (the LOO-fold geometry): the trajectory
    # interpolated across the double gap must still beat the cross-fade at
    # the held-out position.
    from mri_interpolation_tpu.infer.registration import group_synthesize_at

    img = _moving_sequence(t_full=13)
    even = img[..., ::2]                      # 7 frames at t = 0,2,..,12
    keep = [0, 1, 2, 4, 5, 6]                 # drop even frame 3 (t=6)
    sub = even[..., keep]
    t_knots = np.asarray([2 * j / 12 for j in keep])
    pred = group_synthesize_at(sub, t_knots, np.asarray([0.5]),
                               ctrl_sizes=(4, 8), pyramid=(2, 1), steps=150)
    truth = img[..., 6]
    fade = 0.5 * (even[..., 2] + even[..., 4])
    mse_g = float(np.mean((pred[..., 0] - truth) ** 2))
    mse_f = float(np.mean((fade - truth) ** 2))
    assert mse_g < mse_f, (mse_g, mse_f)


def test_upsample_rejects_incompatible_t():
    even = _moving_sequence()[..., ::2]
    with pytest.raises(ValueError):
        motion_compensated_upsample(even, 42)


def test_registration_interp_eval_protocol():
    from mri_interpolation_tpu.train.protocols import registration_interp_eval

    img = _moving_sequence()
    recon, q = registration_interp_eval(
        img, ctrl_sizes=(4, 8), pyramid=(2, 1), steps=60)
    assert recon.shape == img.shape
    assert set(q) == {"full", "odd"}
    assert np.isfinite(q["odd"]["psnr"]) and q["odd"]["psnr"] > 10.0


def test_group_synthesize_cubic_appearance_beats_crossfade_on_curvature():
    """Static scene, quadratic intensity in time: the motion fields are ~0,
    so appearance='cubic' must reproduce interior midpoints (the spline is
    exact on quadratics) while the linear cross-fade cannot."""
    from mri_interpolation_tpu.infer.registration import group_synthesize_at

    rng = np.random.default_rng(0)
    a = rng.random((12, 12), dtype=np.float32)
    b = rng.random((12, 12), dtype=np.float32) * 0.5
    t_knots = np.linspace(0.0, 1.0, 6)
    frames = np.stack([a + b * (t - 0.4) ** 2 for t in t_knots], axis=-1)
    t_eval = (t_knots[1:-2] + t_knots[2:-1]) / 2  # interior midpoints
    truth = np.stack([a + b * (t - 0.4) ** 2 for t in t_eval], axis=-1)

    common = dict(ctrl_sizes=(4,), pyramid=(1,), steps=30, smooth_t=1e3)
    lin = group_synthesize_at(frames, t_knots, t_eval, **common)
    cub = group_synthesize_at(frames, t_knots, t_eval, appearance="cubic", **common)
    mse_lin = float(np.mean((lin - truth) ** 2))
    mse_cub = float(np.mean((cub - truth) ** 2))
    assert mse_cub < 0.25 * mse_lin, (mse_cub, mse_lin)


def test_motion_transfer_exact_on_known_translation():
    """A blob translating at constant velocity, with the TRUE displacement
    field handed in: motion transfer reconstructs the midpoint frame almost
    exactly (sub-voxel bilinear error only) where the cross-fade ghosts.

    Sign convention: the warp INR models frame_t(x) = canonical(x + d(x,t)),
    so a blob whose center MOVES by +v·t has d(x,t) = -v·t.
    """
    from mri_interpolation_tpu.infer.registration import motion_transfer_at

    v = np.asarray([0.2, 0.0], np.float32)

    def frame_at(t):
        return _blob((64, 64), (0.35 + v[0] * t, 0.5 + v[1] * t))

    frames = np.stack([frame_at(0.0), frame_at(1.0)], axis=-1)
    truth = frame_at(0.5)

    def warp_field(x):
        return -x[:, -1:] * v[None, :]

    pred = motion_transfer_at(frames, [0.0, 1.0], [0.5], warp_field)[..., 0]
    fade = 0.5 * frames[..., 0] + 0.5 * frames[..., 1]
    mse_transfer = float(np.mean((pred - truth) ** 2))
    mse_fade = float(np.mean((fade - truth) ** 2))
    assert mse_transfer < 0.02 * mse_fade, (mse_transfer, mse_fade)


def test_motion_transfer_reproduces_kept_frames():
    """At an eval time equal to a kept time the fixed point is y = x and the
    observed frame must come back (up to the fixed-point residual of a
    spatially-VARYING field, which the 2-iteration inversion bounds)."""
    from mri_interpolation_tpu.infer.registration import motion_transfer_at

    axes = [np.linspace(0.0, 1.0, 48, dtype=np.float32)] * 2
    gx, gy = np.meshgrid(*axes, indexing="ij")
    frames = np.stack([
        _blob((48, 48), (0.4, 0.5)),
        _blob((48, 48), (0.5, 0.55)),
        _blob((48, 48), (0.6, 0.5)),
    ], axis=-1)

    def warp_field(x):
        # spatially-varying, temporally-growing displacement, |d| <= 0.03
        d0 = 0.03 * np.sin(2 * np.pi * np.asarray(x[:, 0])) * np.asarray(x[:, -1])
        d1 = 0.02 * np.cos(2 * np.pi * np.asarray(x[:, 1])) * np.asarray(x[:, -1])
        return np.stack([d0, d1], axis=-1).astype(np.float32)

    pred = motion_transfer_at(frames, [0.0, 0.5, 1.0], [0.0, 0.5, 1.0], warp_field)
    for k in range(3):
        err = float(np.max(np.abs(pred[..., k] - frames[..., k])))
        assert err < 0.03, (k, err)


def test_motion_transfer_family_trains_and_beats_fade():
    """End-to-end: the stacking protocol's warp_transfer family (trains a
    tiny warp INR, transfers data appearance along its field) on a moving
    blob. Must beat the linear cross-fade on the held-out odd frames.

    Geometry notes (found by probing): the accel prior's probe spacing
    ``warp_accel_dt`` must be ~half the KEPT-frame spacing or the learned
    d(x, t) is free to be a step function between observed frames (locally
    linear at the probe scale but useless for interpolation); and the
    fixed-point inversion needs enough iterations for the warp magnitude
    (fp_iters default 8 — at 2, inversion error dominated)."""
    from mri_interpolation_tpu.train import TrainConfig
    from mri_interpolation_tpu.train.stacking import (
        _linear_family,
        _warp_transfer_family,
    )

    step = 0.05
    centers = [(0.25 + step * t, 0.5) for t in range(9)]
    img = np.stack([_blob((32, 32), c, sigma=0.10) for c in centers], axis=-1)
    even = img[..., ::2]
    t_keep = np.linspace(0.0, 1.0, 5)
    t_eval = (t_keep[:-1] + t_keep[1:]) / 2
    truth = img[..., 1::2]

    cfg = TrainConfig(batch_size=1024, epochs=150, lr=1e-2)
    fam = _warp_transfer_family(
        cfg, seeds=(0,), n_levels=2, n_features_per_level=2,
        log2_hashmap_size=10, base_resolution=(8, 8),
        finest_resolution=(32, 32), warp_hidden=16, warp_layers=3,
        warp_w0=5.0, warp_accel=1.0, warp_accel_dt=0.125, warp_scale=0.3)
    pred = fam(even, t_keep, t_eval)
    assert pred.shape == truth.shape
    fade = _linear_family()(even, t_keep, t_eval)
    mse_transfer = float(np.mean((pred - truth) ** 2))
    mse_fade = float(np.mean((fade - truth) ** 2))
    assert np.isfinite(mse_transfer)
    assert mse_transfer < 0.5 * mse_fade, (mse_transfer, mse_fade)


def test_warp_transfer_in_default_families():
    from mri_interpolation_tpu.train import TrainConfig
    from mri_interpolation_tpu.train.stacking import default_interp_families

    fams = default_interp_families(TrainConfig(epochs=1), (16, 16, 9))
    assert "warp_transfer" in fams


def test_motion_transfer_3d_spatial():
    """motion_transfer_at on a 3D+t volume (the --stacked4d configuration):
    a trilinearly-sampled translating blob with the TRUE field handed in."""
    from mri_interpolation_tpu.infer.registration import motion_transfer_at

    v = np.asarray([0.15, 0.0, 0.1], np.float32)

    def frame_at(t):
        axes = [np.linspace(0.0, 1.0, s, dtype=np.float32) for s in (24, 24, 12)]
        grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
        c = np.asarray([0.4, 0.5, 0.4], np.float32) + v * t
        d2 = np.sum((grid - c) ** 2, axis=-1)
        return np.exp(-d2 / (2.0 * 0.12**2)).astype(np.float32)

    frames = np.stack([frame_at(0.0), frame_at(1.0)], axis=-1)
    truth = frame_at(0.5)

    def warp_field(x):
        return -x[:, -1:] * v[None, :]

    pred = motion_transfer_at(frames, [0.0, 1.0], [0.5], warp_field)[..., 0]
    fade = 0.5 * frames[..., 0] + 0.5 * frames[..., 1]
    mse_transfer = float(np.mean((pred - truth) ** 2))
    mse_fade = float(np.mean((fade - truth) ** 2))
    # residual error is trilinear resampling on the coarse 12-voxel z axis
    assert mse_transfer < 0.15 * mse_fade, (mse_transfer, mse_fade)


def test_motion_transfer_cubic_exact_on_quadratic_intensity():
    """Zero motion + quadratic intensity trajectory: appearance='cubic'
    reduces to the plain intensity-space Hermite, exact on quadratics at
    interior segments, while the linear transfer cross-fades."""
    from mri_interpolation_tpu.infer.registration import motion_transfer_at

    rng = np.random.default_rng(0)
    a = rng.random((12, 12), dtype=np.float32)
    b = rng.random((12, 12), dtype=np.float32) * 2.0
    t_keep = np.linspace(0.0, 1.0, 6)
    frames = np.stack([a + b * (t - 0.4) ** 2 for t in t_keep], axis=-1)
    t_eval = (t_keep[1:-2] + t_keep[2:-1]) / 2       # interior midpoints
    truth = np.stack([a + b * (t - 0.4) ** 2 for t in t_eval], axis=-1)

    zero_field = lambda x: jnp.zeros_like(x[:, :-1])
    cub = motion_transfer_at(frames, t_keep, t_eval, zero_field,
                             appearance="cubic")
    lin = motion_transfer_at(frames, t_keep, t_eval, zero_field)
    np.testing.assert_allclose(cub, truth, atol=1e-5)
    assert float(np.mean((lin - truth) ** 2)) > 1e-5


def test_motion_transfer_cubic_with_motion_beats_linear_transfer():
    """Moving blob whose peak intensity varies quadratically in time, TRUE
    field handed in: cubic-appearance transfer must beat linear-appearance
    transfer (both are motion-aligned; only cubic models the intensity
    curvature)."""
    from mri_interpolation_tpu.infer.registration import motion_transfer_at

    v = np.asarray([0.3, 0.0], np.float32)
    t_keep = np.linspace(0.0, 1.0, 6)
    t_eval = (t_keep[2:3] + t_keep[3:4]) / 2          # one interior midpoint

    def frame_at(t):
        amp = 1.0 + 0.8 * (t - 0.4) ** 2
        return amp * _blob((48, 48), (0.3 + v[0] * t, 0.5))

    frames = np.stack([frame_at(t) for t in t_keep], axis=-1)
    truth = frame_at(float(t_eval[0]))[..., None]

    def warp_field(x):
        return -x[:, -1:] * v[None, :]

    cub = motion_transfer_at(frames, t_keep, t_eval, warp_field,
                             appearance="cubic")
    lin = motion_transfer_at(frames, t_keep, t_eval, warp_field)
    mse_c = float(np.mean((cub - truth) ** 2))
    mse_l = float(np.mean((lin - truth) ** 2))
    assert mse_c < 0.5 * mse_l, (mse_c, mse_l)


def test_warp_transfer_cubic_in_default_families():
    from mri_interpolation_tpu.train import TrainConfig
    from mri_interpolation_tpu.train.stacking import default_interp_families

    fams = default_interp_families(TrainConfig(epochs=1), (16, 16, 9),
                                   include="all")
    assert "warp_transfer_cubic" in fams


def test_motion_transfer_residual_corrects_contrast_drift():
    """Static scene with a nonlinear global contrast drift a(t): the plain
    transfer cross-fades a(t) linearly between kept times; handing in the
    TRUE residual field corrects it almost exactly. At kept times the
    correction is zero by construction (blend reduces to the sample)."""
    from mri_interpolation_tpu.infer.registration import motion_transfer_at

    base = _blob((32, 32), (0.5, 0.5))
    amp = lambda t: 1.0 + 0.5 * np.sin(np.pi * t)     # nonlinear drift
    t_keep = np.asarray([0.0, 0.5, 1.0])
    t_eval = np.asarray([0.25, 0.75])
    frames = np.stack([amp(t) * base for t in t_keep], axis=-1)
    truth = np.stack([amp(t) * base for t in t_eval], axis=-1)

    zero_field = lambda x: jnp.zeros_like(x[:, :-1])
    rs = 0.5

    def residual_field(x):
        # frame_t = base + rs*r(x,t) with r = (amp(t)-1)/rs * base(x);
        # the blob is analytic, so evaluate it directly at x
        t = x[:, -1]
        d2 = jnp.sum((x[:, :-1] - 0.5) ** 2, axis=-1)
        b = jnp.exp(-d2 / (2.0 * 0.12**2))
        return (((1.0 + 0.5 * jnp.sin(jnp.pi * t)) - 1.0) / rs * b)[:, None]

    plain = motion_transfer_at(frames, t_keep, t_eval, zero_field)
    corrected = motion_transfer_at(frames, t_keep, t_eval, zero_field,
                                   residual_field=residual_field,
                                   residual_scale=rs)
    mse_plain = float(np.mean((plain - truth) ** 2))
    mse_corr = float(np.mean((corrected - truth) ** 2))
    assert mse_corr < 0.05 * mse_plain, (mse_corr, mse_plain)

    # kept times: correction exactly zero -> observed frames reproduced
    at_kept = motion_transfer_at(frames, t_keep, t_keep, zero_field,
                                 residual_field=residual_field,
                                 residual_scale=rs)
    np.testing.assert_allclose(at_kept, frames, atol=1e-5)


def test_warp_transfer_res_in_default_families():
    from mri_interpolation_tpu.train import TrainConfig
    from mri_interpolation_tpu.train.stacking import default_interp_families

    fams = default_interp_families(TrainConfig(epochs=1), (16, 16, 9),
                                   include="all")
    assert "warp_transfer_res" in fams


def test_registration_device_pin(monkeypatch):
    """MRI_TPU_REG_DEVICE pins the classical solvers' computation to the
    named backend (the axon-TPU group-synthesis kernel-fault escape hatch);
    results must match the unpinned run on the same backend."""
    import jax

    from mri_interpolation_tpu.infer.registration import (
        group_synthesize_at,
        register_pair,
        synthesize_frame,
    )

    frames = np.stack([_blob((16, 16), (0.35, 0.5)),
                       _blob((16, 16), (0.45, 0.5)),
                       _blob((16, 16), (0.55, 0.5))], axis=-1)
    t_keep = np.asarray([0.0, 0.5, 1.0])
    base = group_synthesize_at(frames, t_keep, [0.25], steps=20)
    monkeypatch.setenv("MRI_TPU_REG_DEVICE", "cpu")
    pinned = group_synthesize_at(frames, t_keep, [0.25], steps=20)
    np.testing.assert_allclose(np.asarray(pinned), np.asarray(base), atol=1e-6)
    ctrl = register_pair(frames[..., 0], frames[..., 2], steps=10)
    out = synthesize_frame(frames[..., 0], frames[..., 2], ctrl)
    # pinned solvers place their outputs on the named backend
    arr = out if hasattr(out, "devices") else jax.numpy.asarray(out)
    assert {d.platform for d in arr.devices()} == {"cpu"}
