"""Motion-compensated temporal interpolation via pairwise symmetric registration.

New capability beyond the reference (whose only temporal-interpolation tools
are the ITK linear resampler, interp.py:46-50, and direct INR fits): dynamic
MRI frames are a mostly-static anatomy under motion, so a held-out middle
frame is far better predicted by *half-warping the two observed neighbors
toward each other* than by cross-fading them (linear interpolation's ghosting
failure mode) or by an INR whose odd-frame quality is capped by its own
appearance-reconstruction error.

For each consecutive pair of observed frames (A, B) we learn a SYMMETRIC
half-displacement field v (in normalized coordinates) minimizing

    || A(x + v(x)) - B(x - v(x)) ||^2  +  lambda * ||grad v||^2

so the midpoint frame is directly  M(x) = 0.5 * (A(x + v) + B(x - v)).
The field is parameterized by a coarse control grid upsampled with
``jax.image.resize`` (smooth by construction), optimized coarse-to-fine with
an image pyramid — the classic multi-resolution registration recipe, here as
a few jit-compiled ``lax.scan`` Adam loops on the TPU (the whole 7-pair
protocol registers in seconds; the reference's ITK loop takes minutes for a
single linear resample).

All fields live in NORMALIZED units (displacement as a fraction of the
volume extent) so control grids, pyramid levels, and frame ranks (2-D slices
or 3-D volumes) compose without unit juggling.
"""

from __future__ import annotations

import functools
import os
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = [
    "warp_frame",
    "register_pair",
    "synthesize_frame",
    "synthesize_frame_accel",
    "register_even_frames",
    "motion_compensated_upsample",
    "register_group_temporal",
    "group_motion_upsample",
    "group_synthesize_at",
    "motion_transfer_at",
]


def _pinnable(fn):
    """Run a registration solver on the device named by ``MRI_TPU_REG_DEVICE``
    (axon-worker kernel-fault workaround — tracked for removal:
    docs/ENVIRONMENT_WORKAROUNDS.md #2)
    (e.g. ``cpu``), falling through to the process default when unset.

    Escape hatch for a platform bug observed on the axon TPU stack: the
    worker reproducibly dies with a "kernel fault" inside the group
    trajectory synthesis on the full (352,352,6) 4D ankle volume (the
    pairwise solver and every INR path run fine). The classical solvers are
    self-contained (numpy in / numpy-sized out), so pinning them to the host
    CPU backend sidesteps the fault without moving any other work off the
    TPU. Read per call, so one process can mix pinned protocol stages with
    TPU training.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        name = os.environ.get("MRI_TPU_REG_DEVICE", "")
        if not name:
            return fn(*args, **kwargs)
        with jax.default_device(jax.devices(name)[0]):
            return fn(*args, **kwargs)

    return wrapper


def _field_to_grid(ctrl: jnp.ndarray, shape: Sequence[int]) -> jnp.ndarray:
    """Upsample a control-point field (G..., D) to (shape..., D), linear."""
    out = tuple(shape) + (ctrl.shape[-1],)
    return jax.image.resize(ctrl, out, method="linear")


def _sample(frame: jnp.ndarray, pos_norm: jnp.ndarray) -> jnp.ndarray:
    """Bilinear/trilinear sample of ``frame`` at normalized positions.

    ``pos_norm``: (..., D) in [0, 1] per axis (0 -> first voxel, 1 -> last),
    matching the framework's linspace-[0,1] coordinate convention.
    """
    scale = jnp.asarray(frame.shape, dtype=frame.dtype) - 1.0
    idx = pos_norm * scale
    coords = [idx[..., k].reshape(-1) for k in range(frame.ndim)]
    out = jax.scipy.ndimage.map_coordinates(frame, coords, order=1, mode="nearest")
    return out.reshape(pos_norm.shape[:-1])


def _base_grid(shape: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
    axes = [jnp.linspace(0.0, 1.0, s, dtype=dtype) for s in shape]
    return jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)


def warp_frame(frame: jnp.ndarray, disp_norm: jnp.ndarray) -> jnp.ndarray:
    """Sample ``frame`` at x + disp(x); displacement in normalized units."""
    return _sample(frame, _base_grid(frame.shape, frame.dtype) + disp_norm)


def _smoothness(ctrl: jnp.ndarray) -> jnp.ndarray:
    """Mean squared first difference of the control field along each axis,
    in displacement-per-control-cell units (resolution-comparable)."""
    reg = 0.0
    for k in range(ctrl.ndim - 1):
        if ctrl.shape[k] > 1:
            d = jnp.diff(ctrl, axis=k)
            reg = reg + jnp.mean(d * d)
    return reg


def _resize_frame(frame: jnp.ndarray, factor: int) -> jnp.ndarray:
    if factor <= 1:
        return frame
    out = tuple(max(2, s // factor) for s in frame.shape)
    return jax.image.resize(frame, out, method="linear")


@partial(jax.jit, static_argnames=("steps",))
def _register_stage(a, b, ctrl0, lr, smooth, steps: int):
    """One coarse-to-fine stage: Adam on the symmetric matching loss."""
    grid = _base_grid(a.shape, a.dtype)

    def loss_fn(ctrl):
        v = _field_to_grid(ctrl, a.shape)
        fa = _sample(a, grid + v)
        fb = _sample(b, grid - v)
        return jnp.mean((fa - fb) ** 2) + smooth * _smoothness(ctrl)

    opt = optax.adam(lr)

    def step(carry, _):
        ctrl, opt_state = carry
        loss, g = jax.value_and_grad(loss_fn)(ctrl)
        updates, opt_state = opt.update(g, opt_state, ctrl)
        return (optax.apply_updates(ctrl, updates), opt_state), loss

    (ctrl, _), losses = jax.lax.scan(step, (ctrl0, opt.init(ctrl0)), None, length=steps)
    return ctrl, losses


@_pinnable
def register_pair(
    frame_a: np.ndarray,
    frame_b: np.ndarray,
    ctrl_sizes: Sequence[int] = (8, 16, 32),
    pyramid: Sequence[int] = (4, 2, 1),
    steps: int = 200,
    lr: float = 3e-3,
    smooth: float = 1e-2,
    thin_axis_cap: int = 4,
) -> jnp.ndarray:
    """Estimate the symmetric half-displacement field between two frames.

    Returns the final control field (G..., D) in normalized units; upsample
    with the module's helpers or pass straight to :func:`synthesize_frame`.
    Coarse-to-fine: stage i runs on the ``pyramid[i]``-times-downsampled
    images with a ``ctrl_sizes[i]``-wide control grid, warm-started from the
    previous stage (normalized units make the handoff a pure resize).
    ``thin_axis_cap`` bounds the control resolution on thin axes (e.g. the
    6-slice z axis of the 4-D ankle volume).
    """
    a = jnp.asarray(frame_a, jnp.float32)
    b = jnp.asarray(frame_b, jnp.float32)
    ndim = a.ndim
    extent = max(a.shape)

    ctrl = None
    for size, factor in zip(ctrl_sizes, pyramid):
        gshape = tuple(
            min(size, max(2, thin_axis_cap)) if s * 4 <= extent else size
            for s in a.shape
        )
        if ctrl is None:
            ctrl = jnp.zeros(gshape + (ndim,), jnp.float32)
        elif ctrl.shape[:-1] != gshape:
            ctrl = jax.image.resize(ctrl, gshape + (ndim,), method="linear")
        al, bl = _resize_frame(a, factor), _resize_frame(b, factor)
        ctrl, _ = _register_stage(al, bl, ctrl, jnp.float32(lr), jnp.float32(smooth), steps)
    return ctrl


@_pinnable
def synthesize_frame(
    frame_a: np.ndarray,
    frame_b: np.ndarray,
    ctrl: jnp.ndarray,
    tau: float = 0.5,
) -> jnp.ndarray:
    """Motion-compensated intermediate frame at fractional time ``tau``.

    With v the symmetric half-field (A lives at tau=0, B at tau=1):
        M_tau(x) = (1 - tau) * A(x + 2 tau v(x)) + tau * B(x - 2 (1 - tau) v(x))
    which degenerates to A at tau=0, B at tau=1, and the symmetric midpoint
    blend 0.5 (A(x + v) + B(x - v)) at tau=0.5.
    """
    a = jnp.asarray(frame_a, jnp.float32)
    b = jnp.asarray(frame_b, jnp.float32)
    v = _field_to_grid(ctrl, a.shape)
    grid = _base_grid(a.shape, a.dtype)
    fa = _sample(a, grid + (2.0 * tau) * v)
    fb = _sample(b, grid - (2.0 * (1.0 - tau)) * v)
    return (1.0 - tau) * fa + tau * fb


@_pinnable
def synthesize_frame_accel(
    frame_a: np.ndarray,
    frame_b: np.ndarray,
    ctrl: jnp.ndarray,
    ctrl_prev: jnp.ndarray | None,
    ctrl_next: jnp.ndarray | None,
    gamma: float,
    tau: float = 0.5,
) -> jnp.ndarray:
    """Midpoint synthesis on a QUADRATIC motion path.

    The symmetric field assumes a material point moves linearly from
    x + v(x) (frame A) to x - v(x) (frame B). When the true trajectory has an
    extremum between A and B (e.g. the ankle reversing direction at a held-out
    frame), the midpoint model samples the wrong positions in BOTH frames —
    the one regime where motion compensation loses to nothing-at-all. A
    quadratic path p(t) = x + (1-2t) v + a (t-1/2)^2 - that still passes
    through x at t=1/2 - shifts both sampling positions by the common offset
    a/4, with the acceleration a estimated from the neighboring intervals'
    fields: a ~ gamma * (v_next - v_prev) evaluated at x (Eulerian
    first-order). gamma=0 recovers :func:`synthesize_frame`.
    """
    a = jnp.asarray(frame_a, jnp.float32)
    b = jnp.asarray(frame_b, jnp.float32)
    v = _field_to_grid(ctrl, a.shape)
    vp = _field_to_grid(ctrl_prev, a.shape) if ctrl_prev is not None else v
    vn = _field_to_grid(ctrl_next, a.shape) if ctrl_next is not None else v
    off = (gamma * 0.25) * (vn - vp)
    grid = _base_grid(a.shape, a.dtype)
    fa = _sample(a, grid + (2.0 * tau) * v + off)
    fb = _sample(b, grid - (2.0 * (1.0 - tau)) * v + off)
    return (1.0 - tau) * fa + tau * fb


@partial(jax.jit, static_argnames=("steps",))
def _register_group_stage(frames, ctrl0, lr, smooth_s, smooth_t, steps: int,
                          rel_dt=None):
    """One coarse-to-fine stage of the GROUP temporal registration.

    ``frames``: (T, S...) stack; ``ctrl0``: (T, G..., D) per-time control
    fields with the shared semantics  F_t(x + d_t(x)) = M(x)  for an implicit
    canonical image M — eliminated by matching every adjacent pair in
    canonical space. The temporal second-difference penalty ties the
    per-time fields into one coherent trajectory (and fixes the per-pair
    gauge that independent pairwise registrations each choose arbitrarily).
    ``rel_dt`` (T-1,) are the knot intervals relative to their mean — the
    penalty becomes the non-uniform discrete second derivative, so unevenly
    spaced frames (the stacking protocol's LOO folds) are allowed
    proportionally more motion across wider gaps. ``None`` == uniform.
    """
    T = frames.shape[0]
    shape = frames.shape[1:]
    grid = _base_grid(shape, frames.dtype)

    def warped(ctrl, k):
        v = _field_to_grid(ctrl[k], shape)
        return _sample(frames[k], grid + v)

    def loss_fn(ctrl):
        w = jnp.stack([warped(ctrl, k) for k in range(T)])
        data = jnp.mean((w[1:] - w[:-1]) ** 2)
        reg = 0.0
        for k in range(1, ctrl.ndim - 1):  # spatial axes of the control grid
            if ctrl.shape[k] > 1:
                d = jnp.diff(ctrl, axis=k)
                reg = reg + jnp.mean(d * d)
        if rel_dt is None:
            tdiff = ctrl[2:] - 2.0 * ctrl[1:-1] + ctrl[:-2]
        else:
            r = rel_dt.reshape((T - 1,) + (1,) * (ctrl.ndim - 1))
            vel = (ctrl[1:] - ctrl[:-1]) / r
            tdiff = (vel[1:] - vel[:-1]) / (0.5 * (r[1:] + r[:-1]))
        gauge = jnp.mean(ctrl * ctrl)
        return data + smooth_s * reg + smooth_t * jnp.mean(tdiff * tdiff) + 1e-4 * gauge

    opt = optax.adam(lr)

    def step(carry, _):
        ctrl, opt_state = carry
        loss, g = jax.value_and_grad(loss_fn)(ctrl)
        updates, opt_state = opt.update(g, opt_state, ctrl)
        return (optax.apply_updates(ctrl, updates), opt_state), loss

    (ctrl, _), losses = jax.lax.scan(step, (ctrl0, opt.init(ctrl0)), None, length=steps)
    return ctrl, losses


@_pinnable
def register_group_temporal(
    even: np.ndarray,
    ctrl_sizes: Sequence[int] = (8, 16, 32),
    pyramid: Sequence[int] = (4, 2, 1),
    steps: int = 300,
    lr: float = 3e-3,
    smooth_s: float = 1e-2,
    smooth_t: float = 1e-1,
    thin_axis_cap: int = 4,
    t_knots: Sequence[float] | None = None,
) -> jnp.ndarray:
    """Jointly register an (spatial..., T) stack into a shared canonical
    space: returns per-time control fields (T, G..., D) in normalized units.

    Unlike :func:`register_even_frames` (independent pairs, each with its own
    midpoint-anchored gauge), the group fields sample one continuous motion
    trajectory at the observed times — so intermediate-time motion can be
    *interpolated from the trajectory* (Catmull-Rom in
    :func:`group_motion_upsample`), capturing curvature/overshoot that a
    per-pair linear midpoint cannot (the one regime where midpoint
    compensation loses to plain cross-fading).
    """
    stack = jnp.asarray(np.moveaxis(np.asarray(even, np.float32), -1, 0))
    T = stack.shape[0]
    shape = stack.shape[1:]
    ndim = len(shape)
    extent = max(shape)

    rel_dt = None
    if t_knots is not None:
        dt = np.diff(np.asarray(t_knots, np.float32))
        rel_dt = jnp.asarray(dt / dt.mean())

    ctrl = None
    for size, factor in zip(ctrl_sizes, pyramid):
        gshape = tuple(
            min(size, max(2, thin_axis_cap)) if s * 4 <= extent else size
            for s in shape
        )
        if ctrl is None:
            ctrl = jnp.zeros((T,) + gshape + (ndim,), jnp.float32)
        elif ctrl.shape[1:-1] != gshape:
            ctrl = jax.image.resize(ctrl, (T,) + gshape + (ndim,), method="linear")
        fl = jnp.stack([_resize_frame(stack[k], factor) for k in range(T)])
        ctrl, _ = _register_group_stage(
            fl, ctrl, jnp.float32(lr), jnp.float32(smooth_s), jnp.float32(smooth_t),
            steps, rel_dt)
    return ctrl


def _catmull_mid(p0, p1, p2, p3):
    """Catmull-Rom value at the midpoint of the [p1, p2] segment."""
    return (-p0 + 9.0 * p1 + 9.0 * p2 - p3) / 16.0


@_pinnable
def group_motion_upsample(
    even: np.ndarray,
    t_full: int,
    ctrl: jnp.ndarray | None = None,
    temporal: str = "cubic",
    **kwargs,
) -> np.ndarray:
    """Reconstruct the full temporal grid from the group registration.

    Each odd frame t (midpoint of even frames k, k+1) is synthesized by
    interpolating the motion TRAJECTORY at t — Catmull-Rom over the four
    neighboring per-time fields (``temporal="cubic"``; ``"linear"`` ablates
    to the pairwise-midpoint model) — then warping both observed neighbors
    to the interpolated position in canonical space:

        F̂_t(y) = 0.5 [ F_k(y - d_t(y) + d_k(y)) + F_{k+1}(y - d_t(y) + d_{k+1}(y)) ]

    (first-order Eulerian inversion of  F_t(x + d_t(x)) = M(x)).
    """
    T = even.shape[-1]
    if t_full not in (2 * T - 1, 2 * T):
        raise ValueError(f"t_full={t_full} incompatible with {T} even frames")
    if ctrl is None:
        ctrl = register_group_temporal(even, **kwargs)
    shape = even.shape[:-1]
    grid = _base_grid(shape)
    fields = [_field_to_grid(ctrl[k], shape) for k in range(T)]

    out = np.zeros(shape + (t_full,), np.float32)
    out[..., ::2] = even[..., : (t_full + 1) // 2]
    for k in range(T - 1):
        d1, d2 = fields[k], fields[k + 1]
        if temporal == "cubic":
            d0 = fields[k - 1] if k > 0 else d1
            d3 = fields[k + 2] if k + 2 < T else d2
            dmid = _catmull_mid(d0, d1, d2, d3)
        else:
            dmid = 0.5 * (d1 + d2)
        fa = _sample(jnp.asarray(even[..., k]), grid - dmid + d1)
        fb = _sample(jnp.asarray(even[..., k + 1]), grid - dmid + d2)
        out[..., 2 * k + 1] = np.asarray(0.5 * (fa + fb))
    if t_full == 2 * T:
        out[..., -1] = even[..., -1]
    return out


@_pinnable
def group_synthesize_at(
    frames: np.ndarray,
    t_knots: Sequence[float],
    t_eval: Sequence[float],
    ctrl: jnp.ndarray | None = None,
    appearance: str = "linear",
    **kwargs,
) -> np.ndarray:
    """Synthesize frames at ARBITRARY times from the group registration.

    Generalizes :func:`group_motion_upsample` beyond the uniform even/odd
    midpoint layout (needed by the stacking protocol's LOO folds, where the
    kept frames are unevenly spaced): the per-knot fields d_k sample one
    motion trajectory; d(t) is interpolated with a finite-difference cubic
    Hermite over the (non-uniform) knot times — the uniform-midpoint case
    reduces exactly to the Catmull-Rom of :func:`group_motion_upsample` —
    and the two bracketing observed frames are warped to the interpolated
    position in canonical space and cross-faded:

        F̂_t(y) = (1-s) F_k(y - d_t(y) + d_k(y)) + s F_{k+1}(y - d_t(y) + d_{k+1}(y))

    ``appearance="cubic"`` replaces that linear cross-fade with a cubic
    Hermite over FOUR motion-compensated neighbors — each of frames
    k-1..k+2 warped to the canonical position at t, then interpolated in
    INTENSITY with the same non-uniform spline used for the motion. Motion
    compensation and intensity-curvature capture (the ``cubic`` data-space
    family's strength) compose instead of competing: along the compensated
    trajectory a voxel's brightness varies smoothly even under motion, so
    the spline fits what the cross-fade blurs.

    ``frames``: (spatial..., T_kept); returns (spatial..., len(t_eval)).
    """
    t_knots = np.asarray(t_knots, np.float64)
    if ctrl is None:
        ctrl = register_group_temporal(frames, t_knots=t_knots, **kwargs)
    shape = frames.shape[:-1]
    grid = _base_grid(shape)
    T = frames.shape[-1]
    fields = [_field_to_grid(ctrl[k], shape) for k in range(T)]

    out = []
    for t in np.asarray(t_eval, np.float64):
        j = int(np.searchsorted(t_knots, t) - 1)
        j = min(max(j, 0), T - 2)
        t1, t2 = t_knots[j], t_knots[j + 1]
        h = t2 - t1
        s = float((t - t1) / h)
        d1, d2 = fields[j], fields[j + 1]
        # finite-difference tangents, scaled to the segment (non-uniform
        # Catmull-Rom); one-sided at the ends
        m1 = ((d2 - fields[j - 1]) * (h / (t2 - t_knots[j - 1]))
              if j > 0 else d2 - d1)
        m2 = ((fields[j + 2] - d1) * (h / (t_knots[j + 2] - t1))
              if j + 2 < T else d2 - d1)
        h00 = 2 * s**3 - 3 * s**2 + 1
        h10 = s**3 - 2 * s**2 + s
        h01 = -2 * s**3 + 3 * s**2
        h11 = s**3 - s**2
        dmid = h00 * d1 + h10 * m1 + h01 * d2 + h11 * m2
        fa = _sample(jnp.asarray(frames[..., j]), grid - dmid + d1)
        fb = _sample(jnp.asarray(frames[..., j + 1]), grid - dmid + d2)
        if appearance == "cubic":
            # intensity tangents from the outer motion-compensated neighbors
            # (one-sided at the sequence ends, like the motion tangents)
            if j > 0:
                f0 = _sample(jnp.asarray(frames[..., j - 1]),
                             grid - dmid + fields[j - 1])
                im1 = (fb - f0) * (h / (t2 - t_knots[j - 1]))
            else:
                im1 = fb - fa
            if j + 2 < T:
                f3 = _sample(jnp.asarray(frames[..., j + 2]),
                             grid - dmid + fields[j + 2])
                im2 = (f3 - fa) * (h / (t_knots[j + 2] - t1))
            else:
                im2 = fb - fa
            out.append(np.asarray(h00 * fa + h10 * im1 + h01 * fb + h11 * im2))
        else:
            out.append(np.asarray((1.0 - s) * fa + s * fb))
    return np.stack(out, axis=-1)


@_pinnable
def register_even_frames(even: np.ndarray, **kwargs) -> list:
    """Register each consecutive pair of an (spatial..., T_even) stack."""
    T = even.shape[-1]
    return [
        register_pair(even[..., t], even[..., t + 1], **kwargs)
        for t in range(T - 1)
    ]


@_pinnable
def motion_compensated_upsample(
    even: np.ndarray,
    t_full: int,
    fields: list | None = None,
    accel_gamma: float = 0.0,
    **kwargs,
) -> np.ndarray:
    """Reconstruct the full temporal grid from even frames: observed frames
    pass through untouched; each missing odd frame is the registered-midpoint
    synthesis of its two neighbors. The even-frame protocol's counterpart to
    ``linear_interpolate_volume`` (classical.py), with motion compensation.
    """
    T_even = even.shape[-1]
    if t_full not in (2 * T_even - 1, 2 * T_even):
        raise ValueError(f"t_full={t_full} incompatible with {T_even} even frames")
    if fields is None:
        fields = register_even_frames(even, **kwargs)
    out = np.zeros(even.shape[:-1] + (t_full,), np.float32)
    out[..., ::2] = even[..., : (t_full + 1) // 2]
    for t in range(T_even - 1):
        if accel_gamma != 0.0:
            mid = synthesize_frame_accel(
                even[..., t], even[..., t + 1], fields[t],
                fields[t - 1] if t > 0 else None,
                fields[t + 1] if t + 1 < len(fields) else None,
                gamma=accel_gamma, tau=0.5)
        else:
            mid = synthesize_frame(even[..., t], even[..., t + 1], fields[t], tau=0.5)
        out[..., 2 * t + 1] = np.asarray(mid)
    if t_full == 2 * T_even:  # trailing frame has no right neighbor: hold
        out[..., -1] = even[..., -1]
    return out


def motion_transfer_at(
    frames: np.ndarray,
    t_keep: Sequence[float],
    t_eval: Sequence[float],
    warp_field,
    fp_iters: int = 8,
    appearance: str = "linear",
    residual_field=None,
    residual_scale: float = 0.0,
) -> np.ndarray:
    """Synthesize frames at ``t_eval`` by resampling the bracketing OBSERVED
    frames along a learned INR motion field — INR motion, data appearance.

    ``warp_field(x) -> d``: displacement (normalized units, shape (N, s)) at
    coordinates ``x = (spatial..., t) ∈ [0,1]^{s+1}`` — the warp-INR's field
    (``models/warp.py`` ``hparams["warp_field"]``, partially applied with the
    trained params).

    The warp INR models ``frame_t(x) = canonical(x + d(x, t))``, so pixel
    ``x`` at eval time ``t`` shows the same canonical point as pixel ``y`` at
    a kept time ``t_k`` where ``y + d(y, t_k) = x + d(x, t)``. ``y`` is
    recovered by fixed-point iteration (valid because ``d`` is small and
    smooth: ``warp_scale`` ≈ 0.05 of the volume extent; the iteration
    contracts at rate ≈ ‖∂d/∂x‖, so ``fp_iters=8`` is ample for such fields
    and each iteration is just one warp-MLP evaluation), the kept frame is
    bilinearly sampled at ``y``, and the bracketing resamples are blended in
    time. Appearance comes from the DATA, not from the INR's own
    reconstruction — so quality is not capped by the INR's appearance error,
    the limitation of evaluating the INR directly (RESULTS.md: the direct
    warp-INR's full-volume PSNR ≈ 27 dB bounds its held-out frames).

    ``appearance``: how the motion-ALIGNED resamples blend across time —
    ``"linear"`` cross-fades the two bracketing resamples (no ghosting: both
    show the same canonical point); ``"cubic"`` runs the same non-uniform
    cubic Hermite the intensity-space ``cubic`` family uses
    (infer/classical.py:cubic_interpolate_frames) across FOUR aligned
    resamples — motion compensation AND intensity-trajectory curvature,
    which neither the plain transfer nor the plain cubic family has.

    ``residual_field``/``residual_scale``: contrast-drift correction. A warp
    INR trained with an appearance residual models
    ``frame_t(x) = g(x + d) + rs·r(x, t)``; the transferred data sample from
    kept time t_k carries ``rs·r(y_k, t_k)`` baked in where the synthesized
    frame should carry ``rs·r(x, t)``. Passing the INR's ``residual_field``
    (``models/warp.py`` hparams, partially applied like ``warp_field``) adds
    ``rs·(r(x, t) − blend_k r(y_k, t_k))`` — the same blend operator the
    appearance uses — which is zero at kept times (exactness preserved).

    At ``t_eval == t_k`` the fixed point is ``y = x`` and the observed frame
    is reproduced exactly (tested). Frames: ``(spatial..., len(t_keep))``;
    returns ``(spatial..., len(t_eval))``.
    """
    if appearance not in ("linear", "cubic"):
        raise ValueError(f"unknown appearance {appearance!r}")
    t_keep = np.asarray(t_keep, np.float64)
    spatial = frames.shape[:-1]
    grid = _base_grid(spatial).reshape(-1, len(spatial))          # (N, s)
    K = len(t_keep)
    out = []
    for t in np.asarray(t_eval, np.float64):
        j = int(np.searchsorted(t_keep, t) - 1)
        j = min(max(j, 0), K - 2)
        tau = float(np.clip((t - t_keep[j]) / (t_keep[j + 1] - t_keep[j]), 0.0, 1.0))
        t_col = jnp.full((grid.shape[0], 1), t, jnp.float32)
        c = grid + warp_field(jnp.concatenate([grid, t_col], axis=-1))

        ys: dict = {}

        def invert(k: int) -> jnp.ndarray:
            """Fixed-point solve y + d(y, t_k) = c (positions in frame k
            showing the canonical points c)."""
            if k not in ys:
                tk_col = jnp.full((c.shape[0], 1), t_keep[k], c.dtype)
                y = c
                for _ in range(fp_iters):
                    y = c - warp_field(jnp.concatenate([y, tk_col], axis=-1))
                ys[k] = y
            return ys[k]

        def blend(fetch):
            """Appearance blend across aligned per-kept-frame values; applied
            identically to data samples and to residual samples."""
            f1, f2 = fetch(j), fetch(j + 1)
            if appearance == "linear":
                return (1.0 - tau) * f1 + tau * f2
            # non-uniform cubic Hermite across the motion-aligned values
            # (same spline as infer/classical.py:cubic_interpolate_frames;
            # one-sided tangents at the sequence ends)
            t1, t2 = t_keep[j], t_keep[j + 1]
            h = t2 - t1
            m1 = ((f2 - fetch(j - 1)) * (h / (t2 - t_keep[j - 1]))
                  if j > 0 else f2 - f1)
            m2 = ((fetch(j + 2) - f1) * (h / (t_keep[j + 2] - t1))
                  if j + 2 < K else f2 - f1)
            s = tau
            return ((2 * s**3 - 3 * s**2 + 1) * f1 + (s**3 - 2 * s**2 + s) * m1
                    + (-2 * s**3 + 3 * s**2) * f2 + (s**3 - s**2) * m2)

        def fetch_data(k: int) -> jnp.ndarray:
            return _sample(jnp.asarray(frames[..., k], jnp.float32),
                           invert(k).reshape(spatial + (len(spatial),)))

        pred = blend(fetch_data)
        if residual_field is not None and residual_scale > 0.0:
            def fetch_resid(k: int) -> jnp.ndarray:
                tk_col = jnp.full((c.shape[0], 1), t_keep[k], c.dtype)
                xk = jnp.concatenate([invert(k), tk_col], axis=-1)
                return residual_field(xk)[:, 0].reshape(spatial)

            r_eval = residual_field(
                jnp.concatenate([grid, t_col], axis=-1))[:, 0].reshape(spatial)
            pred = pred + residual_scale * (r_eval - blend(fetch_resid))
        out.append(np.asarray(pred))
    return np.stack(out, axis=-1)
