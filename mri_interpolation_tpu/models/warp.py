"""Motion-compensated INR: canonical content + learned temporal deformation.

New capability beyond the reference (which fits intensity directly over
(x, y, t) and therefore cannot beat data-space interpolation on held-out
frames): dynamic MRI is mostly a STATIC anatomy under motion, so model

    f(x, t) = g(x + d(x, t))

with ``g`` a spatial hash-encoded INR of the canonical anatomy and ``d`` a
small, temporally-smooth SIREN deformation field (D-NeRF-style decomposition,
adapted to the reference's dynamic-ankle workload — the evaluation protocol is
the reference's even-frame split, hash_experimentation.py:313-317).

Held-out frames are reconstructed by *motion interpolation*: ``d`` is smooth
in ``t`` by construction (low-frequency SIREN), so intermediate times warp the
canonical image instead of cross-fading adjacent frames (the failure mode of
both linear interpolation and direct INRs: ghosting at moving edges).

The deformation head's last layer initializes to zero, so training starts from
the identity warp (a plain spatial INR averaged over time) and discovers
motion progressively.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..encodings.hashgrid import HashGridEncoding
from .core import Model, dense, dense_init, uniform_init

__all__ = ["make_warp_inr"]


def _siren_field_init(key, dims, w0):
    """SIREN init for the deformation field; final layer ZERO (identity warp)."""
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i in range(len(dims) - 1):
        last = i == len(dims) - 2
        if last:
            layers.append({"w": jnp.zeros((dims[i], dims[i + 1])),
                           "b": jnp.zeros((dims[i + 1],))})
        else:
            bound = (1.0 / dims[i]) if i == 0 else (np.sqrt(6.0 / dims[i]) / w0)
            kw, kb = jax.random.split(keys[i])
            layers.append({"w": uniform_init(kw, (dims[i], dims[i + 1]), bound),
                           "b": uniform_init(kb, (dims[i + 1],), bound)})
    return layers


def _siren_field_apply(layers, h, w0):
    for i, l in enumerate(layers):
        h = h @ l["w"] + l["b"]
        if i < len(layers) - 1:
            h = jnp.sin(w0 * h)
    return h


def make_warp_inr(
    dim_in: int = 3,                 # (spatial..., t); time is the LAST axis
    n_levels: int = 4,
    n_features_per_level: int = 4,
    log2_hashmap_size: int = 23,
    base_resolution: Union[int, Sequence[int]] = (64, 64),
    finest_resolution: Union[int, Sequence[int], None] = (352, 352),
    growth: str = "paper",
    dim_hidden: int = 64,
    n_layers: int = 2,
    dim_out: int = 1,
    warp_hidden: int = 64,
    warp_layers: int = 3,
    warp_w0: float = 5.0,            # low frequency -> temporally smooth motion
    warp_scale: float = 0.05,        # max displacement in normalized coords (measured best)
    residual_scale: float = 0.0,     # >0: small additive appearance term r(x,t)
    residual_w0: float = 0.0,        # 0 -> warp_w0; smaller = lower-freq residual in (x,t)
    warp_smooth: float = 0.0,        # spatial Jacobian penalty weight on d
    warp_accel: float = 0.0,         # temporal acceleration penalty weight on d
    warp_accel_dt: float = 0.5 / 15.0,  # accel probe half-spacing in normalized t
                                     # (default = half-frame on the 15-frame
                                     # ankle workload; set ~half the KEPT-frame
                                     # spacing so the prior acts between the
                                     # observed frames)
    residual_accel: float = 0.0,     # temporal acceleration penalty on r(x,t)
    warp_t_scale: float = 1.0,       # <1 compresses the time input -> smoother d in t
    level_anneal_steps: int = 0,     # >0: coarse-to-fine curriculum on the canonical encoder
    lr: float = 1e-2,
) -> Model:
    """``residual_scale``: motion alone cannot express appearance changes
    (contrast drift, through-plane content); a small zero-initialized SIREN
    residual ``f = g(x + d) + residual_scale * r(x, t)`` absorbs them. Keep it
    small — a large residual re-introduces the direct-INR failure mode
    (temporal memorization that generalizes no better than cross-fading).

    ``warp_smooth``: penalizes the SPATIAL Jacobian of the deformation
    (jvp along each spatial axis) — neighboring voxels should move together.
    ``warp_accel``: penalizes the temporal second difference of d — favors
    near-linear motion between trained frames, exactly the prior the
    held-out even-frame protocol rewards. Both enter through the model's
    ``loss_fn`` hook (Trainer composes them automatically)."""
    s = dim_in - 1
    if isinstance(base_resolution, (tuple, list)) and len(base_resolution) != s:
        base_resolution = tuple(base_resolution)[:s]
    if isinstance(finest_resolution, (tuple, list)) and len(finest_resolution) != s:
        finest_resolution = tuple(finest_resolution)[:s]
    encoder = HashGridEncoding(
        dim=s,
        n_levels=n_levels,
        n_features_per_level=n_features_per_level,
        log2_hashmap_size=log2_hashmap_size,
        base_resolution=base_resolution,
        finest_resolution=finest_resolution,
        growth=growth,
    )
    widths = [encoder.output_dim] + [dim_hidden] * (n_layers - 1) + [dim_out]
    warp_dims = [dim_in] + [warp_hidden] * (warp_layers - 1) + [s]
    res_dims = [dim_in] + [warp_hidden] * (warp_layers - 1) + [dim_out]

    def init(key):
        k_enc, k_dec, k_warp, k_res = jax.random.split(key, 4)
        dkeys = jax.random.split(k_dec, n_layers)
        params = {
            "encoder": encoder.init(k_enc),
            "layers": [dense_init(dkeys[i], widths[i], widths[i + 1]) for i in range(n_layers)],
            "warp": _siren_field_init(k_warp, warp_dims, warp_w0),
        }
        if residual_scale > 0.0:
            params["residual"] = _siren_field_init(k_res, res_dims, warp_w0)
        state = {}
        if level_anneal_steps > 0:
            state = {"anneal_step": jnp.zeros((), jnp.int32)}
        return params, state

    r_w0 = residual_w0 if residual_w0 > 0.0 else warp_w0
    t_scale = jnp.ones((dim_in,)).at[dim_in - 1].set(warp_t_scale)

    def warp_field(params, x):
        """Displacement d(x, t) in normalized coords. SIREN operates on
        [-1, 1]; volume coords arrive in [0, 1]. ``warp_t_scale`` compresses
        the time input, lowering d's effective temporal frequency."""
        return _siren_field_apply(params["warp"], (x * 2.0 - 1.0) * t_scale, warp_w0) * warp_scale

    def residual_field(params, x):
        return _siren_field_apply(params["residual"], x * 2.0 - 1.0, r_w0)

    def apply(params, state, x, train=False, rng=None):
        xs = x[..., :s]
        d = warp_field(params, x)
        xw = jnp.clip(xs + d, 0.0, 1.0)
        z = encoder.apply(params["encoder"], xw)
        if level_anneal_steps > 0:
            # coarse-to-fine curriculum on the CANONICAL appearance encoder
            # (same scheme as make_hash_mlp(level_anneal_steps=); the warp
            # field itself is untouched — motion should organize against a
            # coarse appearance before fine detail joins)
            step = state["anneal_step"]
            alpha = jnp.clip(step.astype(jnp.float32) / level_anneal_steps, 0.0, 1.0)
            lw = jnp.clip(alpha * n_levels
                          - jnp.arange(n_levels, dtype=jnp.float32) + 1.0, 0.0, 1.0)
            shp = z.shape
            z = (z.reshape(shp[:-1] + (n_levels, n_features_per_level))
                 * lw[:, None]).reshape(shp)
            state = {**state, "anneal_step": step + (1 if train else 0)}
        for i in range(n_layers):
            z = dense(params["layers"][i], z)
            if i < n_layers - 1:
                z = jax.nn.relu(z)
        if residual_scale > 0.0:
            z = z + residual_scale * residual_field(params, x)
        return z, state

    loss_fn = None
    if warp_smooth > 0.0 or warp_accel > 0.0 or residual_accel > 0.0:
        from ..train.losses import mse_loss

        def loss_fn(params, state, batch, rng, train):
            x, y = batch
            y_pred, new_state = apply(params, state, x, train=train, rng=rng)
            loss = mse_loss(y_pred, y)
            if warp_smooth > 0.0:
                # spatial Jacobian prior on d: neighboring voxels move
                # together. A jvp formulation SIGILLs this environment's
                # XLA TPU fusion pass (tracked for removal:
                # docs/ENVIRONMENT_WORKAROUNDS.md #1), so central finite
                # differences (~1 voxel) express the same prior with plain
                # ops; when the committed probe record shows jvp healthy on
                # the current jax version (utils.workarounds), the exact
                # directional derivative is used instead — same prior, one
                # MLP evaluation per axis instead of two.
                import os as _os

                from ..utils.workarounds import workaround_active

                _force = _os.environ.get("MRI_TPU_WARP_JVP", "")
                if _force == "1":
                    _use_fd = False       # probe hook: force the jvp path
                elif _force == "0":
                    _use_fd = True
                else:
                    _use_fd = workaround_active("jvp_sigill")
                reg = 0.0
                if _use_fd:
                    eps = 1.0 / 352.0
                    for k in range(s):
                        e = jnp.zeros((1, dim_in)).at[0, k].set(eps)
                        e = jnp.broadcast_to(e, x.shape)
                        gk = (warp_field(params, x + e)
                              - warp_field(params, x - e)) / (2.0 * eps)
                        reg = reg + jnp.mean(gk**2)
                else:
                    for k in range(s):
                        e = jnp.zeros((1, dim_in)).at[0, k].set(1.0)
                        e = jnp.broadcast_to(e, x.shape)
                        _, gk = jax.jvp(
                            lambda xx: warp_field(params, xx), (x,), (e,))
                        reg = reg + jnp.mean(gk**2)
                loss = loss + warp_smooth * reg
            if warp_accel > 0.0 or (residual_accel > 0.0 and residual_scale > 0.0):
                # temporal second difference at half-frame spacing: favors
                # near-linear variation between trained frames — exactly the
                # prior the held-out even-frame protocol rewards
                dt = jnp.zeros((1, dim_in)).at[0, dim_in - 1].set(warp_accel_dt)
                dt = jnp.broadcast_to(dt, x.shape)
                if warp_accel > 0.0:
                    d0 = warp_field(params, x)
                    dp = warp_field(params, x + dt)
                    dm = warp_field(params, x - dt)
                    loss = loss + warp_accel * jnp.mean((dp - 2.0 * d0 + dm) ** 2)
                if residual_accel > 0.0 and residual_scale > 0.0:
                    r0 = residual_field(params, x)
                    rp = residual_field(params, x + dt)
                    rm = residual_field(params, x - dt)
                    loss = loss + residual_accel * jnp.mean(
                        (residual_scale * (rp - 2.0 * r0 + rm)) ** 2)
            return loss, new_state

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="warp_inr",
                 hparams={"lr": lr, "warp_scale": warp_scale, "warp_w0": warp_w0,
                          "encoder": encoder,
                          # d(x, t) itself — consumed by the motion-transfer
                          # interpolator (infer/registration.py:
                          # motion_transfer_at and the stacking protocol's
                          # warp_transfer family), which pairs the INR's
                          # deformation with DATA-space appearance
                          "warp_field": warp_field,
                          # r(x, t) for the transfer's contrast-drift
                          # correction (motion_transfer_at residual_field=)
                          "residual_field": (residual_field
                                             if residual_scale > 0.0 else None),
                          "residual_scale": residual_scale}, loss_fn=loss_fn)
