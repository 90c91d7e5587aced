"""Functional building blocks shared by the model zoo.

Design: models are pure functions over explicit parameter/state pytrees —
no module framework. Every model family exposes the uniform surface

    init(key)                          -> (params, state)
    apply(params, state, x, train=..., rng=...) -> (y, new_state)

``state`` carries non-gradient quantities (BatchNorm running statistics,
spectral-norm power-iteration vectors); stateless models use ``{}``. This
surface is what the trainer jit-compiles and shards; it replaces the
reference's LightningModule hierarchy (reference models.py:20-96) with
something XLA can trace once and run for a whole epoch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "Model",
    "dense_init",
    "dense",
    "uniform_init",
    "batchnorm_init",
    "batchnorm_apply",
    "dropout",
    "spectral_norm_init",
    "spectral_norm_apply",
    "gelu",
    "relu",
]

Params = Dict[str, Any]
State = Dict[str, Any]


@dataclass(frozen=True)
class Model:
    """Uniform model surface consumed by the trainer and evaluators."""

    init: Callable[[jax.Array], Tuple[Params, State]]
    apply: Callable[..., Tuple[jnp.ndarray, State]]
    dim_in: int
    dim_out: int
    name: str = "model"
    hparams: Optional[Dict[str, Any]] = None
    # Optional custom training objective:
    #   loss_fn(params, state, batch, rng, train) -> (loss, new_state).
    # None means the trainer's default MSE over apply(). Used by models whose
    # training step differs from their forward (e.g. the PSF slice-profile
    # objective, reference models.py:525-539).
    loss_fn: Optional[Callable] = None

    def init_all(self, key):
        return self.init(key)

    def predict(self, params, state, x):
        """Eval-mode forward, discarding state updates."""
        y, _ = self.apply(params, state, x, train=False, rng=None)
        return y


# ---------------------------------------------------------------------------
# Dense layers


def uniform_init(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def dense_init(key, dim_in: int, dim_out: int, bound: Optional[float] = None) -> Params:
    """Linear layer params. Default bound 1/sqrt(fan_in) matches torch's
    nn.Linear reset_parameters (kaiming_uniform(a=sqrt(5)) + bias bound), the
    init the reference decoders rely on implicitly."""
    if bound is None:
        bound = 1.0 / (dim_in**0.5)
    kw, kb = jax.random.split(key)
    return {
        "w": uniform_init(kw, (dim_in, dim_out), bound),
        "b": uniform_init(kb, (dim_out,), bound),
    }


def dense(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"] + params["b"]


# ---------------------------------------------------------------------------
# BatchNorm (1d over features), torch semantics


def batchnorm_init(dim: int) -> Tuple[Params, State]:
    """torch.nn.BatchNorm1d defaults: affine, eps 1e-5, momentum 0.1
    (the HashMLP decoder blocks, reference models.py:731-735)."""
    params = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}
    return params, state


def batchnorm_apply(
    params: Params,
    state: State,
    x: jnp.ndarray,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, State]:
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        # torch stores the *unbiased* variance in running stats.
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"], new_state


# ---------------------------------------------------------------------------
# Dropout


def dropout(x: jnp.ndarray, rate: float, train: bool, rng) -> jnp.ndarray:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Spectral normalization (power iteration), torch semantics
# (the legacy FreqMLP decoder wraps its Linears in spectral_norm with
# n_power_iterations=4 — legacy_code/implementation_paper.py:489-496)


def spectral_norm_init(key, dim_out: int) -> State:
    u = jax.random.normal(key, (dim_out,))
    return {"u": u / (jnp.linalg.norm(u) + 1e-12)}


def spectral_norm_apply(
    w: jnp.ndarray,
    sn_state: State,
    train: bool,
    n_power_iterations: int = 4,
    eps: float = 1e-12,
) -> Tuple[jnp.ndarray, State]:
    """Normalize w (dim_in, dim_out) by its top singular value."""
    u = sn_state["u"]
    if train:
        for _ in range(n_power_iterations):
            v = w @ u
            v = v / (jnp.linalg.norm(v) + eps)
            u = w.T @ v
            u = u / (jnp.linalg.norm(u) + eps)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    else:
        v = w @ u
        v = v / (jnp.linalg.norm(v) + eps)
    sigma = v @ (w @ u)
    return w / sigma, {"u": u}


# ---------------------------------------------------------------------------
# Activations

gelu = jax.nn.gelu
relu = jax.nn.relu
