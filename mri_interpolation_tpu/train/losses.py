"""Training objectives.

- ``mse``: the reference's universal criterion (models.py:61-66).
- ``relative_l2``: tcnn's RelativeL2 loss (config/hash_config.json:2-4):
  per-element (y_pred - y)^2 / (y_pred^2 + eps), eps = 0.01 as in tcnn.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mse_loss", "relative_l2_loss", "get_loss"]


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def relative_l2_loss(pred, target, eps: float = 0.01):
    return jnp.mean((pred - target) ** 2 / (jnp.square(pred) + eps))


_LOSSES = {"mse": mse_loss, "relative_l2": relative_l2_loss}


def get_loss(name: str):
    if name not in _LOSSES:
        raise KeyError(f"unknown loss {name!r}; available: {sorted(_LOSSES)}")
    return _LOSSES[name]
