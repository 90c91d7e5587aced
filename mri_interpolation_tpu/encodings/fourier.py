"""Gaussian random Fourier features.

Parity target: ``rff.layers.GaussianEncoding`` as used by ``RffNet``
(reference models.py:565-568) and the legacy FreqMLP rff branch
(implementation_paper.py:460-467): gamma(v) = [cos(2*pi*B v), sin(2*pi*B v)]
with B ~ N(0, sigma^2) of shape (encoded_size, input_dim), fixed (not trained).

TPU-native form: the projection is one (dim -> encoded_size) matmul created
with an explicit PRNG key — no external package, no buffer registration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["GaussianFourierEncoding"]

_TWO_PI = 6.283185307179586


class GaussianFourierEncoding:
    def __init__(self, dim: int, encoded_size: int = 128, sigma: float = 10.0, trainable: bool = False):
        self.input_dim = dim
        self.encoded_size = encoded_size
        self.sigma = float(sigma)
        self.trainable = trainable
        self.output_dim = encoded_size * 2

    def init(self, key):
        b = self.sigma * jax.random.normal(key, (self.encoded_size, self.input_dim), dtype=jnp.float32)
        return {"b": b}

    def apply(self, params, x):
        proj = _TWO_PI * (x @ params["b"].T)
        return jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1)
