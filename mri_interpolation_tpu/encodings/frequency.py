"""NeRF-style frequency (positional) encoding.

Parity target: ``Frequency`` (reference encoding.py:43-66) and the tcnn
"Frequency" encoding used by the legacy dual-encoder FreqMLP
(legacy_code/implementation_paper.py:435-450).

Output layout matches the reference exactly: for each input dimension d the
features are [sin(2^0 x_d), ..., sin(2^{L-1} x_d), cos(2^0 x_d), ...,
cos(2^{L-1} x_d)], flattened dim-major -> output size dim * n_levels * 2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["FrequencyEncoding"]


class FrequencyEncoding:
    """Stateless positional encoding f(x) with dyadic frequencies."""

    def __init__(self, dim: int, n_levels: int = 10):
        assert n_levels > 0
        self.input_dim = dim
        self.n_levels = n_levels
        self.output_dim = dim * n_levels * 2
        # 2^linspace(0, L-1, L) = [1, 2, 4, ...] (encoding.py:56)
        self._freqs = jnp.asarray(2.0 ** np.linspace(0.0, n_levels - 1, n_levels), dtype=jnp.float32)

    def init(self, key):
        return {}

    def apply(self, params, x):
        del params
        z = x[..., None] * self._freqs  # (..., dim, L)
        z = jnp.concatenate([jnp.sin(z), jnp.cos(z)], axis=-1)  # (..., dim, 2L)
        return z.reshape(*z.shape[:-2], self.output_dim)

    def __call__(self, x):
        return self.apply({}, x)
