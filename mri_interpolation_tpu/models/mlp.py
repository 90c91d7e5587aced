"""Plain coordinate MLPs: BaseMLP (ReLU) and RffNet (Fourier features + MLP).

Parity targets:
- ``BaseMLP`` (reference models.py:20-96): n_layers Linear+activation blocks.
  Note the reference appends the activation after EVERY Linear including the
  last (models.py:46-56), so the network output passes through the final
  ReLU/GELU — reproduced here (targets are normalized to [0,1]).
- ``RffNet`` (models.py:542-584): Gaussian random-Fourier-feature encoder
  (sigma=10, 2*n_frequencies features) followed by the same ReLU stack.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..encodings.fourier import GaussianFourierEncoding
from .core import Model, dense, dense_init

__all__ = ["make_mlp", "make_rff_net"]

_ACTIVATIONS = {"relu": jax.nn.relu, "gelu": jax.nn.gelu, "identity": lambda x: x}


def _stack_init(key, dims):
    keys = jax.random.split(key, len(dims) - 1)
    return [dense_init(keys[i], dims[i], dims[i + 1]) for i in range(len(dims) - 1)]


def make_mlp(
    dim_in: int = 2,
    dim_hidden: int = 128,
    dim_out: int = 1,
    n_layers: int = 8,
    activation: str = "relu",
    lr: float = 1e-4,
) -> Model:
    act = _ACTIVATIONS[activation]
    dims = [dim_in] + [dim_hidden] * (n_layers - 1) + [dim_out]

    def init(key):
        return {"layers": _stack_init(key, dims)}, {}

    def apply(params, state, x, train=False, rng=None):
        for layer in params["layers"]:
            x = act(dense(layer, x))  # activation after every layer, incl. last
        return x, state

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="mlp",
                 hparams={"lr": lr, "dim_hidden": dim_hidden, "n_layers": n_layers})


def make_rff_net(
    dim_in: int = 3,
    dim_hidden: int = 128,
    dim_out: int = 1,
    n_layers: int = 8,
    n_frequencies: int = 128,
    sigma: float = 10.0,
    activation: str = "relu",
    lr: float = 1e-4,
) -> Model:
    act = _ACTIVATIONS[activation]
    encoder = GaussianFourierEncoding(dim=dim_in, encoded_size=n_frequencies, sigma=sigma)
    dims = [encoder.output_dim] + [dim_hidden] * (n_layers - 1) + [dim_out]

    def init(key):
        k_enc, k_dec = jax.random.split(key)
        return {"encoder": encoder.init(k_enc), "layers": _stack_init(k_dec, dims)}, {}

    def apply(params, state, x, train=False, rng=None):
        z = encoder.apply(params["encoder"], x)
        for layer in params["layers"]:
            z = act(dense(layer, z))
        return z, state

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="rff_net",
                 hparams={"lr": lr, "n_frequencies": n_frequencies, "sigma": sigma})
