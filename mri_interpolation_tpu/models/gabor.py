"""Gabor / WIRE networks (real and complex Gabor wavelet activations).

Parity targets (reference models.py):
- ``RealGaborLayer`` (models.py:757-788): two Linears (freqs, scale);
  output = cos(w0 * freqs(x)) * exp(-(scale(x) * c)^2).
- ``ComplexGaborLayer`` (models.py:790-834): complex-weight Linear for
  non-first layers; output = exp(i * w0 * z - |c * z|^2).
- ``GaborNet`` (models.py:836-885): n_layers Gabor layers, last maps to
  dim_out. For the complex variant the network value is complex; the real
  part is taken for regression (the reference leaves this implicit — its
  complex path errors on MSE; we make the evident intent work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core import Model, dense, dense_init, uniform_init

__all__ = ["make_gabor_net"]


def _complex_dense_init(key, dim_in, dim_out):
    # torch cfloat Linear init: kaiming_uniform over real/imag independently.
    bound = 1.0 / np.sqrt(dim_in)
    k = jax.random.split(key, 4)
    return {
        "w": uniform_init(k[0], (dim_in, dim_out), bound) + 1j * uniform_init(k[1], (dim_in, dim_out), bound),
        "b": uniform_init(k[2], (dim_out,), bound) + 1j * uniform_init(k[3], (dim_out,), bound),
    }


def make_gabor_net(
    dim_in: int = 3,
    dim_hidden: int = 128,
    dim_out: int = 1,
    n_layers: int = 4,
    w0: float = 30.0,
    sigma: float = 10.0,  # the Gabor scale c; GaborNet passes c=sigma (models.py:862)
    lr: float = 3e-4,     # measured best on the 3D ankle workload (28.6 dB @ 20 epochs)
    kind: str = "real",  # "real" | "complex"
    init_scheme: str = "auto",  # "auto" (SIREN-scaled, converges in 3D) | "torch" (reference init)
) -> Model:
    """``init_scheme="auto"``: the reference's torch-default Linear init makes
    the Gaussian term exp(-(sigma*scale(x))^2) collapse to ~0 at init for any
    useful sigma, which is why GaborNet never converged on 3D volumes (the
    reference defers tuning to optuna, models.py:879). The auto scheme
    initializes ``freqs`` with the SIREN bounds (U(+-1/d) first layer,
    U(+-sqrt(6/d)/w0) after) and ``scale`` small (U(+-0.5/(sigma*sqrt(d)))), so
    at init the network behaves like a SIREN with a near-transparent Gaussian
    envelope (~exp(-0.1)) that learns localization during training."""
    dims = [dim_in] + [dim_hidden] * (n_layers - 1) + [dim_out]

    if kind == "real":

        def init(key):
            keys = jax.random.split(key, n_layers)
            layers = []
            for i in range(n_layers):
                kf, ks = jax.random.split(keys[i])
                if init_scheme == "auto":
                    fb = 1.0 / dims[i] if i == 0 else np.sqrt(6.0 / dims[i]) / w0
                    sb = 0.5 / (max(sigma, 1e-3) * np.sqrt(dims[i]))
                    kfw, kfb = jax.random.split(kf)
                    ksw, ksb = jax.random.split(ks)
                    layers.append({
                        "freqs": {"w": uniform_init(kfw, (dims[i], dims[i + 1]), fb),
                                  "b": uniform_init(kfb, (dims[i + 1],), fb)},
                        "scale": {"w": uniform_init(ksw, (dims[i], dims[i + 1]), sb),
                                  "b": uniform_init(ksb, (dims[i + 1],), sb)},
                    })
                else:
                    layers.append({"freqs": dense_init(kf, dims[i], dims[i + 1]),
                                   "scale": dense_init(ks, dims[i], dims[i + 1])})
            return {"layers": layers}, {}

        def apply(params, state, x, train=False, rng=None):
            for layer in params["layers"]:
                omega = w0 * dense(layer["freqs"], x)
                scale = dense(layer["scale"], x) * sigma
                x = jnp.cos(omega) * jnp.exp(-(scale**2))
            return x, state

    elif kind == "complex":
        # ComplexGaborLayer defaults w0=10, c=40 (models.py:806); GaborNet
        # passes through whatever w0/sigma the caller sets.

        def init(key):
            keys = jax.random.split(key, n_layers)
            layers = []
            for i in range(n_layers):
                if i == 0:
                    layers.append({"lin": dense_init(keys[i], dims[i], dims[i + 1]), "complex": False})
                else:
                    layers.append({"lin": _complex_dense_init(keys[i], dims[i], dims[i + 1]), "complex": True})
            return {"layers": layers}, {}

        def apply(params, state, x, train=False, rng=None):
            z = x
            for i, layer in enumerate(params["layers"]):
                lin = z @ layer["lin"]["w"] + layer["lin"]["b"]
                z = jnp.exp(1j * w0 * lin - jnp.abs(sigma * lin) ** 2)
            return jnp.real(z), state

    else:
        raise ValueError(f"unknown gabor kind {kind!r}")

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out,
                 name=f"gabor_{kind}", hparams={"lr": lr, "w0": w0, "sigma": sigma})
