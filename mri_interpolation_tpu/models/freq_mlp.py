"""FreqMLP — dual spatial/temporal encoders + skip-connected decoder.

Parity target: ``FreqMLP`` (reference legacy_code/implementation_paper.py:
321-557), the 4D dynamic-MRI experiment model. Semantics reproduced:

- input split: spatial coords = x[:, :dim_in-1], time = x[:, -1]
  (implementation_paper.py:509-512);
- spatial encoder (2 layers) + temporal encoder (1 layer, its own
  w0_t/sigma_t/n_frequencies_t), encoder families: "gabor", "siren",
  "frequency" (tcnn Frequency), "rff" (implementation_paper.py:362-473);
- decoder: n_layers blocks of spectral-norm Linear -> BatchNorm1d -> GELU,
  with skip connections re-injecting the concatenated encoding at the listed
  layer indices (implementation_paper.py:478-518); the final block also norms
  + activates the output, as in the reference;
- Adam weight_decay 1e-5 (implementation_paper.py:521-524) — surfaced via
  hparams for the trainer.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..encodings.fourier import GaussianFourierEncoding
from ..encodings.frequency import FrequencyEncoding
from .core import (
    Model,
    batchnorm_apply,
    batchnorm_init,
    dense,
    dense_init,
    spectral_norm_apply,
    spectral_norm_init,
)
from .siren import siren_layer_apply, siren_layer_init

__all__ = ["make_freq_mlp"]


def _gabor_layer_init(key, dim_in, dim_out):
    kf, ks = jax.random.split(key)
    return {"freqs": dense_init(kf, dim_in, dim_out), "scale": dense_init(ks, dim_in, dim_out)}


def _gabor_layer_apply(p, x, w0, c):
    return jnp.cos(w0 * dense(p["freqs"], x)) * jnp.exp(-((dense(p["scale"], x) * c) ** 2))


def make_freq_mlp(
    dim_in: int = 3,
    dim_hidden: int = 64,
    dim_out: int = 1,
    n_layers: int = 4,
    skip_connections: Sequence[int] = (),
    encoder_type: str = "siren",
    w0: float = 30.0,
    n_frequencies: int = 352,
    sigma: float = 6.0,
    w0_t: float = 30.0,
    n_frequencies_t: int = 15,
    sigma_t: float = 6.0,
    lr: float = 5e-3,
    weight_decay: float = 1e-5,
) -> Model:
    d_space = dim_in - 1
    skip_connections = tuple(skip_connections)

    # Encoder output dim per family (implementation_paper.py:385,409,443-449,470).
    if encoder_type in ("gabor", "siren"):
        enc_dim = n_frequencies + n_frequencies_t
    elif encoder_type == "frequency":
        enc_dim = n_frequencies * 2 * d_space + n_frequencies_t * 2
        freq_enc = FrequencyEncoding(dim=d_space, n_levels=n_frequencies)
        freq_enc_t = FrequencyEncoding(dim=1, n_levels=n_frequencies_t)
    elif encoder_type == "rff":
        enc_dim = n_frequencies * 2 + n_frequencies_t * 2
        rff_enc = GaussianFourierEncoding(dim=d_space, encoded_size=n_frequencies, sigma=sigma)
        rff_enc_t = GaussianFourierEncoding(dim=1, encoded_size=n_frequencies_t, sigma=sigma_t)
    else:
        raise ValueError(f"unknown encoder_type {encoder_type!r}")

    widths = []
    for i in range(n_layers):
        if i == 0:
            w_in = enc_dim
        elif i in skip_connections:
            w_in = enc_dim + dim_hidden
        else:
            w_in = dim_hidden
        widths.append((w_in, dim_out if i == n_layers - 1 else dim_hidden))

    def init(key):
        k_enc, k_enc_t, k_dec, k_sn = jax.random.split(key, 4)
        # --- encoders
        if encoder_type == "gabor":
            ks = jax.random.split(k_enc, 2)
            enc = [_gabor_layer_init(ks[0], d_space, n_frequencies),
                   _gabor_layer_init(ks[1], n_frequencies, n_frequencies)]
            enc_t = _gabor_layer_init(k_enc_t, 1, n_frequencies_t)
        elif encoder_type == "siren":
            ks = jax.random.split(k_enc, 2)
            enc = [siren_layer_init(ks[0], d_space, n_frequencies, w0, sigma, is_first=True),
                   siren_layer_init(ks[1], n_frequencies, n_frequencies, w0, sigma, is_first=False)]
            enc_t = siren_layer_init(k_enc_t, 1, n_frequencies_t, w0_t, sigma_t, is_first=True)
        elif encoder_type == "frequency":
            enc, enc_t = {}, {}
        else:  # rff
            enc = rff_enc.init(k_enc)
            enc_t = rff_enc_t.init(k_enc_t)

        # --- decoder: spectral-norm Linear + BN per block
        dkeys = jax.random.split(k_dec, n_layers)
        skeys = jax.random.split(k_sn, n_layers)
        layers, bn_p, bn_s, sn_s = [], [], [], []
        for i, (w_in, w_out) in enumerate(widths):
            layers.append(dense_init(dkeys[i], w_in, w_out))
            p, s = batchnorm_init(w_out)
            bn_p.append(p)
            bn_s.append(s)
            sn_s.append(spectral_norm_init(skeys[i], w_out))
        params = {"encoder": enc, "encoder_t": enc_t, "layers": layers, "bn": bn_p}
        state = {"bn": bn_s, "sn": sn_s}
        return params, state

    def encode(params, x):
        coords, t = x[..., :d_space], x[..., -1:]
        if encoder_type == "gabor":
            z = _gabor_layer_apply(params["encoder"][0], coords, w0, sigma)
            z = _gabor_layer_apply(params["encoder"][1], z, w0, sigma)
            zt = _gabor_layer_apply(params["encoder_t"], t, w0_t, sigma_t)
        elif encoder_type == "siren":
            z = siren_layer_apply(params["encoder"][0], coords, w0)
            z = siren_layer_apply(params["encoder"][1], z, w0)
            zt = siren_layer_apply(params["encoder_t"], t, w0_t)
        elif encoder_type == "frequency":
            z = freq_enc.apply({}, coords)
            zt = freq_enc_t.apply({}, t)
        else:
            z = rff_enc.apply(params["encoder"], coords)
            zt = rff_enc_t.apply(params["encoder_t"], t)
        return jnp.concatenate([z, zt], axis=-1)

    def apply(params, state, x, train=False, rng=None):
        z = encode(params, x)
        skip = z
        new_bn, new_sn = [], []
        for i in range(n_layers):
            if i in skip_connections:
                z = jnp.concatenate([skip, z], axis=-1)
            w_norm, sn_state = spectral_norm_apply(params["layers"][i]["w"], state["sn"][i], train=train)
            new_sn.append(sn_state)
            z = z @ w_norm + params["layers"][i]["b"]
            z, bn_state = batchnorm_apply(params["bn"][i], state["bn"][i], z, train=train)
            new_bn.append(bn_state)
            z = jax.nn.gelu(z)
        return z, {"bn": new_bn, "sn": new_sn}

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="freq_mlp",
                 hparams={"lr": lr, "weight_decay": weight_decay, "encoder_type": encoder_type})
