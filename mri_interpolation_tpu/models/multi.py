"""Multi-frame models: per-frame encoders + one shared decoder.

Parity targets (reference models.py):
- ``MultiSiren`` (models.py:888-956): one SIREN encoder per time frame +
  shared SIREN decoder; a training batch is one whole frame routed by
  frame index.
- ``MultiHashMLP`` (models.py:959-1027): one hash encoder per frame + shared
  (tcnn FullyFusedMLP-style) ReLU decoder. Both use Adam weight_decay 1e-5
  (models.py:931,998).

TPU-native design: instead of a Python list of n_frames modules, per-frame
encoder parameters are STACKED on a leading axis — frame selection is a
``jax.tree.map`` slice (one dynamic index into each stacked leaf), so the same
jitted step serves every frame without retracing; whole-fit scans over frames
stay on device.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

from ..encodings.hashgrid import HashGridEncoding
from .core import Model, dense, dense_init
from .siren import _siren_forward, _siren_init

__all__ = ["make_multi_siren", "make_multi_hash_mlp"]


def _stacked_init(key, n, single_init):
    """Stack n independent inits on a leading axis (one vmapped init)."""
    keys = jax.random.split(key, n)
    return jax.vmap(single_init)(keys)


def _select_frame(stacked, idx):
    return jax.tree.map(lambda p: p[idx], stacked)


def make_multi_siren(
    dim_in: int = 3,
    dim_hidden: int = 64,
    dim_out: int = 1,
    n_layers: int = 4,
    n_frames: int = 15,
    w0: float = 30.0,
    w0_initial: float = 30.0,
    sigma: float = 6.0,
    lr: float = 1e-4,
    weight_decay: float = 1e-5,
) -> Model:
    def init(key):
        k_enc, k_dec = jax.random.split(key)
        encoders = _stacked_init(
            k_enc, n_frames,
            lambda k: _siren_init(k, dim_in, dim_hidden, dim_hidden, n_layers, w0, w0_initial, sigma),
        )
        decoder = _siren_init(k_dec, dim_hidden, dim_hidden, dim_out, n_layers, w0, w0_initial, sigma)
        return {"encoders": encoders, "decoder": decoder}, {}

    def apply(params, state, x, train=False, rng=None, frame_idx=0):
        enc = _select_frame(params["encoders"], frame_idx)
        z = _siren_forward(enc, x, n_layers, w0, w0_initial)
        y = _siren_forward(params["decoder"], z, n_layers, w0, w0_initial)
        return y, state

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="multi_siren",
                 hparams={"lr": lr, "weight_decay": weight_decay, "n_frames": n_frames})


def make_multi_hash_mlp(
    dim_in: int = 3,
    dim_out: int = 1,
    n_frames: int = 15,
    n_levels: int = 16,
    n_features_per_level: int = 2,
    log2_hashmap_size: int = 19,
    base_resolution: Union[int, Sequence[int]] = 16,
    per_level_scale: float = 1.4,
    dim_hidden: int = 128,
    n_layers: int = 2,
    lr: float = 1e-4,
    weight_decay: float = 1e-5,
) -> Model:
    encoder = HashGridEncoding(
        dim=dim_in,
        n_levels=n_levels,
        n_features_per_level=n_features_per_level,
        log2_hashmap_size=log2_hashmap_size,
        base_resolution=base_resolution,
        finest_resolution=None,
        per_level_scale=per_level_scale,
    )
    widths = [encoder.output_dim] + [dim_hidden] * (n_layers - 1) + [dim_out]

    def init(key):
        k_enc, k_dec = jax.random.split(key)
        encoders = _stacked_init(k_enc, n_frames, encoder.init)  # table: (n_frames, T, F)
        dkeys = jax.random.split(k_dec, n_layers)
        decoder = [dense_init(dkeys[i], widths[i], widths[i + 1]) for i in range(n_layers)]
        return {"encoders": encoders, "decoder": decoder}, {}

    def apply(params, state, x, train=False, rng=None, frame_idx=0):
        enc_params = _select_frame(params["encoders"], frame_idx)
        z = encoder.apply(enc_params, x)
        for i in range(n_layers):
            z = dense(params["decoder"][i], z)
            if i < n_layers - 1:
                z = jax.nn.relu(z)
        return z, state

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="multi_hash_mlp",
                 hparams={"lr": lr, "weight_decay": weight_decay, "n_frames": n_frames,
                          "encoder": encoder})
