"""SIREN family: SirenNet, ModulatedSirenNet, PsfSirenNet.

Parity targets (reference models.py):
- ``Sine`` / ``SirenLayer`` w/ the SIREN init scheme (models.py:108-156):
  first layer U(-1/d, 1/d), later layers U(-sqrt(sigma/d)/w0, +...), sigma=6;
  bias drawn from the same bound; forward = sin(w0 * (Wx + b)).
- ``SirenNet`` (models.py:160-233): n_layers hidden SirenLayers (first uses
  w0_initial) + a final SirenLayer with identity activation.
- ``Modulator`` / ``ModulatedSirenNet`` (models.py:236-322, Mehta et al.
  2021): ReLU modulation net over raw coords; layer i's sine output is
  element-wise multiplied by modulation i.
- ``PsfSirenNet`` (models.py:397-539): slice-profile forward model — each
  training coordinate expands to n_sample^3 PSF-offset coordinates, the net
  evaluates all of them, and a fixed normalized Gaussian (sigma = 1/2.3548,
  FWHM = one voxel) integrates the predictions back to one voxel estimate.
  The reference implements the integration as a strided Conv1d
  (models.py:495-506); on TPU it is a reshape + weighted reduction feeding
  the MXU-friendly batched forward.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import Model, uniform_init

__all__ = [
    "make_siren",
    "make_modulated_siren",
    "make_hash_siren",
    "make_psf_siren",
    "siren_layer_init",
    "siren_layer_apply",
]


def siren_layer_init(key, dim_in: int, dim_out: int, w0: float, sigma: float, is_first: bool):
    bound = (1.0 / dim_in) if is_first else (np.sqrt(sigma / dim_in) / w0)
    kw, kb = jax.random.split(key)
    return {
        "w": uniform_init(kw, (dim_in, dim_out), bound),
        "b": uniform_init(kb, (dim_out,), bound),
    }


def siren_layer_apply(params, x, w0: float, sine: bool = True):
    z = x @ params["w"] + params["b"]
    return jnp.sin(w0 * z) if sine else z


def _siren_init(key, dim_in, dim_hidden, dim_out, n_layers, w0, w0_initial, sigma):
    keys = jax.random.split(key, n_layers + 1)
    layers = []
    for i in range(n_layers):
        layers.append(
            siren_layer_init(
                keys[i],
                dim_in if i == 0 else dim_hidden,
                dim_hidden,
                w0_initial if i == 0 else w0,
                sigma,
                is_first=(i == 0),
            )
        )
    last = siren_layer_init(keys[-1], dim_hidden, dim_out, w0, sigma, is_first=False)
    return {"layers": layers, "last": last}


def _siren_forward(params, x, n_layers, w0, w0_initial):
    for i in range(n_layers):
        x = siren_layer_apply(params["layers"][i], x, w0_initial if i == 0 else w0)
    return siren_layer_apply(params["last"], x, w0, sine=False)


def make_siren(
    dim_in: int = 3,
    dim_hidden: int = 64,
    dim_out: int = 1,
    n_layers: int = 4,
    w0: float = 30.0,
    w0_initial: float = 30.0,
    sigma: float = 6.0,
    lr: float = 1e-4,
    fused: str = "auto",  # "auto" | "on" | "off" | "interpret": Pallas fused stack
) -> Model:
    """Canonical SIREN (defaults match SirenNet, models.py:179-191).

    ``fused="auto"`` runs the whole layer stack as one Pallas kernel (weights
    VMEM-resident, tcnn-FullyFusedMLP style) on backends that execute Mosaic
    kernels, and falls back to the XLA path elsewhere — outputs are
    equivalence-tested in tests/test_pallas.py / test_models.py."""
    from ..ops.pallas import fused_siren_apply, resolve_fused

    mode = resolve_fused(fused)

    def init(key):
        return _siren_init(key, dim_in, dim_hidden, dim_out, n_layers, w0, w0_initial, sigma), {}

    def apply(params, state, x, train=False, rng=None):
        if mode != "off":
            out = fused_siren_apply(params, x, n_layers, w0, w0_initial,
                                    interpret=(mode == "interpret"))
        else:
            out = _siren_forward(params, x, n_layers, w0, w0_initial)
        return out, state

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="siren",
                 hparams={"lr": lr, "dim_hidden": dim_hidden, "n_layers": n_layers, "w0": w0,
                          "fused": mode})


def make_modulated_siren(
    dim_in: int = 3,
    dim_hidden: int = 64,
    dim_out: int = 1,
    n_layers: int = 4,
    w0: float = 30.0,
    w0_initial: float = 30.0,
    sigma: float = 6.0,
    lr: float = 1e-4,
) -> Model:
    """SIREN with a ReLU modulator over raw coords (models.py:263-322)."""

    def init(key):
        k_siren, k_mod = jax.random.split(key)
        siren = _siren_init(k_siren, dim_in, dim_hidden, dim_out, n_layers, w0, w0_initial, sigma)
        mkeys = jax.random.split(k_mod, n_layers)
        mods = []
        for i in range(n_layers):
            d = dim_in if i == 0 else dim_hidden + dim_in
            bound = 1.0 / np.sqrt(d)
            kw, kb = jax.random.split(mkeys[i])
            mods.append({"w": uniform_init(kw, (d, dim_hidden), bound), "b": uniform_init(kb, (dim_hidden,), bound)})
        return {"siren": siren, "modulator": mods}, {}

    def apply(params, state, x, train=False, rng=None):
        z = x
        # Modulator: layer i consumes cat(hidden, z) and emits modulation i
        # (models.py:251-260).
        h = z
        mods = []
        for i in range(n_layers):
            h = jax.nn.relu(h @ params["modulator"][i]["w"] + params["modulator"][i]["b"])
            mods.append(h)
            h = jnp.concatenate([h, z], axis=-1)
        y = x
        for i in range(n_layers):
            y = siren_layer_apply(params["siren"]["layers"][i], y, w0_initial if i == 0 else w0)
            y = y * mods[i]
        return siren_layer_apply(params["siren"]["last"], y, w0, sine=False), state

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="modulated_siren",
                 hparams={"lr": lr})


def make_hash_siren(
    dim_in: int = 3,
    dim_hidden: int = 64,
    dim_out: int = 1,
    n_layers: int = 4,
    w0: float = 30.0,
    w0_initial: float = 30.0,
    sigma: float = 6.0,
    lr: float = 1e-4,
    n_levels: int = 16,
    n_features_per_level: int = 2,
    log2_hashmap_size: int = 19,
    base_resolution=16,
    per_level_scale: float = 1.4,
) -> Model:
    """Modulated SIREN whose modulator consumes a hash encoding of the coords.

    Parity target: ``HashSirenNet`` (models.py:325-394). The reference class
    is dead as shipped (tcnn import commented at models.py:10, undefined
    ``self.config`` at models.py:365); this is the evident intent made to
    work: modulator input = hash features (n_levels * n_features_per_level).
    """
    from ..encodings.hashgrid import HashGridEncoding

    enc = HashGridEncoding(
        dim=dim_in, n_levels=n_levels, n_features_per_level=n_features_per_level,
        log2_hashmap_size=log2_hashmap_size, base_resolution=base_resolution,
        finest_resolution=None, per_level_scale=per_level_scale,
    )
    d_lat = enc.output_dim

    def init(key):
        k_enc, k_siren, k_mod = jax.random.split(key, 3)
        siren = _siren_init(k_siren, dim_in, dim_hidden, dim_out, n_layers, w0, w0_initial, sigma)
        mkeys = jax.random.split(k_mod, n_layers)
        mods = []
        for i in range(n_layers):
            d = d_lat if i == 0 else dim_hidden + d_lat
            bound = 1.0 / np.sqrt(d)
            kw, kb = jax.random.split(mkeys[i])
            mods.append({"w": uniform_init(kw, (d, dim_hidden), bound), "b": uniform_init(kb, (dim_hidden,), bound)})
        return {"encoder": enc.init(k_enc), "siren": siren, "modulator": mods}, {}

    def apply(params, state, x, train=False, rng=None):
        lat = enc.apply(params["encoder"], x)
        h = lat
        mods = []
        for i in range(n_layers):
            h = jax.nn.relu(h @ params["modulator"][i]["w"] + params["modulator"][i]["b"])
            mods.append(h)
            h = jnp.concatenate([h, lat], axis=-1)
        y = x
        for i in range(n_layers):
            y = siren_layer_apply(params["siren"]["layers"][i], y, w0_initial if i == 0 else w0)
            y = y * mods[i]
        return siren_layer_apply(params["siren"]["last"], y, w0, sine=False), state

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="hash_siren",
                 hparams={"lr": lr, "encoder": enc})


def psf_offsets_and_weights(
    coordinates_spacing: Sequence[float],
    n_sample: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """PSF offset coordinates and normalized Gaussian integration weights.

    Offsets: meshgrid of linspace(-spacing_i, spacing_i, n_sample) per axis,
    flattened to (n_sample^d, d) (models.py:456-473). Weights: separable
    Gaussian with sigma = 1/2.3548 evaluated on linspace(-0.5, 0.5, n_sample),
    normalized to sum 1 (models.py:476-494).
    """
    d = len(coordinates_spacing)
    axes = [np.linspace(-s, s, n_sample) for s in coordinates_spacing]
    offsets = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, d).astype(np.float32)

    sigma = 1.0 / 2.3548
    unit = np.linspace(-0.5, 0.5, n_sample)
    grids = np.meshgrid(*([unit] * d), indexing="ij")
    psf = np.ones_like(grids[0])
    for g in grids:
        psf = psf * np.exp(-g * g / (2 * sigma * sigma))
    psf = (psf / psf.sum()).reshape(-1).astype(np.float32)
    return offsets, psf


def make_psf_siren(
    dim_in: int = 3,
    dim_hidden: int = 64,
    dim_out: int = 1,
    n_layers: int = 4,
    w0: float = 30.0,
    w0_initial: float = 30.0,
    sigma: float = 6.0,
    lr: float = 1e-4,
    coordinates_spacing: Optional[Sequence[float]] = None,
    n_sample: int = 5,
) -> Model:
    """SIREN with the PSF slice-profile training objective.

    ``apply`` is the plain SIREN forward (used for inference); the PSF
    expansion/integration lives in ``loss_fn``, mirroring the reference's
    split between forward and training_step (models.py:508-539).
    """
    if coordinates_spacing is None:
        raise ValueError("psf_siren needs coordinates_spacing (half-voxel extents in normalized coords)")
    offsets_np, weights_np = psf_offsets_and_weights(coordinates_spacing, n_sample)
    offsets = jnp.asarray(offsets_np)  # (K, d)
    weights = jnp.asarray(weights_np)  # (K,)
    K = offsets.shape[0]

    def init(key):
        return _siren_init(key, dim_in, dim_hidden, dim_out, n_layers, w0, w0_initial, sigma), {}

    def apply(params, state, x, train=False, rng=None):
        return _siren_forward(params, x, n_layers, w0, w0_initial), state

    def loss_fn(params, state, batch, rng, train):
        x, y = batch
        # (B, K, d): every voxel center expands to its PSF cloud
        # (x_to_psf_x, models.py:517-523) — built batched, evaluated in one
        # MXU-friendly (B*K, d) forward pass.
        xp = (x[:, None, :] + offsets).reshape(-1, x.shape[-1])
        z = _siren_forward(params, xp, n_layers, w0, w0_initial)
        # Gaussian integration back to one estimate per voxel: replaces the
        # stride-K Conv1d (models.py:495-506,532) with a weighted reduction.
        z = z.reshape(x.shape[0], K, -1)
        z = jnp.einsum("bkf,k->bf", z, weights)
        return jnp.mean((z - y) ** 2), state

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="psf_siren",
                 hparams={"lr": lr, "n_sample": n_sample}, loss_fn=loss_fn)
