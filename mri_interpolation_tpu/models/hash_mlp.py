"""HashMLP — multiresolution hash encoding + small decoder MLP.

Parity target: ``HashMLP`` (reference models.py:658-754), the reference's
default model (config/base.py:50). Semantics reproduced:

- encoder dispatch: int ``base_resolution`` -> isotropic grid, tuple ->
  anisotropic per-axis grid (models.py:691-708); both map onto our fused
  single-table ``HashGridEncoding``;
- decoder: n_layers blocks of Linear -> BatchNorm1d -> activation -> Dropout
  (models.py:712-739). As in the reference, the LAST block also applies
  BatchNorm/activation/Dropout to the dim_out output;
- ``tcnn``-style configuration (TcnnHashMLP, models.py:587-645 +
  config/hash_config.json): pass ``per_level_scale`` instead of
  ``finest_resolution`` and choose ``decoder="relu_plain"`` for the
  FullyFusedMLP-equivalent plain ReLU decoder (no norm layers).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..encodings.hashgrid import HashGridEncoding
from .core import Model, batchnorm_apply, batchnorm_init, dense, dense_init, dropout

__all__ = ["make_hash_mlp"]

_ACTS = {"gelu": jax.nn.gelu, "relu": jax.nn.relu}


def make_hash_mlp(
    dim_in: int,
    n_levels: int = 4,
    n_features_per_level: int = 1,
    log2_hashmap_size: int = 23,
    base_resolution: Union[int, Sequence[int]] = (64, 64, 5),
    finest_resolution: Union[int, Sequence[int], None] = (352, 352, 15),
    per_level_scale: Optional[float] = None,
    dim_hidden: int = 64,
    dim_out: int = 1,
    n_layers: int = 2,
    activation: str = "gelu",
    dropout_rate: float = 0.0,
    decoder: str = "norm",  # "norm" | "norm_proper" | "relu_plain"
    lr: float = 5e-3,
    growth: str = "reference",
    storage: str = "auto",
    cell_view_max_cells: int = 1 << 18,
    fused: str = "auto",  # "auto" | "on" | "off" | "interpret": Pallas kernels
    temporal_tv: float = 0.0,  # weight of the time-axis table smoothness prior
    level_anneal_steps: int = 0,  # >0: coarse-to-fine level curriculum
) -> Model:
    """``decoder``:

    - ``"norm"`` — the reference's exact stack: EVERY block, including the
      final one mapping to dim_out, is Linear->BatchNorm->act->Dropout
      (models.py:712-739). Normalizing/activating the OUTPUT costs several
      dB at equal budget (measured — see RESULTS.md ablation);
    - ``"norm_proper"`` — same but hidden blocks only; the final Linear is
      plain (the evident intent of the reference quirk);
    - ``"relu_plain"`` — tcnn FullyFusedMLP shape: plain ReLU between
      layers, identity output (config/hash_config.json:23-27).

    ``fused``: on Mosaic-capable backends ("auto" detects them), the encoder
    runs as the fused Pallas hash-encode kernel when its table fits VMEM, and
    a ``decoder="relu_plain"`` stack runs as the fused MLP kernel (the tcnn
    Encoding+FullyFusedMLP pair, reference models.py:615-639). The XLA paths
    remain bit-equivalent fallbacks (tests/test_pallas.py).

    ``level_anneal_steps``: coarse-to-fine curriculum (BARF/Nerfies-style
    frequency annealing mapped onto grid levels — no reference counterpart):
    level ``l``'s features are scaled by ``clip(alpha*L - l + 1, 0, 1)`` with
    ``alpha = train_step / level_anneal_steps`` ramping 0 -> 1, so coarse
    levels organize the fit before fine levels (and their hash collisions)
    join. The step counter lives in ``state`` (like BN statistics) and only
    advances on ``train=True`` applies; after the ramp the model is exactly
    the unannealed one."""
    from ..ops.pallas import fused_mlp_apply, pallas_hash_encode, resolve_fused, table_fits_vmem

    if decoder not in ("norm", "norm_proper", "relu_plain"):
        raise ValueError(f"unknown decoder {decoder!r}")
    norm = decoder in ("norm", "norm_proper")
    act = _ACTS[activation] if norm else jax.nn.relu
    encoder = HashGridEncoding(
        dim=dim_in,
        n_levels=n_levels,
        n_features_per_level=n_features_per_level,
        log2_hashmap_size=log2_hashmap_size,
        base_resolution=base_resolution,
        finest_resolution=finest_resolution,
        per_level_scale=per_level_scale,
        growth=growth,
        storage=storage,
        cell_view_max_cells=cell_view_max_cells,
    )
    mode = resolve_fused(fused)
    fuse_encoder = mode != "off" and table_fits_vmem(encoder)
    fuse_decoder = mode != "off" and decoder == "relu_plain"
    interp = mode == "interpret"
    widths = [encoder.output_dim] + [dim_hidden] * (n_layers - 1) + [dim_out]

    def _block_normed(i: int) -> bool:
        # "norm": every block incl. the final dim_out one (reference quirk,
        # models.py:712-739); "norm_proper": hidden blocks only.
        return norm and (decoder == "norm" or i < n_layers - 1)

    def init(key):
        keys = jax.random.split(key, n_layers + 1)
        layers, bn_params, bn_state = [], [], []
        for i in range(n_layers):
            layers.append(dense_init(keys[i], widths[i], widths[i + 1]))
            if _block_normed(i):
                p, s = batchnorm_init(widths[i + 1])
                bn_params.append(p)
                bn_state.append(s)
        params = {"encoder": encoder.init(keys[-1]), "layers": layers}
        state = {}
        if norm:
            params["bn"] = bn_params
            state = {"bn": bn_state}
        if level_anneal_steps > 0:
            state = {**state, "anneal_step": jnp.zeros((), jnp.int32)}
        return params, state

    def decode(params, state, z, train=False, rng=None):
        """Decoder stack on pre-encoded features. Split out from ``apply`` so
        the tensor-sharded trainer (parallel/sharded_table.py) can substitute
        a distributed encode while reusing the exact decoder semantics."""
        if fuse_decoder:
            # tcnn FullyFusedMLP shape: ReLU between layers, identity output
            # (config/hash_config.json:23-27) — one Pallas kernel per tile.
            return fused_mlp_apply(params["layers"], z, "relu", interpret=interp), state
        new_bn = []
        rngs = jax.random.split(rng, n_layers) if (rng is not None and dropout_rate > 0) else [None] * n_layers
        for i in range(n_layers):
            z = dense(params["layers"][i], z)
            if _block_normed(i):
                z, s = batchnorm_apply(params["bn"][i], state["bn"][i], z, train=train)
                new_bn.append(s)
                z = act(z)
                z = dropout(z, dropout_rate, train, rngs[i])
            elif not norm and i < n_layers - 1:
                # tcnn FullyFusedMLP: ReLU between layers, identity output
                # (config/hash_config.json:23-27).
                z = act(z)
        new_state = {"bn": new_bn} if norm else state
        return z, new_state

    def encode(params, x, prepared=None):
        if fuse_encoder:
            return pallas_hash_encode(encoder, params["encoder"], x, interpret=interp)
        return encoder.apply(params["encoder"], x, prepared=prepared)

    # Batch-independent encode state (the dense cell-corner view), hoistable
    # out of inference loops (infer/grid.py). None when the Pallas encoder is
    # active (it builds no view).
    prepare_encode = None if fuse_encoder else (lambda params: encoder.prepare(params["encoder"]))

    def anneal_weights(state):
        """Per-FEATURE curriculum weights (length n_levels*F) at the state's
        anneal counter, or None when no curriculum is active. The single
        source of truth for the level-anneal weighting: ``apply`` uses it,
        and the encode/decode split consumers (infer/grid.py's hoisted paths)
        MUST apply it between encode and decode or they evaluate a different
        function than the one being trained."""
        if level_anneal_steps <= 0 or "anneal_step" not in state:
            return None
        step = state["anneal_step"]
        alpha = jnp.clip(step.astype(jnp.float32) / level_anneal_steps, 0.0, 1.0)
        lw = jnp.clip(alpha * n_levels - jnp.arange(n_levels, dtype=jnp.float32)
                      + 1.0, 0.0, 1.0)
        return jnp.repeat(lw, n_features_per_level)

    def apply(params, state, x, train=False, rng=None):
        z = encode(params, x)
        w = anneal_weights(state)
        if w is not None:
            y, new_state = decode(params, state, z * w, train=train, rng=rng)
            new_state = dict(new_state)
            new_state["anneal_step"] = state["anneal_step"] + (1 if train else 0)
            return y, new_state
        return decode(params, state, z, train=train, rng=rng)

    loss_fn = None
    if temporal_tv > 0.0:
        from ..encodings.hashgrid import temporal_table_tv
        from ..train.losses import mse_loss

        def loss_fn(params, state, batch, rng, train):
            # MSE + temporal smoothness prior on the dense tables' time axis
            # (couples held-out frames' vertices to trained neighbors under
            # the even-frame protocol).
            x, y = batch
            y_pred, new_state = apply(params, state, x, train=train, rng=rng)
            reg = temporal_table_tv(encoder, params["encoder"]["table"])
            return mse_loss(y_pred, y) + temporal_tv * reg, new_state

    return Model(init=init, apply=apply, dim_in=dim_in, dim_out=dim_out, name="hash_mlp",
                 hparams={"lr": lr, "n_levels": n_levels, "encoder": encoder,
                          "decoder": decoder, "dim_hidden": dim_hidden,
                          "decode": decode, "encode": encode,
                          "prepare_encode": prepare_encode,
                          "anneal_weights": anneal_weights,
                          "level_anneal_steps": level_anneal_steps,
                          "temporal_tv": temporal_tv}, loss_fn=loss_fn)
