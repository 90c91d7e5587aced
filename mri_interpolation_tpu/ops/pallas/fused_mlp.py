"""Fused sine-MLP (SIREN) Pallas kernel.

The TPU-native replacement for tcnn's FullyFusedMLP (reference models.py:629-
639): the whole layer stack executes inside one kernel per batch tile —
weights live in VMEM for the duration, activations never round-trip to HBM
between layers, and the sine nonlinearities fuse into the matmul pipeline.

Forward: grid over batch tiles; each program computes the full stack for its
tile on the MXU (fp32, ``preferred_element_type=float32``).

Backward (custom VJP): recomputes the forward per tile (activations are far
cheaper to recompute than to spill: B x H x L fp32 would be >100 MB/step),
then backpropagates through the stack in-kernel. Weight/bias gradients use the
sequential-grid accumulation pattern: every program writes the same dW output
block, zero-initialized at program 0 and accumulated with ``+=`` — safe
because TPU grids execute sequentially.

Coordinate gradients (dx) are not produced: INR training never differentiates
wrt input coords (they are data), and skipping dx saves a matmul per layer.

Gated by equivalence tests against the plain-JAX oracle
(models/siren._siren_forward) in tests/test_pallas.py.

ENVIRONMENT NOTE: this build environment reaches its TPU through the
experimental 'axon' tunnel. When probed 2026-08-16 it did NOT execute
Mosaic/Pallas kernels (launches hung); re-probed 2026-08-19 the stack
EXECUTES them, and hardware parity + timings are recorded by
scripts/bench_pallas_exec.py in runs/pallas_exec_status.json. The kernels
remain opt-in behind ``pallas_supported()`` because the MEASURED timings put
XLA's own fusion ahead on this chip (see the artifact) — the fused kernels
exist for environments/configs where hand-fusion wins, and the tests gate
their semantics against the plain-JAX oracles either way.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_siren_forward",
    "fused_siren_apply",
    "fused_mlp_forward",
    "fused_mlp_apply",
    "pallas_supported",
]


def pallas_supported() -> bool:
    """True when compiled Pallas kernels can run on the current backend.

    The 'axon' TPU tunnel does not execute Mosaic kernels (launches hang or
    miscompute); CPU needs interpreter mode. The tunnel no longer marks its
    devices (platform='tpu', str='TPU v5 lite0'), so detect it the way its own
    bootstrap does: the PALLAS_AXON_POOL_IPS env var. Set MIT_FORCE_PALLAS=1
    to override (real TPU VMs), MIT_DISABLE_PALLAS=1 to force off.
    Tracked: docs/ENVIRONMENT_WORKAROUNDS.md #3 (auto-reprobed on JAX
    version change by ops.pallas.maybe_reprobe).
    """
    import os

    if os.environ.get("MIT_DISABLE_PALLAS") == "1":
        return False
    if os.environ.get("MIT_FORCE_PALLAS") == "1":
        return True
    if os.environ.get("PALLAS_AXON_POOL_IPS"):  # axon tunnel
        return False
    return jax.devices()[0].platform == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Per-layer activations are static descriptors: ("sine", w0) | ("relu",) |
# ("gelu",) | ("id",). The gelu matches jax.nn.gelu(approximate=True).
_SQRT_2_OVER_PI = float(np.sqrt(2.0 / np.pi))


def _act(a, z):
    if a[0] == "sine":
        return jnp.sin(a[1] * z)
    if a[0] == "relu":
        return jnp.maximum(z, 0.0)
    if a[0] == "gelu":
        u = _SQRT_2_OVER_PI * (z + 0.044715 * z**3)
        return 0.5 * z * (1.0 + jnp.tanh(u))
    return z  # "id"


def _act_grad(a, z):
    """d act / d z, evaluated at pre-activation z."""
    if a[0] == "sine":
        return a[1] * jnp.cos(a[1] * z)
    if a[0] == "relu":
        return (z > 0.0).astype(jnp.float32)
    if a[0] == "gelu":
        u = _SQRT_2_OVER_PI * (z + 0.044715 * z**3)
        t = jnp.tanh(u)
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * 0.044715 * z**2)
        return 0.5 * (1.0 + t) + 0.5 * z * (1.0 - t**2) * du
    return jnp.ones_like(z)


def _forward_kernel(n_layers: int, acts: Tuple[tuple, ...], x_ref, *refs):
    """refs = [W0, b0, ..., W_{L}, b_{L}, out_ref]. Biases are (1, H)."""
    out_ref = refs[-1]
    h = x_ref[:]
    for l in range(n_layers + 1):
        w = refs[2 * l][:]
        b = refs[2 * l + 1][:]
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        h = _act(acts[l], z)
    out_ref[:] = h


def _backward_kernel(n_layers: int, acts: Tuple[tuple, ...], need_dx: bool,
                     x_ref, g_ref, *refs):
    """refs = [W0, b0, ..., WL, bL, dW0, db0, ..., dWL, dbL, (dx?)].

    ``need_dx``: emit input-cotangents too (a per-tile output block). Needed
    when the stack's input is an upstream differentiable op (e.g. the hash
    encoder feeding the fused decoder); skipped for coordinate inputs."""
    n_params = 2 * (n_layers + 1)
    w_refs = refs[:n_params]
    grad_refs = refs[n_params : n_params + n_params]
    dx_ref = refs[-1] if need_dx else None

    # Zero the accumulators on the first tile (sequential-grid accumulation).
    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in grad_refs:
            r[:] = jnp.zeros_like(r)

    # Recompute forward, keeping pre-activations as values (registers/VMEM).
    h = x_ref[:]
    hs = [h]  # inputs to each layer
    zs = []
    for l in range(n_layers + 1):
        w = w_refs[2 * l][:]
        b = w_refs[2 * l + 1][:]
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        zs.append(z)
        h = _act(acts[l], z)
        hs.append(h)

    # Backprop: dz_l flows backward through the stack.
    dz = g_ref[:] * _act_grad(acts[n_layers], zs[n_layers])
    for l in range(n_layers, -1, -1):
        grad_refs[2 * l][:] += jnp.dot(hs[l].T, dz, preferred_element_type=jnp.float32)
        grad_refs[2 * l + 1][:] += jnp.sum(dz, axis=0, keepdims=True)
        if l > 0:
            dh = jnp.dot(dz, w_refs[2 * l][:].T, preferred_element_type=jnp.float32)
            dz = dh * _act_grad(acts[l - 1], zs[l - 1])
        elif need_dx:
            dx_ref[:] = jnp.dot(dz, w_refs[0][:].T, preferred_element_type=jnp.float32)


def _flatten_params(params, n_layers):
    """Flatten the siren pytree; biases reshaped (H,) -> (1, H) (TPU-friendly 2D)."""
    flat = []
    for l in range(n_layers):
        flat.append(params["layers"][l]["w"])
        flat.append(params["layers"][l]["b"].reshape(1, -1))
    flat.append(params["last"]["w"])
    flat.append(params["last"]["b"].reshape(1, -1))
    return flat


def _pad_batch(x, tile):
    n = x.shape[0]
    padded = _round_up(max(n, 1), tile)
    if padded != n:
        x = jnp.concatenate([x, jnp.zeros((padded - n, x.shape[1]), x.dtype)])
    return x, n, padded


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _forward_call(flat, x, n_layers, acts, tile, interpret, out_dim):
    x_p, n, padded = _pad_batch(x, tile)
    grid = padded // tile
    in_specs = [pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for p in flat:
        in_specs.append(
            pl.BlockSpec(p.shape, lambda i, _nd=p.ndim: (0,) * _nd, memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(_forward_kernel, n_layers, acts),
        out_shape=jax.ShapeDtypeStruct((padded, out_dim), jnp.float32),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_p, *flat)
    return out[:n]


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _backward_call(flat, x, g, n_layers, acts, tile, interpret, need_dx=False):
    x_p, n, padded = _pad_batch(x, tile)
    g_p, _, _ = _pad_batch(g, tile)  # zero rows contribute zero grads
    grid = padded // tile
    in_specs = [
        pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, g.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for p in flat:
        in_specs.append(
            pl.BlockSpec(p.shape, lambda i, _nd=p.ndim: (0,) * _nd, memory_space=pltpu.VMEM)
        )
    out_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat]
    out_specs = [
        pl.BlockSpec(p.shape, lambda i, _nd=p.ndim: (0,) * _nd, memory_space=pltpu.VMEM) for p in flat
    ]
    if need_dx:
        out_shapes.append(jax.ShapeDtypeStruct((padded, x.shape[1]), jnp.float32))
        out_specs.append(pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_backward_kernel, n_layers, acts, need_dx),
        out_shape=out_shapes,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(x_p, g_p, *flat)
    if need_dx:
        return outs[:-1], outs[-1][:n]
    return outs


def _siren_acts(n_layers, w0, w0_initial):
    return tuple([("sine", w0_initial)] + [("sine", w0)] * (n_layers - 1) + [("id",)])


def _apply_with_vjp(flat, x, n_layers, acts, tile, interpret):
    out_dim = flat[-1].shape[-1]  # last bias is (1, dim_out)

    @jax.custom_vjp
    def call(flat, x):
        return _forward_call(flat, x, n_layers, acts, tile, interpret, out_dim)

    def fwd(flat, x):
        return call(flat, x), (flat, x)

    def bwd(res, g):
        flat_saved, x_saved = res
        grads = _backward_call(flat_saved, x_saved, g, n_layers, acts, tile, interpret)
        return tuple(grads), None  # no dx

    call.defvjp(fwd, bwd)
    return call(flat, x)


def fused_siren_forward(params, x, n_layers: int, w0: float, w0_initial: float,
                        tile: int = 512, interpret: bool = False):
    """Plain fused forward (no VJP wiring) — used for inference."""
    acts = _siren_acts(n_layers, w0, w0_initial)
    flat = tuple(_flatten_params(params, n_layers))
    out_dim = flat[-1].shape[-1]  # last bias is (1, dim_out)
    return _forward_call(flat, x, n_layers, acts, tile, interpret, out_dim)


def fused_siren_apply(params, x, n_layers: int, w0: float, w0_initial: float,
                      tile: int = 512, interpret: bool = False):
    """Differentiable fused SIREN stack: custom VJP with in-kernel backward.

    Semantics identical to models.siren._siren_forward (same pytree layout).
    """
    acts = _siren_acts(n_layers, w0, w0_initial)
    flat = tuple(_flatten_params(params, n_layers))
    return _apply_with_vjp(flat, x, n_layers, acts, tile, interpret)


def _flatten_layer_list(layers):
    """Flatten [{"w","b"}, ...] into (W0, b0, W1, b1, ...), biases (1, H)."""
    flat = []
    for l in layers:
        flat.append(l["w"])
        flat.append(l["b"].reshape(1, -1))
    return tuple(flat)


def fused_mlp_forward(layers, x, activation: str = "relu",
                      tile: int = 512, interpret: bool = False):
    """Fused plain MLP forward over a layer list: ``activation`` between
    layers, identity output — the tcnn FullyFusedMLP shape
    (config/hash_config.json:22-28)."""
    n_hidden = len(layers) - 1
    acts = tuple([(activation,)] * n_hidden + [("id",)])
    flat = _flatten_layer_list(layers)
    out_dim = flat[-1].shape[-1]  # last bias is (1, dim_out)
    return _forward_call(flat, x, n_hidden, acts, tile, interpret, out_dim)


def fused_mlp_apply(layers, x, activation: str = "relu",
                    tile: int = 512, interpret: bool = False):
    """Differentiable fused plain MLP (relu/gelu hidden activations, identity
    output) over a ``[{"w", "b"}, ...]`` layer list; differentiable wrt the
    layer parameters (custom VJP with in-kernel backward), like
    ``fused_siren_apply``."""
    n_hidden = len(layers) - 1
    acts = tuple([(activation,)] * n_hidden + [("id",)])
    flat = _flatten_layer_list(layers)
    out_dim = flat[-1].shape[-1]  # last bias is (1, dim_out)

    @jax.custom_vjp
    def call(flat, x):
        return _forward_call(flat, x, n_hidden, acts, tile, interpret, out_dim)

    def fwd(flat, x):
        return call(flat, x), (flat, x)

    def bwd(res, g):
        flat_saved, x_saved = res
        # dx is required: the stack's input is typically an upstream encoder
        # output (gradients must keep flowing into the hash table).
        grads, dx = _backward_call(flat_saved, x_saved, g, n_hidden, acts, tile,
                                   interpret, need_dx=True)
        return tuple(grads), dx

    call.defvjp(fwd, bwd)
    out = call(flat, x)
    return out


def unflatten_grads(flat_grads, n_layers):
    """Rebuild the siren params pytree from the flat grad list."""
    layers = []
    for l in range(n_layers):
        layers.append({"w": flat_grads[2 * l], "b": flat_grads[2 * l + 1]})
    return {"layers": layers, "last": {"w": flat_grads[-2], "b": flat_grads[-1]}}
