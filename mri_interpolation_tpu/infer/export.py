"""Serving export: serialize a trained INR's dense-grid evaluator as a
self-contained StableHLO artifact (``jax.export``).

Production-deployment story the reference lacks entirely: a trained model's
reconstruction/interpolation program — parameters baked in as constants,
coordinate synthesis on device, chunked scan evaluation — exports to one
portable file that any JAX runtime of the same platform can execute without
the framework, the model code, or the checkpoint (the TPU analogue of a
TorchScript/ONNX serving artifact).

    save_evaluator("eval.bin", model, params, state, shape=(352, 352, 30))
    vol = load_evaluator("eval.bin")()   # -> np.ndarray of `shape`
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..models.core import Model
from .grid import flat_index_to_coords

__all__ = ["save_evaluator", "load_evaluator", "export_evaluator_bytes",
           "quantize_tables"]


def quantize_tables(params, dtype=jnp.bfloat16):
    """Cast the hash/embedding tables — the dominant parameter mass of the
    hash families (MBs of table vs KBs of decoder) — to ``dtype``.

    bf16 keeps f32's exponent range with 8 mantissa bits: on TPU it halves
    the serving artifact / HBM footprint of the baked-in constants while the
    encode path's arithmetic stays f32 (gathered rows promote on first use).
    The reference's tcnn backend stores its tables in fp16 for the same
    reason (hash_config.json; tinycudann's native precision). Returns a new
    params pytree; training state/optimizer are untouched (this is a
    SERVING-side quantization, applied after the fit).
    """
    def cast(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "table":
            return jnp.asarray(leaf, dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, params)


def _build_eval_fn(model: Model, params, state, shape, lo, hi, chunk_size, frame_idx):
    shape = tuple(int(s) for s in shape)
    n = int(np.prod(shape))
    chunk_size = min(chunk_size, n)
    n_chunks = -(-n // chunk_size)

    def eval_chunk(carry, start):
        flat = start + jnp.arange(chunk_size)
        flat = jnp.minimum(flat, n - 1)
        x = flat_index_to_coords(flat, shape, lo, hi)
        kwargs = {} if frame_idx is None else {"frame_idx": frame_idx}
        y, _ = model.apply(params, state, x, train=False, rng=None, **kwargs)
        return carry, y

    starts = jnp.arange(n_chunks) * chunk_size

    def fn():  # zero-arg: params/state baked in as constants
        _, ys = jax.lax.scan(eval_chunk, 0, starts)
        return ys.reshape(n_chunks * chunk_size, -1)[:n]

    return fn, shape


def export_evaluator_bytes(
    model: Model,
    params,
    state,
    shape: Sequence[int],
    lo: float = 0.0,
    hi: float = 1.0,
    chunk_size: int = 1 << 15,
    frame_idx: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    table_dtype=None,
) -> bytes:
    """Serialize the dense-grid evaluator to StableHLO bytes.

    ``platforms``: lowering platforms (default: the current backend).
    ``table_dtype``: quantize the hash tables in the baked constants (e.g.
    ``jnp.bfloat16`` halves the artifact; see :func:`quantize_tables`).
    """
    if table_dtype is not None:
        params = quantize_tables(params, table_dtype)
    fn, shape = _build_eval_fn(model, params, state, shape, lo, hi, chunk_size, frame_idx)
    kwargs = {"platforms": list(platforms)} if platforms else {}
    exported = jax_export.export(jax.jit(fn), **kwargs)()
    return exported.serialize()


def save_evaluator(path: str, model: Model, params, state, shape: Sequence[int], **kw) -> str:
    """Write the serialized evaluator + its output shape header to ``path``."""
    blob = export_evaluator_bytes(model, params, state, shape, **kw)
    shape = tuple(int(s) for s in shape)
    header = np.asarray(shape, dtype=np.int64)
    with open(path, "wb") as f:
        f.write(np.int64(len(header)).tobytes())
        f.write(header.tobytes())
        f.write(blob)
    return path


def load_evaluator(path: str):
    """Load a saved evaluator; returns ``fn() -> np.ndarray`` of the exported
    grid shape (last axis kept if dim_out > 1)."""
    with open(path, "rb") as f:
        (d,) = np.frombuffer(f.read(8), dtype=np.int64)
        shape = tuple(int(s) for s in np.frombuffer(f.read(8 * int(d)), dtype=np.int64))
        blob = f.read()
    exported = jax_export.deserialize(blob)

    def fn() -> np.ndarray:
        out = np.asarray(exported.call())
        if out.shape[-1] == 1:
            return out.reshape(shape)
        return out.reshape(shape + (out.shape[-1],))

    return fn
