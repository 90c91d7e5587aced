"""Fused multiresolution hash-encode Pallas kernel.

The TPU-native replacement for tinycudann's HashGrid encoding kernel
(reference models.py:615-627, config/hash_config.json:13-21; pure-python
semantics at reference encoding.py:69-128): per level — scale, floor/frac,
2^d corner enumeration, spatial hash (or dense row-major vertex indexing),
table row gathers, multilinear weight product — all fused into one kernel per
batch tile, with the fused level table pinned in VMEM for the kernel's
lifetime.

Why VMEM-resident tables: TPU random gather from HBM is the hash-encoding
wall (~130-145M ids/s measured on this chip regardless of row width); a
gather that stays inside VMEM avoids it entirely. The kernel therefore
requires the fused (total_size, F) table to fit the VMEM budget
(``table_fits_vmem``) — true for the reference's default config and for
per-level hashed tables up to ~2^20 rows x F2 — and the XLA path remains the
fallback for larger tables.

Backward (custom VJP): grid programs execute sequentially on TPU, so the
table-gradient output block is zero-initialized at program 0 and accumulated
with a value-level scatter-add per (level, corner) — the Pallas analogue of
tcnn's atomic-add table updates. Coordinate gradients are not produced
(coords are data in INR training).

Geometry (resolutions, sizes, offsets, dense/hashed dispatch, strides) is
compile-time static, baked from the ``HashGridEncoding`` instance so kernel
and oracle share one source of truth.

ENVIRONMENT NOTE: the 'axon' TPU tunnel did not execute Mosaic/Pallas
kernels when probed 2026-08-16; re-probed 2026-08-19 it EXECUTES them.
The one-hot coarse kernels are now validated ON HARDWARE — forward parity
5e-7, table-gradient parity 3e-6 vs the XLA oracle, timings in
runs/pallas_exec_status.json (scripts/bench_pallas_exec.py). Interpreter-mode
oracle tests (tests/test_pallas.py) still gate semantics on CPU.

LOWERING STATUS (re-probed 2026-08-17, scripts/probe_pallas_compile.py ->
runs/pallas_compile_status.json): the fused MLP kernels AND the one-hot
coarse-level kernels below (``pallas_hash_encode_coarse``: iota/compare/dot
only) lower and compile for TPU on current Mosaic — forward and backward.
The gather-based kernels in this module still fail ("Cannot do int indexing
on TPU": no vector gather/scatter lowering), so their compiled path waits on
a Mosaic with ``dynamic_gather``; re-run the probe after any jax upgrade.
``pallas_supported()`` keeps the XLA path in charge at runtime: the MEASURED
timings (pallas_exec_status.json) put XLA's fusion ahead on every row on
this chip (0.6-0.9x forward, 0.4x backward), so hand-fusion is opt-in.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...encodings.hashgrid import PRIMES, HashGridEncoding
from .fused_mlp import pallas_supported

__all__ = ["pallas_hash_encode", "hash_encode_forward", "table_fits_vmem",
           "pallas_hash_encode_coarse", "coarse_onehot_levels"]

# Conservative VMEM budget for the resident table (16 MB/core total, minus
# activations/weights working set).
_VMEM_TABLE_BYTES = 8 * 2**20


def table_fits_vmem(enc: HashGridEncoding) -> bool:
    return enc.total_size * enc.n_features_per_level * 4 <= _VMEM_TABLE_BYTES


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _level_consts(enc: HashGridEncoding):
    """Static per-level constants baked into the kernel."""
    levels = []
    d = enc.input_dim
    for l in range(enc.n_levels):
        res = enc.level_resolutions[l].astype(np.int64)
        verts = res + 1
        vstrides = np.concatenate([np.cumprod(verts[::-1])[::-1][1:], [1]]).astype(np.int64)
        levels.append(
            dict(
                dense=bool(enc.level_dense[l]),
                res=tuple(int(r) for r in res),
                vstrides=tuple(int(s) for s in vstrides),
                size=int(enc.level_sizes[l]),
                offset=int(enc.level_offsets[l]),
            )
        )
    return levels


def _corner_ids_weights(x_cols, lc, d: int, corner: int):
    """One level/corner: (global row ids, trilinear weight) for a batch tile.

    Shares the oracle's math exactly (encodings/hashgrid.py): truncation
    floor, dense clamp-to-res-1, tcnn uint32 prime-XOR hash for hashed levels.
    """
    xi, xf = [], []
    for k in range(d):
        s = x_cols[k] * float(lc["res"][k])
        i = s.astype(jnp.int32)
        if lc["dense"]:
            i = jnp.clip(i, 0, lc["res"][k] - 1)
        xi.append(i)
        xf.append(s - i.astype(jnp.float32))

    w = None
    for k in range(d):
        f = xf[k] if (corner >> k) & 1 else 1.0 - xf[k]
        w = f if w is None else w * f

    if lc["dense"]:
        idx = None
        for k in range(d):
            t = (xi[k] + ((corner >> k) & 1)) * np.int32(lc["vstrides"][k])
            idx = t if idx is None else idx + t
    else:
        h = None
        for k in range(d):
            t = (xi[k] + ((corner >> k) & 1)).astype(jnp.uint32) * np.uint32(PRIMES[k])
            h = t if h is None else h ^ t
        idx = (h % np.uint32(lc["size"])).astype(jnp.int32)
    return idx + np.int32(lc["offset"]), w


def _forward_kernel(levels, d: int, F: int, x_ref, table_ref, out_ref):
    C = 1 << d
    x_cols = [x_ref[:, k] for k in range(d)]
    for l, lc in enumerate(levels):
        acc = None
        for c in range(C):
            idx, w = _corner_ids_weights(x_cols, lc, d, c)
            rows = table_ref[idx]  # (tile, F) VMEM gather
            contrib = rows * w[:, None]
            acc = contrib if acc is None else acc + contrib
        out_ref[:, l * F : (l + 1) * F] = acc


def _backward_kernel(levels, d: int, F: int, x_ref, g_ref, dtable_ref):
    """dL/dtable via sequential-grid accumulation: every program owns the same
    (total_size, F) output block; zero it once, scatter-add per tile.

    DESIGN CAVEAT (honest performance note): ``acc = dtable_ref[:]`` ...
    ``dtable_ref[:] = acc`` makes EVERY grid program read and rewrite the
    whole (total_size, F) accumulator — with a 2 MB table and ~1.8K tiles
    that is GB-scale VMEM traffic per step. This kernel is an
    interpreter-validated SEMANTICS SPEC for a future Mosaic with gather/
    scatter lowering, not a performance design; a production version needs
    per-tile partial accumulators (reduce at the end) or
    ``input_output_aliasing`` so the accumulator lives in place. The
    one-hot kernels below (``pallas_hash_encode_coarse``) show the
    accumulate-small-block-in-place structure and DO lower on current
    Mosaic."""
    C = 1 << d

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtable_ref[:] = jnp.zeros_like(dtable_ref)

    x_cols = [x_ref[:, k] for k in range(d)]
    acc = dtable_ref[:]
    for l, lc in enumerate(levels):
        gl = g_ref[:, l * F : (l + 1) * F]  # (tile, F)
        for c in range(C):
            idx, w = _corner_ids_weights(x_cols, lc, d, c)
            acc = acc.at[idx].add(gl * w[:, None])
    dtable_ref[:] = acc


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _forward_call(table, x, enc_key, tile, interpret):
    enc, levels = _ENC_REGISTRY[enc_key]
    d, F, L = enc.input_dim, enc.n_features_per_level, enc.n_levels
    n = x.shape[0]
    padded = _round_up(max(n, 1), tile)
    if padded != n:
        x = jnp.concatenate([x, jnp.zeros((padded - n, d), x.dtype)])
    grid = padded // tile
    out = pl.pallas_call(
        functools.partial(_forward_kernel, levels, d, F),
        out_shape=jax.ShapeDtypeStruct((padded, L * F), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, L * F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, table)
    return out[:n]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _backward_call(x, g, table_shape_rows, enc_key, tile, interpret):
    enc, levels = _ENC_REGISTRY[enc_key]
    d, F = enc.input_dim, enc.n_features_per_level
    n = x.shape[0]
    padded = _round_up(max(n, 1), tile)
    if padded != n:
        x = jnp.concatenate([x, jnp.zeros((padded - n, d), x.dtype)])
        g = jnp.concatenate([g, jnp.zeros((padded - n, g.shape[1]), g.dtype)])
    grid = padded // tile
    dtable = pl.pallas_call(
        functools.partial(_backward_kernel, levels, d, F),
        out_shape=jax.ShapeDtypeStruct((table_shape_rows, F), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, g.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((table_shape_rows, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, g)
    return dtable


# Kernels close over static geometry; jit static args must be hashable, so
# encodings register under a small static key.
_ENC_REGISTRY: dict = {}


def _register(enc: HashGridEncoding) -> tuple:
    key = (
        enc.input_dim,
        enc.n_levels,
        enc.n_features_per_level,
        tuple(map(tuple, enc.level_resolutions.tolist())),
        tuple(enc.level_sizes.tolist()),
        tuple(bool(b) for b in enc.level_dense),
    )
    if key not in _ENC_REGISTRY:
        _ENC_REGISTRY[key] = (enc, _level_consts(enc))
    return key


# ---------------------------------------------------------------------------
# One-hot x table MATMUL kernels for coarse dense levels.
#
# Mosaic in this jax cannot lower vector gather/scatter (see LOWERING STATUS
# above), but it CAN lower iota, comparisons and dot. For a coarse dense
# level with R rows, the per-corner lookup
#     rows = table[idx]                        (gather)
# is algebraically
#     rows = onehot(idx, R) @ table_level      (MXU matmul)
# and its transpose
#     dtable_level += onehot(idx, R)^T @ g     (MXU matmul, small in-place +=)
# — no gather/scatter primitives anywhere, so these kernels LOWER AND COMPILE
# for TPU on current Mosaic (verified by scripts/probe_pallas_compile.py;
# status in runs/pallas_compile_status.json). Viable for levels up to a few
# thousand rows: the one-hot tile is (tile, Rpad) f32 in VMEM, and the
# matmul does tile*R*F useful FLOPs per corner — wasteful vs a real gather,
# but it rides the MXU, which is idle in this kernel anyway.
#
# The backward accumulates ONLY each level's (Rpad, F) block in place —
# the structure the big gather-kernel's backward should adopt once Mosaic
# gains scatter lowering (see _backward_kernel's caveat).

_ONEHOT_MAX_ROWS = 2048


def coarse_onehot_levels(enc: HashGridEncoding, max_rows: int = _ONEHOT_MAX_ROWS):
    """Dense levels small enough for the one-hot matmul path."""
    return [
        l for l in range(enc.n_levels)
        if enc.level_dense[l] and int(enc.level_sizes[l]) <= max_rows
    ]


def _onehot_consts(enc: HashGridEncoding, levels):
    """Per-level constants with LOCAL offsets into the packed coarse table
    (each level's rows padded up to a 128 multiple for clean MXU tiling)."""
    consts, cursor = [], 0
    all_levels = _level_consts(enc)
    for l in levels:
        lc = dict(all_levels[l])
        rpad = _round_up(lc["size"], 128)
        lc["local_off"] = cursor
        lc["rpad"] = rpad
        lc["offset"] = 0  # idx stays level-local in the one-hot kernels
        consts.append(lc)
        cursor += rpad
    return consts, cursor


def _pack_coarse_table(enc: HashGridEncoding, table, consts):
    """(total_packed, F) coarse-table: each level's segment zero-padded to its
    rpad. Pure slicing/concat — autodiff routes the packed gradient back to
    the fused table automatically."""
    segs = []
    for lc in consts:
        seg = table[lc["global_off"] : lc["global_off"] + lc["size"]]
        pad = lc["rpad"] - lc["size"]
        if pad:
            seg = jnp.concatenate([seg, jnp.zeros((pad, seg.shape[1]), seg.dtype)])
        segs.append(seg)
    return jnp.concatenate(segs, axis=0)


def _onehot_forward_kernel(consts, d: int, F: int, x_ref, table_ref, out_ref):
    C = 1 << d
    x_cols = [x_ref[:, k] for k in range(d)]
    tile = x_ref.shape[0]
    for j, lc in enumerate(consts):
        seg = table_ref[lc["local_off"] : lc["local_off"] + lc["rpad"], :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, lc["rpad"]), 1)
        acc = None
        for c in range(C):
            idx, w = _corner_ids_weights(x_cols, lc, d, c)
            onehot_w = jnp.where(iota == idx[:, None], w[:, None], 0.0)
            contrib = jax.lax.dot_general(
                onehot_w, seg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = contrib if acc is None else acc + contrib
        out_ref[:, j * F : (j + 1) * F] = acc


def _onehot_backward_kernel(consts, d: int, F: int, x_ref, g_ref, dtable_ref):
    C = 1 << d
    x_cols = [x_ref[:, k] for k in range(d)]
    tile = x_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtable_ref[:] = jnp.zeros_like(dtable_ref)

    for j, lc in enumerate(consts):
        gl = g_ref[:, j * F : (j + 1) * F]
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, lc["rpad"]), 1)
        acc = None
        for c in range(C):
            idx, w = _corner_ids_weights(x_cols, lc, d, c)
            onehot_w = jnp.where(iota == idx[:, None], w[:, None], 0.0)
            # (Rpad, F) = onehot_w^T @ gl — contract the tile axis
            d_seg = jax.lax.dot_general(
                onehot_w, gl, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d_seg if acc is None else acc + d_seg
        # accumulate ONLY this level's small block, in place
        blk = dtable_ref[lc["local_off"] : lc["local_off"] + lc["rpad"], :]
        dtable_ref[lc["local_off"] : lc["local_off"] + lc["rpad"], :] = blk + acc


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _onehot_forward_call(packed, x, okey, tile, interpret):
    consts, total_packed, d, F = _ONEHOT_REGISTRY[okey]
    L = len(consts)
    n = x.shape[0]
    padded = _round_up(max(n, 1), tile)
    if padded != n:
        x = jnp.concatenate([x, jnp.zeros((padded - n, d), x.dtype)])
    out = pl.pallas_call(
        functools.partial(_onehot_forward_kernel, consts, d, F),
        out_shape=jax.ShapeDtypeStruct((padded, L * F), jnp.float32),
        grid=(padded // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((total_packed, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, L * F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, packed)
    return out[:n]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _onehot_backward_call(x, g, okey, tile, interpret):
    consts, total_packed, d, F = _ONEHOT_REGISTRY[okey]
    n = x.shape[0]
    padded = _round_up(max(n, 1), tile)
    if padded != n:
        x = jnp.concatenate([x, jnp.zeros((padded - n, d), x.dtype)])
        g = jnp.concatenate([g, jnp.zeros((padded - n, g.shape[1]), g.dtype)])
    return pl.pallas_call(
        functools.partial(_onehot_backward_kernel, consts, d, F),
        out_shape=jax.ShapeDtypeStruct((total_packed, F), jnp.float32),
        grid=(padded // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, g.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((total_packed, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, g)


_ONEHOT_REGISTRY: dict = {}


def _register_onehot(enc: HashGridEncoding, levels) -> tuple:
    consts, total_packed = _onehot_consts(enc, levels)
    all_levels = _level_consts(enc)
    for lc, l in zip(consts, levels):
        lc["global_off"] = all_levels[l]["offset"]
    key = (_register(enc), tuple(levels))
    if key not in _ONEHOT_REGISTRY:
        _ONEHOT_REGISTRY[key] = (consts, total_packed, enc.input_dim, enc.n_features_per_level)
    return key


def pallas_hash_encode_coarse(
    enc: HashGridEncoding,
    params,
    x,
    tile: int = 256,
    max_rows: int = _ONEHOT_MAX_ROWS,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable encode of the COARSE dense levels via one-hot matmuls.

    Returns (N, n_coarse * F) features for ``coarse_onehot_levels(enc)`` in
    logical level order — the compiled-Mosaic slice of the encoder on current
    jax (finer levels stay on the XLA path). Gradients flow to the fused
    table through the packing slices.
    """
    levels = coarse_onehot_levels(enc, max_rows)
    if not levels:
        raise ValueError("no dense level small enough for the one-hot path")
    okey = _register_onehot(enc, levels)
    consts = _ONEHOT_REGISTRY[okey][0]
    packed = _pack_coarse_table(enc, params["table"], consts)

    @jax.custom_vjp
    def call(packed, x):
        return _onehot_forward_call(packed, x, okey, tile, interpret)

    def fwd(packed, x):
        return call(packed, x), x

    def bwd(x_saved, g):
        return _onehot_backward_call(x_saved, g, okey, tile, interpret), None

    call.defvjp(fwd, bwd)
    return call(packed, x)


def hash_encode_forward(enc: HashGridEncoding, params, x, tile: int = 1024,
                        interpret: bool = False) -> jnp.ndarray:
    """Plain fused forward (no VJP wiring) — inference path."""
    key = _register(enc)
    return _forward_call(params["table"], x, key, tile, interpret)


def pallas_hash_encode(enc: HashGridEncoding, params, x, tile: int = 1024,
                       interpret: bool = False) -> jnp.ndarray:
    """Differentiable fused hash encode: custom VJP with in-kernel scatter-add
    table gradients. Semantics identical to ``HashGridEncoding.apply``."""
    if not table_fits_vmem(enc):
        raise ValueError(
            f"hash table ({enc.total_size} x {enc.n_features_per_level} fp32) exceeds the "
            f"VMEM-resident budget ({_VMEM_TABLE_BYTES} B); use the XLA path"
        )
    key = _register(enc)
    rows = int(params["table"].shape[0])

    @jax.custom_vjp
    def call(table, x):
        return _forward_call(table, x, key, tile, interpret)

    def fwd(table, x):
        return call(table, x), x

    def bwd(x_saved, g):
        dtable = _backward_call(x_saved, g, rows, key, tile, interpret)
        return dtable, None  # no dx: coords are data

    call.defvjp(fwd, bwd)
    return call(params["table"], x)
