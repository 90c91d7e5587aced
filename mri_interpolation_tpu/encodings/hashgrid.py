"""Multiresolution hash-grid encoding (Instant-NGP family), TPU-native.

Capability parity with three reference components:

- ``MultiResHashGrid`` — isotropic, growth b = exp((ln fine - ln base) /
  (base - 1)) (reference encoding.py:131-191; note the reference divides by
  ``base_resolution - 1`` where the Instant-NGP paper uses ``n_levels - 1`` —
  we reproduce the reference formula for parity and expose the paper formula
  as ``growth="paper"``),
- ``MultiResHashGridV2`` — anisotropic per-axis resolutions
  (encoding.py:273-336),
- ``tcnn.Encoding(HashGrid)`` — explicit ``per_level_scale`` growth
  (models.py:615-627, config/hash_config.json:13-21).

Hash function parity: tcnn's spatial hash — multiply per-dim integer corner
coordinates by PRIMES, XOR-fold across dims, modulo table size
(encoding.py:40,69-78) — implemented in uint32 with native wraparound.

TPU-first design choices (vs the reference's per-level nn.Embedding loop):

- all levels live in ONE concatenated (total_size, F) table with static
  per-level offsets, so the forward pass is a single large XLA gather and the
  backward a single scatter-add — no per-level kernel dispatch;
- corner enumeration, interpolation weights and hashing are computed for all
  levels/corners in one vectorized block (batch, L, 2^d) with static shapes,
  so XLA tiles it onto the VPU without retracing.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HashGridEncoding", "PRIMES", "spatial_hash", "temporal_table_tv"]

# Hash primes (supports up to 7-D input), same constants as tcnn grid.h /
# reference encoding.py:40.
PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


def spatial_hash(corner_ids: jnp.ndarray, hashmap_sizes: jnp.ndarray) -> jnp.ndarray:
    """tcnn spatial hash: per-dim prime multiply (uint32 wraparound), XOR fold,
    modulo table size. Parity: ``fast_hash`` (encoding.py:69-78).

    corner_ids: (..., d) int32 non-negative grid corner coordinates.
    hashmap_sizes: broadcastable uint32 table sizes.
    """
    d = corner_ids.shape[-1]
    primes = jnp.asarray(np.array(PRIMES[:d], dtype=np.uint32))
    h = corner_ids.astype(jnp.uint32) * primes  # wraps mod 2^32
    folded = h[..., 0]
    for i in range(1, d):
        folded = folded ^ h[..., i]
    return (folded % hashmap_sizes.astype(jnp.uint32)).astype(jnp.int32)


def _level_geometry(
    dim: int,
    n_levels: int,
    log2_hashmap_size: int,
    base_resolution: Union[int, Sequence[int]],
    finest_resolution: Union[int, Sequence[int], None],
    per_level_scale: Union[float, None],
    growth: str,
) -> Tuple[np.ndarray, np.ndarray]:
    """Static per-level (resolutions, hashmap sizes). Pure Python/NumPy — all
    geometry is compile-time constant so the jitted forward has static shapes."""
    isotropic = isinstance(base_resolution, (int, float))
    base = np.full(dim, base_resolution, dtype=np.float64) if isotropic else np.asarray(base_resolution, np.float64)
    if not isotropic and len(base) != dim:
        raise ValueError(
            f"base_resolution has {len(base)} axes but dim={dim}. (The reference's "
            f"default HashConfig hits this mismatch silently — config/base.py:73 vs :79.)"
        )

    if per_level_scale is not None:
        b = np.full(dim, float(per_level_scale))
    else:
        if finest_resolution is None:
            raise ValueError("need finest_resolution or per_level_scale")
        fine = (
            np.full(dim, finest_resolution, dtype=np.float64)
            if isinstance(finest_resolution, (int, float))
            else np.asarray(finest_resolution, np.float64)
        )
        if growth == "reference":
            # encoding.py:167-171, 310-312: divides by (base_resolution - 1).
            denom = base - 1.0
        elif growth == "paper":
            # Instant-NGP eq. (3): divides by (n_levels - 1).
            denom = np.full(dim, max(n_levels - 1, 1), dtype=np.float64)
        else:
            raise ValueError(f"unknown growth {growth!r}")
        b = np.exp((np.log(fine) - np.log(base)) / denom)

    res = np.stack([np.floor(base * b**lvl) for lvl in range(n_levels)]).astype(np.int64)  # (L, d)
    if isotropic:
        # min(res^dim, 2^log2): encoding.py:176
        sizes = np.minimum(res[:, 0].astype(object) ** dim, 2**log2_hashmap_size)
    else:
        # min(max(res)^dim, 2^log2): encoding.py:319-321
        sizes = np.minimum(res.max(axis=1).astype(object) ** dim, 2**log2_hashmap_size)
    return res.astype(np.int32), sizes.astype(np.int64)


class HashGridEncoding:
    """Multiresolution hash grid with a single fused parameter table.

    Parameters live as ``{"table": (total_size, n_features)}``; per-level
    slices are addressed through static offsets.
    """

    def __init__(
        self,
        dim: int,
        n_levels: int = 16,
        n_features_per_level: int = 2,
        log2_hashmap_size: int = 15,
        base_resolution: Union[int, Sequence[int]] = 16,
        finest_resolution: Union[int, Sequence[int], None] = 512,
        per_level_scale: Union[float, None] = None,
        growth: str = "reference",
        init_scale: float = 1e-4,
        storage: str = "auto",
        cell_view_max_cells: int = 1 << 18,
    ):
        """``storage`` selects the per-level table layout:

        - ``"auto"`` (default): a level whose full vertex grid
          (prod(res+1)) fits the level's hashmap budget is stored DENSE
          (direct row-major indexing, collision-free) — exactly tcnn's
          dense/hashed switch (tiny-cuda-nn grid.h); larger levels hash.
        - ``"hashed"``: every level hashes — bit-exact reference semantics
          (encoding.py:108-128 always hashes, even when the grid fits).
        - ``"dense"``: force dense (errors if a level exceeds its budget).

        Dense levels further split by ``cell_view_max_cells`` (an execution
        detail, not a semantics change): SMALL dense levels use the
        cell-corner VIEW path — one fused row-gather per (voxel, level) from
        a view built out of 2^d shifted slices, whose per-step cost scales
        with the GRID size (sequential traffic); BIG dense levels join the
        hashed levels' packed per-corner path, whose cost scales with the
        BATCH (measured crossover ~2^18 cells: a (352,352,15) cell view costs
        ~240 MB of traffic per step, dwarfing 80K random ids).
        """
        if dim > len(PRIMES):
            raise ValueError(f"hash grid supports at most {len(PRIMES)}-D inputs, got {dim}")
        if storage not in ("auto", "hashed", "dense"):
            raise ValueError(f"unknown storage {storage!r}")
        self.input_dim = dim
        self.n_levels = n_levels
        self.n_features_per_level = n_features_per_level
        self.log2_hashmap_size = log2_hashmap_size
        self.output_dim = n_levels * n_features_per_level
        self.init_scale = init_scale
        self.storage = storage

        res, sizes = _level_geometry(
            dim, n_levels, log2_hashmap_size, base_resolution, finest_resolution, per_level_scale, growth
        )
        self.level_resolutions = res  # (L, d) int32, static
        vertex_counts = np.prod(res.astype(np.int64) + 1, axis=1)  # (L,)
        # Dense eligibility compares the full vertex grid against the 2^log2
        # cap (tcnn grid.h semantics: direct indexing whenever the grid fits
        # the table budget; only larger grids hash).
        budget = 2**log2_hashmap_size
        if storage == "hashed":
            dense = np.zeros(n_levels, dtype=bool)
        elif storage == "dense":
            if (vertex_counts > budget).any():
                raise ValueError(
                    f"storage='dense' but some level's vertex grid exceeds the 2^{log2_hashmap_size} "
                    f"budget: {vertex_counts}"
                )
            dense = np.ones(n_levels, dtype=bool)
        else:
            dense = vertex_counts <= budget
        self.level_dense = dense  # (L,) bool, static
        # dense levels store exactly their vertex grid; hashed levels the budget
        self.level_sizes = np.where(dense, vertex_counts, sizes).astype(np.int64)
        self.level_offsets = np.concatenate([[0], np.cumsum(self.level_sizes)]).astype(np.int64)
        self.total_size = int(self.level_offsets[-1])
        # Execution-path split for dense levels (see __init__ docstring).
        cell_counts = np.prod(res.astype(np.int64), axis=1)
        self.level_cellview = dense & (cell_counts <= cell_view_max_cells)  # (L,) bool

        # Corner bit pattern: corner c uses xi+1 on dims whose bit is set
        # (complement of the reference's bin_mask, encoding.py:101-106).
        n_corners = 1 << dim
        corners = np.arange(n_corners, dtype=np.int32)[:, None]
        dims = np.arange(dim, dtype=np.int32)[None, :]
        self._corner_bits = ((corners >> dims) & 1).astype(np.int32)  # (C, d) in {0,1}

        # Device constants (built lazily so construction stays backend-free).
        self._res_f32 = jnp.asarray(res, dtype=jnp.float32)  # (L, d)
        self._sizes_u32 = jnp.asarray(self.level_sizes.astype(np.uint32))[:, None]  # (L, 1)
        self._offsets_i32 = jnp.asarray(self.level_offsets[:-1].astype(np.int32))[:, None]  # (L, 1)
        self._bits = jnp.asarray(self._corner_bits)  # (C, d)

    def init(self, key):
        # U(-1e-4, 1e-4), parity with nn.init.uniform_ (encoding.py:96).
        table = jax.random.uniform(
            key,
            (self.total_size, self.n_features_per_level),
            minval=-self.init_scale,
            maxval=self.init_scale,
            dtype=jnp.float32,
        )
        return {"table": table}

    # ------------------------------------------------------------------
    # Per-level geometry helpers (B-minor layout: every vector op runs on
    # (N,)-shaped arrays — the batch fills the 128-wide lanes; a (..., d=3)
    # minor layout would waste 125/128 of every VPU op).

    def _level_xi_xf(self, xs, level: int, clamp: bool):
        res = self.level_resolutions[level]
        scaled = [xs[k] * float(res[k]) for k in range(self.input_dim)]
        xi = [s.astype(jnp.int32) for s in scaled]  # trunc == floor for x >= 0 (encoding.py:112)
        if clamp:
            # Dense storage clamps the cell index to res-1: at x == 1.0 the
            # fractional weight moves fully onto the far corner — identical
            # function value, always in-bounds.
            xi = [jnp.clip(i, 0, int(res[k]) - 1) for k, i in enumerate(xi)]
        xf = [s - i.astype(jnp.float32) for s, i in zip(scaled, xi)]
        return xi, xf

    def _corner_weight(self, xf, corner: int):
        w = None
        for k in range(self.input_dim):
            f = xf[k] if (corner >> k) & 1 else 1.0 - xf[k]
            w = f if w is None else w * f
        return w

    def _dense_strides(self, level: int) -> np.ndarray:
        """Row-major strides over the level's CELL grid."""
        res = self.level_resolutions[level].astype(np.int64)
        return np.concatenate([np.cumprod(res[::-1])[::-1][1:], [1]])

    def _vertex_strides(self, level: int) -> np.ndarray:
        verts = self.level_resolutions[level].astype(np.int64) + 1
        return np.concatenate([np.cumprod(verts[::-1])[::-1][1:], [1]])

    def corner_ids_and_weights(self, x: jnp.ndarray):
        """Corner enumeration for all levels: global table rows + weights.

        x: (..., d) in [0, 1]. Returns (ids, weights), each (..., L, C).
        Dense levels use direct row-major vertex indexing; hashed levels the
        tcnn spatial hash. Exposed so kernels/tests share the exact geometry.
        """
        d, L, C = self.input_dim, self.n_levels, 1 << self.input_dim
        lead = x.shape[:-1]
        x2 = x.reshape(-1, d)
        xs = [x2[:, k] for k in range(d)]
        ids_levels, w_levels = [], []
        for l in range(L):
            dense = bool(self.level_dense[l])
            xi, xf = self._level_xi_xf(xs, l, clamp=dense)
            ids_c, w_c = [], []
            if dense:
                vstr = self._vertex_strides(l)
                for c in range(C):
                    idx = None
                    for k in range(d):
                        t = (xi[k] + ((c >> k) & 1)) * np.int32(vstr[k])
                        idx = t if idx is None else idx + t
                    ids_c.append(idx + np.int32(self.level_offsets[l]))
                    w_c.append(self._corner_weight(xf, c))
            else:
                primes = [np.uint32(p) for p in PRIMES[:d]]
                size = np.uint32(self.level_sizes[l])
                for c in range(C):
                    h = None
                    for k in range(d):
                        t = (xi[k] + ((c >> k) & 1)).astype(jnp.uint32) * primes[k]
                        h = t if h is None else h ^ t
                    ids_c.append((h % size).astype(jnp.int32) + np.int32(self.level_offsets[l]))
                    w_c.append(self._corner_weight(xf, c))
            ids_levels.append(jnp.stack(ids_c, axis=-1))  # (N, C)
            w_levels.append(jnp.stack(w_c, axis=-1))
        ids = jnp.stack(ids_levels, axis=-2)  # (N, L, C)
        weights = jnp.stack(w_levels, axis=-2)
        return ids.reshape(*lead, L, C), weights.reshape(*lead, L, C)

    def _dense_cell_table(self, table):
        """Concatenated cell-corner view over the CELL-VIEW dense levels.

        Each dense level's vertex grid is expanded into a (n_cells, C*F) view
        by stacking 2^d SHIFTED SLICES — sequential memory traffic only — so
        the per-voxel lookup becomes ONE row-gather of all corners instead of
        2^d scattered element-gathers.
        """
        d, C, F = self.input_dim, 1 << self.input_dim, self.n_features_per_level
        views = []
        for l in range(self.n_levels):
            if not self.level_cellview[l]:
                continue
            res = self.level_resolutions[l]
            verts = tuple(int(r) + 1 for r in res)
            seg = table[int(self.level_offsets[l]) : int(self.level_offsets[l + 1])]
            grid = seg.reshape(*verts, F)
            slices = []
            for c in range(C):
                sl = tuple(slice((c >> k) & 1, ((c >> k) & 1) + int(res[k])) for k in range(d))
                slices.append(grid[sl])
            cv = jnp.stack(slices, axis=-2)  # (*cells, C, F)
            views.append(cv.reshape(-1, C * F))
        return jnp.concatenate(views, axis=0) if views else None

    def prepare(self, params):
        """Precompute the batch-independent encode state: the dense
        cell-corner view. Building the view costs sequential traffic over the
        whole dense table; inside an inference scan it is loop-INVARIANT, so
        callers evaluating many batches (infer/grid.py) hoist it out and pass
        it back via ``apply(..., prepared=...)`` — measured as the dominant
        per-chunk cost of dense-grid inference."""
        return {"cell_view": self._dense_cell_table(params["table"])}

    def apply(self, params, x, prepared=None):
        """Encode coords -> (..., L * F) features.

        Small dense levels: one fused row-gather from the cell-corner view.
        Big dense + hashed levels: packed per-corner gathers with a
        single-scatter custom VJP. ``prepared``: optional output of
        :meth:`prepare` (hoists the cell-view build out of inference loops).
        """
        table = params["table"]
        d, L, C, F = self.input_dim, self.n_levels, 1 << self.input_dim, self.n_features_per_level
        lead = x.shape[:-1]
        x2 = x.reshape(-1, d)
        n = x2.shape[0]
        xs = [x2[:, k] for k in range(d)]

        outs: list = [None] * L

        # ---- small dense levels: fused cell-view row-gather
        dense_levels = [l for l in range(L) if self.level_cellview[l]]
        if dense_levels:
            cv = prepared["cell_view"] if prepared is not None else self._dense_cell_table(table)
            cell_offset = 0
            ids_list, weights_list = [], []
            for l in dense_levels:
                res = self.level_resolutions[l]
                xi, xf = self._level_xi_xf(xs, l, clamp=True)
                cstr = self._dense_strides(l)
                cid = None
                for k in range(d):
                    t = xi[k] * np.int32(cstr[k])
                    cid = t if cid is None else cid + t
                ids_list.append(cid + np.int32(cell_offset))
                weights_list.append(jnp.stack([self._corner_weight(xf, c) for c in range(C)], axis=-1))
                cell_offset += int(np.prod(self.level_resolutions[l].astype(np.int64)))
            ids = jnp.stack(ids_list, axis=0).reshape(-1)  # (L_dense * N,)
            rows = jnp.take(cv, ids, axis=0)  # (L_dense * N, C*F)
            rows = rows.reshape(len(dense_levels), n, C, F)
            weights = jnp.stack(weights_list, axis=0)  # (L_dense, N, C)
            feats = jnp.einsum("lncf,lnc->lnf", rows, weights)
            for i, l in enumerate(dense_levels):
                outs[l] = feats[i]

        # ---- big dense + hashed levels: ONE packed gather + custom VJP with
        # one packed scatter-add (autodiff would emit per-level/per-corner
        # scatters and rematerialize corner rows; XLA scatter on this TPU
        # costs ~50-85ns per scattered element with a ~2.7x cliff above
        # ~2^18 destination rows — sorted ids / indices_are_sorted hints /
        # segment_sum don't beat it — so the backward is structured around a
        # single scatter op and the cheap id/weight recompute).
        packed_levels = [l for l in range(L) if not self.level_cellview[l]]
        if packed_levels:
            feats = self._packed_features(table, xs, n)  # (N, Lp, F)
            for i, l in enumerate(packed_levels):
                outs[l] = feats[:, i]

        out = jnp.concatenate(outs, axis=-1)  # (N, L*F)
        return out.reshape(*lead, self.output_dim)

    # ------------------------------------------------------------------
    # grid-aligned separable fast path (dense levels, regular output grids)

    def supports_grid_path(self) -> bool:
        """True when every level is dense — the separable regular-grid
        evaluation covers the whole encoding."""
        return bool(self.level_dense.all())

    def apply_grid(self, params, out_shape: Sequence[int], lo: float = 0.0, hi: float = 1.0):
        """Encode a REGULAR axis-aligned grid: (prod(out_shape), L*F).

        Multilinear interpolation on a regular output grid is SEPARABLE: each
        dense level's vertex grid is resampled one axis at a time (two slab
        gathers + a lerp per axis) — O(grid) sequential traffic instead of
        O(grid * 2^d) random per-voxel gathers. Matches ``apply`` on the same
        coordinates to float round-off (tests/test_encodings.py); the
        dense-grid inference path (infer/grid.py) dispatches here.

        Requires all-dense storage (``supports_grid_path``) and the [0, 1]
        coordinate convention the hash models train with.
        """
        if not self.supports_grid_path():
            raise ValueError("apply_grid requires all-dense storage")
        d, F = self.input_dim, self.n_features_per_level
        out_shape = tuple(int(s) for s in out_shape)
        if len(out_shape) != d:
            raise ValueError(f"grid rank {len(out_shape)} != encoder dim {d}")
        table = params["table"]
        n = int(np.prod(out_shape))
        feats = []
        for l in range(self.n_levels):
            res = self.level_resolutions[l]
            verts = tuple(int(r) + 1 for r in res)
            g = table[int(self.level_offsets[l]) : int(self.level_offsets[l + 1])]
            g = g.reshape(*verts, F)
            for k in range(d):
                # same arithmetic as _level_xi_xf on flat_index_to_coords
                # output: x = lo + (hi-lo) * i/(S-1); scaled = x * res
                denom = max(out_shape[k] - 1, 1)
                x = lo + (hi - lo) * (
                    jnp.arange(out_shape[k], dtype=jnp.float32) / np.float32(denom)
                )
                scaled = x * float(res[k])
                xi = jnp.clip(scaled.astype(jnp.int32), 0, int(res[k]) - 1)
                w = scaled - xi.astype(jnp.float32)
                g0 = jnp.take(g, xi, axis=k)
                g1 = jnp.take(g, xi + 1, axis=k)
                wshape = [1] * g0.ndim
                wshape[k] = out_shape[k]
                w = w.reshape(wshape)
                g = g0 * (1.0 - w) + g1 * w
            feats.append(g.reshape(n, F))
        return jnp.concatenate(feats, axis=-1)  # (n, L*F) in logical level order

    # ------------------------------------------------------------------
    # packed per-corner path (big dense + hashed levels)

    def _packed_ids_weights(self, xs):
        """Corner rows + weights for every non-cell-view level: (N, Lp, C).

        Big dense levels use direct row-major vertex indexing (clamped);
        hashed levels the tcnn spatial hash — same math as the oracle paths.
        """
        d, C = self.input_dim, 1 << self.input_dim
        primes = [np.uint32(p) for p in PRIMES[:d]]
        ids_l, w_l = [], []
        for l in range(self.n_levels):
            if self.level_cellview[l]:
                continue
            dense = bool(self.level_dense[l])
            xi, xf = self._level_xi_xf(xs, l, clamp=dense)
            ids_c, w_c = [], []
            if dense:
                vstr = self._vertex_strides(l)
                for c in range(C):
                    idx = None
                    for k in range(d):
                        t = (xi[k] + ((c >> k) & 1)) * np.int32(vstr[k])
                        idx = t if idx is None else idx + t
                    ids_c.append(idx + np.int32(self.level_offsets[l]))
                    w_c.append(self._corner_weight(xf, c))
            else:
                size = np.uint32(self.level_sizes[l])
                for c in range(C):
                    h = None
                    for k in range(d):
                        t = (xi[k] + ((c >> k) & 1)).astype(jnp.uint32) * primes[k]
                        h = t if h is None else h ^ t
                    ids_c.append((h % size).astype(jnp.int32) + np.int32(self.level_offsets[l]))
                    w_c.append(self._corner_weight(xf, c))
            ids_l.append(jnp.stack(ids_c, axis=-1))
            w_l.append(jnp.stack(w_c, axis=-1))
        return jnp.stack(ids_l, axis=1), jnp.stack(w_l, axis=1)

    def _packed_features(self, table, xs, n: int):
        """(N, Lp, F) features for non-cell-view levels, differentiable wrt
        table.

        Backward: ONE packed narrow scatter-add over all packed levels.
        (A wide-row variant — per-voxel (C*F) rows into a cell-indexed
        buffer + slice-stack adjoint — was measured 5x SLOWER end-to-end
        despite the favorable per-id scatter cost: XLA lowers the big-grid
        slice adjoint poorly. Keep the single narrow scatter.)
        """
        d = self.input_dim
        F = self.n_features_per_level
        packed = [l for l in range(self.n_levels) if not self.level_cellview[l]]
        Lp = len(packed)
        C = 1 << d
        rows_total = self.total_size

        @jax.custom_vjp
        def call(table, xs):
            ids, w = self._packed_ids_weights(xs)
            rows = jnp.take(table, ids.reshape(-1), axis=0).reshape(n, Lp, C, F)
            return jnp.einsum("nlcf,nlc->nlf", rows, w)

        def fwd(table, xs):
            return call(table, xs), xs

        def bwd(xs_saved, g):
            # recompute ids/weights (VPU-cheap) instead of saving (N, Lp, C)
            ids, w = self._packed_ids_weights(xs_saved)
            contrib = (g[:, :, None, :] * w[..., None]).reshape(-1, F)
            flat_ids = ids.reshape(-1)
            import os as _os

            _layout = _os.environ.get("MRI_TPU_SCATTER_LAYOUT", "auto")
            _use_flat = (_layout == "flat" or (
                _layout != "wide"
                and 1 < F <= 5 and rows_total > (1 << 18)
                and n * Lp * C >= (1 << 18)))
            if _use_flat and F > 1:
                # FLAT element scatter: wide-row scatter-adds hit a measured
                # ~4.6x per-id cost cliff once the destination exceeds ~2^18
                # rows (~81 ns/id vs ~17.8 below, F-independent), while
                # narrow 4-byte scatters stay ~9-12 ns/element at EVERY
                # table size (bf16 identical -> transaction-driven, not
                # byte-driven). Expanding each row-update into F element
                # updates into the flattened (rows*F,) table therefore wins
                # up to F~5 (isolated: F2 81->25 ns/id, F4 84->49; F8 loses
                # 87->94) — but only once enough ids amortize the expansion:
                # in-context crossover measured at ~2^18 scattered ids
                # (0.78x at 80k ids, 1.4x at 320k, 2.4x at 1.28M on the NGP
                # F2 config), hence the n*Lp*C gate. The trailing reshape
                # back to (rows, F) is layout-free. Override with
                # MRI_TPU_SCATTER_LAYOUT=wide|flat. See RESULTS.md
                # scatter-pricing table.
                fi = (flat_ids[:, None] * np.int32(F)
                      + jnp.arange(F, dtype=flat_ids.dtype)[None, :]).reshape(-1)
                dtable = (jnp.zeros((rows_total * F,), g.dtype)
                          .at[fi].add(contrib.reshape(-1))
                          .reshape(rows_total, F))
            else:
                dtable = jnp.zeros((rows_total, F), g.dtype).at[flat_ids].add(contrib)
            return dtable, None  # no dx: coords are data

        call.defvjp(fwd, bwd)
        return call(table, xs)


def temporal_table_tv(enc: HashGridEncoding, table: jnp.ndarray) -> jnp.ndarray:
    """Mean squared difference of adjacent TIME-axis vertices across every
    dense level's feature grid (time = the volume's last axis).

    A smoothness prior for the even-frame interpolation protocol: with the
    time resolution at the full frame grid, the held-out frames' vertices are
    unconstrained by the data term; this regularizer couples them to their
    trained neighbors (new capability — the reference sketches hash-table
    regularization only as comments, hash_experimentation.py:464-544).
    """
    total, count = 0.0, 0
    for l in range(enc.n_levels):
        if not enc.level_dense[l]:
            continue
        verts = tuple(int(r) + 1 for r in enc.level_resolutions[l])
        if verts[-1] < 2:
            continue
        seg = table[int(enc.level_offsets[l]) : int(enc.level_offsets[l + 1])]
        grid = seg.reshape(*verts, enc.n_features_per_level)
        diff = jnp.diff(grid, axis=len(verts) - 1)
        total = total + jnp.sum(diff**2)
        count += int(np.prod(diff.shape))
    return total / max(count, 1)
