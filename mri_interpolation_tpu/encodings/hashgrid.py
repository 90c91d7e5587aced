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

__all__ = ["HashGridEncoding", "PRIMES", "spatial_hash"]

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
    ):
        if dim > len(PRIMES):
            raise ValueError(f"hash grid supports at most {len(PRIMES)}-D inputs, got {dim}")
        self.input_dim = dim
        self.n_levels = n_levels
        self.n_features_per_level = n_features_per_level
        self.log2_hashmap_size = log2_hashmap_size
        self.output_dim = n_levels * n_features_per_level
        self.init_scale = init_scale

        res, sizes = _level_geometry(
            dim, n_levels, log2_hashmap_size, base_resolution, finest_resolution, per_level_scale, growth
        )
        self.level_resolutions = res  # (L, d) int32, static
        self.level_sizes = sizes  # (L,) int64, static
        self.level_offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        self.total_size = int(self.level_offsets[-1])

        # Corner bit pattern: corner c uses xi+1 on dims whose bit is set
        # (complement of the reference's bin_mask, encoding.py:101-106).
        n_corners = 1 << dim
        corners = np.arange(n_corners, dtype=np.int32)[:, None]
        dims = np.arange(dim, dtype=np.int32)[None, :]
        self._corner_bits = ((corners >> dims) & 1).astype(np.int32)  # (C, d) in {0,1}

        # Device constants (built lazily so construction stays backend-free).
        self._res_f32 = jnp.asarray(res, dtype=jnp.float32)  # (L, d)
        self._sizes_u32 = jnp.asarray(sizes.astype(np.uint32))[:, None]  # (L, 1)
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

    def corner_ids_and_weights(self, x: jnp.ndarray):
        """Fused corner enumeration for all levels.

        x: (..., d) in [0, 1]. Returns (ids, weights) with shapes
        (..., L, C) int32 global table rows and (..., L, C) float32
        multilinear weights. Exposed separately so Pallas kernels can reuse
        the exact same geometry.
        """
        scaled = x[..., None, :] * self._res_f32  # (..., L, d)
        xi = scaled.astype(jnp.int32)  # trunc == floor for x >= 0 (encoding.py:112)
        xf = scaled - xi.astype(jnp.float32)
        # (..., L, C, d)
        corner = xi[..., :, None, :] + self._bits
        w = jnp.where(self._bits == 1, xf[..., :, None, :], 1.0 - xf[..., :, None, :])
        weights = jnp.prod(w, axis=-1)  # (..., L, C)
        hashed = spatial_hash(corner, self._sizes_u32)  # (..., L, C)
        return hashed + self._offsets_i32, weights

    def apply(self, params, x):
        """Encode coords -> (..., L * F) features. One gather, one reduce."""
        ids, weights = self.corner_ids_and_weights(x)  # (..., L, C) each
        feats = jnp.take(params["table"], ids, axis=0)  # (..., L, C, F)
        out = jnp.sum(feats * weights[..., None], axis=-2)  # (..., L, F)
        return out.reshape(*out.shape[:-2], self.output_dim)
