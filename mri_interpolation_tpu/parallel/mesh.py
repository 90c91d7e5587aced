"""Device mesh construction.

The reference is strictly single-process/single-GPU (SURVEY.md §2.7): no DDP,
no collectives. Scaling here is new capability, built the TPU way: a 1-D
``jax.sharding.Mesh`` over the slice's chips with a ``data`` axis; gradients
ride ICI through ``psum`` inside ``shard_map``. DCN is out of scope
(single-slice target per BASELINE.json).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "sharded_batch", "P", "Mesh", "NamedSharding"]


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))
