"""Pallas TPU kernels.

Every kernel here is gated on equivalence with a plain-JAX oracle
(tests/test_pallas.py runs them in interpreter mode on CPU; TPU runs use the
compiled path). Current kernels:

- fused_mlp: fused MLP stack (sine/relu/gelu activations) — weights
  VMEM-resident, activations never leave the chip between layers; custom VJP
  with sequential-grid weight-gradient accumulation. The FullyFusedMLP
  equivalent (SURVEY.md §2.6).
- hash_encode: fused multiresolution hash encoding — per-level hash + corner
  gathers from a VMEM-resident table + multilinear reduce; custom VJP with
  in-kernel scatter-add table gradients. The tcnn HashGrid equivalent.

``resolve_fused`` maps a model factory's ``fused`` knob ("auto" | "on" |
"off" | "interpret") to the execution mode for the current backend.
"""

from .fused_mlp import (
    fused_mlp_apply,
    fused_mlp_forward,
    fused_siren_apply,
    fused_siren_forward,
    pallas_supported,
)
from .hash_encode import (
    coarse_onehot_levels,
    hash_encode_forward,
    pallas_hash_encode,
    pallas_hash_encode_coarse,
    table_fits_vmem,
)

__all__ = [
    "fused_siren_apply",
    "fused_siren_forward",
    "fused_mlp_apply",
    "fused_mlp_forward",
    "pallas_hash_encode",
    "pallas_hash_encode_coarse",
    "coarse_onehot_levels",
    "hash_encode_forward",
    "table_fits_vmem",
    "pallas_supported",
    "resolve_fused",
]


def resolve_fused(fused: str) -> str:
    """Resolve a factory's ``fused`` knob: returns "off", "on" (compiled) or
    "interpret" (interpreter mode, test/debug). "auto" enables the compiled
    path only on backends that execute Mosaic kernels."""
    if fused == "auto":
        return "on" if pallas_supported() else "off"
    if fused not in ("off", "on", "interpret"):
        raise ValueError(f"unknown fused mode {fused!r}")
    return fused
