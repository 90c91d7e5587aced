"""Pallas TPU kernels.

Every kernel here is gated on equivalence with a plain-JAX oracle
(tests/test_pallas.py runs them in interpreter mode on CPU; TPU runs use the
compiled path). Current kernels:

- fused_mlp: fused sine-MLP (SIREN) stack — weights VMEM-resident, activations
  never leave the chip between layers; custom VJP with sequential-grid
  weight-gradient accumulation. The FullyFusedMLP equivalent (SURVEY.md §2.6).
"""

from .fused_mlp import fused_siren_apply, fused_siren_forward

__all__ = ["fused_siren_apply", "fused_siren_forward"]
