"""mri_interpolation_tpu — TPU-native implicit-neural-representation framework
for MRI interpolation / super-resolution.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Benjamin-Fouquet/mri_interpolation (coordinate-MLP fitting of (dynamic) MRI
volumes, arbitrary-resolution grid inference), built TPU-first:

- pure-functional model zoo (SIREN, modulated SIREN, hash-grid MLP, Gabor/WIRE,
  RFF, PSF-SIREN, dual-encoder FreqMLP, multi-frame variants)
- device-resident voxel dataset, scan-compiled epochs (one XLA dispatch/epoch)
- Pallas fused kernels for the hot paths (hash encode, fused MLP blocks)
- sharded dense-grid inference and data-parallel fitting over a jax Mesh
"""

__version__ = "0.1.0"

from . import io

__all__ = ["io", "__version__"]
