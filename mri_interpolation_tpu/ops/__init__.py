"""Custom ops: Pallas TPU kernels (with plain-JAX oracles) and helpers."""
