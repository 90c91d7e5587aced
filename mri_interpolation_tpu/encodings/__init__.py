"""Coordinate encodings: frequency / Gaussian Fourier / multiresolution hash.

Uniform surface: each encoding has ``input_dim``, ``output_dim``,
``init(key) -> params`` and ``apply(params, x) -> features``.
"""

from .fourier import GaussianFourierEncoding
from .frequency import FrequencyEncoding
from .hashgrid import PRIMES, HashGridEncoding, spatial_hash

__all__ = [
    "FrequencyEncoding",
    "GaussianFourierEncoding",
    "HashGridEncoding",
    "PRIMES",
    "spatial_hash",
]
