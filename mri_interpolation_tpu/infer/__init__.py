"""Inference: arbitrary-resolution dense-grid evaluation + classical baseline."""

from .grid import evaluate_grid, flat_index_to_coords, predict_batched
from .classical import linear_interpolate_volume

__all__ = [
    "evaluate_grid",
    "flat_index_to_coords",
    "predict_batched",
    "linear_interpolate_volume",
]
