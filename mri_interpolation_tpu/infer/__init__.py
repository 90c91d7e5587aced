"""Inference: arbitrary-resolution dense-grid evaluation, classical baseline,
and serving export."""

from .grid import evaluate_grid, flat_index_to_coords, predict_batched
from .classical import linear_interpolate_volume
from .export import export_evaluator_bytes, load_evaluator, save_evaluator

__all__ = [
    "evaluate_grid",
    "flat_index_to_coords",
    "predict_batched",
    "linear_interpolate_volume",
    "save_evaluator",
    "load_evaluator",
    "export_evaluator_bytes",
]
