"""Parallel layer: mesh construction, data-parallel fitting, sharded inference."""

from .data_parallel import DataParallelTrainer, evaluate_grid_sharded, fit_multi_volume
from .mesh import Mesh, NamedSharding, P, make_mesh, replicated, sharded_batch

__all__ = [
    "DataParallelTrainer",
    "evaluate_grid_sharded",
    "fit_multi_volume",
    "make_mesh",
    "replicated",
    "sharded_batch",
    "Mesh",
    "NamedSharding",
    "P",
]
