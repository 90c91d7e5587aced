"""Parallel layer: mesh construction, data-parallel fitting, sharded inference."""

from .data_parallel import DataParallelTrainer, evaluate_grid_sharded, fit_multi_volume
from .mesh import Mesh, NamedSharding, P, make_mesh, replicated, sharded_batch
from .sharded_table import (
    ShardedHashTrainer,
    evaluate_grid_sharded_table,
    make_sharded_encode,
    plan_table_sharding,
    shard_table,
    sharded_encode_apply,
    unshard_table,
)

__all__ = [
    "DataParallelTrainer",
    "evaluate_grid_sharded",
    "fit_multi_volume",
    "ShardedHashTrainer",
    "evaluate_grid_sharded_table",
    "plan_table_sharding",
    "make_sharded_encode",
    "sharded_encode_apply",
    "shard_table",
    "unshard_table",
    "make_mesh",
    "replicated",
    "sharded_batch",
    "Mesh",
    "NamedSharding",
    "P",
]
