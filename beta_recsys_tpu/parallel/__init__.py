"""Parallel runtime: device meshes, sharding rules, sharded embeddings."""

from .mesh import DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh, replicated, row_sharding  # noqa: F401
from .sharding import (  # noqa: F401
    default_param_rule,
    make_sharded_train_step,
    pad_to_multiple,
    shard_batch,
    shard_params,
)
