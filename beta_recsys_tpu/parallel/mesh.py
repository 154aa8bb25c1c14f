"""Device mesh construction for data x model parallelism.

The framework's standard mesh has two axes (SURVEY.md §7 design stance):
- "data":  batch sharding (the default scaling mode, P1 in SURVEY §2.8)
- "model": row-sharding of user/item embedding tables (the framework's model
  parallelism — reference nn.Embedding tables become sharded tables with
  collective lookup, per BASELINE.json north star)

On a v5e-16 slice the default is an (8, 2) mesh; on one chip both axes are 1.
Axis layout follows the ICI topology ordering jax.devices() provides, so
"data" all-reduces and "model" collectives ride ICI, not DCN.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data=None, n_model=1, devices=None):
    """Create a ("data", "model") mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = max(n // n_model, 1)
    used = n_data * n_model
    if used > n:
        raise ValueError(f"mesh {n_data}x{n_model} needs {used} devices, have {n}")
    arr = np.array(devices[:used]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh):
    """Batch arrays: shard the leading dim over "data", replicate over "model"."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def row_sharding(mesh):
    """Embedding tables: shard rows over "model" (replicated over "data")."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))
