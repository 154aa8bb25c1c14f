"""Parameter/batch sharding rules and the sharded train-step builder.

The scaling recipe (jax-ml scaling book): pick a mesh, annotate param and batch
shardings, jit the step, and let XLA's SPMD partitioner insert the collectives
(grad all-reduce over "data", embedding-row gathers over "model"). The explicit
shard_map embedding-lookup kernel lives in
:mod:`beta_recsys_tpu.parallel.embedding` for when the automatic partitioning
of huge tables is not good enough.
"""

import jax
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def default_param_rule(n_users, n_items, min_rows=1024):
    """Sharding rule: row-shard big per-user/per-item tables over "model".

    Any other parameter (dense layers, biases, scalars) is replicated — they
    are small in every model in the zoo (SURVEY §2.8: the largest tensors are
    the embedding tables).
    """

    def rule(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 2 and leaf.shape[0] in (n_users, n_items):
            if leaf.shape[0] >= min_rows:
                return P(MODEL_AXIS, None)
        return P()

    return rule


def shard_params(params, mesh, rule):
    """Place a params pytree on the mesh per the sharding rule."""
    def place(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, rule(leaf)))

    return jax.tree_util.tree_map(place, params)


def shard_batch(batch, mesh):
    """Shard every batch array's leading dim over the "data" axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def place(leaf):
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(place, batch)


def pad_to_multiple(arr, multiple, axis=0):
    """Pad an array along ``axis`` so its size divides ``multiple`` (wraps data)."""
    n = arr.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return arr
    reps = -(-target // n)
    tiled = np.concatenate([arr] * reps, axis=axis)
    return np.take(tiled, np.arange(target), axis=axis)


def make_sharded_train_step(model, optimizer, mesh, param_rule=None):
    """Jitted single train step with explicit param/batch shardings.

    Returns (step_fn, place_params) where place_params moves params/opt_state
    onto the mesh. The step: grads + optimizer update; XLA inserts the "data"
    all-reduce for grads and "model" collectives for sharded-table lookups.
    """
    param_rule = param_rule or default_param_rule(model.n_users, model.n_items)

    def place(params):
        return shard_params(params, mesh, param_rule)

    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(model.loss)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1)), place
