"""Bucketed psum-gather embedding exchange: correctness + gradients on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from beta_recsys_tpu.parallel.embedding import bucketed_psum_gather, pad_table
from beta_recsys_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=4, n_model=2)


def _sharded_table(mesh, n_rows=40, d=8, seed=0):
    table = jax.random.normal(jax.random.key(seed), (n_rows, d))
    padded = pad_table(table, mesh.shape["model"])
    return table, jax.device_put(padded, NamedSharding(mesh, P("model", None)))


def test_all_to_all_matches_local_gather(mesh):
    table, table_sharded = _sharded_table(mesh)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 40, 32), jnp.int32)
    ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("data")))
    out = bucketed_psum_gather(table_sharded, ids_sharded, mesh, capacity_factor=4.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)


def test_all_to_all_skewed_ids_within_capacity(mesh):
    table, table_sharded = _sharded_table(mesh)
    # all ids owned by shard 0 — needs capacity >= local_b
    ids = jnp.asarray(np.arange(32) % 20, jnp.int32)
    ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("data")))
    out = bucketed_psum_gather(table_sharded, ids_sharded, mesh, capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)


def test_all_to_all_gradients_scatter_to_shards(mesh):
    table, table_sharded = _sharded_table(mesh)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 40, 16), jnp.int32)
    ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("data")))
    w = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)

    def loss(t):
        return jnp.sum(bucketed_psum_gather(t, ids_sharded, mesh, capacity_factor=4.0) * w)

    g = jax.grad(loss)(table_sharded)
    expected = np.zeros((40, 8), np.float32)
    for i, idx in enumerate(np.asarray(ids)):
        expected[idx] += np.asarray(w)[i]
    np.testing.assert_allclose(np.asarray(g)[:40], expected, rtol=1e-5, atol=1e-6)
