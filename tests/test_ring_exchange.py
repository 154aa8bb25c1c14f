"""Ring RDMA all-gather + bucketed embedding exchange on the 8-device mesh.

Runs the Pallas kernel in Mosaic interpret mode (CPU backend), which emulates
remote DMAs and semaphores across the virtual devices — the TPU answer to
multi-chip testing without a pod (SURVEY §4).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from beta_recsys_tpu.ops.pallas.ring_exchange import ring_allgather
from beta_recsys_tpu.parallel.embedding import (
    pad_table,
    psum_gather,
    rdma_bucketed_gather,
)
from beta_recsys_tpu.parallel.mesh import make_mesh


def _model_mesh():
    return Mesh(np.array(jax.devices()).reshape(1, 8), ("data", "model"))


def test_ring_allgather_matches_lax():
    mesh = Mesh(np.array(jax.devices()), ("model",))
    x = jax.random.normal(jax.random.key(0), (8 * 16, 128), jnp.float32)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=P("model"), out_specs=P(None, None),
        check_vma=False,
    )
    def gathered(block):
        return ring_allgather(block, "model").reshape(-1, block.shape[1])

    np.testing.assert_allclose(np.asarray(gathered(x)), np.asarray(x), rtol=1e-6)


def test_rdma_bucketed_gather_matches_dense():
    mesh = _model_mesh()
    n_rows, d = 61, 32
    table = jax.random.normal(jax.random.key(1), (n_rows, d), jnp.float32)
    padded = pad_table(table, mesh.shape["model"])
    padded = jax.device_put(padded, NamedSharding(mesh, P("model", None)))
    ids = jax.random.randint(jax.random.key(2), (40,), 0, n_rows, jnp.int32)

    out = rdma_bucketed_gather(padded, ids, mesh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(table[ids]), rtol=1e-6, atol=1e-6
    )


def test_rdma_bucketed_gather_skewed_ids_overflow_zero():
    # All ids owned by shard 0 with capacity_factor=1.0: beyond-capacity ids
    # must come back as zero rows, in-capacity ones exact (documented
    # bucketed semantics, same as bucketed_psum_gather).
    mesh = _model_mesh()
    d = 16
    table = jax.random.normal(jax.random.key(3), (64, d), jnp.float32)
    padded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids = jnp.zeros((32,), jnp.int32)  # all hit shard 0; capacity = 8
    out = np.asarray(rdma_bucketed_gather(padded, ids, mesh, capacity_factor=1.0))
    row0 = np.asarray(table[0])
    np.testing.assert_allclose(out[:8], np.tile(row0, (8, 1)), rtol=1e-6)
    np.testing.assert_allclose(out[8:], 0.0)


def test_rdma_bucketed_gather_grads_match_psum_gather():
    mesh = _model_mesh()
    n_rows, d, b = 48, 32, 24
    table = jax.random.normal(jax.random.key(4), (n_rows, d), jnp.float32)
    padded = jax.device_put(
        pad_table(table, mesh.shape["model"]), NamedSharding(mesh, P("model", None))
    )
    ids = jax.random.randint(jax.random.key(5), (b,), 0, n_rows, jnp.int32)
    w = jax.random.normal(jax.random.key(6), (b, d))

    g_rdma = jax.grad(lambda t: jnp.sum(rdma_bucketed_gather(t, ids, mesh) * w))(padded)
    g_psum = jax.grad(lambda t: jnp.sum(psum_gather(t, ids, mesh) * w))(padded)
    np.testing.assert_allclose(
        np.asarray(g_rdma), np.asarray(g_psum), rtol=1e-5, atol=1e-6
    )


def test_rdma_bucketed_gather_under_jit():
    mesh = _model_mesh()
    table = jax.random.normal(jax.random.key(7), (64, 32), jnp.float32)
    padded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids = jax.random.randint(jax.random.key(8), (16,), 0, 64, jnp.int32)
    out = jax.jit(lambda t, i: rdma_bucketed_gather(t, i, mesh))(padded, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(table[ids]), rtol=1e-6, atol=1e-6
    )
