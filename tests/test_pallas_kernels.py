"""Pallas kernel tests (interpret mode on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_embedding_gather_matches_take():
    from beta_recsys_tpu.ops.pallas.embedding_lookup import embedding_gather

    table = jax.random.normal(jax.random.key(0), (64, 128))
    ids = jnp.array([3, 0, 63, 7, 7, 12], dtype=jnp.int32)
    out = embedding_gather(table, ids, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)


def test_embedding_gather_grad_scatter_add():
    from beta_recsys_tpu.ops.pallas.embedding_lookup import embedding_gather

    table = jax.random.normal(jax.random.key(1), (32, 128))
    ids = jnp.array([5, 5, 9, 0], dtype=jnp.int32)
    w = jax.random.normal(jax.random.key(2), (4, 128))

    def loss(t):
        return jnp.sum(embedding_gather(t, ids, 4) * w)

    g = jax.grad(loss)(table)
    expected = np.zeros_like(np.asarray(table))
    for i, idx in enumerate(np.asarray(ids)):
        expected[idx] += np.asarray(w)[i]
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)
