"""Streaming top-k correctness vs dense scoring."""

import jax
import jax.numpy as jnp
import numpy as np

from beta_recsys_tpu.ops.topk import streaming_topk


def test_matches_dense_topk():
    rng = np.random.default_rng(0)
    B, d, n_items, k = 16, 32, 1000, 10
    u = jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(n_items, d)), jnp.float32)
    vals, idx = streaming_topk(u, V, k, block=128)
    dense = np.asarray(u @ V.T)
    ref_idx = np.argsort(-dense, axis=1)[:, :k]
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(dense, ref_idx, 1), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.take_along_axis(dense, np.asarray(idx), 1),
        np.take_along_axis(dense, ref_idx, 1),
        rtol=1e-5,
    )


def test_exclude_mask_and_ragged_blocks():
    rng = np.random.default_rng(1)
    B, d, n_items, k = 8, 16, 777, 5  # 777 not divisible by block
    u = jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(n_items, d)), jnp.float32)
    mask = jnp.asarray(rng.random((B, n_items)) < 0.3)
    vals, idx = streaming_topk(u, V, k, block=128, exclude_mask=mask)
    dense = np.array(u @ V.T)  # writable copy
    dense[np.asarray(mask)] = -np.inf
    ref_vals = np.sort(dense, axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5)
    # excluded items never appear
    assert not np.asarray(mask)[np.arange(B)[:, None], np.asarray(idx)].any()
