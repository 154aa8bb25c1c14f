"""Parity tests for the scatter-free graph propagation strategies.

All three formats (dense MXU matmul, chunked windowed segment-matmul, COO
segment-sum) must agree — forward, with per-step dynamic edge values, and in
gradients wrt both the node features and the edge values (the chunked format's
custom VJP routes dx through a transposed edge pack and dvals through two
gathers, so this pins that no scatter shortcut broke correctness).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beta_recsys_tpu.ops.graph import pack_propagator, propagate_mean


def _rand_graph(n, nnz, hub_deg, seed=0):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    if hub_deg:
        # one hub node exercises the power-of-two capacity bucketing
        rows = np.concatenate([rows, np.full(hub_deg, 3, np.int32)])
        cols = np.concatenate([cols, rng.integers(0, n, hub_deg).astype(np.int32)])
    vals = rng.random(len(rows)).astype(np.float32)
    return rows, cols, vals


def _close(a, b, tol=3e-5):
    denom = max(float(np.abs(np.asarray(b)).max()), 1.0)
    return float(np.abs(np.asarray(a) - np.asarray(b)).max()) / denom < tol


@pytest.mark.parametrize("n,nnz,hub", [(50, 300, 900), (600, 5000, 0), (1200, 20000, 700)])
def test_strategy_parity_forward_and_grads(n, nnz, hub):
    rows, cols, vals = _rand_graph(n, nnz, hub)
    x = jnp.asarray(np.random.default_rng(1).random((n, 16)).astype(np.float32))
    props = {f: pack_propagator(rows, cols, vals, n, fmt=f) for f in ("dense", "chunked", "coo")}

    ref = props["coo"].spmm(x)
    for f in ("dense", "chunked"):
        assert _close(props[f].spmm(x), ref), f

    v2 = jnp.asarray(np.random.default_rng(2).random(len(rows)).astype(np.float32))
    ref_dyn = props["coo"].spmm(x, v2)
    for f in ("dense", "chunked"):
        assert _close(props[f].spmm(x, v2), ref_dyn), f

    def make_loss(p):
        return lambda x_, v_: jnp.sum(p.spmm(x_, v_) ** 2)

    gx_ref, gv_ref = jax.grad(make_loss(props["coo"]), argnums=(0, 1))(x, v2)
    for f in ("dense", "chunked"):
        gx, gv = jax.grad(make_loss(props[f]), argnums=(0, 1))(x, v2)
        assert _close(gx, gx_ref), (f, "dx")
        assert _close(gv, gv_ref), (f, "dvals")


def test_auto_format_selection():
    rows, cols, vals = _rand_graph(64, 200, 0)
    assert pack_propagator(rows, cols, vals, 64).format == "dense"
    assert pack_propagator(rows, cols, vals, 64, dense_max_nodes=32).format == "chunked"


def test_isolated_nodes_get_zero_rows():
    # nodes 90..99 have no incoming edges
    rows = np.array([0, 1, 2], np.int32)
    cols = np.array([5, 6, 7], np.int32)
    vals = np.ones(3, np.float32)
    x = jnp.ones((100, 8), jnp.float32)
    for f in ("dense", "chunked", "coo"):
        out = np.asarray(pack_propagator(rows, cols, vals, 100, fmt=f).spmm(x))
        assert np.all(out[90:] == 0.0), f
        assert np.all(out[:3] == 1.0), f


def test_propagate_mean_matches_legacy():
    from beta_recsys_tpu.ops.graph import lightgcn_propagate

    rows, cols, vals = _rand_graph(80, 600, 0, seed=3)
    rng = np.random.default_rng(4)
    ue = jnp.asarray(rng.random((30, 8)).astype(np.float32))
    ie = jnp.asarray(rng.random((50, 8)).astype(np.float32))
    ref_u, ref_i = lightgcn_propagate(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), ue, ie, 3
    )
    for f in ("dense", "chunked"):
        prop = pack_propagator(rows, cols, vals, 80, fmt=f)
        u, i = propagate_mean(prop, ue, ie, 3)
        assert _close(u, ref_u) and _close(i, ref_i), f
