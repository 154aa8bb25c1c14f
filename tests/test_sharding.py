"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The TPU answer to "test multi-node without a cluster" (SURVEY.md §4): a
sharded train step must (a) compile and run over a ("data", "model") mesh and
(b) produce the same result as the unsharded step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.parallel.embedding import psum_gather, pad_table
from beta_recsys_tpu.parallel.mesh import make_mesh
from beta_recsys_tpu.parallel.sharding import (
    default_param_rule,
    make_sharded_train_step,
    shard_batch,
    shard_params,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return make_mesh(n_data=4, n_model=2)


def _mf_problem(n_users=32, n_items=64, emb=16):
    model = MF({"model": "MF", "emb_dim": emb, "loss": "bpr", "lr": 0.1}, n_users, n_items)
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    batch = {
        "users": rng.integers(0, n_users, 16).astype(np.int32),
        "pos_items": rng.integers(0, n_items, 16).astype(np.int32),
        "neg_items": rng.integers(0, n_items, 16).astype(np.int32),
    }
    return model, params, batch


def test_sharded_step_matches_single_device(mesh):
    model, params, batch = _mf_problem()
    optimizer = optax.sgd(0.1)

    # Unsharded reference step.
    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(model.loss)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    opt_state = optimizer.init(params)
    ref_params, _, ref_loss = jax.jit(step)(params, opt_state, batch, jax.random.key(1))

    # Sharded step over the mesh (tables row-sharded over "model").
    rule = default_param_rule(model.n_users, model.n_items, min_rows=1)
    sharded_step, _ = make_sharded_train_step(model, optimizer, mesh, param_rule=rule)
    s_params = shard_params(params, mesh, rule)
    s_opt_state = optimizer.init(s_params)
    s_batch = shard_batch(batch, mesh)
    out_params, _, s_loss = sharded_step(s_params, s_opt_state, s_batch, jax.random.key(1))

    assert float(s_loss) == pytest.approx(float(ref_loss), rel=1e-5)
    for k in ("user_emb", "item_emb"):
        np.testing.assert_allclose(
            np.asarray(out_params[k]), np.asarray(ref_params[k]), rtol=1e-5, atol=1e-6
        )


def test_psum_gather_matches_local(mesh):
    n_rows, d = 40, 8
    table = jax.random.normal(jax.random.key(0), (n_rows, d))
    padded = pad_table(table, mesh.shape["model"])
    from jax.sharding import NamedSharding, PartitionSpec as P

    table_sharded = jax.device_put(padded, NamedSharding(mesh, P("model", None)))
    ids = jnp.array([0, 5, 39, 17, 23], dtype=jnp.int32)
    out = psum_gather(table_sharded, ids, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)


def test_psum_gather_gradients(mesh):
    """Autodiff through the collective lookup = local scatter-add of grads."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_model = mesh.shape["model"]
    table = 0.1 * jax.random.normal(jax.random.key(0), (20, 4))
    table = jax.device_put(pad_table(table, n_model),
                           NamedSharding(mesh, P("model", None)))
    ids = jnp.array([1, 1, 5], dtype=jnp.int32)

    def loss_fn(t):
        return jnp.sum(psum_gather(t, ids, mesh) ** 2)

    g = jax.grad(loss_fn)(table)
    dense = np.asarray(table)
    expected = np.zeros_like(dense)
    for i in np.asarray(ids):
        expected[i] += 2 * dense[i]
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5, atol=1e-6)


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip, entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 16)
    dryrun_multichip(8)
