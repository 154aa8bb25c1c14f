"""Forward/loss/grad tests for the second model wave:
SimGCL, BUIR, UltraGCN, VAECF, Triple2vec, PairwiseGMF, User/ItemKNN."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.models import build_model
from beta_recsys_tpu.ops.ultragcn_prep import get_ii_constraint_mat
from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)

N_USERS, N_ITEMS, B = 20, 30, 8


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            DEFAULT_USER_COL: rng.integers(0, N_USERS, 300),
            DEFAULT_ITEM_COL: rng.integers(0, N_ITEMS, 300),
            DEFAULT_RATING_COL: np.ones(300, np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(300),
        }
    )
    return BaseData((df, [], []), intersect=False)


def _pairwise_batch(rng, n_users, n_items):
    return {
        "users": jnp.asarray(rng.integers(0, n_users, B), jnp.int32),
        "pos_items": jnp.asarray(rng.integers(0, n_items, B), jnp.int32),
        "neg_items": jnp.asarray(rng.integers(0, n_items, B), jnp.int32),
    }


def _check(model, params, batch, rng_key=1):
    loss, grads = jax.value_and_grad(model.loss)(params, batch, jax.random.key(rng_key))
    assert np.isfinite(float(loss)), float(loss)
    users = jnp.arange(4, dtype=jnp.int32)
    cand = jnp.asarray(np.arange(24).reshape(4, 6) % model.n_items, jnp.int32)
    assert model.score_candidates(params, users, cand).shape == (4, 6)
    return loss, grads


def test_simgcl(data):
    rng = np.random.default_rng(1)
    model = build_model(
        {"model": "SimGCL", "emb_dim": 8, "n_layer": 2, "eps": 0.1, "reg": 1e-4, "lambda": 0.5},
        data.n_users, data.n_items, artifacts={"adj": data.get_norm_adj("sym")},
    )
    params = model.init_params(jax.random.key(0))
    _check(model, params, _pairwise_batch(rng, data.n_users, data.n_items))


def test_buir(data):
    rng = np.random.default_rng(2)
    model = build_model(
        {"model": "BUIR", "emb_dim": 8, "momentum": 0.9},
        data.n_users, data.n_items, artifacts={"adj": data.get_norm_adj("sym")},
    )
    params = model.init_params(jax.random.key(0))
    batch = _pairwise_batch(rng, data.n_users, data.n_items)
    loss, grads = _check(model, params, batch)
    # target encoder receives no gradients
    tgt_grads = jax.tree_util.tree_leaves(grads["target"])
    assert all(np.allclose(np.asarray(g), 0) for g in tgt_grads)
    # post_update moves target toward online
    p2 = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    merged = model.post_update({**p2, "target": params["target"]})
    assert not np.allclose(
        np.asarray(merged["target"]["user_emb"]), np.asarray(params["target"]["user_emb"])
    )


def test_ultragcn(data):
    rng = np.random.default_rng(3)
    train_mat, bu, bi = data.create_constraint_mat()
    nb, sims = get_ii_constraint_mat(train_mat, 5)
    assert nb.shape == (data.n_items, 5)
    model = build_model(
        {"model": "UltraGCN", "emb_dim": 8, "w1": 1e-7, "w2": 1, "w3": 1e-7, "w4": 1,
         "negative_weight": 10, "gamma": 1e-4, "lambda": 1.0},
        data.n_users, data.n_items,
        artifacts={"constraint": (bu, bi), "ii_neighbors": nb, "ii_sims": sims},
    )
    params = model.init_params(jax.random.key(0))
    batch = {
        "users": jnp.asarray(rng.integers(0, data.n_users, B), jnp.int32),
        "pos_items": jnp.asarray(rng.integers(0, data.n_items, B), jnp.int32),
        "neg_items": jnp.asarray(rng.integers(0, data.n_items, (B, 4)), jnp.int32),
    }
    loss, _ = jax.value_and_grad(model.loss)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_vaecf(data):
    rows = np.asarray(data.user_item_csr().todense(), dtype=np.float32)
    rows = (rows > 0).astype(np.float32)
    model = build_model(
        {"model": "VAECF", "emb_dim": 8, "z_dim": 4, "ae_structure": [16],
         "activation": "tanh", "likelihood": "mult", "beta": 1.0},
        data.n_users, data.n_items, artifacts={"user_rows": rows},
    )
    params = model.init_params(jax.random.key(0))
    batch = {"rows": jnp.asarray(rows[:B]), "users": jnp.arange(B)}
    loss, grads = jax.value_and_grad(model.loss)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    users = jnp.arange(4, dtype=jnp.int32)
    assert model.score_all(params, users).shape == (4, data.n_items)


def test_triple2vec(data):
    rng = np.random.default_rng(4)
    model = build_model(
        {"model": "Triple2vec", "emb_dim": 8, "n_neg": 3},
        data.n_users, data.n_items,
    )
    params = model.init_params(jax.random.key(0))
    batch = {
        "users": jnp.asarray(rng.integers(0, data.n_users, B), jnp.int32),
        "item1": jnp.asarray(rng.integers(0, data.n_items, B), jnp.int32),
        "item2": jnp.asarray(rng.integers(0, data.n_items, B), jnp.int32),
        "neg_users": jnp.asarray(rng.integers(0, data.n_users, (B, 3)), jnp.int32),
        "neg_item1": jnp.asarray(rng.integers(0, data.n_items, (B, 3)), jnp.int32),
        "neg_item2": jnp.asarray(rng.integers(0, data.n_items, (B, 3)), jnp.int32),
    }
    loss, _ = jax.value_and_grad(model.loss)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_pairwise_gmf(data):
    rng = np.random.default_rng(5)
    model = build_model(
        {"model": "PairwiseGMF", "emb_dim": 8, "regs": [1e-4]},
        data.n_users, data.n_items,
    )
    params = model.init_params(jax.random.key(0))
    _check(model, params, _pairwise_batch(rng, data.n_users, data.n_items))


@pytest.mark.parametrize("name", ["UserKNN", "ItemKNN"])
def test_knn(data, name):
    model = build_model(
        {"model": name, "neighbourhood_size": 5},
        data.n_users, data.n_items,
        artifacts={"interactions": data.user_item_csr()},
    )
    params = model.init_params(jax.random.key(0))
    users = jnp.arange(4, dtype=jnp.int32)
    scores = model.score_all(params, users)
    assert scores.shape == (4, data.n_items)
    # seen items are masked to -inf
    R = np.asarray(data.user_item_csr().todense()) > 0
    s = np.asarray(scores)
    assert np.all(s[R[:4]] < -1e29)


def test_grocery_triples(data):
    from beta_recsys_tpu.data.grocery_data import GroceryData
    from beta_recsys_tpu.utils.constants import DEFAULT_ORDER_COL

    rng = np.random.default_rng(0)
    df = data.train.copy()
    df[DEFAULT_ORDER_COL] = rng.integers(0, 10, len(df)) * 100 + df[DEFAULT_USER_COL]
    gd = GroceryData((df, [], []), intersect=False)
    triples = gd.sample_triples(500, seed=0)
    assert len(triples["users"]) == 500
    t2 = gd.sample_triples(300, time_step=3, seed=0)
    assert set(np.unique(t2["t"])) <= {0, 1, 2}
