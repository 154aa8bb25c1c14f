"""Forward/loss/grad tests for wave 3: SGL, MixGCF, LCFN, NARM, TiSASRec, CMN,
VBCAR, TVBR."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.data.sequential_data import SequentialData
from beta_recsys_tpu.models import build_model
from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)

B = 8


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            DEFAULT_USER_COL: rng.integers(0, 15, 250),
            DEFAULT_ITEM_COL: rng.integers(0, 20, 250),
            DEFAULT_RATING_COL: np.ones(250, np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(250),
        }
    )
    return BaseData((df, [], []), intersect=False)


@pytest.fixture(scope="module")
def seq_data():
    rng = np.random.default_rng(1)
    df = pd.DataFrame(
        {
            DEFAULT_USER_COL: np.repeat(np.arange(12), 8),
            DEFAULT_ITEM_COL: rng.integers(0, 15, 96),
            DEFAULT_RATING_COL: np.ones(96, np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(96),
        }
    )
    return SequentialData((df, [], []), intersect=False)


def _pairwise(rng, d):
    return {
        "users": jnp.asarray(rng.integers(0, d.n_users, B), jnp.int32),
        "pos_items": jnp.asarray(rng.integers(0, d.n_items, B), jnp.int32),
        "neg_items": jnp.asarray(rng.integers(0, d.n_items, B), jnp.int32),
    }


def _finite_loss(model, params, batch, key=1):
    loss, grads = jax.value_and_grad(model.loss)(params, batch, jax.random.key(key))
    assert np.isfinite(float(loss)), float(loss)
    return loss, grads


@pytest.mark.parametrize("ssl_mode", ["both_side", "merge"])
def test_sgl(data, ssl_mode):
    rng = np.random.default_rng(2)
    model = build_model(
        {"model": "SGL", "emb_dim": 8, "n_layers": 2, "regs": [1e-4],
         "ssl_reg": 0.1, "ssl_temp": 0.2, "ssl_mode": ssl_mode, "ssl_ratio": 0.1, "aug_type": 1},
        data.n_users, data.n_items, artifacts={"adj": data.get_norm_adj("sym")},
    )
    params = model.init_params(jax.random.key(0))
    _finite_loss(model, params, _pairwise(rng, data))
    u = jnp.arange(3, dtype=jnp.int32)
    cand = jnp.zeros((3, 5), jnp.int32)
    assert model.score_candidates(params, u, cand).shape == (3, 5)


def test_mixgcf(data):
    rng = np.random.default_rng(3)
    model = build_model(
        {"model": "MixGCF", "emb_dim": 8, "context_hops": 2, "pool": "mean",
         "l2": 1e-4, "n_negs": 4, "K": 2, "ns": "mixgcf",
         "edge_dropout_rate": 0.1, "mess_dropout_rate": 0.1},
        data.n_users, data.n_items, artifacts={"adj": data.get_norm_adj("sym")},
    )
    assert model.num_neg == 8
    params = model.init_params(jax.random.key(0))
    batch = {
        "users": jnp.asarray(rng.integers(0, data.n_users, B), jnp.int32),
        "pos_items": jnp.asarray(rng.integers(0, data.n_items, B), jnp.int32),
        "neg_items": jnp.asarray(rng.integers(0, data.n_items, (B, 8)), jnp.int32),
    }
    _finite_loss(model, params, batch)


def test_lcfn(data):
    rng = np.random.default_rng(4)
    P, Q = data.get_graph_embeddings(cut_off=0.2)
    assert P.shape[0] == data.n_users and Q.shape[0] == data.n_items
    model = build_model(
        {"model": "LCFN", "emb_dim": 8, "layer": 1, "lamda": 0.001},
        data.n_users, data.n_items, artifacts={"graph_embeddings": (P, Q)},
    )
    params = model.init_params(jax.random.key(0))
    _finite_loss(model, params, _pairwise(rng, data))


def test_narm(seq_data):
    maxlen = 6
    arrays = seq_data.prefix_target_arrays(maxlen)
    assert arrays["seq"].shape[1] == maxlen
    assert (arrays["target"] >= 1).all()
    model = build_model(
        {"model": "NARM", "emb_dim": 8, "hidden_size": 12, "embedding_dim": 8,
         "dropout_input": 0.1, "dropout_hidden": 0.1},
        seq_data.n_users, seq_data.n_items,
        artifacts={"ctx": seq_data.eval_context(maxlen)},
    )
    params = model.init_params(jax.random.key(0))
    batch = {
        "seq": jnp.asarray(arrays["seq"][:B]),
        "target": jnp.asarray(arrays["target"][:B]),
    }
    _finite_loss(model, params, batch)
    u = jnp.arange(4, dtype=jnp.int32)
    cand = jnp.zeros((4, 5), jnp.int32)
    assert model.score_candidates(params, u, cand).shape == (4, 5)


def test_tisasrec(seq_data):
    maxlen, time_span = 6, 16
    arrays = seq_data.tisasrec_arrays(maxlen, time_span)
    assert arrays["time_matrix"].shape == (len(arrays["users"]), maxlen, maxlen)
    assert arrays["time_matrix"].max() <= time_span
    ctx, ctx_time = seq_data.tisasrec_eval_context(maxlen, time_span)
    model = build_model(
        {"model": "TiSASRec", "emb_dim": 8, "maxlen": maxlen, "num_blocks": 1,
         "num_heads": 2, "dropout_rate": 0.0, "l2_emb": 0.0, "time_span": time_span},
        seq_data.n_users, seq_data.n_items,
        artifacts={"ctx": ctx, "ctx_time": ctx_time},
    )
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(5)
    batch = {
        "users": jnp.asarray(arrays["users"][:B]),
        "seq": jnp.asarray(arrays["seq"][:B]),
        "pos": jnp.asarray(arrays["pos"][:B]),
        "neg": jnp.asarray(rng.integers(1, seq_data.n_items + 1, (B, maxlen)), jnp.int32),
        "time_matrix": jnp.asarray(arrays["time_matrix"][:B]),
    }
    _finite_loss(model, params, batch)
    u = jnp.arange(4, dtype=jnp.int32)
    cand = jnp.zeros((4, 5), jnp.int32)
    assert model.score_candidates(params, u, cand).shape == (4, 5)


def test_cmn(data):
    from beta_recsys_tpu.models.cmn import build_item_neighborhoods

    rng = np.random.default_rng(6)
    nb, nb_len = build_item_neighborhoods(data.user_item_csr())
    assert nb.shape[0] == data.n_items
    model = build_model(
        {"model": "CMN", "emb_dim": 8, "hops": 2, "training_l2_lambda": 0.1},
        data.n_users, data.n_items,
        artifacts={"item_neighbors": nb, "item_nb_len": nb_len},
    )
    params = model.init_params(jax.random.key(0))
    _finite_loss(model, params, _pairwise(rng, data))
    u = jnp.arange(3, dtype=jnp.int32)
    cand = jnp.zeros((3, 4), jnp.int32)
    assert model.score_candidates(params, u, cand).shape == (3, 4)


@pytest.mark.parametrize("name", ["VBCAR", "TVBR"])
def test_vbcar_tvbr(data, name):
    rng = np.random.default_rng(7)
    user_fea = rng.normal(size=(data.n_users, 12)).astype(np.float32)
    item_fea = rng.normal(size=(data.n_items, 12)).astype(np.float32)
    cfg = {"model": name, "emb_dim": 8, "late_dim": 16, "n_neg": 3, "alpha": 0.05,
           "activator": "tanh", "time_step": 3}
    model = build_model(cfg, data.n_users, data.n_items,
                        artifacts={"user_fea": user_fea, "item_fea": item_fea})
    params = model.init_params(jax.random.key(0))
    batch = {
        "users": jnp.asarray(rng.integers(0, data.n_users, B), jnp.int32),
        "item1": jnp.asarray(rng.integers(0, data.n_items, B), jnp.int32),
        "item2": jnp.asarray(rng.integers(0, data.n_items, B), jnp.int32),
        "neg_users": jnp.asarray(rng.integers(0, data.n_users, (B, 3)), jnp.int32),
        "neg_item1": jnp.asarray(rng.integers(0, data.n_items, (B, 3)), jnp.int32),
        "neg_item2": jnp.asarray(rng.integers(0, data.n_items, (B, 3)), jnp.int32),
    }
    if name == "TVBR":
        batch["t"] = jnp.asarray(rng.integers(0, 4, B), jnp.int32)
    _finite_loss(model, params, batch)
    u_emb, i_emb = model.user_item_embeddings(params)
    assert u_emb.shape[0] == data.n_users and i_emb.shape[0] == data.n_items
