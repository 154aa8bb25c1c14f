"""Per-model forward/loss shape + learning tests (what the reference lacks,
SURVEY §4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.data.sequential_data import SequentialData
from beta_recsys_tpu.datasets.data_split import feed_neg_sample, leave_one_out
from beta_recsys_tpu.models import MODEL_REGISTRY, build_model
from beta_recsys_tpu.utils.alias_table import AliasTable
from beta_recsys_tpu.utils.constants import (
    DEFAULT_FLAG_COL,
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)

N_USERS, N_ITEMS, B = 20, 30, 8


def _pairwise_batch(rng):
    return {
        "users": jnp.asarray(rng.integers(0, N_USERS, B), jnp.int32),
        "pos_items": jnp.asarray(rng.integers(0, N_ITEMS, B), jnp.int32),
        "neg_items": jnp.asarray(rng.integers(0, N_ITEMS, B), jnp.int32),
    }


def _pointwise_batch(rng):
    return {
        "users": jnp.asarray(rng.integers(0, N_USERS, B), jnp.int32),
        "items": jnp.asarray(rng.integers(0, N_ITEMS, B), jnp.int32),
        "labels": jnp.asarray(rng.random(B) < 0.5, jnp.float32),
    }


def _graph_artifacts():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            DEFAULT_USER_COL: rng.integers(0, N_USERS, 200),
            DEFAULT_ITEM_COL: rng.integers(0, N_ITEMS, 200),
            DEFAULT_RATING_COL: np.ones(200, np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(200),
        }
    )
    data = BaseData((df, [], []), intersect=False)
    return data, {"adj": data.get_norm_adj("sym")}, {"adj": data.get_norm_adj("row")}


CONFIGS = {
    "MF": ({"model": "MF", "emb_dim": 8, "loss": "bpr"}, "pairwise", None),
    "GMF": ({"model": "GMF", "emb_dim": 8}, "pointwise", None),
    "MLP": ({"model": "MLP", "emb_dim": 8, "mlp_config": {"n_layers": 2}}, "pointwise", None),
    "NCF": ({"model": "NCF", "emb_dim": 8, "mlp_config": {"n_layers": 2}}, "pointwise", None),
}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_model_forward_and_grad(name):
    cfg, kind, _ = CONFIGS[name]
    rng = np.random.default_rng(0)
    # Graph models need real interaction stats; replace counts with data dims.
    model = build_model(cfg, N_USERS, N_ITEMS)
    params = model.init_params(jax.random.key(0))
    batch = _pairwise_batch(rng) if kind == "pairwise" else _pointwise_batch(rng)
    loss, grads = jax.value_and_grad(model.loss)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # candidate scoring shape
    users = jnp.arange(5, dtype=jnp.int32)
    cand = jnp.asarray(rng.integers(0, N_ITEMS, (5, 7)), jnp.int32)
    scores = model.score_candidates(params, users, cand)
    assert scores.shape == (5, 7)


@pytest.mark.parametrize("variant", ["lightgcn", "ngcf"])
def test_graph_models(variant):
    data, sym_art, row_art = _graph_artifacts()
    rng = np.random.default_rng(1)
    if variant == "lightgcn":
        cfg = {"model": "LightGCN", "emb_dim": 8, "layer_size": [8, 8], "regs": [1e-4], "keep_pro": 0.9}
        model = build_model(cfg, data.n_users, data.n_items, artifacts=sym_art)
    else:
        cfg = {"model": "NGCF", "emb_dim": 8, "layer_size": [8, 8], "regs": [1e-4], "mess_dropout": [0.1, 0.1]}
        model = build_model(cfg, data.n_users, data.n_items, artifacts=row_art)
    params = model.init_params(jax.random.key(0))
    batch = {
        "users": jnp.asarray(rng.integers(0, data.n_users, B), jnp.int32),
        "pos_items": jnp.asarray(rng.integers(0, data.n_items, B), jnp.int32),
        "neg_items": jnp.asarray(rng.integers(0, data.n_items, B), jnp.int32),
    }
    loss, grads = jax.value_and_grad(model.loss)(params, batch, jax.random.key(2))
    assert np.isfinite(float(loss))
    users = jnp.arange(4, dtype=jnp.int32)
    cand = jnp.asarray(rng.integers(0, data.n_items, (4, 6)), jnp.int32)
    assert model.score_candidates(params, users, cand).shape == (4, 6)
    assert model.score_all(params, users).shape == (4, data.n_items)


def _seq_dataset(n_users=30, n_items=25, seq_len=10):
    """Each user cycles deterministically through items: next = cur + 1 mod n."""
    rows = []
    t = 0
    for u in range(n_users):
        start = u % n_items
        for j in range(seq_len):
            rows.append((u, (start + j) % n_items, 1.0, t))
            t += 1
    df = pd.DataFrame(rows, columns=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL])
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    test = flagged[flagged[DEFAULT_FLAG_COL] == "test"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    valid_neg = feed_neg_sample(valid, 10, sampler)
    test_neg = feed_neg_sample(test, 10, sampler)
    return SequentialData((train, [valid_neg], [test_neg]))


def test_sasrec_learns_next_item():
    from beta_recsys_tpu.config import Config
    from beta_recsys_tpu.core.train_engine import TrainEngine

    data = _seq_dataset()
    maxlen = 12
    cfg = Config(
        {
            "system": {"root_dir": "/tmp/sasrec_test", "metrics": ["ndcg", "recall"], "k": [5, 10], "valid_metric": "ndcg", "valid_k": 10, "seed": 3},
            "dataset": {"dataset": "seq_synth"},
            "model": {
                "model": "SASRec",
                "emb_dim": 32,
                "maxlen": maxlen,
                "num_blocks": 1,
                "num_heads": 1,
                "dropout_rate": 0.0,
                "l2_emb": 0.0,
                "batch_size": 16,
                "lr": 0.01,
                "optimizer": "adam",
                "max_epoch": 60,
                "max_n_update": 60,
            },
        }
    )
    model = build_model(
        cfg.model, data.n_users, data.n_items,
        artifacts={"ctx": data.eval_context(maxlen)},
    )
    engine = TrainEngine(cfg)
    valid_cand = data.eval_candidates(data.valid[0])
    engine.build(model, data, valid_cand, None)
    result = engine.train(verbose=False)
    # Deterministic successor structure: the model must beat random (~0.25)
    # decisively on 11-candidate ranking.
    assert result["valid_metric"] > 0.5, result

    # test-time context includes validation items
    test_model = model.with_context(data.eval_context(maxlen, extra_df=data.valid[0]))
    from beta_recsys_tpu.core.eval_engine import RankingEvaluator

    test_cand = data.eval_candidates(data.test[0])
    res = RankingEvaluator(test_model, test_cand, ("ndcg",), (10,)).evaluate(engine.params)
    assert res["ndcg@10"] > 0.5, res
