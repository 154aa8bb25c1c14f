"""User-facing API tests: Recommender wrappers, tune sweep, Experiment matrix."""

import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.config import Config
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.datasets.data_split import feed_neg_sample, leave_one_out
from beta_recsys_tpu.recommenders import LightGCN, MatrixFactorization
from beta_recsys_tpu.utils.alias_table import AliasTable
from beta_recsys_tpu.utils.constants import (
    DEFAULT_FLAG_COL,
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)
from tests.test_train_mf import make_structured_interactions


@pytest.fixture(scope="module")
def data():
    df = make_structured_interactions()
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    test = flagged[flagged[DEFAULT_FLAG_COL] == "test"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    return BaseData(
        (train, [feed_neg_sample(valid, 20, sampler)], [feed_neg_sample(test, 20, sampler)])
    )


def _cfg(tmp_path, **model_overrides):
    model = {
        "model": "MF",
        "emb_dim": 16,
        "batch_size": 128,
        "loss": "bpr",
        "optimizer": "adam",
        "lr": 0.05,
        "max_epoch": 15,
        "max_n_update": 5,
    }
    model.update(model_overrides)
    return Config(
        {
            "system": {
                "root_dir": str(tmp_path),
                "metrics": ["ndcg", "recall"],
                "k": [10],
                "valid_metric": "ndcg",
                "valid_k": 10,
                "seed": 1,
                "result_file": "res.csv",
            },
            "dataset": {"dataset": "synthetic", "data_split": "leave_one_out"},
            "model": model,
            "tunable": [{"name": "lr", "type": "choice", "values": [0.1, 0.01]}],
        }
    )


def test_mf_wrapper_train_test_predict_load(tmp_path, data):
    rec = MatrixFactorization(_cfg(tmp_path))
    result = rec.train(data)
    assert result["valid_metric"] > 0.3
    row = rec.test()
    assert "ndcg@10" in row
    pairs = data.test[0].head(10)
    scores = rec.predict(pairs)
    assert scores.shape == (10,) and np.all(np.isfinite(scores))
    rec.load(result["model_save_dir"])


def test_lightgcn_wrapper(tmp_path, data):
    rec = LightGCN(
        _cfg(tmp_path, model="LightGCN", layer_size=[16, 16], regs=[1e-4], keep_pro=0.9, max_epoch=10)
    )
    result = rec.train(data)
    assert result["valid_metric"] > 0.3, result


def test_tune_grid(tmp_path, data):
    cfg = _cfg(tmp_path, max_epoch=4, tune=True)
    rec = MatrixFactorization(cfg)
    result = rec.train(data)
    assert "tune_result" in result
    table = result["tune_result"]
    assert len(table) == 2 and set(table["lr"]) == {0.1, 0.01}
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "tune_results/", "tune_result.csv"))


def test_experiment_matrix(tmp_path, data):
    from beta_recsys_tpu.experiment import Experiment

    models = [
        MatrixFactorization(_cfg(tmp_path, max_epoch=3)),
        MatrixFactorization(_cfg(tmp_path, max_epoch=3, loss="bce")),
    ]
    exp = Experiment([data], models, metrics=["ndcg", "recall"], eval_scopes=[5, 10])
    results = exp.run()
    assert len(results) == 2
    assert "ndcg@10" in results.columns


def test_recommend_topk(tmp_path, data):
    """recommend() returns k ranked items per user, train items excluded."""
    rec = MatrixFactorization(_cfg(tmp_path, max_epoch=5))
    rec.train(data)
    recs = rec.recommend(k=5)
    assert set(recs.columns) >= {"col_user", "col_item", "col_prediction", "rank"}
    assert len(recs) == data.n_users * 5
    # per-user: ranks are 1..5 and scores are non-increasing
    for u, grp in recs.groupby("col_user"):
        assert list(grp["rank"]) == [1, 2, 3, 4, 5]
        s = grp["col_prediction"].to_numpy()
        assert np.all(s[:-1] >= s[1:] - 1e-6)
    # no train items leak into recommendations
    csr = data.user_item_csr()
    for u, grp in recs.groupby("col_user"):
        train_items = set(csr[u].indices)
        assert not (set(grp["col_item"]) & train_items)


def test_serving_uses_best_checkpoint_and_consistent_scale(tmp_path, data):
    """ADVICE r1: predict()/recommend() serve the best checkpoint regardless
    of call order, and recommend() scores are on predict()'s scale (MF:
    sigmoid of bias-augmented logits, global bias included)."""
    rec = MatrixFactorization(_cfg(tmp_path, max_epoch=8))
    rec.train(data)

    # recommend() without calling test() first
    recs = rec.recommend(k=5)
    pairs = pd.DataFrame(
        {
            DEFAULT_USER_COL: recs["col_user"].to_numpy(),
            DEFAULT_ITEM_COL: recs["col_item"].to_numpy(),
        }
    )
    scores = rec.predict(pairs)
    np.testing.assert_allclose(recs["col_prediction"].to_numpy(), scores, rtol=1e-5, atol=1e-6)
    # MF scores are sigmoid outputs: bounded in (0, 1)
    assert recs["col_prediction"].between(0.0, 1.0).all()

    # call-order independence: test() then recommend() gives identical output
    rec.test()
    recs2 = rec.recommend(k=5)
    np.testing.assert_allclose(
        recs["col_prediction"].to_numpy(), recs2["col_prediction"].to_numpy(), rtol=1e-6
    )
    pd.testing.assert_frame_equal(
        recs[["col_user", "col_item"]], recs2[["col_user", "col_item"]]
    )

    # use_best=False serves live final-epoch params instead
    import jax.numpy as jnp

    live = rec.model.score_pairs(
        rec.engine.params,
        jnp.asarray(pairs[DEFAULT_USER_COL].to_numpy(np.int32)),
        jnp.asarray(pairs[DEFAULT_ITEM_COL].to_numpy(np.int32)),
    )
    np.testing.assert_allclose(rec.predict(pairs, use_best=False), np.asarray(live), rtol=1e-6)


def test_cold_start_load_and_serve(tmp_path, data):
    """A FRESH recommender (no train()) loads a checkpoint dir and serves:
    the production path the reference lacks (its load needs a live engine)."""
    rec = MatrixFactorization(_cfg(tmp_path, max_epoch=6))
    result = rec.train(data)
    save_dir = result["model_save_dir"]
    pairs = data.test[0].head(10)
    want = rec.predict(pairs)
    recs_want = rec.recommend(k=5, exclude_train=False)

    cold = MatrixFactorization(_cfg(tmp_path, max_epoch=6))
    cold.load(save_dir)  # no data, no train
    np.testing.assert_allclose(cold.predict(pairs), want, rtol=1e-6)
    recs_cold = cold.recommend(k=5, exclude_train=False)
    np.testing.assert_allclose(
        recs_cold["col_prediction"].to_numpy(),
        recs_want["col_prediction"].to_numpy(),
        rtol=1e-6,
    )
    # exclude_train without data raises a clear error
    with pytest.raises(ValueError, match="exclude_train"):
        cold.recommend(k=5)
    # with data supplied, train-item exclusion works cold too
    cold2 = MatrixFactorization(_cfg(tmp_path, max_epoch=6))
    cold2.load(save_dir, data=data)
    assert len(cold2.recommend(k=5)) == data.n_users * 5


def test_export_embeddings(tmp_path, data):
    rec = MatrixFactorization(_cfg(tmp_path, max_epoch=4))
    rec.train(data)
    path = rec.export_embeddings(str(tmp_path / "emb.npz"))
    arrs = np.load(path)
    u, i = arrs["user_emb"], arrs["item_emb"]
    assert u.shape[0] == data.n_users and i.shape[0] == data.n_items
    # exported tables reproduce recommend()'s ranking (bias-augmented form)
    recs = rec.recommend(k=3, exclude_train=False)
    scores = u @ i.T
    top3 = np.argsort(-scores, axis=1)[:, :3]
    got = recs["col_item"].to_numpy().reshape(data.n_users, 3)
    np.testing.assert_array_equal(got, top3)
