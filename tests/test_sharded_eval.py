"""Mesh-sharded evaluation must reproduce single-device results exactly.

Runs on the virtual 8-CPU-device mesh (tests/conftest.py) — the TPU answer to
multi-chip eval testing without a pod (SURVEY §4).
"""

import jax
import numpy as np
import pytest

from beta_recsys_tpu.core.eval_engine import FullCatalogEvaluator, RankingEvaluator
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.datasets.data_split import feed_neg_sample, leave_one_out
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.parallel.mesh import make_mesh
from beta_recsys_tpu.utils.alias_table import AliasTable
from beta_recsys_tpu.utils.constants import DEFAULT_FLAG_COL, DEFAULT_ITEM_COL
from tests.test_train_mf import make_structured_interactions


@pytest.fixture(scope="module")
def setup():
    # 61 eval users: NOT divisible by the 8-device data axis, so the padding +
    # rescale path is exercised.
    df = make_structured_interactions(n_users=61, n_items=40, per_user=8)
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    data = BaseData((train, [feed_neg_sample(valid, 20, sampler)], []))
    cfg = {"model": "MF", "emb_dim": 16, "loss": "bpr", "optimizer": "adam",
           "lr": 0.05, "reg": 0.0, "batch_size": 128}
    model = MF(cfg, data.n_users, data.n_items)
    params = model.init_params(jax.random.key(0))
    return data, model, params


def test_ranking_evaluator_sharded_matches_single(setup):
    data, model, params = setup
    cand = data.eval_candidates(data.valid[0])
    base = RankingEvaluator(model, cand).evaluate(params)
    mesh = make_mesh(n_data=8, n_model=1)
    sharded = RankingEvaluator(model, cand, mesh=mesh).evaluate(params)
    assert base.keys() == sharded.keys()
    for k in base:
        assert sharded[k] == pytest.approx(base[k], rel=1e-5), k


def test_full_catalog_evaluator_sharded_matches_single(setup):
    import scipy.sparse as sp

    data, model, params = setup
    rng = np.random.default_rng(0)
    rel = sp.csr_matrix(
        (np.ones(data.n_users),
         (np.arange(data.n_users), rng.integers(0, data.n_items, data.n_users))),
        shape=(data.n_users, data.n_items),
    )
    users = np.arange(data.n_users)
    train_csr = data.user_item_csr()
    base = FullCatalogEvaluator(model, users, rel, train_csr, user_block=16).evaluate(params)
    mesh = make_mesh(n_data=4, n_model=2)
    sharded = FullCatalogEvaluator(
        model, users, rel, train_csr, user_block=16, mesh=mesh
    ).evaluate(params)
    for k in base:
        assert sharded[k] == pytest.approx(base[k], rel=1e-5), k


def test_engine_wires_mesh_into_evaluators(setup, tmp_path):
    from beta_recsys_tpu.config import Config
    from beta_recsys_tpu.core.train_engine import TrainEngine

    data, model, params = setup
    cfg = Config(
        {
            "system": {"root_dir": str(tmp_path), "metrics": ["ndcg"], "k": [10],
                       "valid_metric": "ndcg", "valid_k": 10, "seed": 3,
                       "mesh": {"data": 8, "model": 1}},
            "dataset": {"dataset": "synthetic"},
            "model": {"model": "MF", "loss": "bpr", "emb_dim": 16,
                      "batch_size": 128, "optimizer": "adam", "lr": 0.05,
                      "max_epoch": 3, "max_n_update": 3},
        }
    )
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    assert engine.valid_evaluator.mesh is engine.mesh
    result = engine.train(verbose=False)
    assert np.isfinite(result["valid_metric"])
