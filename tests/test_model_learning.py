"""Learning tests: each model family must beat random ranking decisively on
structured synthetic data (what the reference's test suite lacks entirely,
SURVEY §4)."""

import numpy as np
import pytest

from beta_recsys_tpu.config import Config
from beta_recsys_tpu.core.train_engine import TrainEngine
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.datasets.data_split import feed_neg_sample, leave_one_out
from beta_recsys_tpu.models import build_model
from beta_recsys_tpu.utils.alias_table import AliasTable
from beta_recsys_tpu.utils.constants import DEFAULT_FLAG_COL, DEFAULT_ITEM_COL
from tests.test_train_mf import make_structured_interactions

# Random ranking over 21 candidates ~= 0.20 ndcg@10; learned must beat this.
THRESHOLD = 0.32


@pytest.fixture(scope="module")
def data():
    df = make_structured_interactions(n_users=60, n_items=40, per_user=8)
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    return BaseData((train, [feed_neg_sample(valid, 20, sampler)], []))


def _train(data, model_overrides, artifacts=None, tmp="/tmp/learning_tests"):
    model_cfg = {
        "emb_dim": 16,
        "batch_size": 128,
        "optimizer": "adam",
        "lr": 0.05,
        "max_epoch": 30,
        "max_n_update": 30,
    }
    model_cfg.update(model_overrides)
    cfg = Config(
        {
            "system": {"root_dir": tmp, "metrics": ["ndcg"], "k": [10],
                       "valid_metric": "ndcg", "valid_k": 10, "seed": 11},
            "dataset": {"dataset": "synthetic"},
            "model": model_cfg,
        }
    )
    model = build_model(cfg.model, data.n_users, data.n_items, artifacts=artifacts)
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    return engine.train(verbose=False)


def test_gmf_learns(data):
    result = _train(data, {"model": "GMF", "num_negative": 4, "lr": 0.01})
    assert result["valid_metric"] > THRESHOLD, result


def test_ncf_learns(data):
    result = _train(
        data, {"model": "NCF", "emb_dim": 8, "mlp_config": {"n_layers": 2},
               "num_negative": 4, "lr": 0.01}
    )
    assert result["valid_metric"] > THRESHOLD, result


def test_lightgcn_learns(data):
    result = _train(
        data,
        {"model": "LightGCN", "layer_size": [16, 16], "regs": [1e-4], "keep_pro": 1.0},
        artifacts={"adj": data.get_norm_adj("sym")},
    )
    assert result["valid_metric"] > THRESHOLD, result


def test_mf_sparse_optim_via_engine(data):
    """Engine-level sparse_optim flag trains to quality parity."""
    result = _train(data, {"model": "MF", "loss": "bpr", "sparse_optim": True})
    assert result["valid_metric"] > THRESHOLD, result


def test_vaecf_learns(data):
    rows = np.asarray(data.user_item_csr().todense(), dtype=np.float32)
    rows = (rows > 0).astype(np.float32)
    result = _train(
        data,
        {"model": "VAECF", "z_dim": 8, "ae_structure": [32], "activation": "tanh",
         "likelihood": "mult", "beta": 0.2, "lr": 0.005, "max_epoch": 60, "max_n_update": 60},
        artifacts={"user_rows": rows},
    )
    assert result["valid_metric"] > THRESHOLD, result
