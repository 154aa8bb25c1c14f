"""Learning tests for the graph/contrastive family: SimGCL, BUIR, MixGCF, SGL,
NGCF, UltraGCN on structured data."""

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

THRESHOLD = 0.30  # random ~0.20 over 21 candidates


@pytest.fixture(scope="module")
def data():
    df = make_structured_interactions(n_users=60, n_items=40, per_user=8)
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    return BaseData((train, [feed_neg_sample(valid, 20, sampler)], []))


def _train(data, model_overrides, artifacts, tmp="/tmp/graph_learning"):
    model_cfg = {"emb_dim": 16, "batch_size": 128, "optimizer": "adam",
                 "lr": 0.02, "max_epoch": 40, "max_n_update": 40}
    model_cfg.update(model_overrides)
    cfg = Config(
        {
            "system": {"root_dir": tmp, "metrics": ["ndcg"], "k": [10],
                       "valid_metric": "ndcg", "valid_k": 10, "seed": 21},
            "dataset": {"dataset": "synthetic"},
            "model": model_cfg,
        }
    )
    model = build_model(cfg.model, data.n_users, data.n_items, artifacts=artifacts)
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    return engine.train(verbose=False)


def test_ngcf_learns(data):
    result = _train(
        data,
        {"model": "NGCF", "layer_size": [16, 16], "mess_dropout": [0.0, 0.0], "regs": [1e-5]},
        {"adj": data.get_norm_adj("row")},
    )
    assert result["valid_metric"] > THRESHOLD, result


def test_simgcl_learns(data):
    # contrastive weight scaled down for the tiny dataset (summed InfoNCE over
    # a 128-batch dominates the BPR term otherwise)
    result = _train(
        data,
        {"model": "SimGCL", "n_layer": 2, "eps": 0.1, "reg": 1e-4, "lambda": 0.005,
         "lr": 0.001, "max_epoch": 60, "max_n_update": 60},
        {"adj": data.get_norm_adj("sym")},
    )
    assert result["valid_metric"] > THRESHOLD, result


def test_buir_learns(data):
    result = _train(
        data,
        {"model": "BUIR", "momentum": 0.99, "n_layers": 2, "lr": 0.01},
        {"adj": data.get_norm_adj("sym")},
    )
    assert result["valid_metric"] > THRESHOLD, result


def test_mixgcf_learns(data):
    result = _train(
        data,
        {"model": "MixGCF", "context_hops": 2, "pool": "mean", "l2": 1e-4,
         "n_negs": 4, "K": 1, "ns": "mixgcf",
         "edge_dropout_rate": 0.0, "mess_dropout_rate": 0.0, "lr": 0.01},
        {"adj": data.get_norm_adj("sym")},
    )
    assert result["valid_metric"] > THRESHOLD, result


def test_sgl_learns(data):
    result = _train(
        data,
        {"model": "SGL", "n_layers": 2, "regs": [1e-5], "ssl_reg": 0.02,
         "ssl_temp": 0.2, "ssl_mode": "both_side", "ssl_ratio": 0.1,
         "aug_type": 1, "lr": 0.01},
        {"adj": data.get_norm_adj("sym")},
    )
    assert result["valid_metric"] > THRESHOLD, result


def test_ultragcn_learns(data):
    from beta_recsys_tpu.ops.ultragcn_prep import get_ii_constraint_mat

    train_mat, bu, bi = data.create_constraint_mat()
    nb, sims = get_ii_constraint_mat(train_mat, 5)
    result = _train(
        data,
        {"model": "UltraGCN", "w1": 1e-7, "w2": 1, "w3": 1e-7, "w4": 1,
         "negative_weight": 10, "gamma": 1e-4, "lambda": 0.5,
         "num_negative": 8, "lr": 0.01},
        {"constraint": (bu, bi), "ii_neighbors": nb, "ii_sims": sims},
    )
    assert result["valid_metric"] > THRESHOLD, result
