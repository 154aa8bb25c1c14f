"""Every user-facing wrapper trains end-to-end for a couple of epochs.

Exercises each wrapper's build_artifacts + data_class wiring (the reference
has no such coverage at all)."""

import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu import recommenders as rec
from beta_recsys_tpu.config import Config
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.data.grocery_data import GroceryData
from beta_recsys_tpu.data.sequential_data import SequentialData
from beta_recsys_tpu.datasets.data_split import feed_neg_sample, leave_one_out
from beta_recsys_tpu.utils.alias_table import AliasTable
from beta_recsys_tpu.utils.constants import (
    DEFAULT_FLAG_COL,
    DEFAULT_ITEM_COL,
    DEFAULT_ORDER_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


def _split_frames():
    rng = np.random.default_rng(0)
    n = 600
    df = pd.DataFrame(
        {
            DEFAULT_USER_COL: rng.integers(0, 30, n),
            DEFAULT_ITEM_COL: rng.integers(0, 25, n),
            DEFAULT_RATING_COL: np.ones(n, np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(n),
            DEFAULT_ORDER_COL: rng.integers(0, 8, n) * 100 + rng.integers(0, 30, n),
        }
    )
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    test = flagged[flagged[DEFAULT_FLAG_COL] == "test"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    return train, [feed_neg_sample(valid, 8, sampler)], [feed_neg_sample(test, 8, sampler)]


@pytest.fixture(scope="module")
def frames():
    return _split_frames()


def _cfg(tmp, model_overrides):
    model = {"emb_dim": 8, "batch_size": 64, "optimizer": "adam", "lr": 0.01,
             "max_epoch": 2, "max_n_update": 2}
    model.update(model_overrides)
    return Config(
        {
            "system": {"root_dir": str(tmp), "metrics": ["ndcg"], "k": [5],
                       "valid_metric": "ndcg", "valid_k": 5, "seed": 1},
            "dataset": {"dataset": "synthetic", "data_split": "leave_one_out"},
            "model": model,
        }
    )


WRAPPER_CASES = [
    (rec.MatrixFactorization, BaseData, {"model": "MF", "loss": "bpr"}),
    (rec.GMFRecommender, BaseData, {"model": "GMF", "num_negative": 2}),
    (rec.MLPRecommender, BaseData, {"model": "MLP", "mlp_config": {"n_layers": 2}, "num_negative": 2}),
    (rec.NeuCF, BaseData, {"model": "NCF", "mlp_config": {"n_layers": 2}, "num_negative": 2}),
    (rec.LightGCN, BaseData, {"model": "LightGCN", "layer_size": [8, 8], "regs": [1e-4], "keep_pro": 1.0}),
    (rec.NGCF, BaseData, {"model": "NGCF", "layer_size": [8, 8], "mess_dropout": [0.0, 0.0], "regs": [1e-4]}),
    (rec.SimGCL, BaseData, {"model": "SimGCL", "n_layer": 2, "eps": 0.1, "reg": 1e-4, "lambda": 0.01}),
    (rec.BUIR, BaseData, {"model": "BUIR", "momentum": 0.9, "n_layers": 2}),
    (rec.SGL, BaseData, {"model": "SGL", "n_layers": 2, "regs": [1e-5], "ssl_reg": 0.01,
                         "ssl_temp": 0.2, "ssl_mode": "both_side", "ssl_ratio": 0.1, "aug_type": 1}),
    (rec.MixGCF, BaseData, {"model": "MixGCF", "context_hops": 2, "pool": "mean", "l2": 1e-4,
                            "n_negs": 2, "K": 1, "ns": "mixgcf",
                            "edge_dropout_rate": 0.0, "mess_dropout_rate": 0.0}),
    (rec.LCFN, BaseData, {"model": "LCFN", "layer": 1, "lamda": 1e-3, "cut_off": 0.2}),
    (rec.UltraGCN, BaseData, {"model": "UltraGCN", "w1": 1e-7, "w2": 1, "w3": 1e-7, "w4": 1,
                              "negative_weight": 5, "gamma": 1e-4, "lambda": 0.5,
                              "num_negative": 4, "ii_neighbor_num": 4}),
    (rec.VAECF, BaseData, {"model": "VAECF", "z_dim": 4, "ae_structure": [8],
                           "activation": "tanh", "likelihood": "mult", "beta": 0.5}),
    (rec.UserKNNRecommender, BaseData, {"model": "UserKNN", "neighbourhood_size": 5}),
    (rec.ItemKNNRecommender, BaseData, {"model": "ItemKNN", "neighbourhood_size": 5}),
    (rec.SASRec, SequentialData, {"model": "SASRec", "maxlen": 8, "num_blocks": 1,
                                  "num_heads": 1, "dropout_rate": 0.0, "l2_emb": 0.0}),
    (rec.TiSASRec, SequentialData, {"model": "TiSASRec", "maxlen": 8, "num_blocks": 1,
                                    "num_heads": 1, "dropout_rate": 0.0, "l2_emb": 0.0,
                                    "time_span": 8}),
    (rec.NARM, SequentialData, {"model": "NARM", "maxlen": 8, "hidden_size": 8,
                                "embedding_dim": 8, "dropout_input": 0.0, "dropout_hidden": 0.0}),
    (rec.Triple2vec, GroceryData, {"model": "Triple2vec", "n_neg": 2, "n_sample": 2000}),
    (rec.VBCAR, GroceryData, {"model": "VBCAR", "late_dim": 8, "n_neg": 2, "n_sample": 2000,
                              "alpha": 0.05, "activator": "tanh"}),
    (rec.TVBR, GroceryData, {"model": "TVBR", "late_dim": 8, "n_neg": 2, "n_sample": 2000,
                             "alpha": 0.05, "time_step": 2, "activator": "tanh"}),
    (rec.CMN, BaseData, {"model": "CMN", "hops": 2, "training_l2_lambda": 0.01}),
    (rec.PairwiseGMFRecommender, BaseData, {"model": "PairwiseGMF", "regs": [1e-4]}),
]


@pytest.mark.parametrize("wrapper_cls,data_cls,overrides", WRAPPER_CASES,
                         ids=[o["model"] for _, _, o in WRAPPER_CASES])
def test_wrapper_end_to_end(tmp_path, frames, wrapper_cls, data_cls, overrides):
    data = data_cls(tuple(f.copy() if hasattr(f, "copy") else [x.copy() for x in f] for f in frames))
    wrapper = wrapper_cls(_cfg(tmp_path, overrides))
    result = wrapper.train(data)
    assert np.isfinite(result["valid_metric"]), result
    row = wrapper.test()
    assert "ndcg@5" in row and np.isfinite(row["ndcg@5"])
