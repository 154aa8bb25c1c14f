"""Process-per-trial tuning: each trial runs in a fresh interpreter."""

import os

import pytest

from beta_recsys_tpu.config import Config
from beta_recsys_tpu.experiment.tune import tune
from beta_recsys_tpu.recommenders import MatrixFactorization
from tests.test_recommender_api import data  # noqa: F401 (fixture)


def test_tune_with_processes(tmp_path, data, monkeypatch):  # noqa: F811
    # child interpreters must not grab the TPU backend (slow remote compile)
    monkeypatch.setenv("BETA_RECSYS_FORCE_CPU", "1")
    cfg = Config(
        {
            "system": {"root_dir": str(tmp_path), "metrics": ["ndcg"], "k": [10],
                       "valid_metric": "ndcg", "valid_k": 10, "seed": 2},
            "dataset": {"dataset": "synthetic"},
            "model": {"model": "MF", "emb_dim": 8, "batch_size": 128, "loss": "bpr",
                      "optimizer": "adam", "lr": 0.05, "max_epoch": 2, "max_n_update": 2},
            "tunable": [{"name": "lr", "type": "choice", "values": [0.1, 0.01]}],
        }
    )
    result = tune(MatrixFactorization, cfg, data, processes=2)
    table = result["tune_result"]
    assert len(table) == 2 and set(table["lr"]) == {0.1, 0.01}
    assert os.path.exists(os.path.join(str(tmp_path), "tune_results/", "tune_result.csv"))
