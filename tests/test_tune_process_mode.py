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
    # per-worker device placement (VERDICT r3 #8): the 8-device virtual CPU
    # mesh partitions 4 per worker; each live worker holds a unique partition
    # index — disjoint device pools by construction (separate interpreters,
    # each with its own 4-device world). A fast first worker may run both
    # trials before the second spawns, so assert subset, not equality.
    assert set(table["worker_partition_index"]) <= {0, 1}
    assert (table["worker_n_devices"] == 4).all(), table["worker_n_devices"]
    assert table["worker_pid"].nunique() == table["worker_partition_index"].nunique()
    assert (table["worker_platform"] == "cpu").all()


def test_tune_single_chip_tpu_serializes(tmp_path, data, monkeypatch):  # noqa: F811
    """processes>0 on a non-CPU backend without worker_env must fall back to
    sequential trials (libtpu is single-client) — with a warning, not a
    device fight."""
    import importlib

    tune_mod = importlib.import_module("beta_recsys_tpu.experiment.tune")
    monkeypatch.setattr(tune_mod, "_worker_placements", lambda *a: None)
    cfg = Config(
        {
            "system": {"root_dir": str(tmp_path), "metrics": ["ndcg"], "k": [10],
                       "valid_metric": "ndcg", "valid_k": 10, "seed": 2},
            "dataset": {"dataset": "synthetic"},
            "model": {"model": "MF", "emb_dim": 8, "batch_size": 128, "loss": "bpr",
                      "optimizer": "adam", "lr": 0.05, "max_epoch": 1, "max_n_update": 1},
            "tunable": [{"name": "lr", "type": "choice", "values": [0.1, 0.01]}],
        }
    )
    result = tune_mod.tune(MatrixFactorization, cfg, data, processes=2)
    table = result["tune_result"]
    # sequential fallback ran in THIS process: no worker columns
    assert len(table) == 2 and "worker_pid" not in table.columns
