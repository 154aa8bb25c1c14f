"""Learning tests for NARM and TiSASRec on deterministic successor data."""

import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.config import Config
from beta_recsys_tpu.core.eval_engine import RankingEvaluator
from beta_recsys_tpu.core.train_engine import TrainEngine
from beta_recsys_tpu.models import build_model
from tests.test_models import _seq_dataset


@pytest.fixture(scope="module")
def data():
    return _seq_dataset(n_users=40, n_items=20, seq_len=12)


def _sys(tmp):
    return {"root_dir": str(tmp), "metrics": ["ndcg"], "k": [10],
            "valid_metric": "ndcg", "valid_k": 10, "seed": 3}


def test_narm_learns(data, tmp_path):
    maxlen = 10
    cfg = Config(
        {
            "system": _sys(tmp_path),
            "dataset": {"dataset": "seq_synth"},
            "model": {"model": "NARM", "emb_dim": 24, "embedding_dim": 24,
                      "hidden_size": 32, "maxlen": maxlen, "dropout_input": 0.0,
                      "dropout_hidden": 0.0, "batch_size": 64, "lr": 0.01,
                      "optimizer": "adam", "max_epoch": 40, "max_n_update": 40},
        }
    )
    model = build_model(cfg.model, data.n_users, data.n_items,
                        artifacts={"ctx": data.eval_context(maxlen)})
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    result = engine.train(verbose=False)
    # successor structure; random over 11 candidates ~0.25
    assert result["valid_metric"] > 0.5, result


def test_tisasrec_learns(data, tmp_path):
    maxlen, time_span = 10, 16
    cfg = Config(
        {
            "system": _sys(tmp_path),
            "dataset": {"dataset": "seq_synth"},
            "model": {"model": "TiSASRec", "emb_dim": 32, "maxlen": maxlen,
                      "num_blocks": 1, "num_heads": 1, "dropout_rate": 0.0,
                      "l2_emb": 0.0, "time_span": time_span, "batch_size": 16,
                      "lr": 0.01, "optimizer": "adam", "max_epoch": 60, "max_n_update": 60},
        }
    )
    ctx, ctx_time = data.tisasrec_eval_context(maxlen, time_span)
    model = build_model(cfg.model, data.n_users, data.n_items,
                        artifacts={"ctx": ctx, "ctx_time": ctx_time})
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    result = engine.train(verbose=False)
    assert result["valid_metric"] > 0.5, result
