"""Sharded whole-epoch training: mesh-constrained scan equals single-device."""

import jax
import numpy as np
import pytest

from beta_recsys_tpu.core.train_engine import make_epoch_fn, make_optimizer
from beta_recsys_tpu.data.base_data import BaseData, TrainArrays
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.ops.sampling import uniform_negatives
from beta_recsys_tpu.parallel.mesh import make_mesh


def _setup():
    rng = np.random.default_rng(0)
    n = 2048
    arrays = TrainArrays(
        users=rng.integers(0, 64, n).astype(np.int32),
        items=rng.integers(0, 128, n).astype(np.int32),
        ratings=np.ones(n, np.float32),
    )
    cfg = {"model": "MF", "emb_dim": 16, "loss": "bpr", "optimizer": "adam", "lr": 0.05}
    model = MF(cfg, 64, 128)
    optimizer = make_optimizer(cfg)
    sampler = lambda key, users, shape: uniform_negatives(key, shape, 128)
    return arrays, model, optimizer, sampler


def test_mesh_epoch_matches_single_device():
    arrays, model, optimizer, sampler = _setup()
    params = model.init_params(jax.random.key(0))
    opt_state = optimizer.init(params)

    plain = make_epoch_fn(model, optimizer, arrays, 256, sampler, donate=False)
    p1, o1, _, loss1 = plain(params, opt_state, jax.random.key(7))

    mesh = make_mesh(n_data=8, n_model=1)
    sharded = make_epoch_fn(model, optimizer, arrays, 256, sampler, donate=False, mesh=mesh)
    p2, o2, _, loss2 = sharded(params, opt_state, jax.random.key(7))

    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    # psum reduction order across 8 shards differs from the single-device sum;
    # Adam compounds the drift over the epoch, so tolerate a few ulps.
    np.testing.assert_allclose(
        np.asarray(p1["user_emb"]), np.asarray(p2["user_emb"]), rtol=2e-5, atol=1e-5
    )


def test_engine_with_mesh_config(tmp_path):
    """End-to-end: TrainEngine with system.mesh trains and evaluates."""
    import pandas as pd

    from beta_recsys_tpu.config import Config
    from beta_recsys_tpu.core.train_engine import TrainEngine
    from beta_recsys_tpu.datasets.data_split import feed_neg_sample, leave_one_out
    from beta_recsys_tpu.utils.alias_table import AliasTable
    from beta_recsys_tpu.utils.constants import (
        DEFAULT_FLAG_COL,
        DEFAULT_ITEM_COL,
        DEFAULT_RATING_COL,
        DEFAULT_TIMESTAMP_COL,
        DEFAULT_USER_COL,
    )
    from tests.test_train_mf import make_structured_interactions

    df = make_structured_interactions()
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    data = BaseData((train, [feed_neg_sample(valid, 20, sampler)], []))

    cfg = Config(
        {
            "system": {
                "root_dir": str(tmp_path),
                "metrics": ["ndcg"],
                "k": [10],
                "valid_metric": "ndcg",
                "valid_k": 10,
                "seed": 5,
                "mesh": {"data": 4, "model": 2},
            },
            "dataset": {"dataset": "synthetic"},
            "model": {"model": "MF", "emb_dim": 16, "batch_size": 128, "loss": "bpr",
                      "optimizer": "adam", "lr": 0.05, "max_epoch": 10, "max_n_update": 10},
        }
    )
    from beta_recsys_tpu.models import build_model

    model = build_model(cfg.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    assert engine.mesh is not None and dict(engine.mesh.shape) == {"data": 4, "model": 2}
    result = engine.train(verbose=False)
    assert result["valid_metric"] > 0.3, result
