"""RatingEvaluator: explicit-feedback metrics through the jitted path."""

import jax
import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.core.rating_eval import RatingEvaluator
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_USER_COL,
)


def test_rating_evaluator_matches_numpy():
    rng = np.random.default_rng(0)
    model = MF({"model": "MF", "emb_dim": 8}, 20, 30)
    params = model.init_params(jax.random.key(0))
    df = pd.DataFrame(
        {
            DEFAULT_USER_COL: rng.integers(0, 20, 50),
            DEFAULT_ITEM_COL: rng.integers(0, 30, 50),
            DEFAULT_RATING_COL: rng.random(50).astype(np.float32),
        }
    )
    ev = RatingEvaluator(model, df, metrics=("rmse", "mae", "rsquared"))
    res = ev.evaluate(params)
    preds = np.asarray(
        model.score_pairs(
            params,
            df[DEFAULT_USER_COL].to_numpy(np.int32),
            df[DEFAULT_ITEM_COL].to_numpy(np.int32),
        )
    )
    y = df[DEFAULT_RATING_COL].to_numpy()
    assert res["rmse"] == pytest.approx(np.sqrt(np.mean((y - preds) ** 2)), rel=1e-5)
    assert res["mae"] == pytest.approx(np.mean(np.abs(y - preds)), rel=1e-5)


def test_unknown_metric_raises():
    model = MF({"model": "MF", "emb_dim": 4}, 5, 5)
    df = pd.DataFrame(
        {DEFAULT_USER_COL: [0], DEFAULT_ITEM_COL: [0], DEFAULT_RATING_COL: [1.0]}
    )
    with pytest.raises(ValueError):
        RatingEvaluator(model, df, metrics=("ndcg",))
