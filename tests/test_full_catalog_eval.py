"""FullCatalogEvaluator: blocked on-device top-k over the whole catalog,
pinned against the host pandas golden metrics."""

import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.core.eval_engine import FullCatalogEvaluator
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.utils import evaluation as host_eval
from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_PREDICTION_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


def test_full_catalog_matches_host_golden():
    import jax

    rng = np.random.default_rng(0)
    n_users, n_items = 30, 40
    rows = []
    t = 0
    for u in range(n_users):
        for it in rng.choice(n_items, size=6, replace=False):
            rows.append((u, int(it), 1.0, t))
            t += 1
    df = pd.DataFrame(rows, columns=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL])
    # last 2 interactions per user -> "test", rest train
    test_mask = df.groupby(DEFAULT_USER_COL).cumcount() >= 4
    train = df[~test_mask].copy()
    test = df[test_mask].copy()
    data = BaseData((train, [], [test]), intersect=True)

    model = MF({"model": "MF", "emb_dim": 8, "loss": "bpr"}, data.n_users, data.n_items)
    params = model.init_params(jax.random.key(0))

    users, rel_csr, train_csr = data.full_catalog_eval(data.test[0])
    ev = FullCatalogEvaluator(model, users, rel_csr, train_csr, metrics=("ndcg", "recall", "precision", "map"), ks=(5, 10), user_block=16)
    device_res = ev.evaluate(params)

    # host golden: score all (user, item) pairs, mask train positives
    scores = np.asarray(model.score_all(params, users))
    train_dense = np.asarray(train_csr[users].todense()) > 0
    pred_rows = []
    for i, u in enumerate(users):
        for it in range(data.n_items):
            if not train_dense[i, it]:
                pred_rows.append((u, it, float(scores[i, it])))
    pred_df = pd.DataFrame(pred_rows, columns=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_PREDICTION_COL])
    true_df = data.test[0][[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL]].copy()
    for col in (DEFAULT_USER_COL, DEFAULT_ITEM_COL):
        pred_df[col] = pred_df[col].astype(np.int64)
        true_df[col] = true_df[col].astype(np.int64)

    for m, fn in [("ndcg", host_eval.ndcg_at_k), ("recall", host_eval.recall_at_k),
                  ("precision", host_eval.precision_at_k), ("map", host_eval.map_at_k)]:
        for k in (5, 10):
            host_v = fn(true_df, pred_df, k=k)
            assert device_res[f"{m}@{k}"] == pytest.approx(host_v, abs=2e-4), (m, k)
