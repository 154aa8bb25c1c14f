"""TopKRetrievalEvaluator parity with the dense FullCatalogEvaluator."""

import jax
import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.core.eval_engine import FullCatalogEvaluator, TopKRetrievalEvaluator
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


def test_matches_dense_full_catalog():
    rng = np.random.default_rng(0)
    rows = []
    t = 0
    for u in range(40):
        for it in rng.choice(50, size=8, replace=False):
            rows.append((u, int(it), 1.0, t))
            t += 1
    df = pd.DataFrame(rows, columns=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL])
    test_mask = df.groupby(DEFAULT_USER_COL).cumcount() >= 5
    data = BaseData((df[~test_mask].copy(), [], [df[test_mask].copy()]), intersect=True)

    # MF without sigmoid/bias interference: use raw embeddings for retrieval
    model = MF({"model": "MF", "emb_dim": 8, "loss": "bpr"}, data.n_users, data.n_items)
    params = model.init_params(jax.random.key(0))

    users, rel_csr, train_csr = data.full_catalog_eval(data.test[0])
    metrics = ("ndcg", "precision", "recall", "map")
    ks = (5, 10)
    dense = FullCatalogEvaluator(model, users, rel_csr, train_csr, metrics, ks, user_block=16)
    stream = TopKRetrievalEvaluator(model, users, rel_csr, train_csr, metrics, ks,
                                    user_block=16, item_block=128)
    # MF's bias-augmented factorized form ranks identically to its sigmoid
    # scores, so the streaming evaluator must match the dense one exactly.
    dense_res = dense.evaluate(params)
    stream_res = stream.evaluate(params)
    for key, v in dense_res.items():
        assert stream_res[key] == pytest.approx(v, abs=1e-4), key
