"""Golden-value tests for host metrics + host/device parity tests.

Mirrors the reference metric tests (tests/test_evaluation.py): fixture true/pred
frames, approx golden values, perfect-score identities, zero-hit cases, and
ValueError paths; plus pins the on-device jnp metrics to the host goldens.
"""

import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.utils import evaluation as ev
from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_PREDICTION_COL,
    DEFAULT_RATING_COL,
    DEFAULT_USER_COL,
)

TOL = 1e-4


@pytest.fixture
def rating_true():
    return pd.DataFrame(
        {
            DEFAULT_USER_COL: [1, 1, 1, 2, 2, 2, 2, 3, 3, 3],
            DEFAULT_ITEM_COL: [1, 2, 3, 1, 4, 5, 6, 2, 5, 6],
            DEFAULT_RATING_COL: [5.0, 4.0, 3.0, 5.0, 5.0, 3.0, 1.0, 5.0, 5.0, 5.0],
        }
    )


@pytest.fixture
def rating_pred():
    return pd.DataFrame(
        {
            DEFAULT_USER_COL: [1, 1, 1, 2, 2, 2, 2, 3, 3, 3],
            DEFAULT_ITEM_COL: [3, 10, 12, 10, 3, 5, 11, 2, 10, 3],
            DEFAULT_PREDICTION_COL: [14, 13, 12, 14, 13, 12, 11, 14, 13, 12],
            DEFAULT_RATING_COL: [5.0, 4.0, 3.0, 5.0, 5.0, 3.0, 1.0, 5.0, 5.0, 5.0],
        }
    )


def test_rating_metrics_identity(rating_true):
    pred_same = rating_true.rename(columns={DEFAULT_RATING_COL: DEFAULT_PREDICTION_COL})
    assert ev.rmse(rating_true, pred_same) == pytest.approx(0.0, abs=TOL)
    assert ev.mae(rating_true, pred_same) == pytest.approx(0.0, abs=TOL)
    assert ev.rsquared(rating_true, pred_same) == pytest.approx(1.0, abs=TOL)
    assert ev.exp_var(rating_true, pred_same) == pytest.approx(1.0, abs=TOL)


def test_rating_metrics_values(rating_true, rating_pred):
    # joined pairs: (1,3): 3 vs 14 ; (2,5): 3 vs 12 ; (3,2): 5 vs 14
    y_t = np.array([3.0, 3.0, 5.0])
    y_p = np.array([14.0, 12.0, 14.0])
    assert ev.rmse(rating_true, rating_pred) == pytest.approx(
        np.sqrt(np.mean((y_t - y_p) ** 2)), abs=TOL
    )
    assert ev.mae(rating_true, rating_pred) == pytest.approx(np.mean(np.abs(y_t - y_p)), abs=TOL)


def test_ranking_metrics_perfect(rating_true):
    pred_same = rating_true.rename(columns={DEFAULT_RATING_COL: DEFAULT_PREDICTION_COL})
    kwargs = {}
    assert ev.precision_at_k(rating_true, pred_same, k=10) < 1  # k > per-user items
    assert ev.recall_at_k(rating_true, pred_same, k=10) == pytest.approx(1.0, abs=TOL)
    assert ev.ndcg_at_k(rating_true, pred_same, k=10) == pytest.approx(1.0, abs=TOL)
    assert ev.map_at_k(rating_true, pred_same, k=10) == pytest.approx(1.0, abs=TOL)


def test_ranking_metrics_golden(rating_true, rating_pred):
    # user 1: top-10 preds = items [3,10,12]; hits = {3} at rank 1; actual = 3
    # user 2: preds [10,3,5,11]; hits = {5} at rank 3; actual = 4
    # user 3: preds [2,10,3]; hits = {2} at rank 1; actual = 3
    k = 10
    precision = (1 / k + 1 / k + 1 / k) / 3
    recall = (1 / 3 + 1 / 4 + 1 / 3) / 3
    ndcg_u1 = (1 / np.log1p(1)) / sum(1 / np.log1p(r) for r in range(1, 4))
    ndcg_u2 = (1 / np.log1p(3)) / sum(1 / np.log1p(r) for r in range(1, 5))
    ndcg_u3 = (1 / np.log1p(1)) / sum(1 / np.log1p(r) for r in range(1, 4))
    ndcg = (ndcg_u1 + ndcg_u2 + ndcg_u3) / 3
    map_val = ((1 / 1) / 3 + (1 / 3) / 4 + (1 / 1) / 3) / 3
    assert ev.precision_at_k(rating_true, rating_pred, k=k) == pytest.approx(precision, abs=TOL)
    assert ev.recall_at_k(rating_true, rating_pred, k=k) == pytest.approx(recall, abs=TOL)
    assert ev.ndcg_at_k(rating_true, rating_pred, k=k) == pytest.approx(ndcg, abs=TOL)
    assert ev.map_at_k(rating_true, rating_pred, k=k) == pytest.approx(map_val, abs=TOL)


def test_ranking_no_hits(rating_true):
    pred = pd.DataFrame(
        {
            DEFAULT_USER_COL: [1, 2, 3],
            DEFAULT_ITEM_COL: [99, 99, 99],
            DEFAULT_PREDICTION_COL: [5.0, 5.0, 5.0],
        }
    )
    assert ev.precision_at_k(rating_true, pred, k=10) == 0.0
    assert ev.recall_at_k(rating_true, pred, k=10) == 0.0
    assert ev.ndcg_at_k(rating_true, pred, k=10) == 0.0
    assert ev.map_at_k(rating_true, pred, k=10) == 0.0


def test_missing_column_raises(rating_true, rating_pred):
    bad = rating_pred.drop(columns=[DEFAULT_PREDICTION_COL])
    with pytest.raises(ValueError):
        ev.precision_at_k(rating_true, bad, k=10)


def test_dtype_mismatch_raises(rating_true, rating_pred):
    bad = rating_pred.copy()
    bad[DEFAULT_ITEM_COL] = bad[DEFAULT_ITEM_COL].astype(np.float64)
    with pytest.raises(ValueError):
        ev.precision_at_k(rating_true, bad, k=10)


# ---------------------------------------------------------------------------
# Host / device parity
# ---------------------------------------------------------------------------


def _random_candidate_problem(rng, n_users=37, n_cand=23):
    scores = rng.normal(size=(n_users, n_cand)).astype(np.float32)
    relevance = (rng.random((n_users, n_cand)) < 0.15).astype(np.float32)
    relevance[:, 0] = 1.0  # every user has >=1 positive
    mask = np.ones((n_users, n_cand), dtype=bool)
    mask[:, -3:] = rng.random((n_users, 3)) < 0.5  # ragged padding
    relevance *= mask
    return scores, relevance, mask


def _to_frames(scores, relevance, mask):
    users, items, ratings, preds = [], [], [], []
    U, C = scores.shape
    for u in range(U):
        for c in range(C):
            if mask[u, c]:
                users.append(u)
                items.append(u * C + c)  # unique item ids per candidate slot
                ratings.append(float(relevance[u, c]))
                preds.append(float(scores[u, c]))
    true = pd.DataFrame(
        {
            DEFAULT_USER_COL: users,
            DEFAULT_ITEM_COL: items,
            DEFAULT_RATING_COL: ratings,
        }
    )
    pred = pd.DataFrame(
        {
            DEFAULT_USER_COL: users,
            DEFAULT_ITEM_COL: items,
            DEFAULT_PREDICTION_COL: preds,
        }
    )
    return true, pred


@pytest.mark.parametrize("k", [5, 10])
def test_device_metrics_match_host(k):
    from beta_recsys_tpu.ops import metrics as dm

    rng = np.random.default_rng(0)
    scores, relevance, mask = _random_candidate_problem(rng)
    true, pred = _to_frames(scores, relevance, mask)

    host = {
        "precision": ev.precision_at_k(true, pred, k=k),
        "recall": ev.recall_at_k(true, pred, k=k),
        "ndcg": ev.ndcg_at_k(true, pred, k=k),
        "map": ev.map_at_k(true, pred, k=k),
    }
    dev = dm.ranking_metrics(scores, relevance, mask, list(host), [k])
    for m, v in host.items():
        assert float(dev[f"{m}@{k}"]) == pytest.approx(v, abs=1e-4), m


def test_device_auc_respects_mask():
    from beta_recsys_tpu.ops import metrics as dm

    # unmasked low-score negative would corrupt ranks if included
    y_true = np.array([1.0, 0.0, 0.0], np.float32)
    y_pred = np.array([0.9, 0.5, 0.1], np.float32)
    mask = np.array([True, True, False])
    assert float(dm.auc(y_true, y_pred, mask)) == pytest.approx(1.0)
    # and the masked entry is excluded from the statistic entirely
    y_true2 = np.array([1.0, 0.0, 1.0], np.float32)
    y_pred2 = np.array([0.2, 0.5, 0.9], np.float32)
    mask2 = np.array([True, True, False])
    from sklearn.metrics import roc_auc_score

    assert float(dm.auc(y_true2, y_pred2, mask2)) == pytest.approx(
        roc_auc_score(y_true2[:2], y_pred2[:2])
    )


def test_device_rating_metrics():
    from beta_recsys_tpu.ops import metrics as dm

    rng = np.random.default_rng(1)
    y_true = rng.random(100).astype(np.float32)
    y_pred = rng.random(100).astype(np.float32)
    assert float(dm.rmse(y_true, y_pred)) == pytest.approx(
        np.sqrt(np.mean((y_true - y_pred) ** 2)), abs=1e-5
    )
    assert float(dm.mae(y_true, y_pred)) == pytest.approx(np.mean(np.abs(y_true - y_pred)), abs=1e-5)
    labels = (rng.random(100) < 0.3).astype(np.float32)
    from sklearn.metrics import roc_auc_score

    assert float(dm.auc(labels, y_pred)) == pytest.approx(
        roc_auc_score(labels, y_pred), abs=1e-4
    )
