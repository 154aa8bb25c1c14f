"""Host-side (numpy/pandas) rating and ranking metrics — the golden reference
implementations used for testing and for small offline analyses.

Semantics follow the reference exactly (beta_rec/utils/evaluation.py:214-785,
Spark-MLlib-style ranking metrics): top-k per user by prediction with 'first'
tie-breaking, precision normalized by k, recall/MAP normalized by the number of
relevant items, NDCG with 1/log1p(rank) gains.

The hot-path, on-device versions of these metrics live in
:mod:`beta_recsys_tpu.ops.metrics` (jnp reductions, jit-compatible); a parity test
pins the two implementations against each other.
"""

import numpy as np
import pandas as pd

from .constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_K,
    DEFAULT_PREDICTION_COL,
    DEFAULT_RATING_COL,
    DEFAULT_THRESHOLD,
    DEFAULT_USER_COL,
)


class PandasHash:
    """Hashable wrapper around a DataFrame so it can key an lru_cache.

    Reference parity: beta_rec/utils/evaluation.py:24-171. Equality/hash are
    content-based (values + columns), so repeated metric calls on the same
    truth/prediction frames hit the cache.
    """

    def __init__(self, df):
        self.df = df
        self._hash = hash(
            (tuple(pd.util.hash_pandas_object(df).to_numpy()), tuple(df.columns))
        )

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return isinstance(other, PandasHash) and self._hash == other._hash


def lru_cache_df(maxsize=128):
    """functools.lru_cache for functions whose leading args are DataFrames.

    DataFrame positional/keyword args are wrapped in :class:`PandasHash` for
    the cache key and unwrapped before the call (reference
    beta_rec/utils/evaluation.py:172-211).
    """
    import functools

    def decorator(fn):
        @functools.lru_cache(maxsize=maxsize)
        def cached(*args, **kwargs):
            args = tuple(a.df if isinstance(a, PandasHash) else a for a in args)
            kwargs = {k: (v.df if isinstance(v, PandasHash) else v) for k, v in kwargs.items()}
            return fn(*args, **kwargs)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            args = tuple(PandasHash(a) if isinstance(a, pd.DataFrame) else a for a in args)
            kwargs = {
                k: (PandasHash(v) if isinstance(v, pd.DataFrame) else v)
                for k, v in kwargs.items()
            }
            return cached(*args, **kwargs)

        wrapper.cache_info = cached.cache_info
        wrapper.cache_clear = cached.cache_clear
        return wrapper

    return decorator


def _check_columns(rating_true, rating_pred, col_user, col_item, col_rating, col_prediction):
    """Validate that the expected columns exist with matching key dtypes."""
    for df, col in [
        (rating_true, col_user),
        (rating_true, col_item),
        (rating_true, col_rating),
        (rating_pred, col_user),
        (rating_pred, col_item),
        (rating_pred, col_prediction),
    ]:
        if col not in df.columns:
            raise ValueError(f"Missing column {col} in DataFrame")
    for col in (col_user, col_item):
        if rating_true[col].dtype != rating_pred[col].dtype:
            raise ValueError(f"Mismatched dtype for column {col}")


def merge_rating_true_pred(
    rating_true,
    rating_pred,
    col_user=DEFAULT_USER_COL,
    col_item=DEFAULT_ITEM_COL,
    col_rating=DEFAULT_RATING_COL,
    col_prediction=DEFAULT_PREDICTION_COL,
):
    """Inner-join truth/prediction on (user, item); return aligned rating arrays."""
    _check_columns(rating_true, rating_pred, col_user, col_item, col_rating, col_prediction)
    suffixes = ["_true", "_pred"]
    merged = pd.merge(rating_true, rating_pred, on=[col_user, col_item], suffixes=suffixes)
    if col_rating in rating_pred.columns:
        col_rating = col_rating + suffixes[0]
    if col_prediction in rating_true.columns:
        col_prediction = col_prediction + suffixes[1]
    return merged[col_rating].to_numpy(), merged[col_prediction].to_numpy()


def rmse(rating_true, rating_pred, **kwargs):
    """Root mean squared error over joined (user, item) pairs."""
    y_true, y_pred = merge_rating_true_pred(rating_true, rating_pred, **kwargs)
    return float(np.sqrt(np.mean((y_true - y_pred) ** 2)))


def mae(rating_true, rating_pred, **kwargs):
    """Mean absolute error over joined (user, item) pairs."""
    y_true, y_pred = merge_rating_true_pred(rating_true, rating_pred, **kwargs)
    return float(np.mean(np.abs(y_true - y_pred)))


def rsquared(rating_true, rating_pred, **kwargs):
    """Coefficient of determination R^2."""
    y_true, y_pred = merge_rating_true_pred(rating_true, rating_pred, **kwargs)
    ss_res = np.sum((y_true - y_pred) ** 2)
    ss_tot = np.sum((y_true - np.mean(y_true)) ** 2)
    return float(1.0 - ss_res / ss_tot)


def exp_var(rating_true, rating_pred, **kwargs):
    """Explained variance."""
    y_true, y_pred = merge_rating_true_pred(rating_true, rating_pred, **kwargs)
    return float(1.0 - np.var(y_true - y_pred) / np.var(y_true))


def auc(rating_true, rating_pred, **kwargs):
    """Area under the ROC curve (binary relevance from the rating column)."""
    from sklearn.metrics import roc_auc_score

    y_true, y_pred = merge_rating_true_pred(rating_true, rating_pred, **kwargs)
    return float(roc_auc_score(y_true, y_pred))


def logloss(rating_true, rating_pred, **kwargs):
    """Binary cross-entropy between true relevance and predicted probability."""
    from sklearn.metrics import log_loss

    y_true, y_pred = merge_rating_true_pred(rating_true, rating_pred, **kwargs)
    return float(log_loss(y_true, y_pred))


def get_top_k_items(dataframe, col_user=DEFAULT_USER_COL, col_rating=DEFAULT_RATING_COL, k=DEFAULT_K):
    """Per-user top-k rows by ``col_rating`` with a 1-based ``rank`` column.

    Ties keep first-occurrence order ('first' ranking, matching Spark and the
    reference beta_rec/utils/evaluation.py:755-785).
    """
    sorted_df = dataframe.sort_values(col_rating, ascending=False, kind="stable")
    # Stable sort on user groups preserves the within-user rating order.
    top_k = sorted_df.groupby(col_user, sort=False).head(k).copy()
    top_k = top_k.sort_values([col_user], kind="stable").reset_index(drop=True)
    top_k["rank"] = top_k.groupby(col_user, sort=False).cumcount() + 1
    return top_k


def merge_ranking_true_pred(
    rating_true,
    rating_pred,
    col_user=DEFAULT_USER_COL,
    col_item=DEFAULT_ITEM_COL,
    col_rating=DEFAULT_RATING_COL,
    col_prediction=DEFAULT_PREDICTION_COL,
    relevancy_method="top_k",
    k=DEFAULT_K,
    threshold=DEFAULT_THRESHOLD,
):
    """Compute per-user hits of top-k predictions against relevant (rating>=1) truth.

    Returns (df_hit, df_hit_count, n_users): hit rows with their rank, per-user
    hit/actual counts, and the number of common users.
    """
    _check_columns(rating_true, rating_pred, col_user, col_item, col_rating, col_prediction)
    rating_true = rating_true[rating_true[col_rating] >= 1]
    common_users = set(rating_true[col_user]).intersection(set(rating_pred[col_user]))
    true_common = rating_true[rating_true[col_user].isin(common_users)]
    pred_common = rating_pred[rating_pred[col_user].isin(common_users)]
    n_users = len(common_users)

    if relevancy_method == "top_k":
        top_k = k
    elif relevancy_method == "by_threshold":
        top_k = threshold
    else:
        raise NotImplementedError("Invalid relevancy_method")

    df_hit = get_top_k_items(pred_common, col_user=col_user, col_rating=col_prediction, k=top_k)
    df_hit = pd.merge(df_hit, true_common, on=[col_user, col_item])[[col_user, col_item, "rank"]]

    hit_count = df_hit.groupby(col_user).size().rename("hit").reset_index()
    actual_count = true_common.groupby(col_user).size().rename("actual").reset_index()
    df_hit_count = pd.merge(hit_count, actual_count, on=col_user)
    return df_hit, df_hit_count, n_users


def precision_at_k(rating_true, rating_pred, k=DEFAULT_K, **kwargs):
    """Precision@k averaged over users, normalized by k (Spark semantics)."""
    df_hit, df_hit_count, n_users = merge_ranking_true_pred(
        rating_true, rating_pred, k=k, **kwargs
    )
    if df_hit.shape[0] == 0:
        return 0.0
    return float((df_hit_count["hit"] / k).sum() / n_users)


def recall_at_k(rating_true, rating_pred, k=DEFAULT_K, **kwargs):
    """Recall@k averaged over users, normalized by each user's relevant count."""
    df_hit, df_hit_count, n_users = merge_ranking_true_pred(
        rating_true, rating_pred, k=k, **kwargs
    )
    if df_hit.shape[0] == 0:
        return 0.0
    return float((df_hit_count["hit"] / df_hit_count["actual"]).sum() / n_users)


def ndcg_at_k(rating_true, rating_pred, k=DEFAULT_K, **kwargs):
    """NDCG@k with binary relevance: gain 1/log1p(rank), ideal over min(actual, k)."""
    df_hit, df_hit_count, n_users = merge_ranking_true_pred(
        rating_true, rating_pred, k=k, **kwargs
    )
    if df_hit.shape[0] == 0:
        return 0.0
    df_dcg = df_hit.copy()
    df_dcg["dcg"] = 1.0 / np.log1p(df_dcg["rank"])
    dcg = df_dcg.groupby(kwargs.get("col_user", DEFAULT_USER_COL), sort=False).agg(
        {"dcg": "sum"}
    ).reset_index()
    df_ndcg = pd.merge(dcg, df_hit_count, on=kwargs.get("col_user", DEFAULT_USER_COL))
    df_ndcg["idcg"] = df_ndcg["actual"].apply(
        lambda x: sum(1.0 / np.log1p(r) for r in range(1, min(x, k) + 1))
    )
    return float((df_ndcg["dcg"] / df_ndcg["idcg"]).sum() / n_users)


def map_at_k(rating_true, rating_pred, k=DEFAULT_K, **kwargs):
    """MAP@k: mean over users of (sum of precision-at-hit-ranks / actual relevant)."""
    col_user = kwargs.get("col_user", DEFAULT_USER_COL)
    df_hit, df_hit_count, n_users = merge_ranking_true_pred(
        rating_true, rating_pred, k=k, **kwargs
    )
    if df_hit.shape[0] == 0:
        return 0.0
    df_sorted = df_hit.sort_values([col_user, "rank"], kind="stable")
    df_sorted["rr"] = (df_sorted.groupby(col_user).cumcount() + 1) / df_sorted["rank"]
    rr = df_sorted.groupby(col_user).agg({"rr": "sum"}).reset_index()
    df_merge = pd.merge(rr, df_hit_count, on=col_user)
    return float((df_merge["rr"] / df_merge["actual"]).sum() / n_users)


METRIC_FNS = {
    "rmse": rmse,
    "mae": mae,
    "rsquared": rsquared,
    "exp_var": exp_var,
    "auc": auc,
    "logloss": logloss,
    "precision": precision_at_k,
    "recall": recall_at_k,
    "ndcg": ndcg_at_k,
    "map": map_at_k,
}
