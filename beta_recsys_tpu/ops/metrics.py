"""On-device (jit-compatible) ranking and rating metrics.

These are the TPU hot-path replacements for the reference's pandas
groupby/merge metric pipeline (beta_rec/utils/evaluation.py:461-785): everything
is a fixed-shape jnp reduction over a padded candidate matrix, so an entire
evaluation pass (scoring + metrics) runs inside one jit with no host round-trip.

Semantics match the host golden implementations in
:mod:`beta_recsys_tpu.utils.evaluation` (Spark-style: 'first' tie-breaking via
index order — ``lax.top_k`` picks the lowest index among ties, same as pandas
rank(method='first') on a stably-sorted frame; precision normalized by k;
recall/MAP by per-user relevant count; NDCG gain 1/log1p(rank)).

Inputs:
    scores:    (U, C) float — per-user candidate scores; padded slots = -inf.
    relevance: (U, C) float — 1.0 where the candidate is a true positive.
    mask:      (U, C) bool — True for valid candidate slots.
A user with no relevant candidates contributes 0 to every metric mean,
matching the reference (users absent from df_hit contribute 0 to the sum but
n_users still counts them only when they appear in both true and pred —
callers should pre-filter users to those with >=1 relevant item).
"""

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _topk_relevance(scores, relevance, mask, k):
    """Return (U, k) relevance of each user's top-k candidates, by score desc.

    When k exceeds the candidate count C the result is zero-padded to k
    (reference: pandas nlargest just returns all C rows; precision can be < 1).
    """
    kk = min(k, scores.shape[1])
    masked = jnp.where(mask, scores, NEG_INF)
    _, idx = jax.lax.top_k(masked, kk)  # ties → lowest index, like rank('first')
    top_rel = jnp.take_along_axis(relevance, idx, axis=1)
    top_valid = jnp.take_along_axis(mask, idx, axis=1)
    out = top_rel * top_valid
    if kk < k:
        out = jnp.pad(out, ((0, 0), (0, k - kk)))
    return out


def _actual_counts(relevance, mask):
    return jnp.sum(relevance * mask, axis=1)


def precision_at_k(scores, relevance, mask, k):
    """Mean over users of (#hits in top-k) / k."""
    hits = _topk_relevance(scores, relevance, mask, k).sum(axis=1)
    return jnp.mean(hits / k)


def recall_at_k(scores, relevance, mask, k):
    """Mean over users of (#hits in top-k) / (#relevant)."""
    hits = _topk_relevance(scores, relevance, mask, k).sum(axis=1)
    actual = _actual_counts(relevance, mask)
    return jnp.mean(jnp.where(actual > 0, hits / jnp.maximum(actual, 1), 0.0))


def ndcg_at_k(scores, relevance, mask, k):
    """Mean over users of DCG@k / IDCG@k with gains 1/log1p(rank)."""
    top_rel = _topk_relevance(scores, relevance, mask, k)
    ranks = jnp.arange(1, k + 1, dtype=scores.dtype)
    gains = 1.0 / jnp.log1p(ranks)
    dcg = jnp.sum(top_rel * gains, axis=1)
    actual = _actual_counts(relevance, mask)
    # IDCG = prefix sums of the gain sequence up to min(actual, k).
    ideal_prefix = jnp.cumsum(gains)
    idx = jnp.clip(jnp.minimum(actual, k).astype(jnp.int32) - 1, 0, k - 1)
    idcg = ideal_prefix[idx]
    return jnp.mean(jnp.where(actual > 0, dcg / idcg, 0.0))


def map_at_k(scores, relevance, mask, k):
    """Mean over users of sum_j (j / rank_j) / actual, j-th hit at rank rank_j."""
    top_rel = _topk_relevance(scores, relevance, mask, k)
    ranks = jnp.arange(1, k + 1, dtype=scores.dtype)
    hit_counts = jnp.cumsum(top_rel, axis=1)  # j at each hit position
    rr = jnp.sum(top_rel * hit_counts / ranks, axis=1)
    actual = _actual_counts(relevance, mask)
    return jnp.mean(jnp.where(actual > 0, rr / jnp.maximum(actual, 1), 0.0))


RANKING_METRICS = {
    "precision": precision_at_k,
    "recall": recall_at_k,
    "ndcg": ndcg_at_k,
    "map": map_at_k,
}


def ranking_metrics(scores, relevance, mask, metrics, ks):
    """Compute a {metric@k: value} dict in one jit-compatible call."""
    out = {}
    for m in metrics:
        fn = RANKING_METRICS[m]
        for k in ks:
            out[f"{m}@{k}"] = fn(scores, relevance, mask, k)
    return out


# ---------------------------------------------------------------------------
# Rating metrics (pointwise, fixed-shape with a validity mask)
# ---------------------------------------------------------------------------


def rmse(y_true, y_pred, mask=None):
    d2 = (y_true - y_pred) ** 2
    return jnp.sqrt(_masked_mean(d2, mask))


def mae(y_true, y_pred, mask=None):
    return _masked_mean(jnp.abs(y_true - y_pred), mask)


def rsquared(y_true, y_pred, mask=None):
    ss_res = _masked_sum((y_true - y_pred) ** 2, mask)
    mean_true = _masked_mean(y_true, mask)
    ss_tot = _masked_sum((y_true - mean_true) ** 2, mask)
    return 1.0 - ss_res / ss_tot


def exp_var(y_true, y_pred, mask=None):
    err = y_true - y_pred
    var_err = _masked_mean((err - _masked_mean(err, mask)) ** 2, mask)
    var_true = _masked_mean((y_true - _masked_mean(y_true, mask)) ** 2, mask)
    return 1.0 - var_err / var_true


def auc(y_true, y_pred, mask=None):
    """Probability a random positive outranks a random negative (rank statistic).

    Ties in predictions contribute 1/2, matching sklearn's roc_auc_score.
    """
    if mask is None:
        mask = jnp.ones_like(y_pred, dtype=bool)
    pos = (y_true > 0) & mask
    neg = (y_true <= 0) & mask
    # Masked-out entries sort to +inf (the tail), so valid entries keep the
    # same ascending ranks they would have among valid entries alone.
    y_pred = jnp.where(mask, y_pred, jnp.inf)
    # Rank-sum (Mann-Whitney U) formulation with average ranks for ties.
    order = jnp.argsort(y_pred)
    sorted_pred = y_pred[order]
    ranks_sorted = jnp.arange(1, y_pred.shape[0] + 1, dtype=y_pred.dtype)
    # Average tied ranks: use double argsort on (pred, tie-broken) — implement via
    # segment means over equal prediction values.
    uniq_start = jnp.concatenate(
        [jnp.array([True]), sorted_pred[1:] != sorted_pred[:-1]]
    )
    group_id = jnp.cumsum(uniq_start) - 1
    num_groups = y_pred.shape[0]
    group_sum = jax.ops.segment_sum(ranks_sorted, group_id, num_segments=num_groups)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(ranks_sorted), group_id, num_segments=num_groups)
    avg_rank_sorted = group_sum[group_id] / jnp.maximum(group_cnt[group_id], 1)
    ranks = jnp.zeros_like(avg_rank_sorted).at[order].set(avg_rank_sorted)
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(neg)
    rank_sum_pos = jnp.sum(jnp.where(pos, ranks, 0.0))
    u_stat = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return u_stat / jnp.maximum(n_pos * n_neg, 1)


def logloss(y_true, y_pred, mask=None, eps=1e-15):
    p = jnp.clip(y_pred, eps, 1 - eps)
    ll = -(y_true * jnp.log(p) + (1 - y_true) * jnp.log1p(-p))
    return _masked_mean(ll, mask)


def _masked_sum(x, mask):
    return jnp.sum(jnp.where(mask, x, 0.0)) if mask is not None else jnp.sum(x)


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    return _masked_sum(x, mask) / jnp.maximum(jnp.sum(mask), 1)
