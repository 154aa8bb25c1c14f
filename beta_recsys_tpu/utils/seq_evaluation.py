"""Sequential (session) metrics over ground-truth / predicted item lists.

Reference semantics: beta_rec/utils/seq_evaluation.py:4-115 — precision normalized
by prediction length, recall by ground-truth length, MRR of first hit, NDCG with
binary gains and log2(rank+2) discounts.
"""

import numpy as np


def _dedup(li):
    """Remove duplicates; items may themselves be lists (session tuples)."""
    seen, out = set(), []
    for x in li:
        key = tuple(x) if isinstance(x, (list, np.ndarray)) else x
        if key not in seen:
            seen.add(key)
            out.append(x)
    return out


def precision(ground_truth, prediction):
    """Fraction of unique predicted items present in the unique ground truth."""
    gt, pred = _dedup(ground_truth), _dedup(prediction)
    score = sum(1 for p in pred if p in gt) / float(len(pred))
    assert 0 <= score <= 1
    return score


def recall(ground_truth, prediction):
    """Fraction of unique ground-truth items recovered by the prediction."""
    gt, pred = _dedup(ground_truth), _dedup(prediction)
    if len(pred) == 0:
        return 0
    score = sum(1 for p in pred if p in gt) / float(len(gt))
    assert 0 <= score <= 1
    return score


def mrr(ground_truth, prediction):
    """Reciprocal rank of the first hit; 0 when no predicted item is relevant."""
    for rank, p in enumerate(prediction):
        if p in ground_truth:
            return 1.0 / (rank + 1)
    return 0.0


def ndcg(ground_truth, prediction):
    """NDCG with binary relevance over the predicted ranking."""
    rel = np.array([1 if p in ground_truth else 0 for p in prediction])
    hit_ranks = np.nonzero(rel)[0]
    if len(hit_ranks) == 0:
        return 0.0
    dcg = np.sum((2.0 ** rel[hit_ranks] - 1) / np.log2(hit_ranks + 2))
    n_hits = len(hit_ranks)
    idcg = np.sum(1.0 / np.log2(np.arange(n_hits) + 2))
    return float(dcg / idcg)
