"""SeqEvalEngine scroll-protocol tests with a deterministic scorer."""

import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.core.seq_eval_engine import SeqEvalEngine


def perfect_next_item_scorer(n_items):
    """Scores item (last_item + 1) mod n highest — matches the cyclic data."""

    def score_fn(profiles):
        B, T = profiles.shape
        last = profiles[:, -1]  # 1-indexed
        scores = np.zeros((B, n_items), dtype=np.float32)
        nxt0 = (last - 1 + 1) % n_items  # 0-indexed successor
        scores[np.arange(B), nxt0] = 10.0
        return scores

    return score_fn


def test_scroll_protocol_perfect_recommender():
    n_items = 12
    # cyclic sequences: successor always +1 (1-indexed, wrap via mod)
    seqs = [[(s + j) % n_items + 1 for j in range(6)] for s in range(5)]
    engine = SeqEvalEngine(metrics=("precision", "recall", "mrr", "ndcg"))
    res = engine.sequential_evaluation(
        perfect_next_item_scorer(n_items), seqs, maxlen=6, given_k=1,
        look_ahead=1, top_n=5, scroll=True, step=1,
    )
    # perfect scorer: next item always rank 1 -> mrr = ndcg = 1, recall = 1
    assert res["mrr"] == pytest.approx(1.0)
    assert res["ndcg"] == pytest.approx(1.0)
    assert res["recall"] == pytest.approx(1.0)
    assert res["precision"] == pytest.approx(1 / 5)  # 1 hit in top-5


def test_no_scroll_single_point():
    n_items = 10
    seqs = [[1, 2, 3, 4]]
    engine = SeqEvalEngine(metrics=("mrr",))
    res = engine.sequential_evaluation(
        perfect_next_item_scorer(n_items), seqs, maxlen=4, given_k=2,
        look_ahead=1, top_n=3, scroll=False,
    )
    assert res["mrr"] == pytest.approx(1.0)


def test_given_k_zero_raises():
    engine = SeqEvalEngine(metrics=("mrr",))
    with pytest.raises(ValueError):
        engine.sequential_evaluation(lambda p: None, [[1, 2]], 4, given_k=0)


def test_get_test_sequences():
    df = pd.DataFrame({"col_sequence": [[1], [1, 2, 3], [1, 2]]})
    out = SeqEvalEngine.get_test_sequences(df, given_k=2)
    assert len(out) == 1 and list(out[0]) == [1, 2, 3]
