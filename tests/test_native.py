"""Native C++ host-kernel tests (ctypes) + parity with the Python paths."""

import numpy as np
import pytest

from beta_recsys_tpu import native
from beta_recsys_tpu.utils.alias_table import AliasTable


def test_native_builds():
    assert native.available(), "g++ toolchain expected in this environment"


def test_alias_build_matches_python():
    freqs = [6.0, 4.0, 1.0, 1.0]
    prob, alias = native.alias_build(freqs)
    ref = AliasTable(list(freqs))
    np.testing.assert_allclose(prob, ref.prob_arr, rtol=1e-12)
    np.testing.assert_array_equal(alias, ref.alias_arr)


def test_alias_sample_distribution():
    freqs = np.array([8.0, 4.0, 2.0, 1.0, 1.0])
    prob, alias = native.alias_build(freqs)
    draws = native.alias_sample(prob, alias, 200_000, seed=7)
    counts = np.bincount(draws, minlength=5) / len(draws)
    np.testing.assert_allclose(counts, freqs / freqs.sum(), atol=0.01)


def test_feed_neg_batch():
    # 3 users, catalog of 20 items, uniform popularity
    labels = np.arange(20, dtype=np.int64)
    prob, alias = native.alias_build(np.ones(20))
    indptr = np.array([0, 2, 5, 6], dtype=np.int64)
    pos = np.array([0, 1, 2, 3, 4, 19], dtype=np.int64)
    out = native.feed_neg_batch(indptr, pos, prob, alias, labels, 8, seed=3)
    assert out.shape == (3, 8)
    for u, (lo, hi) in enumerate(zip(indptr[:-1], indptr[1:])):
        user_pos = set(pos[lo:hi].tolist())
        row = out[u]
        assert len(set(row.tolist())) == 8  # unique
        assert not (set(row.tolist()) & user_pos)  # excludes positives


def test_feed_neg_batch_insufficient_raises():
    labels = np.arange(5, dtype=np.int64)
    prob, alias = native.alias_build(np.ones(5))
    indptr = np.array([0, 3], dtype=np.int64)
    pos = np.array([0, 1, 2], dtype=np.int64)
    with pytest.raises(RuntimeError):
        native.feed_neg_batch(indptr, pos, prob, alias, labels, 4, seed=0)


def test_kcore_filter_matches_pandas():
    import pandas as pd

    from beta_recsys_tpu.datasets.data_split import filter_user_item
    from beta_recsys_tpu.utils.constants import (
        DEFAULT_ITEM_COL,
        DEFAULT_RATING_COL,
        DEFAULT_USER_COL,
    )

    rng = np.random.default_rng(0)
    users = rng.integers(0, 50, 2000)
    items = rng.integers(0, 60, 2000)
    # dedup (u, i) pairs so count == nunique semantics match
    pairs = np.unique(np.stack([users, items], 1), axis=0)
    users, items = pairs[:, 0], pairs[:, 1]
    keep = native.kcore_filter(users, items, 50, 60, min_u_c=5, min_i_c=5)
    df = pd.DataFrame(
        {DEFAULT_USER_COL: users, DEFAULT_ITEM_COL: items, DEFAULT_RATING_COL: 1.0}
    )
    ref = filter_user_item(df, min_u_c=5, min_i_c=5)
    ref_pairs = set(zip(ref[DEFAULT_USER_COL], ref[DEFAULT_ITEM_COL]))
    got_pairs = set(zip(users[keep], items[keep]))
    assert got_pairs == ref_pairs


def test_kcore_filter_distinct_matches_pandas_with_duplicates():
    """Native distinct-count k-core == pandas nunique loop, duplicates present."""
    import pandas as pd

    from beta_recsys_tpu.datasets.data_split import (
        filter_user_item,
        filter_user_item_order,
    )
    from beta_recsys_tpu.utils.constants import (
        DEFAULT_ITEM_COL,
        DEFAULT_ORDER_COL,
        DEFAULT_RATING_COL,
        DEFAULT_USER_COL,
    )

    rng = np.random.default_rng(3)
    n = 5000
    # zipf-skewed ids so the peel actually removes rows (uniform ids at this
    # size never fall below the thresholds and the test would pin nothing)
    df = pd.DataFrame(
        {
            DEFAULT_USER_COL: rng.zipf(1.3, n) % 300,
            DEFAULT_ITEM_COL: rng.zipf(1.3, n) % 250,
            DEFAULT_ORDER_COL: rng.integers(0, 2000, n),
            DEFAULT_RATING_COL: 1.0,
        }
    )
    ref = filter_user_item(df, 8, 8, use_native=False).reset_index(drop=True)
    got = filter_user_item(df, 8, 8, use_native=True).reset_index(drop=True)
    assert 0 < len(ref) < n  # the filter must actually drop rows
    assert got.equals(ref)

    ref_o = filter_user_item_order(df, 6, 6, 4, use_native=False).reset_index(drop=True)
    got_o = filter_user_item_order(df, 6, 6, 4, use_native=True).reset_index(drop=True)
    assert 0 < len(ref_o) < n
    assert got_o.equals(ref_o)


def test_kcore_filter_distinct_string_ids():
    import pandas as pd

    from beta_recsys_tpu.datasets.data_split import filter_user_item
    from beta_recsys_tpu.utils.constants import (
        DEFAULT_ITEM_COL,
        DEFAULT_RATING_COL,
        DEFAULT_USER_COL,
    )

    rng = np.random.default_rng(4)
    n = 2000
    df = pd.DataFrame(
        {
            DEFAULT_USER_COL: ["u%d" % x for x in rng.zipf(1.3, n) % 150],
            DEFAULT_ITEM_COL: ["i%d" % x for x in rng.zipf(1.3, n) % 120],
            DEFAULT_RATING_COL: 1.0,
        }
    )
    ref = filter_user_item(df, 6, 6, use_native=False).reset_index(drop=True)
    got = filter_user_item(df, 6, 6, use_native=True).reset_index(drop=True)
    assert 0 < len(ref) < n
    assert got.equals(ref)
