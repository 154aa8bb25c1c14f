"""The parity harness's structured synthetic generator: shape + learnability."""

import numpy as np

from beta_recsys_tpu.datasets.synthetic import generate_structured_data
from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


def test_structured_data_shape_and_powerlaw():
    df = generate_structured_data(
        n_users=200, n_items=400, n_interactions=20_000, seed=7
    )
    assert not df.duplicated([DEFAULT_USER_COL, DEFAULT_ITEM_COL]).any()
    assert df[DEFAULT_USER_COL].nunique() == 200
    assert abs(len(df) - 20_000) < 2_000  # redistribution keeps total close
    # zipf-ish popularity: head items dominate the tail
    vc = df[DEFAULT_ITEM_COL].value_counts()
    assert vc.iloc[0] > 8 * vc.iloc[-1]
    uc = df[DEFAULT_USER_COL].value_counts()
    assert uc.min() >= 5  # leave-one-out always has train rows
    # timestamps are a global total order
    assert (np.diff(df[DEFAULT_TIMESTAMP_COL].to_numpy()) > 0).all()


def test_structured_data_has_planted_block_structure():
    """Items co-consumed by a user concentrate in few groups (the MF signal):
    a user's items should hit far fewer distinct popularity-rank-mod-groups
    than uniform sampling would."""
    n_groups = 8
    df = generate_structured_data(
        n_users=100, n_items=400, n_interactions=6_000, n_groups=n_groups,
        affinity=0.9, markov=0.0, seed=3,
    )
    # reconstruct the group assignment the generator used
    rng = np.random.default_rng(3)
    item_rank = rng.permutation(400)
    group_of_item = item_rank % n_groups
    per_user_home_share = []
    for u, items in df.groupby(DEFAULT_USER_COL)[DEFAULT_ITEM_COL]:
        groups = group_of_item[items.to_numpy()]
        per_user_home_share.append(np.bincount(groups, minlength=n_groups).max() / len(groups))
    # affinity 0.9 -> the modal group holds most of each user's items
    # (uniform would give ~1/8 = 0.125)
    assert np.mean(per_user_home_share) > 0.5


def test_structured_data_deterministic():
    a = generate_structured_data(n_users=50, n_items=100, n_interactions=2_000, seed=11)
    b = generate_structured_data(n_users=50, n_items=100, n_interactions=2_000, seed=11)
    assert a.equals(b)
