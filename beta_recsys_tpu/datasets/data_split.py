"""Dataset split strategies, k-core filtering, and evaluation negative sampling.

Behavioral parity surface with the reference (beta_rec/datasets/data_split.py):
six split strategies labeling a ``col_flag`` column (random, random_basket,
leave_one_out, leave_one_basket, temporal, temporal_basket), iterative k-core
filters, per-user negative sampling of evaluation candidates via an alias table,
and the npz split cache. All per-user Python loops in the reference are
vectorized here with pandas/numpy group operations.

The ``shuffle`` symbol is module-level so tests can patch it for determinism,
mirroring the reference test strategy (tests/test_data_split.py:305-320).
"""

import math
import os

import numpy as np
import pandas as pd
from sklearn.utils import shuffle  # patchable seam for deterministic tests

from ..utils.alias_table import AliasTable
from ..utils.common import get_dataframe_from_npz, save_dataframe_as_npz
from ..utils.constants import (
    DEFAULT_FLAG_COL,
    DEFAULT_ITEM_COL,
    DEFAULT_ORDER_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


def filter_by_count(df, group_col, filter_col, num):
    """Keep rows whose ``group_col`` value has >= ``num`` unique ``filter_col`` values."""
    counts = df.groupby(group_col)[filter_col].nunique()
    keep = counts[counts >= num].index
    return df[df[group_col].isin(keep)]


def check_data_available(data):
    """Raise if the filtered dataset has no interactions left."""
    if len(data.index) < 1:
        raise RuntimeError(
            "This dataset contains no interaction after filtering. "
            "Please check the default filter setup of this split!"
        )


def _kcore_native(df, min_u_c, min_i_c, min_o_c):
    """C++ fast path for the distinct-count k-core; None when unavailable.

    The iterative filter has a unique maximal fixed point (a violating row's
    counts can only decrease, so it can never re-qualify) — removal order
    does not matter, making the simultaneous-removal C++ kernel exactly
    equivalent to the sequential pandas loop.
    """
    from .. import native

    if not native.available():
        return None
    u_codes, u_uniq = pd.factorize(df[DEFAULT_USER_COL])
    i_codes, i_uniq = pd.factorize(df[DEFAULT_ITEM_COL])
    pair_ids, pair_uniq = pd.factorize(
        u_codes.astype(np.int64) * len(i_uniq) + i_codes
    )
    uo_ids, n_uos = None, 0
    if min_o_c > 0:
        o_codes, o_uniq = pd.factorize(df[DEFAULT_ORDER_COL])
        uo_ids, uo_uniq = pd.factorize(
            u_codes.astype(np.int64) * len(o_uniq) + o_codes
        )
        n_uos = len(uo_uniq)
    keep = native.kcore_filter_distinct(
        u_codes, i_codes, pair_ids, uo_ids,
        len(u_uniq), len(i_uniq), len(pair_uniq), n_uos,
        min_u_c, min_i_c, min_o_c,
    )
    return df[keep]


def filter_user_item(df, min_u_c=5, min_i_c=5, use_native=True):
    """Iterative k-core filter: users with >= min_i_c items, items with >= min_u_c users.

    Iterates to a fixed point (removing users can invalidate items and vice versa).
    Reference: beta_rec/datasets/data_split.py:63-115. With the native host
    library the whole iteration runs in C++ (one pass over int arrays per
    round vs a pandas groupby-nunique per filter per round).
    """
    if use_native:
        fast = _kcore_native(df, min_u_c, min_i_c, 0)
        if fast is not None:
            check_data_available(fast)
            return fast
    n_interact = len(df.index)
    while True:
        if min_i_c > 0:
            df = filter_by_count(df, DEFAULT_USER_COL, DEFAULT_ITEM_COL, min_i_c)
        if min_u_c > 0:
            df = filter_by_count(df, DEFAULT_ITEM_COL, DEFAULT_USER_COL, min_u_c)
        new_n = len(df.index)
        if new_n == n_interact:
            break
        n_interact = new_n
    check_data_available(df)
    return df


def filter_user_item_order(df, min_u_c=5, min_i_c=5, min_o_c=5, use_native=True):
    """k-core filter additionally requiring users to have >= min_o_c orders.

    Reference: beta_rec/datasets/data_split.py:118-177.
    """
    if use_native:
        fast = _kcore_native(df, min_u_c, min_i_c, min_o_c)
        if fast is not None:
            check_data_available(fast)
            return fast
    n_interact = len(df.index)
    while True:
        if min_o_c > 0:
            df = filter_by_count(df, DEFAULT_USER_COL, DEFAULT_ORDER_COL, min_o_c)
        if min_i_c > 0:
            df = filter_by_count(df, DEFAULT_USER_COL, DEFAULT_ITEM_COL, min_i_c)
        if min_u_c > 0:
            df = filter_by_count(df, DEFAULT_ITEM_COL, DEFAULT_USER_COL, min_u_c)
        new_n = len(df.index)
        if new_n == n_interact:
            break
        n_interact = new_n
    check_data_available(df)
    return df


def feed_neg_sample(data, negative_num, item_sampler, use_native=True):
    """Append sampled negative items (rating 0) to an evaluation split.

    For each user: keep their positive items (unique), then sample
    ``negative_num`` negatives from ``item_sampler`` excluding the positives
    (alias draws of negative_num + n_pos unique items, positives removed,
    truncated — reference semantics beta_rec/datasets/data_split.py:180-243).
    With ``negative_num < 0`` all non-interacted items become negatives.
    The returned frame is shuffled.

    When the native host library is available and ratings are implicit, the
    per-user draw loop runs in C++ (beta_recsys_tpu/native/betarec_host.cc).
    """
    if use_native and negative_num > 0 and data[DEFAULT_RATING_COL].nunique() == 1:
        fast = _feed_neg_sample_native(data, negative_num, item_sampler)
        if fast is not None:
            return fast
    unique_item_arr = data[DEFAULT_ITEM_COL].unique()
    unique_rating_num = data[DEFAULT_RATING_COL].nunique()
    user_groups = data.groupby(DEFAULT_USER_COL)

    users_out, items_out, ratings_out = [], [], []
    for u, group in user_groups:
        if unique_rating_num != 1:
            # Keep the first-seen rating per unique positive item.
            pos_df = group.drop_duplicates(DEFAULT_ITEM_COL)
            pos_items = pos_df[DEFAULT_ITEM_COL].to_numpy()
            pos_ratings = pos_df[DEFAULT_RATING_COL].to_numpy()
        else:
            pos_items = pd.unique(group[DEFAULT_ITEM_COL])
            pos_ratings = np.ones(len(pos_items))
        pos_set = set(pos_items.tolist())
        n_pos = len(pos_items)

        if negative_num < 0:
            neg_items = np.asarray(
                [it for it in unique_item_arr if it not in pos_set]
            )
        else:
            draws = item_sampler.sample(negative_num + n_pos, 1, True)
            neg_items = np.asarray([d for d in draws if d not in pos_set][:negative_num])
        n_neg = len(neg_items)

        users_out.append(np.full(n_pos + n_neg, u))
        items_out.append(np.concatenate([pos_items, neg_items]))
        ratings_out.append(np.concatenate([pos_ratings, np.zeros(n_neg)]))

    total = pd.DataFrame(
        {
            DEFAULT_USER_COL: np.concatenate(users_out),
            DEFAULT_ITEM_COL: np.concatenate(items_out),
            DEFAULT_RATING_COL: np.concatenate(ratings_out),
        }
    )
    return shuffle(total)


def _feed_neg_sample_native(data, negative_num, item_sampler):
    """C++ fast path for implicit-feedback splits; None if unavailable."""
    from .. import native

    if not native.available():
        return None
    labels = np.asarray(item_sampler.index2Label, dtype=np.int64)
    # Unique positives per user (reference drops duplicate positives via set()).
    dedup = data[[DEFAULT_USER_COL, DEFAULT_ITEM_COL]].drop_duplicates()
    users = dedup[DEFAULT_USER_COL].to_numpy()
    items = dedup[DEFAULT_ITEM_COL].to_numpy(dtype=np.int64)
    uniq_users, inv = np.unique(users, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    sorted_items = items[order]
    counts = np.bincount(inv, minlength=len(uniq_users))
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    try:
        negs = native.feed_neg_batch(
            indptr, sorted_items, item_sampler.prob_arr, item_sampler.alias_arr,
            labels, negative_num, seed=np.random.randint(2**31),
        )
    except RuntimeError:
        return None  # fall back to the truncating Python path
    total = pd.DataFrame(
        {
            DEFAULT_USER_COL: np.concatenate(
                [users, np.repeat(uniq_users, negative_num)]
            ),
            DEFAULT_ITEM_COL: np.concatenate([items, negs.reshape(-1)]),
            DEFAULT_RATING_COL: np.concatenate(
                [np.ones(len(users)), np.zeros(negs.size)]
            ),
        }
    )
    return shuffle(total)


def random_split(data, test_rate=0.1, by_user=False):
    """Random split: last ceil(n*test_rate) shuffled rows → test, prior block → validate.

    Reference: beta_rec/datasets/data_split.py:356-407.
    """
    data[DEFAULT_FLAG_COL] = "train"
    if by_user:
        for _, group in data.groupby(DEFAULT_USER_COL):
            idx = shuffle(group.index.values)
            _assign_tail_flags(data, idx, test_rate)
    else:
        idx = shuffle(data.index.values)
        _assign_tail_flags(data, idx, test_rate)
    return data


def _assign_tail_flags(data, ordered_index, test_rate):
    """Label the tail of an ordered index array: test then validate before it."""
    total = len(ordered_index)
    validate_size = math.ceil(total * test_rate)
    test_size = math.ceil(total * test_rate)
    train_size = total - test_size
    data.loc[ordered_index[train_size:], DEFAULT_FLAG_COL] = "test"
    data.loc[
        ordered_index[train_size - validate_size : train_size], DEFAULT_FLAG_COL
    ] = "validate"


def _assign_basket_tail_flags(data, ordered_orders, test_rate, user_mask=None):
    """Label rows whose order id falls in the tail of an ordered order-id array."""
    total = len(ordered_orders)
    validate_size = math.ceil(total * test_rate)
    test_size = math.ceil(total * test_rate)
    train_size = total - test_size
    test_orders = set(ordered_orders[train_size:])
    valid_orders = set(ordered_orders[train_size - validate_size : train_size])
    in_scope = data[DEFAULT_ORDER_COL].isin(test_orders)
    if user_mask is not None:
        in_scope &= user_mask
    data.loc[in_scope, DEFAULT_FLAG_COL] = "test"
    in_scope = data[DEFAULT_ORDER_COL].isin(valid_orders)
    if user_mask is not None:
        in_scope &= user_mask
    data.loc[in_scope, DEFAULT_FLAG_COL] = "validate"


def random_basket_split(data, test_rate=0.1, by_user=False):
    """Random split at basket (order) granularity.

    Reference: beta_rec/datasets/data_split.py:409-463.
    """
    data[DEFAULT_FLAG_COL] = "train"
    if by_user:
        for u, group in data.groupby(DEFAULT_USER_COL):
            orders = shuffle(group[DEFAULT_ORDER_COL].unique())
            _assign_basket_tail_flags(data, orders, test_rate)
    else:
        orders = shuffle(data[DEFAULT_ORDER_COL].unique())
        _assign_basket_tail_flags(data, orders, test_rate)
    return data


def leave_one_out(data, random=False):
    """Hold out each user's most recent item as test, second most recent as validate.

    Vectorized: sort by timestamp descending (or shuffle when ``random``), then
    the first two rows per user get flags. Reference: data_split.py:465-490.
    """
    data[DEFAULT_FLAG_COL] = "train"
    if random:
        data = shuffle(data)
    else:
        data.sort_values(by=[DEFAULT_TIMESTAMP_COL], ascending=False, inplace=True)
    data.loc[data.groupby(DEFAULT_USER_COL).head(2).index, DEFAULT_FLAG_COL] = "validate"
    data.loc[data.groupby(DEFAULT_USER_COL).head(1).index, DEFAULT_FLAG_COL] = "test"
    return data


def leave_one_basket(data, random=False):
    """Hold out each user's last basket as test, second-to-last as validate.

    Vectorized over (user, order) first-appearance order in timestamp-sorted data.
    Reference: data_split.py:493-518.
    """
    data[DEFAULT_FLAG_COL] = "train"
    if random:
        data = shuffle(data)
    else:
        data.sort_values(by=[DEFAULT_TIMESTAMP_COL], inplace=True)

    # First appearance of each (user, order) in the sorted frame gives the
    # per-user basket order; rank from the end to find last / second-to-last.
    firsts = data.drop_duplicates([DEFAULT_USER_COL, DEFAULT_ORDER_COL])[
        [DEFAULT_USER_COL, DEFAULT_ORDER_COL]
    ].copy()
    firsts["_pos_from_end"] = firsts.groupby(DEFAULT_USER_COL).cumcount(ascending=False)
    flag_map = firsts[firsts["_pos_from_end"] <= 1].copy()
    flag_map[DEFAULT_FLAG_COL] = np.where(
        flag_map["_pos_from_end"] == 0, "test", "validate"
    )
    merged = data.merge(
        flag_map[[DEFAULT_USER_COL, DEFAULT_ORDER_COL, DEFAULT_FLAG_COL]],
        on=[DEFAULT_USER_COL, DEFAULT_ORDER_COL],
        how="left",
        suffixes=("", "_new"),
    )
    merged.index = data.index
    new_flag = merged[DEFAULT_FLAG_COL + "_new"]
    data.loc[new_flag.notna().values, DEFAULT_FLAG_COL] = new_flag.dropna().values
    return data


def temporal_split(data, test_rate=0.1, by_user=False):
    """Chronological split: newest ceil(n*test_rate) rows → test, prior → validate.

    Reference: data_split.py:520-571.
    """
    data[DEFAULT_FLAG_COL] = "train"
    data.sort_values(by=[DEFAULT_TIMESTAMP_COL], inplace=True)
    if by_user:
        for _, group in data.groupby(DEFAULT_USER_COL, sort=False):
            _assign_tail_flags(data, group.index.values, test_rate)
    else:
        _assign_tail_flags(data, data.index.values, test_rate)
    return data


def temporal_basket_split(data, test_rate=0.1, by_user=False):
    """Chronological split at basket granularity.

    Reference: data_split.py:573-626.
    """
    data[DEFAULT_FLAG_COL] = "train"
    data.sort_values(by=[DEFAULT_TIMESTAMP_COL], inplace=True)
    if by_user:
        for u, group in data.groupby(DEFAULT_USER_COL, sort=False):
            orders = pd.unique(group[DEFAULT_ORDER_COL])
            _assign_basket_tail_flags(data, orders, test_rate)
    else:
        orders = pd.unique(data[DEFAULT_ORDER_COL])
        _assign_basket_tail_flags(data, orders, test_rate)
    return data


_SPLIT_FNS = {
    "random": lambda d, tr, rnd, bu: random_split(d, tr, bu),
    "random_basket": lambda d, tr, rnd, bu: random_basket_split(d, tr, bu),
    "leave_one_out": lambda d, tr, rnd, bu: leave_one_out(d, rnd),
    "leave_one_basket": lambda d, tr, rnd, bu: leave_one_basket(d, rnd),
    "temporal": lambda d, tr, rnd, bu: temporal_split(d, tr, bu),
    "temporal_basket": lambda d, tr, rnd, bu: temporal_basket_split(d, tr, bu),
}


def generate_parameterized_path(test_rate=0, random=False, n_negative=100, by_user=False):
    """Encode split parameters into a cache sub-directory name.

    Reference: data_split.py:753-780.
    """
    path_str = "user_based" if by_user else "full"
    test_rate = round(test_rate * 100)
    if test_rate != 0:
        path_str += f"_test_rate_{test_rate}"
    if random:
        path_str += "_random"
    path_str += f"_n_neg_{n_negative}"
    return path_str


def save_split_data(data, base_dir, data_split="leave_one_basket", parameterized_dir=None, suffix="train.npz"):
    """Save a split DataFrame under <base_dir>/<split>/<param_dir>/<suffix>."""
    data_dir = os.path.join(base_dir, data_split, parameterized_dir or "")
    os.makedirs(data_dir, exist_ok=True)
    save_dataframe_as_npz(data, os.path.join(data_dir, suffix))


def load_split_data(path, n_test=10):
    """Load cached train/valid/test npz splits.

    With ``n_test == 0`` loads the raw (negative-free) valid/test frames;
    otherwise loads ``n_test`` negative-sampled copies of each.
    """
    train_data = get_dataframe_from_npz(os.path.join(path, "train.npz"))
    if not n_test:
        valid_df = get_dataframe_from_npz(os.path.join(path, "valid.npz"))
        test_df = get_dataframe_from_npz(os.path.join(path, "test.npz"))
        return train_data, valid_df, test_df
    valid_li = [get_dataframe_from_npz(os.path.join(path, f"valid_{i}.npz")) for i in range(n_test)]
    test_li = [get_dataframe_from_npz(os.path.join(path, f"test_{i}.npz")) for i in range(n_test)]
    return train_data, valid_li, test_li


def split_data(
    data,
    split_type,
    test_rate,
    random=False,
    n_negative=100,
    save_dir=None,
    by_user=False,
    n_test=10,
):
    """Run a split strategy, optionally persisting train/valid/test (+ negative copies).

    Returns the flagged DataFrame. Reference: data_split.py:628-727.
    """
    if n_negative < 0 and n_test > 1:
        n_test = 1  # all-negatives mode has a single valid/test copy
    if split_type not in _SPLIT_FNS:
        print("[ERROR] wrong split_type.")
        return None
    data = _SPLIT_FNS[split_type](data, test_rate, random, by_user)

    tp_train = data[data[DEFAULT_FLAG_COL] == "train"]
    tp_validate = data[data[DEFAULT_FLAG_COL] == "validate"]
    tp_test = data[data[DEFAULT_FLAG_COL] == "test"]
    if save_dir is None:
        return data

    parameterized_path = generate_parameterized_path(
        test_rate=test_rate, random=random, n_negative=n_negative, by_user=by_user
    )
    save_split_data(tp_train, save_dir, split_type, parameterized_path, "train.npz")
    save_split_data(tp_validate, save_dir, split_type, parameterized_path, "valid.npz")
    save_split_data(tp_test, save_dir, split_type, parameterized_path, "test.npz")

    item_sampler = AliasTable(data[DEFAULT_ITEM_COL].value_counts().to_dict())
    n_items = tp_train[DEFAULT_ITEM_COL].nunique()
    valid_neg_max = tp_validate.groupby(DEFAULT_USER_COL)[DEFAULT_ITEM_COL].count().max()
    test_neg_max = tp_test.groupby(DEFAULT_USER_COL)[DEFAULT_ITEM_COL].count().max()
    if n_items - valid_neg_max < n_negative or n_items - test_neg_max < n_negative:
        raise RuntimeError(
            "This dataset do not have sufficient negative items for sampling! \n"
            f"valid_neg_max: {n_items - valid_neg_max}, "
            f"test_neg_max: {n_items - test_neg_max}, "
            f"n_negative: {n_negative}\nPlease directly use valid.npz and test.npz."
        )
    for i in range(n_test):
        tp_validate_new = feed_neg_sample(tp_validate, n_negative, item_sampler)
        tp_test_new = feed_neg_sample(tp_test, n_negative, item_sampler)
        save_split_data(tp_validate_new, save_dir, split_type, parameterized_path, f"valid_{i}.npz")
        save_split_data(tp_test_new, save_dir, split_type, parameterized_path, f"test_{i}.npz")
    return data


def generate_random_data(n_interaction, user_id, item_id, seed=None):
    """Generate a random implicit-feedback interaction frame for tests.

    Reference: data_split.py:730-750 (orders encode both a basket index and the
    user so the basket structure is user-consistent).
    """
    rng = np.random.default_rng(seed)
    order_id = 10
    users = rng.integers(0, user_id, size=n_interaction)
    orders = rng.integers(0, order_id, size=n_interaction) * 100 + users
    timestamps = orders
    items = rng.integers(0, item_id, size=n_interaction)
    ratings = np.ones(n_interaction, dtype=np.int64)
    return pd.DataFrame(
        {
            DEFAULT_USER_COL: users,
            DEFAULT_ORDER_COL: orders,
            DEFAULT_TIMESTAMP_COL: timestamps,
            DEFAULT_ITEM_COL: items,
            DEFAULT_RATING_COL: ratings,
        }
    )
