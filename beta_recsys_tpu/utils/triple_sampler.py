"""Basket (user, item_i, item_j) triple sampling for grocery models
(Triple2vec / VBCAR / TVBR).

Reference semantics: beta_rec/utils/triple_sampler.py:16-141 — sample baskets
(order, user) uniformly, then two items (with replacement) from each sampled
basket; the time-bucketed variant splits baskets into ``time_step`` temporal
buckets by mean order timestamp and samples per bucket. This version is fully
vectorized (no per-row Python loop) and keeps the CSV cache contract
(columns UID, PID1, PID2[, T]).
"""

import os

import numpy as np
import pandas as pd

from .constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_ORDER_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


def _basket_arrays(df_train):
    """Return (basket_user, flat_items, basket_offsets, basket_lengths, order of baskets).

    Baskets are (order, user) groups ordered by groupby key, matching the
    reference's ``groupby([order, user]).apply(list)``.
    """
    grouped = df_train.groupby([DEFAULT_ORDER_COL, DEFAULT_USER_COL], sort=True)
    users, lengths, items_flat, order_ids = [], [], [], []
    for (oid, uid), group in grouped:
        users.append(uid)
        order_ids.append(oid)
        its = group[DEFAULT_ITEM_COL].to_numpy()
        lengths.append(len(its))
        items_flat.append(its)
    lengths = np.asarray(lengths, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    return (
        np.asarray(users),
        np.concatenate(items_flat) if items_flat else np.array([], dtype=np.int64),
        offsets,
        lengths,
        np.asarray(order_ids),
    )


def _sample_from_baskets(users, flat_items, offsets, lengths, basket_idx, rng):
    """Vectorized: pick two items (with replacement) from each indexed basket."""
    li = lengths[basket_idx]
    off = offsets[basket_idx]
    i_pos = off + (rng.random(len(basket_idx)) * li).astype(np.int64)
    j_pos = off + (rng.random(len(basket_idx)) * li).astype(np.int64)
    return users[basket_idx], flat_items[i_pos], flat_items[j_pos]


class Sampler:
    """Generate and cache basket triples for grocery-model training."""

    def __init__(self, df_train, sample_file, n_sample, dump=True, load_save=False, seed=None):
        self.sample_file = sample_file
        self.df_train = df_train
        self.n_sample = n_sample
        self.dump = dump
        self.load_save = load_save
        self.rng = np.random.default_rng(seed)

    def sample(self):
        """Uniformly sample ``n_sample`` (user, item, item) triples over baskets."""
        if self.load_save and os.path.exists(self.sample_file):
            return self.load_triples_from_file(self.sample_file)
        users, flat_items, offsets, lengths, _ = _basket_arrays(self.df_train)
        basket_idx = self.rng.integers(0, len(lengths), size=self.n_sample)
        u, i, j = _sample_from_baskets(users, flat_items, offsets, lengths, basket_idx, self.rng)
        triple_df = pd.DataFrame({"UID": u, "PID1": i, "PID2": j})
        if self.dump:
            triple_df.to_csv(self.sample_file, index=False)
        return triple_df

    def sample_by_time(self, time_step):
        """Time-bucketed triples: baskets sorted by mean timestamp, split into
        ``time_step`` buckets, ``n_sample/time_step`` triples drawn per bucket."""
        if self.load_save and os.path.exists(self.sample_file):
            return self.load_triples_from_file(self.sample_file)
        if time_step == 0:
            return self.sample()
        users, flat_items, offsets, lengths, order_ids = _basket_arrays(self.df_train)
        order_ts = (
            self.df_train.groupby(DEFAULT_ORDER_COL)[DEFAULT_TIMESTAMP_COL]
            .mean()
            .reindex(order_ids)
            .to_numpy()
        )
        time_order = np.argsort(order_ts, kind="stable")
        n_orders = len(lengths)
        n_per_t = n_orders // time_step
        n_sample_per_t = self.n_sample // time_step
        rest = n_orders - time_step * n_per_t

        all_u, all_i, all_j, all_t = [], [], [], []
        for t in range(time_step):
            if t == 0:
                lo, hi = 0, rest
            else:
                lo = t * n_per_t + rest
                hi = (t + 1) * n_per_t + rest
            if hi <= lo:
                continue
            pick = self.rng.integers(lo, hi, size=n_sample_per_t)
            basket_idx = time_order[pick]
            u, i, j = _sample_from_baskets(users, flat_items, offsets, lengths, basket_idx, self.rng)
            all_u.append(u)
            all_i.append(i)
            all_j.append(j)
            all_t.append(np.full(len(u), t, dtype=np.int64))
        triple_df = pd.DataFrame(
            {
                "UID": np.concatenate(all_u),
                "PID1": np.concatenate(all_i),
                "PID2": np.concatenate(all_j),
                "T": np.concatenate(all_t),
            }
        )
        if self.dump:
            triple_df.to_csv(self.sample_file, index=False)
        return triple_df

    def load_triples_from_file(self, triple_file):
        """Load cached triples from CSV."""
        return pd.read_csv(triple_file)
