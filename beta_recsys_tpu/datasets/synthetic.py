"""Synthetic dataset adapters: offline interactions for demos/tests/parity.

Two generators:
- ``generate_random_data`` (wrapped by ``Synthetic``) — uniform noise, the
  reference's test fixture (data_split.py:730-750). Good for pipeline smoke
  tests; models cannot LEARN from it.
- ``generate_structured_data`` (wrapped by ``SyntheticStructured``) — a
  power-law, block-structured world with planted preference and sequence
  dynamics, built for the quality-parity harness (examples/parity_check.py):
  zipf user activity + zipf item popularity (like real recsys data), G latent
  groups with user->group affinity (MF/graph signal), and Markov group
  persistence along each user's timeline (sequential signal for SASRec/NARM).
  A learning regression that uniform noise can't catch shows up here as a
  drop in ndcg/recall lift over the closed-form random baseline.
"""

import numpy as np
import pandas as pd

from ..utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)
from .data_split import generate_random_data
from .dataset_base import DatasetBase


def generate_structured_data(
    n_users=943,
    n_items=1682,
    n_interactions=100_000,
    n_groups=8,
    zipf_user=1.1,
    zipf_item=1.05,
    affinity=0.75,
    markov=0.6,
    min_per_user=5,
    seed=2020,
):
    """Power-law, block-structured implicit interactions (ml-100k shaped).

    Construction:
    - items get zipf popularity weights by rank; ranks round-robin into
      ``n_groups`` groups so every group spans the popularity spectrum;
    - users get zipf activity (interaction counts, floored at
      ``min_per_user`` so leave-one-out always has train rows);
    - each user walks a Markov chain over groups: stay in the current group
      w.p. ``markov``, else return home w.p. ``affinity``, else jump uniformly
      — items sample from the chosen group's popularity distribution without
      within-user repeats;
    - timestamps interleave users globally while preserving each user's
      per-step order (valid for both leave-one-out and temporal splits).
    """
    rng = np.random.default_rng(seed)

    # item popularity + group assignment (round-robin by rank: every group
    # spans the popularity spectrum)
    item_rank = rng.permutation(n_items)
    pop = 1.0 / (item_rank + 1.0) ** zipf_item
    group_of_item = item_rank % n_groups
    log_pop = np.log(pop)

    # user activity: shifted zipf (ml-100k-like: heavy but bounded head),
    # one redistribution pass returns the mass the per-user cap clips off
    user_rank = rng.permutation(n_users)
    act = 1.0 / (user_rank + 10.0) ** zipf_user
    cap = max(n_items // 4, min_per_user + 1)
    counts = np.clip(
        np.round(act / act.sum() * n_interactions).astype(int), min_per_user, cap
    )
    deficit = n_interactions - counts.sum()
    if deficit > 0:
        room = cap - counts
        add = np.minimum(np.round(room / max(room.sum(), 1) * deficit).astype(int), room)
        counts += add
    home = rng.integers(0, n_groups, n_users)

    users_out, items_out, steps_out = [], [], []
    for u in range(n_users):
        c = int(counts[u])
        # group walk: stay w.p. markov, else home w.p. affinity, else jump
        stay = rng.random(c) < markov
        to_home = rng.random(c) < affinity
        jumps = rng.integers(0, n_groups, c)
        g = np.empty(c, dtype=np.int64)
        cur = home[u]
        for t in range(c):
            if not stay[t]:
                cur = home[u] if to_home[t] else jumps[t]
            g[t] = cur
        # popularity-weighted sampling WITHOUT within-user replacement via the
        # Gumbel top-k trick: one key per item, each group's items consumed in
        # descending-key order as the walk visits that group
        keys = log_pop + rng.gumbel(size=n_items)
        pref_order = np.argsort(-keys)
        pref_groups = group_of_item[pref_order]
        per_group = [pref_order[pref_groups == gg] for gg in range(n_groups)]
        taken = np.zeros(n_groups, dtype=np.int64)
        its = np.empty(c, dtype=np.int64)
        for t in range(c):
            gg = g[t]
            if taken[gg] >= len(per_group[gg]):  # group exhausted: next-best group
                gg = int(np.argmin(taken / np.maximum(
                    [len(p) for p in per_group], 1)))
                g[t] = gg
            its[t] = per_group[gg][taken[gg]]
            taken[gg] += 1
        users_out.append(np.full(c, u, dtype=np.int64))
        items_out.append(its)
        steps_out.append(np.arange(c, dtype=np.int64))

    users = np.concatenate(users_out)
    items = np.concatenate(items_out)
    steps = np.concatenate(steps_out)
    # interleave: order by (per-user step, random tiebreak) -> global timestamps
    order = np.lexsort((rng.random(len(users)), steps))
    return pd.DataFrame(
        {
            DEFAULT_USER_COL: users[order],
            DEFAULT_ITEM_COL: items[order],
            DEFAULT_RATING_COL: np.ones(len(users), dtype=np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(len(users), dtype=np.int64),
        }
    )


class Synthetic(DatasetBase):
    """Random implicit-feedback interactions with basket structure."""

    def __init__(self, dataset_name="synthetic", min_u_c=0, min_i_c=0, root_dir=None,
                 n_interactions=20_000, n_users=300, n_items=400, seed=42):
        super().__init__(
            dataset_name=dataset_name,
            min_u_c=min_u_c,
            min_i_c=min_i_c,
            root_dir=root_dir,
            url=None,
            tips="synthetic dataset generates itself; no download needed",
        )
        self.n_interactions = n_interactions
        self.n_users = n_users
        self.n_items = n_items
        self.seed = seed

    def download(self):
        pass  # nothing to download

    def preprocess(self):
        data = generate_random_data(
            self.n_interactions, self.n_users, self.n_items, seed=self.seed
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class SyntheticStructured(DatasetBase):
    """Power-law block-structured interactions (the parity-harness dataset)."""

    def __init__(self, dataset_name="synthetic_structured", min_u_c=0, min_i_c=0,
                 root_dir=None, n_interactions=100_000, n_users=943, n_items=1682,
                 seed=2020, **gen_kwargs):
        super().__init__(
            dataset_name=dataset_name,
            min_u_c=min_u_c,
            min_i_c=min_i_c,
            root_dir=root_dir,
            url=None,
            tips="synthetic dataset generates itself; no download needed",
        )
        self.n_interactions = n_interactions
        self.n_users = n_users
        self.n_items = n_items
        self.seed = seed
        self.gen_kwargs = gen_kwargs

    def download(self):
        pass  # nothing to download

    def preprocess(self):
        data = generate_structured_data(
            n_users=self.n_users,
            n_items=self.n_items,
            n_interactions=self.n_interactions,
            seed=self.seed,
            **self.gen_kwargs,
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


def add_synthetic_baskets(df, basket_size=5):
    """Attach a deterministic order/basket column to an interaction frame.

    Groups each user's interactions (timestamp order) into consecutive
    baskets of ``basket_size``. Used by the head-to-head harness so basket
    models (Triple2vec) can run on the structured synthetic split with an
    identical basket structure on both frameworks.
    """
    from ..utils.constants import DEFAULT_ORDER_COL, DEFAULT_TIMESTAMP_COL

    df = df.copy()
    rank = (
        df.sort_values(DEFAULT_TIMESTAMP_COL)
        .groupby(DEFAULT_USER_COL)
        .cumcount()
    )
    df[DEFAULT_ORDER_COL] = (
        df[DEFAULT_USER_COL].to_numpy(np.int64) * 100_000
        + (rank.reindex(df.index).to_numpy(np.int64) // basket_size)
    )
    return df
