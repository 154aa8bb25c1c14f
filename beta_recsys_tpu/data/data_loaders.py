"""Host-side batch iterators mirroring the reference DataLoader factories.

Reference parity: beta_rec/data/base_data.py:182-289 + data/data_loaders.py —
``instance_bce_loader`` (pointwise with per-user sampled negatives),
``instance_bpr_loader`` (pairwise triplets), ``instance_mul_neg_loader``.

Note: the jitted engines do NOT use these — batching/shuffling/negatives run
inside the compiled epoch (core.train_engine). These iterators exist for API
parity and for host-side experimentation; they yield numpy arrays.
"""

import numpy as np

from ..utils.constants import DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_USER_COL


class RatingDataset:
    """Aligned (user, item, rating) arrays (reference data_loaders.py:4)."""

    def __init__(self, users, items, ratings):
        self.users = np.asarray(users, dtype=np.int64)
        self.items = np.asarray(items, dtype=np.int64)
        self.ratings = np.asarray(ratings, dtype=np.float32)

    def __len__(self):
        return len(self.users)

    def __getitem__(self, idx):
        return self.users[idx], self.items[idx], self.ratings[idx]


class PairwiseNegativeDataset:
    """Aligned (user, pos_item, neg_item) arrays (reference data_loaders.py:30)."""

    def __init__(self, users, pos_items, neg_items):
        self.users = np.asarray(users, dtype=np.int64)
        self.pos_items = np.asarray(pos_items, dtype=np.int64)
        self.neg_items = np.asarray(neg_items, dtype=np.int64)

    def __len__(self):
        return len(self.users)

    def __getitem__(self, idx):
        return self.users[idx], self.pos_items[idx], self.neg_items[idx]


def _batched(arrays, batch_size, shuffle, rng):
    n = len(arrays[0])
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    for start in range(0, n, batch_size):
        b = idx[start : start + batch_size]
        yield tuple(a[b] for a in arrays)


def instance_bpr_loader(data, batch_size, rng=None, num_rounds=1):
    """Yield (users, pos_items, neg_items) batches with uniform negatives
    rejected against each user's positives."""
    rng = rng or np.random.default_rng()
    users = data.train[DEFAULT_USER_COL].to_numpy(np.int64)
    pos = data.train[DEFAULT_ITEM_COL].to_numpy(np.int64)
    mask = data.pos_bitmask()
    neg = rng.integers(0, data.n_items, len(users))
    for _ in range(num_rounds):
        collide = mask[users, neg]
        neg = np.where(collide, rng.integers(0, data.n_items, len(users)), neg)
    return _batched((users, pos, neg.astype(np.int64)), batch_size, True, rng)


def instance_bce_loader(data, num_negative, batch_size, rng=None):
    """Yield (users, items, labels) with num_negative sampled negatives per
    positive interaction."""
    rng = rng or np.random.default_rng()
    users = data.train[DEFAULT_USER_COL].to_numpy(np.int64)
    pos = data.train[DEFAULT_ITEM_COL].to_numpy(np.int64)
    ratings = data.train[DEFAULT_RATING_COL].to_numpy(np.float32)
    mask = data.pos_bitmask()
    rep_users = np.repeat(users, num_negative)
    neg = rng.integers(0, data.n_items, len(rep_users))
    collide = mask[rep_users, neg]
    neg = np.where(collide, rng.integers(0, data.n_items, len(rep_users)), neg)
    all_users = np.concatenate([users, rep_users])
    all_items = np.concatenate([pos, neg])
    all_labels = np.concatenate([ratings, np.zeros(len(neg), np.float32)])
    return _batched((all_users, all_items, all_labels), batch_size, True, rng)


def instance_vae_loader(data, batch_size, rng=None, shuffle=True):
    """Yield (user_ids, dense user×item rows) batches for VAECF.

    Reference parity: instance_vae_loader (beta_rec/data/base_data.py:513-532)
    builds a binarized user×item CSR and batches user rows. Here each batch is
    densified on demand (float32) so the jitted VAE step sees fixed-shape
    device arrays; the full matrix never materializes for large catalogs.
    """
    rng = rng or np.random.default_rng()
    csr = data.user_item_csr()
    csr.data[:] = 1.0
    order = np.arange(data.n_users)
    if shuffle:
        rng.shuffle(order)
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        yield idx.astype(np.int32), np.asarray(csr[idx].todense(), dtype=np.float32)


def instance_mul_neg_loader(data, num_negative, batch_size, rng=None):
    """Yield (users, pos_items, neg_items (B, num_negative)) batches."""
    rng = rng or np.random.default_rng()
    users = data.train[DEFAULT_USER_COL].to_numpy(np.int64)
    pos = data.train[DEFAULT_ITEM_COL].to_numpy(np.int64)
    mask = data.pos_bitmask()
    neg = rng.integers(0, data.n_items, (len(users), num_negative))
    collide = mask[users[:, None], neg]
    neg = np.where(collide, rng.integers(0, data.n_items, neg.shape), neg)
    return _batched((users, pos, neg), batch_size, True, rng)
