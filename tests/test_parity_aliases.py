"""Parity tests for reference-named compatibility surfaces added late:

get_adj_mat (disk-cached triple), get_constraint_mat alias, evaluate_data
(pointwise positives+negatives frame), instance_vae_loader (dense user rows),
seq collate_fn (pad + length-sort), lru_cache_df/PandasHash (DataFrame memo).
"""

import numpy as np
import pandas as pd

from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.data.data_loaders import instance_vae_loader
from beta_recsys_tpu.datasets.seq_data_utils import collate_fn
from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)
from beta_recsys_tpu.utils.evaluation import PandasHash, lru_cache_df


def _tiny_data(n_users=12, n_items=20, n=200, seed=0):
    rng = np.random.default_rng(seed)
    train = pd.DataFrame(
        {
            DEFAULT_USER_COL: rng.integers(0, n_users, n),
            DEFAULT_ITEM_COL: rng.integers(0, n_items, n),
            DEFAULT_RATING_COL: np.ones(n, np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(n),
        }
    )
    test = pd.DataFrame(
        {
            DEFAULT_USER_COL: np.arange(n_users),
            DEFAULT_ITEM_COL: rng.integers(0, n_items, n_users),
            DEFAULT_RATING_COL: np.ones(n_users, np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(n_users),
        }
    )
    return BaseData((train, [test], [test]), intersect=False)


def test_get_adj_mat_matches_create_and_caches(tmp_path):
    data = _tiny_data()
    adj, norm, mean = data.create_adj_mat()
    cfg = {"dataset": {"dataset": "tiny", "data_split": "loo"}}
    a2, n2, m2 = data.get_adj_mat(cfg, cache_dir=str(tmp_path))
    assert (adj != a2).nnz == 0 and (norm != n2).nnz == 0 and (mean != m2).nnz == 0
    # Second call loads from the npz cache and must round-trip exactly.
    a3, n3, m3 = data.get_adj_mat(cfg, cache_dir=str(tmp_path))
    assert (adj != a3).nnz == 0 and (norm != n3).nnz == 0 and (mean != m3).nnz == 0
    assert list(tmp_path.glob("ngcf_tiny_loo_adj.npz"))


def test_get_constraint_mat_alias():
    data = _tiny_data()
    (m1, u1, i1), (m2, u2, i2) = data.create_constraint_mat(), data.get_constraint_mat()
    np.testing.assert_allclose(u1, u2)
    np.testing.assert_allclose(i1, i2)
    assert (m1 != m2).nnz == 0


def test_evaluate_data_shape_and_exclusions():
    data = _tiny_data()
    n_neg = 7
    df = data.evaluate_data(n_negative=n_neg)
    pos = df[df[DEFAULT_RATING_COL] == 1]
    neg = df[df[DEFAULT_RATING_COL] == 0]
    assert len(neg) == n_neg * len(pos)
    # Negatives never collide with train positives or the eval positive.
    train_pairs = set(
        zip(
            data.train[DEFAULT_USER_COL].to_numpy().tolist(),
            data.train[DEFAULT_ITEM_COL].to_numpy().tolist(),
        )
    )
    pos_pairs = set(
        zip(pos[DEFAULT_USER_COL].tolist(), pos[DEFAULT_ITEM_COL].tolist())
    )
    neg_pairs = set(
        zip(neg[DEFAULT_USER_COL].tolist(), neg[DEFAULT_ITEM_COL].tolist())
    )
    assert not (neg_pairs & train_pairs) and not (neg_pairs & pos_pairs)


def test_instance_vae_loader_rows_match_csr():
    data = _tiny_data()
    csr = data.user_item_csr()
    csr.data[:] = 1.0
    seen = np.zeros(data.n_users, bool)
    for uids, rows in instance_vae_loader(data, batch_size=5, rng=np.random.default_rng(1)):
        assert rows.shape == (len(uids), data.n_items) and rows.dtype == np.float32
        np.testing.assert_allclose(rows, np.asarray(csr[uids].todense()))
        seen[uids] = True
    assert seen.all()


def test_collate_fn_pads_and_sorts():
    batch = [([1, 2], 3), ([4, 5, 6, 7], 8), ([9], 10)]
    padded, lengths, targets = collate_fn(batch)
    assert padded.shape == (3, 4)
    np.testing.assert_array_equal(lengths, [4, 2, 1])
    np.testing.assert_array_equal(targets, [8, 3, 10])
    np.testing.assert_array_equal(padded[0], [4, 5, 6, 7])
    np.testing.assert_array_equal(padded[1], [1, 2, 0, 0])


def test_lru_cache_df_hits_on_equal_frames():
    calls = {"n": 0}

    @lru_cache_df(maxsize=8)
    def f(df, k=1):
        calls["n"] += 1
        return float(df.to_numpy().sum()) * k

    a = pd.DataFrame({"x": [1, 2, 3]})
    b = pd.DataFrame({"x": [1, 2, 3]})  # equal content, different object
    assert f(a) == f(b) == 6.0
    assert calls["n"] == 1
    assert f(a, k=2) == 12.0 and calls["n"] == 2
    assert hash(PandasHash(a)) == hash(PandasHash(b))
