"""Dataset layer tests: DatasetBase lifecycle on a synthetic adapter, registry,
seq utils. (Network adapters are exercised structurally — no downloads.)"""

import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.datasets import DATASET_REGISTRY, DatasetBase, build_dataset
from beta_recsys_tpu.datasets.data_split import generate_random_data
from beta_recsys_tpu.datasets.seq_data_utils import (
    SeqDataset,
    create_seq_db,
    dataset_to_seq_target_format,
    pad_sequences,
    reindex_items,
)
from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


class SyntheticDataset(DatasetBase):
    """Test adapter: generates random interactions in preprocess."""

    def __init__(self, root_dir):
        super().__init__(dataset_name="synthetic_test", min_i_c=0, root_dir=root_dir)

    def preprocess(self):
        data = generate_random_data(800, 40, 50, seed=3)
        self.save_dataframe_as_npz(data, self.interaction_file())


def test_dataset_lifecycle(tmp_path):
    ds = SyntheticDataset(str(tmp_path))
    # load_interaction triggers preprocess on miss
    inter = ds.load_interaction()
    assert len(inter) > 0
    train, valid_li, test_li = ds.load_leave_one_out(n_negative=10, n_test=2)
    assert len(valid_li) == 2 and len(test_li) == 2
    # cache hit path: no preprocess needed again
    train2, _, _ = ds.load_leave_one_out(n_negative=10, n_test=2)
    assert len(train2) == len(train)
    # temporal split path
    train3, valid3, test3 = ds.load_temporal_split(test_rate=0.2, n_negative=10, n_test=1)
    assert len(train3) > 0


def test_load_split_config_dispatch(tmp_path):
    ds = SyntheticDataset(str(tmp_path))
    cfg = {"dataset": {"data_split": "leave_one_out", "n_negative": 5, "n_test": 1}}
    train, valid_li, test_li = ds.load_split(cfg)
    assert len(valid_li) == 1


def test_registry_complete():
    # All 19 core datasets + amazon categories are registered.
    core = [
        "ml_100k", "ml_1m", "ml_10m", "ml_25m", "dunnhumby", "tafeng",
        "instacart", "instacart_25", "epinions", "last_fm", "yelp", "gowalla",
        "taobao", "ali_mobile", "retailrocket", "yoochoose", "diginetica",
        "citeulike-a", "citeulike-t", "movielens_2k", "delicious-2k", "lastfm-2k",
    ]
    for name in core:
        assert name in DATASET_REGISTRY, name
    assert "amazon_digital_music" in DATASET_REGISTRY
    assert len([k for k in DATASET_REGISTRY if k.startswith("amazon_")]) >= 20


def test_build_dataset(tmp_path):
    cfg = {"dataset": {"dataset": "ml_100k", "root_dir": str(tmp_path)}}
    ds = build_dataset(cfg)
    assert ds.dataset_name == "ml_100k"
    import os

    assert os.path.isdir(ds.raw_path) and os.path.isdir(ds.processed_path)


def test_seq_utils():
    df = pd.DataFrame(
        {
            DEFAULT_USER_COL: [1, 1, 1, 2, 2],
            DEFAULT_ITEM_COL: [100, 200, 300, 100, 300],
            DEFAULT_RATING_COL: [1.0] * 5,
            DEFAULT_TIMESTAMP_COL: [1, 2, 3, 1, 2],
        }
    )
    re = reindex_items(df)
    assert set(re[DEFAULT_ITEM_COL]) == {1, 2, 3}
    seq_db = create_seq_db(re)
    assert list(seq_db[seq_db[DEFAULT_USER_COL] == 1]["item_list"])[0] == [1, 2, 3]
    seqs, targets = dataset_to_seq_target_format(seq_db)
    assert len(seqs) == 3  # user1: 2 examples, user2: 1
    padded = pad_sequences(seqs, maxlen=4)
    assert padded.shape == (3, 4)
    ds = SeqDataset(seqs, targets, maxlen=4)
    batches = list(ds.batches(2, shuffle=False))
    assert batches[0][0].shape == (2, 4)


def test_corrupted_interaction_cache_rebuilds(tmp_path):
    """A corrupted interaction npz is rebuilt by re-running preprocess
    (reference dataset_base.py:193-202 semantics)."""
    from beta_recsys_tpu.datasets.synthetic import Synthetic

    ds = Synthetic(root_dir=str(tmp_path), min_u_c=0, min_i_c=0)
    first = ds.load_interaction()
    cache = ds.interaction_file()
    with open(cache, "wb") as f:
        f.write(b"not an npz")
    again = ds.load_interaction()
    assert len(again) == len(first)
