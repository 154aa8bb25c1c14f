"""Sequence-dataset utilities: 1-based reindexing, per-user sequence DBs,
(prefix, target) expansion, padded batch collation.

Reference parity: beta_rec/datasets/seq_data_utils.py:38-179 — items are
reindexed 1..n with 0 reserved for padding; sequences are built per user in
time order; every prefix yields a (seq, target) example; collation pads to the
batch max length. Here collation pads to a FIXED maxlen (static shapes for
jit) instead of the dynamic batch max.
"""

import numpy as np
import pandas as pd

from ..utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


def reindex_items(train_data, valid_data=None, test_data=None):
    """Map item ids to 1..n (0 = padding) across splits, keyed on train items."""
    item2idx = {}
    for it in pd.unique(train_data[DEFAULT_ITEM_COL]):
        item2idx[it] = len(item2idx) + 1

    def apply(df):
        if df is None:
            return None
        df = df[df[DEFAULT_ITEM_COL].isin(item2idx.keys())].copy()
        df[DEFAULT_ITEM_COL] = df[DEFAULT_ITEM_COL].map(item2idx)
        return df

    out = [apply(train_data), apply(valid_data), apply(test_data)]
    return [d for d in out if d is not None] if (valid_data is not None or test_data is not None) else out[0]


def create_seq_db(data):
    """Per-user chronological item sequences: DataFrame (user, item_list)."""
    sorted_df = data.sort_values(by=[DEFAULT_TIMESTAMP_COL], kind="stable")
    seqs = sorted_df.groupby(DEFAULT_USER_COL)[DEFAULT_ITEM_COL].apply(list)
    return seqs.reset_index().rename(columns={DEFAULT_ITEM_COL: "item_list"})


def dataset_to_seq_target_format(seq_db):
    """Expand sequences into (prefix, target) example pairs.

    Reference seq_data_utils.py:107-128: every position >= 1 becomes a target
    with the full preceding prefix as input.
    """
    seqs, targets = [], []
    for items in seq_db["item_list"]:
        for t in range(1, len(items)):
            seqs.append(items[:t])
            targets.append(items[t])
    return seqs, targets


def pad_sequences(seqs, maxlen, pad_left=True):
    """Pad/truncate variable-length sequences to (n, maxlen) int32."""
    out = np.zeros((len(seqs), maxlen), dtype=np.int32)
    for i, s in enumerate(seqs):
        s = list(s)[-maxlen:]
        if pad_left:
            out[i, maxlen - len(s):] = s
        else:
            out[i, : len(s)] = s
    return out


def collate_fn(batch, pad_left=False):
    """Pad a list of (seq, target) pairs and sort by descending length.

    Reference parity: the DataLoader collate_fn in
    beta_rec/datasets/seq_data_utils.py:131-179 (pad to the batch max length,
    sort so packed-RNN consumers see descending lengths). Returns
    (padded (B, L) int32, lengths (B,) int32, targets (B,) int32) numpy arrays.
    """
    seqs = [list(s) for s, _ in batch]
    targets = np.asarray([t for _, t in batch], dtype=np.int32)
    lengths = np.asarray([len(s) for s in seqs], dtype=np.int32)
    order = np.argsort(-lengths, kind="stable")
    maxlen = max(1, int(lengths.max()) if len(lengths) else 1)
    padded = pad_sequences([seqs[i] for i in order], maxlen, pad_left=pad_left)
    return padded, lengths[order], targets[order]


class SeqDataset:
    """Array-backed (seq, target) dataset with fixed-shape batch iteration."""

    def __init__(self, seqs, targets, maxlen, pad_left=True):
        self.seq = pad_sequences(seqs, maxlen, pad_left)
        self.target = np.asarray(targets, dtype=np.int32)
        self.lengths = np.asarray([min(len(s), maxlen) for s in seqs], dtype=np.int32)

    def __len__(self):
        return len(self.target)

    def batches(self, batch_size, shuffle=True, rng=None):
        idx = np.arange(len(self))
        if shuffle:
            (rng or np.random.default_rng()).shuffle(idx)
        for start in range(0, len(idx), batch_size):
            b = idx[start : start + batch_size]
            yield self.seq[b], self.target[b], self.lengths[b]
