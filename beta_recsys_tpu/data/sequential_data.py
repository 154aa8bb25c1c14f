"""Sequential data: per-user chronological item sequences as padded arrays.

TPU-first replacement for the reference SequentialData + WarpSampler pipeline
(beta_rec/data/sequential_data.py:47-65, recommenders/sasrec.py:31-130): the
per-user (seq, pos) training arrays are deterministic given the interaction
history, so they are built ONCE on the host as padded matrices; only negatives
are sampled, and that happens on device inside the jitted train step. This
removes the 3-process Queue sampler entirely.

Items are 1-indexed here (0 = padding), matching SASRec-family conventions
(reference models/sasrec.py:61 embedding with padding_idx=0). Dense model ids
from BaseData are shifted by +1.

Note: the reference builds training sequences newest-first and negates eval
scores (get_train_seq sorts descending, eval_engine.py:310 multiplies by -1),
effectively training next-item prediction backwards in time. This framework
uses standard forward chronology.
"""

import numpy as np

from ..utils.constants import DEFAULT_ITEM_COL, DEFAULT_TIMESTAMP_COL, DEFAULT_USER_COL
from .base_data import BaseData


class SequentialData(BaseData):
    """BaseData + padded per-user sequence arrays for sequence models."""

    def __init__(self, split_dataset, config=None, intersect=True, binarize=True, bin_thld=0.0, normalize=False):
        super().__init__(split_dataset, intersect=intersect, binarize=binarize, bin_thld=bin_thld, normalize=normalize)
        self.config = config
        self._user_seqs = None

    def get_train_seq(self):
        """Per-user chronological (oldest-first) item lists, 1-indexed."""
        if self._user_seqs is None:
            df = self.train.sort_values(by=[DEFAULT_TIMESTAMP_COL], kind="stable")
            seqs = [[] for _ in range(self.n_users)]
            for u, it in zip(
                df[DEFAULT_USER_COL].to_numpy(), df[DEFAULT_ITEM_COL].to_numpy()
            ):
                seqs[u].append(it + 1)
            self._user_seqs = seqs
        return self._user_seqs

    def train_seq_arrays(self, maxlen):
        """Deterministic SASRec training arrays.

        Returns dict with:
            users: (n,) user ids with >= 2 interactions
            seq:   (n, maxlen) input items (right-aligned, 0-padded, 1-indexed)
            pos:   (n, maxlen) next-item targets aligned with seq (0 where pad)
        """
        seqs = self.get_train_seq()
        users, seq_rows, pos_rows = [], [], []
        for u, items in enumerate(seqs):
            if len(items) < 2:
                continue
            inp = items[:-1][-maxlen:]
            tgt = items[1:][-maxlen:]
            pad = maxlen - len(inp)
            seq_rows.append(np.pad(inp, (pad, 0)))
            pos_rows.append(np.pad(tgt, (pad, 0)))
            users.append(u)
        return {
            "users": np.asarray(users, dtype=np.int32),
            "seq": np.asarray(seq_rows, dtype=np.int32),
            "pos": np.asarray(pos_rows, dtype=np.int32),
        }

    def prefix_target_arrays(self, maxlen):
        """(prefix, target) expansion for session models (NARM).

        Every position t >= 1 of each user sequence yields one example:
        seq = last maxlen items before t (left-padded), target = item at t
        (reference seq_data_utils.dataset_to_seq_target_format:107-128).
        """
        seqs = self.get_train_seq()
        seq_rows, targets = [], []
        for items in seqs:
            for t in range(1, len(items)):
                prefix = items[max(0, t - maxlen):t]
                pad = maxlen - len(prefix)
                seq_rows.append(np.pad(prefix, (pad, 0)))
                targets.append(items[t])
        return {
            "seq": np.asarray(seq_rows, dtype=np.int32),
            "target": np.asarray(targets, dtype=np.int32),
        }

    def _user_times(self):
        """Per-user scaled timestamps aligned with get_train_seq.

        Each user's timestamps are divided by their minimum nonzero gap
        (personalized time scale, reference recommenders/tisasrec.py:86-104).
        """
        df = self.train.sort_values(by=[DEFAULT_TIMESTAMP_COL], kind="stable")
        times = [[] for _ in range(self.n_users)]
        for u, ts in zip(df[DEFAULT_USER_COL].to_numpy(), df[DEFAULT_TIMESTAMP_COL].to_numpy()):
            times[u].append(ts)
        scaled = []
        for ts in times:
            ts = np.asarray(ts, dtype=np.int64)
            if len(ts) > 1:
                gaps = np.diff(np.sort(ts))
                gaps = gaps[gaps > 0]
                scale = gaps.min() if len(gaps) else 1
            else:
                scale = 1
            scaled.append(np.round((ts - (ts.min() if len(ts) else 0)) / scale).astype(np.int64) + 1)
        return scaled

    @staticmethod
    def _clipped_interval_matrix(time_row, time_span):
        """Vectorized |t_i - t_j| clipped to time_span (replaces the reference's
        O(L^2) Python loops, recommenders/tisasrec.py:108-130)."""
        diff = np.abs(time_row[:, None].astype(np.int64) - time_row[None, :])
        return np.minimum(diff, time_span).astype(np.int32)

    def tisasrec_arrays(self, maxlen, time_span):
        """TiSASRec training arrays: users/seq/pos plus per-user clipped
        time-interval matrices (n, maxlen, maxlen)."""
        base = self.train_seq_arrays(maxlen)
        times = self._user_times()
        mats = np.zeros((len(base["users"]), maxlen, maxlen), dtype=np.int32)
        for row, u in enumerate(base["users"]):
            ts = times[u][:-1][-maxlen:]
            padded = np.zeros(maxlen, dtype=np.int64)
            if len(ts):
                padded[maxlen - len(ts):] = ts
            mats[row] = self._clipped_interval_matrix(padded, time_span)
        base["time_matrix"] = mats
        return base

    def tisasrec_eval_context(self, maxlen, time_span, extra_df=None):
        """(ctx, ctx_time_matrix) for TiSASRec scoring.

        Items and timestamps extend together when ``extra_df`` (validation
        items for final test) is given, so position p of the context always
        matches row/col p of the interval matrix. Appended items get
        last-train-time + 1, 2, ... (eval frames carry no timestamps).
        """
        seqs = [list(s) for s in self.get_train_seq()]
        times = [list(t) for t in self._user_times()]
        if extra_df is not None:
            from ..utils.constants import DEFAULT_RATING_COL

            pos = extra_df[extra_df[DEFAULT_RATING_COL] > 0]
            for u, it in zip(
                pos[DEFAULT_USER_COL].to_numpy(), pos[DEFAULT_ITEM_COL].to_numpy()
            ):
                u = int(u)
                seqs[u].append(int(it) + 1)
                times[u].append((times[u][-1] + 1) if times[u] else 1)
        ctx = np.zeros((self.n_users, maxlen), dtype=np.int32)
        mats = np.zeros((self.n_users, maxlen, maxlen), dtype=np.int32)
        for u in range(self.n_users):
            tail_items = seqs[u][-maxlen:]
            tail_times = times[u][-maxlen:]
            if tail_items:
                ctx[u, maxlen - len(tail_items):] = tail_items
            padded = np.zeros(maxlen, dtype=np.int64)
            if tail_times:
                padded[maxlen - len(tail_times):] = tail_times
            mats[u] = self._clipped_interval_matrix(padded, time_span)
        return ctx, mats

    def eval_context(self, maxlen, extra_df=None):
        """(n_users, maxlen) context matrix: each user's train sequence,
        optionally extended with positively-rated items of ``extra_df``
        (validation items for final-test scoring, reference
        eval_engine.test_seq_predict:319-375)."""
        seqs = [list(s) for s in self.get_train_seq()]
        if extra_df is not None:
            from ..utils.constants import DEFAULT_RATING_COL

            pos = extra_df[extra_df[DEFAULT_RATING_COL] > 0]
            for u, it in zip(
                pos[DEFAULT_USER_COL].to_numpy(), pos[DEFAULT_ITEM_COL].to_numpy()
            ):
                seqs[int(u)].append(int(it) + 1)
        ctx = np.zeros((self.n_users, maxlen), dtype=np.int32)
        for u, items in enumerate(seqs):
            tail = items[-maxlen:]
            if tail:
                ctx[u, maxlen - len(tail):] = tail
        return ctx
