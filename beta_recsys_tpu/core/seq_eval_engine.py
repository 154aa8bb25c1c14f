"""Session-based sequential evaluation (scroll / next-item protocol).

Reference parity: beta_rec/core/eval_engine.py:625-939 (SeqEvalEngine) —
for each test sequence, evaluate recommendations from a ``given_k`` prefix
against the next ``look_ahead`` interactions, optionally scrolling the prefix
forward by ``step`` and averaging; metrics are the sequential precision /
recall / mrr / ndcg (beta_recsys_tpu.utils.seq_evaluation).

TPU redesign: the reference scores one (sequence, prefix) pair at a time
through a Python recommender object. Here every (sequence, prefix) evaluation
point is expanded up front, padded into ONE fixed-shape batch, and scored with
a single jitted full-catalog call — top-n extraction happens on device and
only the tiny top-n id lists return to host for the list metrics.
"""

import numpy as np

from ..utils import seq_evaluation

METRIC_FNS = {
    "precision": seq_evaluation.precision,
    "recall": seq_evaluation.recall,
    "mrr": seq_evaluation.mrr,
    "ndcg": seq_evaluation.ndcg,
}


class SeqEvalEngine:
    """Batched scroll-protocol evaluator for session recommenders."""

    def __init__(self, config=None, metrics=("precision", "recall", "mrr", "ndcg")):
        if config is not None:
            sys_cfg = config["system"] if "system" in config else config
            metrics = [m for m in sys_cfg.get("metrics", metrics) if m in METRIC_FNS] or list(metrics)
        self.metrics = list(metrics)

    @staticmethod
    def get_test_sequences(test_data, given_k, col_sequence="col_sequence"):
        """Sequences longer than |given_k| (reference eval_engine.py:818-838)."""
        return test_data.loc[
            test_data[col_sequence].map(len) > abs(given_k), col_sequence
        ].values

    @staticmethod
    def _expand_eval_points(test_sequences, given_k, look_ahead, scroll, step):
        """All (profile, ground_truth) pairs across sequences + owner index."""
        points = []
        for i, seq in enumerate(test_sequences):
            seq = list(seq)
            gk = given_k if given_k >= 0 else len(seq) + given_k
            gks = range(gk, len(seq), step) if scroll else [gk]
            for g in gks:
                profile = seq[:g]
                gt = seq[g:]
                if look_ahead != "all":
                    gt = gt[:look_ahead]
                if profile and gt:
                    points.append((i, profile, gt))
        return points

    def sequential_evaluation(
        self,
        score_fn,
        test_sequences,
        maxlen,
        given_k=1,
        look_ahead=1,
        top_n=10,
        scroll=True,
        step=1,
        batch_size=512,
    ):
        """Average metrics over sequences.

        Args:
            score_fn: fn(padded_profiles (B, maxlen) int32, 1-indexed, 0 pad)
                -> (B, n_items) scores over 0-indexed items.
        Returns {metric: value} averaged per-sequence then over sequences,
        matching the reference's nested averaging.
        """
        if given_k == 0:
            raise ValueError("given_k must be != 0")
        points = self._expand_eval_points(test_sequences, given_k, look_ahead, scroll, step)
        if not points:
            return {m: 0.0 for m in self.metrics}

        profiles = np.zeros((len(points), maxlen), dtype=np.int32)
        for r, (_, profile, _) in enumerate(points):
            tail = profile[-maxlen:]
            profiles[r, maxlen - len(tail):] = tail

        top_lists = np.zeros((len(points), top_n), dtype=np.int64)
        import jax

        for start in range(0, len(points), batch_size):
            blk = profiles[start : start + batch_size]
            pad = batch_size - len(blk)
            if pad:
                blk = np.pad(blk, ((0, pad), (0, 0)))
            scores = score_fn(blk)
            _, idx = jax.lax.top_k(scores, top_n)
            top_lists[start : start + batch_size] = np.asarray(idx)[: batch_size - pad]

        # per-sequence accumulation (mean over its eval points), then global mean
        n_seq = len(test_sequences)
        seq_sums = {m: np.zeros(n_seq) for m in self.metrics}
        seq_counts = np.zeros(n_seq)
        for r, (owner, _, gt) in enumerate(points):
            reco = [int(x) + 1 for x in top_lists[r]]  # back to 1-indexed ids
            for m in self.metrics:
                seq_sums[m][owner] += METRIC_FNS[m](gt, reco)
            seq_counts[owner] += 1
        active = seq_counts > 0
        out = {}
        for m in self.metrics:
            per_seq = np.where(active, seq_sums[m] / np.maximum(seq_counts, 1), 0.0)
            out[m] = float(per_seq.sum() / n_seq)
        return out

    def train_eval_seq(self, valid_sequences, test_sequences, score_fn, maxlen, epoch_id=0, given_k=1, look_ahead=1, top_n=10, scroll=True, step=1):
        """Per-epoch valid+test evaluation (reference eval_engine.py:839-906)."""
        results = {}
        for tag, seqs in (("valid", valid_sequences), ("test", test_sequences)):
            if seqs is None or len(seqs) == 0:
                continue
            res = self.sequential_evaluation(
                score_fn, seqs, maxlen, given_k, look_ahead, top_n, scroll, step
            )
            results.update({f"{tag}_{m}": v for m, v in res.items()})
        print(f"[Seq eval epoch {epoch_id}] " + " ".join(f"{k}={v:.4f}" for k, v in results.items()))
        return results
