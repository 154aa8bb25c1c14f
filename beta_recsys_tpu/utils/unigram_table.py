"""Word2vec-style unigram table sampler (0.75 power smoothing).

Reference semantics: beta_rec/utils/unigram_table.py:6-77 — builds a table of label
indices proportional to freq^0.75 and samples uniformly from it. This version is
vectorized numpy; the table is capped at 1e8 entries like the reference.
"""

import numpy as np

TABLE_CAP = int(1e8)


class UnigramTable:
    """Sampler over labels with probability proportional to count**0.75."""

    def __init__(self, obj_freq, power=0.75, table_size=None):
        if isinstance(obj_freq, dict):
            labels = np.asarray(list(obj_freq.keys()))
            freqs = np.asarray(list(obj_freq.values()), dtype=np.float64)
        else:
            freqs = np.asarray(obj_freq, dtype=np.float64)
            labels = np.arange(len(freqs))
        self.labels = labels
        pow_freq = freqs ** power
        norm = pow_freq / pow_freq.sum()
        if table_size is None:
            table_size = min(max(len(freqs) * 100, 1_000_000), TABLE_CAP)
        counts = np.maximum(np.round(norm * table_size).astype(np.int64), 1)
        self.table = np.repeat(np.arange(len(labels)), counts)

    def sample(self, count):
        """Draw ``count`` labels with replacement."""
        idx = np.random.randint(0, len(self.table), size=count)
        return self.labels[self.table[idx]]
