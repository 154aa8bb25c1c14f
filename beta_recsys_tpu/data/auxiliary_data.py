"""Auxiliary user/item features for feature-aware models (VBCAR/TVBR).

Reference parity: beta_rec/data/auxiliary_data.py:7-172 — random Gaussian
init or loaded item feature CSVs (one_hot / word2vec / bert / cate) and every
concatenation combination ("one_hot_word2vec", ...). Features are returned as
dense float32 matrices aligned with the dense item ids.
"""

import numpy as np

FEATURE_TYPES = ("one_hot", "word2vec", "bert", "cate")


class Auxiliary:
    """Builds user/item feature matrices from config + loaded feature dicts."""

    def __init__(self, config=None, n_users=None, n_items=None, item2id=None, seed=0):
        self.config = config or {}
        self.n_users = n_users
        self.n_items = n_items
        self.item2id = item2id or {}
        self.rng = np.random.default_rng(seed)

    def _random(self, n, dim):
        return self.rng.normal(0.0, 1.0, (n, dim)).astype(np.float32)

    def _dic_to_matrix(self, fea_dic):
        """Align a {raw_item_id: vector} dict to dense item ids (zeros if absent)."""
        dim = len(next(iter(fea_dic.values())))
        mat = np.zeros((self.n_items, dim), dtype=np.float32)
        for raw_id, vec in fea_dic.items():
            if raw_id in self.item2id:
                mat[self.item2id[raw_id]] = vec
        return mat

    def item_features(self, fea_type="random", dim=64, load_fn=None):
        """Item features: 'random', a single type, or '_'-joined combinations
        (e.g. 'one_hot_word2vec' concatenates both)."""
        if fea_type == "random" or load_fn is None:
            return self._random(self.n_items, dim)
        parts = []
        for t in FEATURE_TYPES:
            if t in fea_type:
                parts.append(self._dic_to_matrix(load_fn(t)))
        if not parts:
            return self._random(self.n_items, dim)
        return np.concatenate(parts, axis=1)

    def user_features(self, fea_type="random", dim=64, load_fn=None):
        """User features (random unless a loader is provided)."""
        if fea_type == "random" or load_fn is None:
            return self._random(self.n_users, dim)
        raise NotImplementedError("custom user feature types: pass load_fn output directly")
