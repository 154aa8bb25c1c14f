"""User/Item KNN: neighborhood models as batched on-device matmuls.

Reference parity: beta_rec/models/userKNN.py:31-149, itemKNN.py:39-163 —
overlap similarity normalized by sqrt(interaction counts), top-k neighborhood,
scores exclude already-seen items. The reference scores one user at a time
through scipy sparse products; here the whole batch is two dense matmuls and a
top-k on the MXU (the interaction bitmask R is a device-resident dense
(n_users, n_items) float — suitable for catalogs up to ~100M cells; larger
catalogs should use the blocked evaluator path).

No training: batch_kind "none" — the engine skips the epoch loop
(reference UserKNNEngine.train_an_epoch is a no-op, userKNN.py:122-148).
"""

import jax.numpy as jnp
import numpy as np

from ..ops.metrics import NEG_INF
from .base import RecModel


class _KNNBase(RecModel):
    batch_kind = "none"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.k = int(config.get("neighbourhood_size", 50))
        R = self.artifacts["interactions"]  # scipy CSR or dense
        if hasattr(R, "todense"):
            R = np.asarray(R.todense())
        self.R = jnp.asarray((R > 0).astype(np.float32))

    def init_params(self, rng):
        return {"_": jnp.zeros(())}  # stateless; params pytree kept for API shape

    def loss(self, params, batch, rng):
        return jnp.zeros(())


class UserKNN(_KNNBase):
    """Scores items by similarity-weighted sums over the user's nearest users."""

    def _user_scores(self, users):
        R = self.R
        seq_rows = R[users]  # (B, n_items)
        # overlap(u, v) = |items_u ∩ items_v| / sqrt(|items_v|)
        counts = jnp.sum(R, axis=1)
        overlap = seq_rows @ R.T  # (B, n_users)
        overlap = overlap / jnp.sqrt(jnp.maximum(counts, 1.0))[None, :]
        # keep only top-k neighbors per row
        kth = jnp.sort(overlap, axis=1)[:, -self.k][:, None]
        neigh = jnp.where(overlap >= kth, overlap, 0.0)
        scores = neigh @ R  # (B, n_items)
        return jnp.where(seq_rows > 0, NEG_INF, scores)

    def score_candidates(self, params, users, cand_items):
        return jnp.take_along_axis(self._user_scores(users), cand_items, axis=1)

    def score_all(self, params, users):
        return self._user_scores(users)


class ItemKNN(_KNNBase):
    """Item-side analogue: scores via item-item overlap similarity.

    sim(i, j) = |users_i ∩ users_j| / sqrt(|users_j|) and score(u, j) sums
    sim(i, j) over the user's items — matching reference itemKNN.py:86-125
    (which, notably, never applies neighbourhood_size in predict). The
    constant item-item Gram matrix is precomputed once.
    """

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        item_counts = jnp.sum(self.R, axis=0)
        self.sim = (self.R.T @ self.R) / jnp.sqrt(jnp.maximum(item_counts, 1.0))[None, :]

    def _user_scores(self, users):
        seq_rows = self.R[users]  # (B, n_items)
        scores = seq_rows @ self.sim
        return jnp.where(seq_rows > 0, NEG_INF, scores)

    def score_candidates(self, params, users, cand_items):
        return jnp.take_along_axis(self._user_scores(users), cand_items, axis=1)

    def score_all(self, params, users):
        return self._user_scores(users)
