"""Generalized Matrix Factorization: elementwise-product tower with affine output.

Reference parity: beta_rec/models/gmf.py:8-100 — rating =
sigmoid(w^T (u ⊙ i) + b), BCE loss, N(0, 0.01) embedding init.
"""

import jax
import jax.numpy as jnp

from ..ops.gather import table_lookup
from .base import RecModel
from .losses import bce_loss


class GMF(RecModel):
    batch_kind = "pointwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.stddev = float(config.get("stddev", 0.01))

    def init_params(self, rng):
        k_u, k_i, k_w = jax.random.split(rng, 3)
        return {
            "user_emb": self._normal(k_u, (self.n_users, self.emb_dim)),
            "item_emb": self._normal(k_i, (self.n_items, self.emb_dim)),
            "affine_w": jax.nn.initializers.lecun_normal()(k_w, (self.emb_dim, 1)),
            "affine_b": jnp.zeros((1,), jnp.float32),
        }

    def score_pairs(self, params, users, items):
        prod = table_lookup(params["user_emb"], users) * table_lookup(params["item_emb"], items)
        logits = prod @ params["affine_w"] + params["affine_b"]
        return jax.nn.sigmoid(logits[..., 0])

    def score_candidates(self, params, users, cand_items):
        users_b = jnp.broadcast_to(users[:, None], cand_items.shape)
        return self.score_pairs(params, users_b, cand_items)

    def loss(self, params, batch, rng):
        scores = self.score_pairs(params, batch["users"], batch["items"])
        return bce_loss(scores, batch["labels"])
