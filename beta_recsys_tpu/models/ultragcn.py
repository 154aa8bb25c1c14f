"""UltraGCN: constraint-weighted BCE without explicit propagation.

Reference parity: beta_rec/models/ultragcn.py:9-228 — per-pair weights
w1 + w2*beta_u*beta_i for positives, w3 + w4*... for negatives; weighted
BCE-with-logits (negatives averaged per user, scaled by negative_weight);
item-item neighbor loss -sim * log sigmoid(u · neighbor) over top-k neighbors
of each positive item; gamma * L2 of all params.

Artifacts:
    "constraint": (beta_uD, beta_iD) from BaseData.create_constraint_mat
    "ii_neighbors": (n_items, K) int32 and "ii_sims": (n_items, K) float32
    from beta_recsys_tpu.ops.ultragcn_prep.get_ii_constraint_mat (vectorized
    replacement for the reference's per-row topk loop, ultragcn.py:9-33).
"""

import jax
import jax.numpy as jnp

from ..ops.gather import table_lookup
from .base import RecModel


class UltraGCN(RecModel):
    batch_kind = "multineg"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.w1 = float(config.get("w1", 1e-7))
        self.w2 = float(config.get("w2", 1.0))
        self.w3 = float(config.get("w3", 1e-7))
        self.w4 = float(config.get("w4", 1.0))
        self.negative_weight = float(config.get("negative_weight", 1.0))
        self.gamma = float(config.get("gamma", 1e-4))
        self.lambda_ = float(config.get("lambda", 1.0))
        self.stddev = float(config.get("stddev", 1e-3))
        beta_uD, beta_iD = self.artifacts["constraint"]
        self.beta_uD = jnp.asarray(beta_uD)
        self.beta_iD = jnp.asarray(beta_iD)
        self.ii_neighbors = jnp.asarray(self.artifacts["ii_neighbors"])
        self.ii_sims = jnp.asarray(self.artifacts["ii_sims"])

    def init_params(self, rng):
        k_u, k_i = jax.random.split(rng)
        return {
            "user_emb": self._normal(k_u, (self.n_users, self.emb_dim)),
            "item_emb": self._normal(k_i, (self.n_items, self.emb_dim)),
        }

    def user_item_embeddings(self, params):
        return params["user_emb"], params["item_emb"]

    def loss(self, params, batch, rng):
        users, pos, negs = batch["users"], batch["pos_items"], batch["neg_items"]
        u_e = table_lookup(params["user_emb"], users)
        p_e = table_lookup(params["item_emb"], pos)
        n_e = params["item_emb"][negs]  # (B, N, d)

        pos_w = self.w1 + self.w2 * self.beta_uD[users] * self.beta_iD[pos] \
            if self.w2 > 0 else jnp.full(users.shape, self.w1)
        neg_w = (
            self.w3 + self.w4 * self.beta_uD[users][:, None] * self.beta_iD[negs]
            if self.w4 > 0
            else jnp.full(negs.shape, self.w3)
        )

        pos_scores = jnp.sum(u_e * p_e, axis=-1)
        neg_scores = jnp.sum(u_e[:, None, :] * n_e, axis=-1)
        pos_loss = pos_w * jax.nn.softplus(-pos_scores)
        neg_loss = jnp.mean(neg_w * jax.nn.softplus(neg_scores), axis=-1)
        loss_l = jnp.sum(pos_loss + neg_loss * self.negative_weight)

        # Item-item constraint: top-K co-occurrence neighbors of each positive.
        nb = self.ii_neighbors[pos]  # (B, K)
        sims = self.ii_sims[pos]  # (B, K)
        nb_e = params["item_emb"][nb]  # (B, K, d)
        loss_i = -jnp.sum(
            sims * jax.nn.log_sigmoid(jnp.sum(u_e[:, None, :] * nb_e, axis=-1))
        )

        norm_loss = 0.5 * (
            jnp.sum(params["user_emb"] ** 2) + jnp.sum(params["item_emb"] ** 2)
        )
        return loss_l + self.gamma * norm_loss + self.lambda_ * loss_i
