"""PairwiseGMF: GMF tower with ReLU outputs and pairwise hinge-BPR loss.

Reference parity: beta_rec/models/pairwise_gmf.py:20-159 — truncated-normal
embeddings, scores = relu(v^T (u ⊙ i)), used to pretrain CMN's user/item
memories. The engine trains with BPR over (pos, neg) scores + L2 on the
looked-up embeddings.
"""

import jax
import jax.numpy as jnp

from ..ops.gather import table_lookup
from .base import RecModel
from .losses import bpr_loss, l2_reg


class PairwiseGMF(RecModel):
    batch_kind = "pairwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.stddev = float(config.get("stddev", 0.01))
        regs = config.get("regs", [1e-5])
        self.reg = float(regs[0] if isinstance(regs, (list, tuple)) else regs)

    def init_params(self, rng):
        k_u, k_i, k_v = jax.random.split(rng, 3)
        # Truncated normal(0, 0.01), matching reference truncated_normal_.
        trunc = jax.nn.initializers.truncated_normal(self.stddev)
        return {
            "user_memory": trunc(k_u, (self.n_users, self.emb_dim), jnp.float32),
            "item_memory": trunc(k_i, (self.n_items, self.emb_dim), jnp.float32),
            "v": jax.nn.initializers.xavier_uniform()(k_v, (self.emb_dim, 1)),
        }

    def score_pairs(self, params, users, items):
        prod = table_lookup(params["user_memory"], users) * table_lookup(params["item_memory"], items)
        return jax.nn.relu(prod @ params["v"])[..., 0]

    def score_candidates(self, params, users, cand_items):
        users_b = jnp.broadcast_to(users[:, None], cand_items.shape)
        return self.score_pairs(params, users_b, cand_items)

    def loss(self, params, batch, rng):
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        pos_scores = self.score_pairs(params, users, pos)
        neg_scores = self.score_pairs(params, users, neg)
        reg = l2_reg(
            table_lookup(params["user_memory"], users),
            table_lookup(params["item_memory"], pos),
            table_lookup(params["item_memory"], neg),
            batch_size=users.shape[0],
        )
        return bpr_loss(pos_scores, neg_scores) + self.reg * reg
