"""LightGCN: layer-averaged linear propagation over the user-item graph.

Reference parity: beta_rec/models/lightgcn.py:7-191 — xavier-init embeddings,
n_layers sparse propagations with sym-normalized adjacency, mean over layer
outputs, sigmoid dot-product prediction, softplus BPR + L2 on ego embeddings
(decay = regs[0]), edge dropout with keep_pro during training.

Artifacts: {"adj": (rows, cols, vals)} from BaseData.get_norm_adj("sym").
"""

import jax
import jax.numpy as jnp

from ..ops.gather import table_lookup
from ..ops.graph import edge_dropout, pack_propagator, propagate_mean
from .base import RecModel
from .losses import softplus_bpr_loss


class LightGCN(RecModel):
    batch_kind = "pairwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.n_layers = len(config.get("layer_size", [64, 64, 64]))
        regs = config.get("regs", [1e-5])
        self.decay = float(regs[0] if isinstance(regs, (list, tuple)) else regs)
        self.keep_prob = float(config.get("keep_pro", 1.0))
        rows, cols, vals = self.artifacts["adj"]
        self.adj_vals = jnp.asarray(vals)
        self.prop = pack_propagator(
            rows, cols, vals, n_users + n_items, fmt=config.get("graph_format", "auto")
        )

    def init_params(self, rng):
        k_u, k_i = jax.random.split(rng)
        init = jax.nn.initializers.xavier_uniform()
        return {
            "user_emb": init(k_u, (self.n_users, self.emb_dim), jnp.float32),
            "item_emb": init(k_i, (self.n_items, self.emb_dim), jnp.float32),
        }

    def propagate(self, params, rng=None):
        """Graph propagation; edge dropout only when an rng is provided (training)."""
        vals = None
        if rng is not None and self.keep_prob < 1.0:
            vals = edge_dropout(rng, self.adj_vals, self.keep_prob)
        return propagate_mean(
            self.prop, params["user_emb"], params["item_emb"], self.n_layers, vals
        )

    def user_item_embeddings(self, params):
        return self.propagate(params)

    def score_pairs(self, params, users, items):
        u_final, i_final = self.propagate(params)
        return jax.nn.sigmoid(jnp.sum(u_final[users] * i_final[items], axis=-1))

    def score_candidates(self, params, users, cand_items):
        u_final, i_final = self.propagate(params)
        return jnp.einsum("ud,ucd->uc", u_final[users], i_final[cand_items])

    def score_all(self, params, users):
        u_final, i_final = self.propagate(params)
        return u_final[users] @ i_final.T

    def loss(self, params, batch, rng):
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        u_final, i_final = self.propagate(params, rng=rng)
        # table_lookup: scatter-free VJP into the (small) propagated tensors
        # and ego tables (ops/gather.py)
        u_rows = table_lookup(u_final, users)
        pos_scores = jnp.sum(u_rows * table_lookup(i_final, pos), axis=-1)
        neg_scores = jnp.sum(u_rows * table_lookup(i_final, neg), axis=-1)
        mf_loss = softplus_bpr_loss(pos_scores, neg_scores)
        reg = 0.5 * (
            jnp.sum(table_lookup(params["user_emb"], users) ** 2)
            + jnp.sum(table_lookup(params["item_emb"], pos) ** 2)
            + jnp.sum(table_lookup(params["item_emb"], neg) ** 2)
        ) / users.shape[0]
        return mf_loss + self.decay * reg
