"""LCFN: low-pass collaborative filtering with hypergraph spectral filters.

Reference parity: beta_rec/models/lcfn.py:8-205 — per layer:
emb' = sigmoid(P diag(filter) P^T emb @ transformer) with P/Q the smallest
hypergraph-Laplacian eigenvectors (artifacts["graph_embeddings"] from
BaseData.get_graph_embeddings); scores over concatenated layer outputs; BPR +
lamda * (norms of ego embeddings, filters, transformers).

Note: the reference's filters/transformers are plain tensors that never
receive gradients (lcfn.py:28-48 — not nn.Parameters); here they are real
trainable parameters, which is the published model's intent.
"""

import jax
import jax.numpy as jnp

from .base import RecModel
from .losses import bpr_loss


class LCFN(RecModel):
    batch_kind = "pairwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.layer = int(config.get("layer", 1))
        self.lamda = float(config.get("lamda", 0.001))
        P, Q = self.artifacts["graph_embeddings"]
        self.P = jnp.asarray(P)
        self.Q = jnp.asarray(Q)

    def init_params(self, rng):
        keys = jax.random.split(rng, 2 + 3 * self.layer)
        params = {
            "user_emb": 0.01 + 0.02 * jax.random.normal(keys[0], (self.n_users, self.emb_dim)),
            "item_emb": 0.01 + 0.02 * jax.random.normal(keys[1], (self.n_items, self.emb_dim)),
            "user_filters": [],
            "item_filters": [],
            "transformers": [],
        }
        for k in range(self.layer):
            params["user_filters"].append(
                1.0 + 0.001 * jax.random.normal(keys[2 + 3 * k], (self.P.shape[1],))
            )
            params["item_filters"].append(
                1.0 + 0.001 * jax.random.normal(keys[3 + 3 * k], (self.Q.shape[1],))
            )
            params["transformers"].append(
                0.001 * jax.random.normal(keys[4 + 3 * k], (self.emb_dim, self.emb_dim))
                + jnp.diag(1.0 + 0.001 * jax.random.normal(keys[4 + 3 * k], (self.emb_dim,)))
            )
        return params

    def propagate(self, params):
        u_out = [params["user_emb"]]
        emb = params["user_emb"]
        for k in range(self.layer):
            filtered = self.P @ (params["user_filters"][k][:, None] * (self.P.T @ emb))
            emb = jax.nn.sigmoid(filtered @ params["transformers"][k])
            u_out.append(emb)
        i_out = [params["item_emb"]]
        emb = params["item_emb"]
        for k in range(self.layer):
            filtered = self.Q @ (params["item_filters"][k][:, None] * (self.Q.T @ emb))
            emb = jax.nn.sigmoid(filtered @ params["transformers"][k])
            i_out.append(emb)
        return jnp.concatenate(u_out, axis=1), jnp.concatenate(i_out, axis=1)

    def user_item_embeddings(self, params):
        return self.propagate(params)

    def loss(self, params, batch, rng):
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        u_all, i_all = self.propagate(params)
        pos_scores = jnp.sum(u_all[users] * i_all[pos], axis=1)
        neg_scores = jnp.sum(u_all[users] * i_all[neg], axis=1)
        reg = (
            jnp.linalg.norm(params["user_emb"][users])
            + jnp.linalg.norm(params["item_emb"][pos])
            + jnp.linalg.norm(params["item_emb"][neg])
        )
        for k in range(self.layer):
            reg = reg + (
                jnp.linalg.norm(params["user_filters"][k])
                + jnp.linalg.norm(params["item_filters"][k])
                + jnp.linalg.norm(params["transformers"][k])
            )
        return bpr_loss(pos_scores, neg_scores) + self.lamda * reg
