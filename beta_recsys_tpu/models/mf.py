"""Matrix Factorization with user/item/global biases.

Reference parity: beta_rec/models/mf.py:9-139 — score =
sigmoid(u.i + b_u + b_i + b_g); BPR or BCE loss on the sigmoid scores; L2
regularizer over the looked-up embeddings normalized by batch size, weighted by
``reg``. (The reference's engine reads ``reg`` from the wrong config level and
effectively trains with reg=0; here ``reg`` from the model config is honored.)
"""

import jax
import jax.numpy as jnp

from ..ops.gather import grouped_table_lookup, table_lookup
from .base import RecModel
from .losses import bce_loss, bpr_loss, l2_reg


class MF(RecModel):
    """Biased matrix factorization."""

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.loss_type = config.get("loss", "bpr")
        self.reg = float(config.get("reg", 0.0))

    def init_params(self, rng):
        k_u, k_i = jax.random.split(rng)
        return {
            "user_emb": self._normal(k_u, (self.n_users, self.emb_dim)),
            "item_emb": self._normal(k_i, (self.n_items, self.emb_dim)),
            "user_bias": jnp.zeros((self.n_users,), jnp.float32),
            "item_bias": jnp.zeros((self.n_items,), jnp.float32),
            "global_bias": jnp.zeros((), jnp.float32),
        }

    def user_item_embeddings(self, params):
        """Bias-augmented factorized form for retrieval: appending [1, b_u] to
        user vectors and [b_i, 1] to item vectors makes the dot product equal
        u·i + b_u + b_i, which ranks identically to the sigmoid score."""
        u = params["user_emb"]
        i = params["item_emb"]
        ones_u = jnp.ones((u.shape[0], 1), u.dtype)
        ones_i = jnp.ones((i.shape[0], 1), i.dtype)
        u_ext = jnp.concatenate([u, ones_u, params["user_bias"][:, None]], axis=1)
        i_ext = jnp.concatenate([i, params["item_bias"][:, None], ones_i], axis=1)
        return u_ext, i_ext

    def retrieval_score_transform(self, params, scores):
        """The factorized form omits the global bias and the sigmoid (both
        rank-invariant); re-apply them so recommend() matches score_pairs."""
        return jax.nn.sigmoid(scores + params["global_bias"])

    def score_pairs(self, params, users, items):
        # grouped scatter-free lookup (ops/gather.py): emb + bias of each id
        # set share ONE one-hot matmul in the backward
        u_emb, u_bias = grouped_table_lookup(
            (params["user_emb"], params["user_bias"]), users)
        i_emb, i_bias = grouped_table_lookup(
            (params["item_emb"], params["item_bias"]), items)
        logits = (
            jnp.sum(u_emb * i_emb, axis=-1) + u_bias + i_bias
            + params["global_bias"]
        )
        return jax.nn.sigmoid(logits)

    def score_candidates(self, params, users, cand_items):
        users_b = jnp.broadcast_to(users[:, None], cand_items.shape)
        return self.score_pairs(params, users_b, cand_items)

    def score_all(self, params, users):
        logits = (
            params["user_emb"][users] @ params["item_emb"].T
            + params["user_bias"][users][:, None]
            + params["item_bias"][None, :]
            + params["global_bias"]
        )
        return jax.nn.sigmoid(logits)

    def _reg_term(self, params, users, items):
        u_emb, u_bias = grouped_table_lookup(
            (params["user_emb"], params["user_bias"]), users)
        i_emb, i_bias = grouped_table_lookup(
            (params["item_emb"], params["item_bias"]), items)
        return l2_reg(u_emb, i_emb, u_bias, i_bias, batch_size=users.shape[0])

    def loss(self, params, batch, rng):
        if self.loss_type == "bpr":
            users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
            pos_scores = self.score_pairs(params, users, pos)
            neg_scores = self.score_pairs(params, users, neg)
            loss = bpr_loss(pos_scores, neg_scores)
            reg = self._reg_term(params, users, pos) + self._reg_term(params, users, neg)
        elif self.loss_type == "bce":
            users, items, labels = batch["users"], batch["items"], batch["labels"]
            scores = self.score_pairs(params, users, items)
            loss = bce_loss(scores, labels)
            reg = self._reg_term(params, users, items)
        else:
            raise ValueError(f"Unsupported loss {self.loss_type}; use 'bpr' or 'bce'")
        return loss + self.reg * reg

    @property
    def batch_kind(self):
        return "pairwise" if self.loss_type == "bpr" else "pointwise"

    # -- sparse-optimizer protocol (core/sparse_optim.py) -----------------------

    def row_tables(self):
        """Sparse tables -> which batch ids index them. Biases are folded into
        the row tensors as an extra column so they get lazy updates too."""
        return {"user_emb": "users", "item_emb": "items_cat", "user_bias": "users", "item_bias": "items_cat"}

    def row_loss(self, rows, dense_params, batch, rng):
        """BPR loss computed from gathered rows only (no table-sized tensors)."""
        B = batch["users"].shape[0]
        u_emb = rows["user_emb"]  # (B, d)
        i_emb = rows["item_emb"]  # (2B, d): pos then neg
        u_bias = rows["user_bias"]
        i_bias = rows["item_bias"]
        g = dense_params["global_bias"]
        pos_scores = jax.nn.sigmoid(
            jnp.sum(u_emb * i_emb[:B], axis=-1) + u_bias + i_bias[:B] + g
        )
        neg_scores = jax.nn.sigmoid(
            jnp.sum(u_emb * i_emb[B:], axis=-1) + u_bias + i_bias[B:] + g
        )
        loss = bpr_loss(pos_scores, neg_scores)
        if self.reg:
            reg = l2_reg(u_emb, i_emb, u_bias, i_bias, batch_size=B)
            loss = loss + self.reg * reg
        return loss
