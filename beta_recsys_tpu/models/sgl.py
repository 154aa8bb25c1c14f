"""SGL: self-supervised graph learning (LightGCN + contrastive augmented views).

Reference parity: beta_rec/models/sgl.py:229-585 — LightGCN propagation of the
full graph for the BPR branch plus two augmented-graph propagations for the
InfoNCE branch (ssl modes user_side / item_side / both_side / merge,
temperature ssl_temp, weight ssl_reg); summed BPR + regs * L2(ego)/2.

TPU redesign: augmented adjacencies are drawn ON DEVICE per loss call
(ops.graph.sgl_augment renormalizes the surviving subgraph with segment-sums)
instead of rebuilding scipy matrices host-side each epoch. The 'merge' ssl
mode contrasts batch nodes without torch.unique dedup (fixed shapes).
"""

import jax
import jax.numpy as jnp

from ..ops.graph import pack_propagator, sgl_augment
from ..ops.gather import table_lookup
from .base import RecModel


class SGL(RecModel):
    batch_kind = "pairwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.n_layers = int(config.get("n_layers", 3))
        regs = config.get("regs", 1e-5)
        self.reg = float(regs[0] if isinstance(regs, (list, tuple)) else regs)
        self.ssl_reg = float(config.get("ssl_reg", 0.1))
        self.ssl_temp = float(config.get("ssl_temp", 0.2))
        self.ssl_mode = config.get("ssl_mode", "both_side")
        self.ssl_ratio = float(config.get("ssl_ratio", 0.1))
        self.aug_type = int(config.get("aug_type", 1))
        rows, cols, vals = self.artifacts["adj"]
        self.adj_rows = jnp.asarray(rows)
        self.adj_cols = jnp.asarray(cols)
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

    def _propagate(self, params, vals_per_layer):
        """Layer-mean propagation; vals_per_layer is a list of edge-value arrays
        (length n_layers) so random-walk augmentation can differ per layer."""
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = ego
        for vals in vals_per_layer:
            ego = self.prop.spmm(ego, vals)
            acc = acc + ego
        final = acc / (len(vals_per_layer) + 1)
        return final[: self.n_users], final[self.n_users :]

    def propagate(self, params):
        return self._propagate(params, [None] * self.n_layers)

    def _augmented_view(self, params, rng):
        n_nodes = self.n_users + self.n_items
        if self.aug_type == 2:  # random walk: fresh subgraph per layer
            keys = jax.random.split(rng, self.n_layers)
            vals = [
                sgl_augment(k, self.adj_rows, self.adj_cols, n_nodes, self.aug_type, self.ssl_ratio)
                for k in keys
            ]
        else:
            vals = [
                sgl_augment(rng, self.adj_rows, self.adj_cols, n_nodes, self.aug_type, self.ssl_ratio)
            ] * self.n_layers
        return self._propagate(params, vals)

    def user_item_embeddings(self, params):
        return self.propagate(params)

    def _info_nce(self, anchor, positive, all_candidates):
        norm = lambda v: v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        a, p, c = norm(anchor), norm(positive), norm(all_candidates)
        pos = jnp.exp(jnp.sum(a * p, axis=1) / self.ssl_temp)
        ttl = jnp.sum(jnp.exp(a @ c.T / self.ssl_temp), axis=1)
        return -jnp.sum(jnp.log(pos / ttl))

    def loss(self, params, batch, rng):
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        u_final, i_final = self.propagate(params)
        u_e, p_e, n_e = (table_lookup(u_final, users), table_lookup(i_final, pos), table_lookup(i_final, neg))
        pos_scores = jnp.sum(u_e * p_e, axis=1)
        neg_scores = jnp.sum(u_e * n_e, axis=1)
        bpr = -jnp.sum(jnp.log(jax.nn.sigmoid(pos_scores - neg_scores) + 1e-10))
        reg = 0.5 * (
            jnp.sum(table_lookup(params["user_emb"], users) ** 2)
            + jnp.sum(table_lookup(params["item_emb"], pos) ** 2)
            + jnp.sum(table_lookup(params["item_emb"], neg) ** 2)
        )
        k1, k2 = jax.random.split(rng)
        u1, i1 = self._augmented_view(params, k1)
        u2, i2 = self._augmented_view(params, k2)
        if self.ssl_mode == "user_side":
            ssl = self._info_nce(u1[users], u2[users], u2)
        elif self.ssl_mode == "item_side":
            ssl = self._info_nce(i1[pos], i2[pos], i2)
        elif self.ssl_mode == "both_side":
            ssl = self._info_nce(u1[users], u2[users], u2) + self._info_nce(i1[pos], i2[pos], i2)
        elif self.ssl_mode == "merge":
            m1 = jnp.concatenate([u1[users], i1[pos]], axis=0)
            m2 = jnp.concatenate([u2[users], i2[pos]], axis=0)
            ssl = self._info_nce(m1, m2, m2)
        else:
            raise ValueError(f"Invalid ssl_mode {self.ssl_mode}")
        return bpr + self.reg * reg + self.ssl_reg * ssl
