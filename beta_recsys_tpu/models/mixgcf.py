"""MixGCF: hop-mixing synthesized hard negatives on a LightGCN backbone.

Reference parity: beta_rec/models/mixgcf.py:7-290 — GCN keeps per-hop
embeddings (n_hops+1); for each of K final negatives, n_negs candidates are
positive-mixed (random convex blend with the positive, per hop) and the
highest-scoring candidate per hop is selected (hop mixing, gradients stopped
through the argmax); loss = mean log(1 + sum_k exp(neg_k - pos)) +
l2/2 * ||hop-0 embeddings||^2 / batch. Pooling: mean/sum/concat/final.
Edge + message dropout during training.
"""

import jax
import jax.numpy as jnp

from ..ops.graph import edge_dropout, pack_propagator
from ..ops.gather import table_lookup
from .base import RecModel


class MixGCF(RecModel):
    batch_kind = "multineg"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.n_hops = int(config.get("context_hops", 3))
        self.pool = config.get("pool", "mean")
        self.decay = float(config.get("l2", 1e-4))
        self.n_negs = int(config.get("n_negs", 16))
        self.K = int(config.get("K", 1))
        self.ns = config.get("ns", "mixgcf")
        self.edge_dropout_rate = float(config.get("edge_dropout_rate", 0.0))
        self.mess_dropout_rate = float(config.get("mess_dropout_rate", 0.0))
        rows, cols, vals = self.artifacts["adj"]
        self.adj_vals = jnp.asarray(vals)
        self.prop = pack_propagator(
            rows, cols, vals, n_users + n_items, fmt=config.get("graph_format", "auto")
        )

    @property
    def num_neg(self):
        """Negatives per positive the epoch builder must draw (K groups of n_negs)."""
        return self.K * self.n_negs

    def init_params(self, rng):
        k_u, k_i = jax.random.split(rng)
        init = jax.nn.initializers.xavier_uniform()
        return {
            "user_emb": init(k_u, (self.n_users, self.emb_dim), jnp.float32),
            "item_emb": init(k_i, (self.n_items, self.emb_dim), jnp.float32),
        }

    def gcn(self, params, rng=None):
        """Per-hop embeddings: (n_users, H+1, d), (n_items, H+1, d)."""
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        embs = [ego]
        for _ in range(self.n_hops):
            vals = None
            if rng is not None and self.edge_dropout_rate > 0:
                rng, sub = jax.random.split(rng)
                vals = edge_dropout(sub, self.adj_vals, 1 - self.edge_dropout_rate)
            ego = self.prop.spmm(ego, vals)
            if rng is not None and self.mess_dropout_rate > 0:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1 - self.mess_dropout_rate, ego.shape)
                ego = jnp.where(keep, ego / (1 - self.mess_dropout_rate), 0.0)
            embs.append(ego)
        stacked = jnp.stack(embs, axis=1)  # (n_nodes, H+1, d)
        return stacked[: self.n_users], stacked[self.n_users :]

    def pooling(self, embs):
        if self.pool == "mean":
            return jnp.mean(embs, axis=1)
        if self.pool == "sum":
            return jnp.sum(embs, axis=1)
        if self.pool == "concat":
            return embs.reshape(embs.shape[0], -1)
        return embs[:, -1, :]  # "final"

    def user_item_embeddings(self, params):
        u, i = self.gcn(params)
        return self.pooling(u), self.pooling(i)

    def _mix_negatives(self, rng, user_hop, item_hop, users, neg_group, pos):
        """Positive mixing + hop mixing for one group of n_negs candidates.

        Returns (B, H+1, d) synthesized negative embeddings.
        """
        s_e = table_lookup(user_hop, users)  # (B, H+1, d)
        if self.pool != "concat":
            s_e = self.pooling(s_e)[:, None, :]  # (B, 1, d) query
            s_e = jnp.broadcast_to(s_e, (s_e.shape[0], user_hop.shape[1], s_e.shape[2]))
        p_e = table_lookup(item_hop, pos)  # (B, H+1, d)
        n_e = item_hop[neg_group]  # (B, n_negs, H+1, d)
        seed = jax.random.uniform(rng, (n_e.shape[0], 1, n_e.shape[2], 1))
        mixed = seed * p_e[:, None, :, :] + (1 - seed) * n_e
        scores = jnp.einsum("bhd,bnhd->bnh", s_e, mixed)
        idx = jax.lax.stop_gradient(jnp.argmax(scores, axis=1))  # (B, H+1)
        return jnp.take_along_axis(mixed, idx[:, None, :, None], axis=1)[:, 0]

    def loss(self, params, batch, rng):
        users, pos, negs = batch["users"], batch["pos_items"], batch["neg_items"]
        rng, k_gcn = jax.random.split(rng)
        user_hop, item_hop = self.gcn(params, rng=k_gcn)
        if self.ns == "rns":
            neg_embs = item_hop[negs[:, : self.K]]  # (B, K, H+1, d)
        else:
            groups = []
            for k in range(self.K):
                rng, sub = jax.random.split(rng)
                group = negs[:, k * self.n_negs : (k + 1) * self.n_negs]
                groups.append(self._mix_negatives(sub, user_hop, item_hop, users, group, pos))
            neg_embs = jnp.stack(groups, axis=1)  # (B, K, H+1, d)

        u_e = self.pooling(table_lookup(user_hop, users))
        pos_e = self.pooling(table_lookup(item_hop, pos))
        B, K = neg_embs.shape[0], neg_embs.shape[1]
        neg_e = self.pooling(neg_embs.reshape(B * K, *neg_embs.shape[2:])).reshape(B, K, -1)
        pos_scores = jnp.sum(u_e * pos_e, axis=1)
        neg_scores = jnp.sum(u_e[:, None, :] * neg_e, axis=-1)
        mf_loss = jnp.mean(
            jnp.log(1 + jnp.sum(jnp.exp(neg_scores - pos_scores[:, None]), axis=1))
        )
        reg = 0.5 * (
            jnp.sum(table_lookup(user_hop, users)[:, 0, :] ** 2)
            + jnp.sum(table_lookup(item_hop, pos)[:, 0, :] ** 2)
            + jnp.sum(neg_embs[:, :, 0, :] ** 2)
        ) / users.shape[0]
        return mf_loss + self.decay * reg
