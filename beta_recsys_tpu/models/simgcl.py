"""SimGCL: LightGCN backbone + noise-perturbed-embedding contrastive loss.

Reference parity: beta_rec/models/simgcl.py:9-165 — n_layer propagations
(layer mean, no ego layer), perturbation adds sign(e) * normalize(noise) * eps
per layer; InfoNCE at temperature 0.2 between two perturbed views; summed BPR
(-log sigmoid, sum) + reg * (||u||+||pos||+||neg||) + lambda * cl_loss.
TPU deviation: the reference dedups batch indices with torch.unique (dynamic
shape); here the CL loss runs over the raw batch indices (duplicates weight
popular nodes slightly higher; metric-neutral in practice).
"""

import jax
import jax.numpy as jnp

from ..ops.graph import pack_propagator
from ..ops.gather import table_lookup
from .base import RecModel


class SimGCL(RecModel):
    batch_kind = "pairwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.eps = float(config.get("eps", 0.1))
        self.n_layers = int(config.get("n_layer", 3))
        self.reg = float(config.get("reg", 1e-4))
        self.cl_rate = float(config.get("lambda", 0.5))
        self.temp = float(config.get("temperature", 0.2))
        rows, cols, vals = self.artifacts["adj"]
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
        """Mean of n_layers propagated embeddings; perturbed when rng given."""
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = jnp.zeros_like(ego)
        for _ in range(self.n_layers):
            ego = self.prop.spmm(ego)
            if rng is not None:
                rng, sub = jax.random.split(rng)
                noise = jax.random.uniform(sub, ego.shape)
                noise = noise / jnp.maximum(
                    jnp.linalg.norm(noise, axis=-1, keepdims=True), 1e-12
                )
                ego = ego + jnp.sign(ego) * noise * self.eps
            acc = acc + ego
        final = acc / self.n_layers
        return final[: self.n_users], final[self.n_users :]

    def user_item_embeddings(self, params):
        # Reference predicts with the RAW embeddings (simgcl.py:74-83).
        return params["user_emb"], params["item_emb"]

    def _info_nce(self, v1, v2):
        pos = jnp.exp(jnp.sum(v1 * v2, axis=-1) / self.temp)
        ttl = jnp.sum(jnp.exp(v1 @ v2.T / self.temp), axis=1)
        return -jnp.sum(jnp.log(pos / ttl))

    def loss(self, params, batch, rng):
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        u_final, i_final = self.propagate(params)
        u_e, p_e, n_e = (table_lookup(u_final, users), table_lookup(i_final, pos), table_lookup(i_final, neg))
        pos_scores = jnp.sum(u_e * p_e, axis=-1)
        neg_scores = jnp.sum(u_e * n_e, axis=-1)
        rec_loss = -jnp.sum(jnp.log(1e-7 + jax.nn.sigmoid(pos_scores - neg_scores)))
        reg_loss = self.reg * (
            jnp.linalg.norm(u_e) + jnp.linalg.norm(p_e) + jnp.linalg.norm(n_e)
        )
        k1, k2 = jax.random.split(rng)
        u1, i1 = self.propagate(params, rng=k1)
        u2, i2 = self.propagate(params, rng=k2)
        norm = lambda v: v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        cl = self._info_nce(norm(u1)[users], norm(u2)[users]) + self._info_nce(
            norm(i1)[pos], norm(i2)[pos]
        )
        return rec_loss + reg_loss + self.cl_rate * cl
