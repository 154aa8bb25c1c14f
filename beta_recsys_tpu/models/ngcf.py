"""NGCF: bilinear graph message passing with per-layer transforms.

Reference parity: beta_rec/models/ngcf.py:9-194 — per layer i:
side = A_norm @ ego; ego = leaky_relu(W_gc side) + leaky_relu(W_bi (ego ⊙ side));
message dropout; layer outputs L2-normalized and concatenated. Scores are dot
products of concatenated embeddings; BPR loss with decay*L2/batch (regs[0]).

Artifacts: {"adj": (rows, cols, vals)} — row-normalized D^-1(A+I) in the
reference (recommenders/ngcf.py uses norm_adj from get_adj_mat).
"""

import jax
import jax.numpy as jnp

from ..ops.graph import pack_propagator
from ..ops.gather import table_lookup
from .base import RecModel
from .losses import bpr_loss


class NGCF(RecModel):
    batch_kind = "pairwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        layer_size = list(config.get("layer_size", [64, 64, 64]))
        self.layer_dims = [self.emb_dim] + layer_size
        self.n_layers = len(layer_size)
        self.mess_dropout = list(config.get("mess_dropout", [0.1] * self.n_layers))
        regs = config.get("regs", [1e-5])
        self.decay = float(regs[0] if isinstance(regs, (list, tuple)) else regs)
        rows, cols, vals = self.artifacts["adj"]
        self.prop = pack_propagator(
            rows, cols, vals, n_users + n_items, fmt=config.get("graph_format", "auto")
        )

    def init_params(self, rng):
        keys = jax.random.split(rng, 2 + 2 * self.n_layers)
        xavier = jax.nn.initializers.xavier_uniform()
        params = {
            "user_emb": xavier(keys[0], (self.n_users, self.emb_dim), jnp.float32),
            "item_emb": xavier(keys[1], (self.n_items, self.emb_dim), jnp.float32),
            "gc": [],
            "bi": [],
        }
        for i in range(self.n_layers):
            n_in, n_out = self.layer_dims[i], self.layer_dims[i + 1]
            params["gc"].append(
                {
                    "w": xavier(keys[2 + 2 * i], (n_in, n_out), jnp.float32),
                    "b": jnp.zeros((n_out,), jnp.float32),
                }
            )
            params["bi"].append(
                {
                    "w": xavier(keys[3 + 2 * i], (n_in, n_out), jnp.float32),
                    "b": jnp.zeros((n_out,), jnp.float32),
                }
            )
        return params

    def propagate(self, params, rng=None):
        """Return concatenated multi-layer (user, item) embeddings."""
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        outs = [ego]
        for i in range(self.n_layers):
            side = self.prop.spmm(ego)
            gc = params["gc"][i]
            bi = params["bi"][i]
            sum_emb = jax.nn.leaky_relu(side @ gc["w"] + gc["b"], 0.01)
            bi_emb = jax.nn.leaky_relu((ego * side) @ bi["w"] + bi["b"], 0.01)
            ego = sum_emb + bi_emb
            if rng is not None and self.mess_dropout[i] > 0:
                rng, sub = jax.random.split(rng)
                keep = 1.0 - self.mess_dropout[i]
                mask = jax.random.bernoulli(sub, keep, ego.shape)
                ego = jnp.where(mask, ego / keep, 0.0)
            norm = ego / jnp.maximum(jnp.linalg.norm(ego, axis=1, keepdims=True), 1e-12)
            outs.append(norm)
        final = jnp.concatenate(outs, axis=1)
        return final[: self.n_users], final[self.n_users :]

    def user_item_embeddings(self, params):
        return self.propagate(params)

    def loss(self, params, batch, rng):
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        u_final, i_final = self.propagate(params, rng=rng)
        u_e, p_e, n_e = (table_lookup(u_final, users), table_lookup(i_final, pos), table_lookup(i_final, neg))
        pos_scores = jnp.sum(u_e * p_e, axis=-1)
        neg_scores = jnp.sum(u_e * n_e, axis=-1)
        mf_loss = bpr_loss(pos_scores, neg_scores)
        reg = 0.5 * (jnp.sum(u_e**2) + jnp.sum(p_e**2) + jnp.sum(n_e**2)) / users.shape[0]
        return mf_loss + self.decay * reg
