"""BUIR: bootstrapped user-item representation learning (BYOL-style).

Reference parity: beta_rec/models/buir.py:9-250 — online and target LightGCN
encoders (3 layers, layer-mean including ego), a linear predictor on the online
side, loss = 2 - 2*cos(pred(u_on), i_tgt) symmetric in u/i, and a momentum EMA
update of the target from the online encoder after every optimizer step
(here via the engine's ``post_update`` hook — the EMA is a parameter move, not
a gradient). Prediction scores: u_on·i_tgt + u_tgt·i_on via get_embedding.
"""

import jax
import jax.numpy as jnp

from ..ops.graph import pack_propagator, propagate_mean
from ..ops.gather import table_lookup
from .base import RecModel


class BUIR(RecModel):
    batch_kind = "pairwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.momentum = float(config.get("momentum", 0.995))
        self.n_layers = int(config.get("n_layers", 3))
        rows, cols, vals = self.artifacts["adj"]
        self.prop = pack_propagator(
            rows, cols, vals, n_users + n_items, fmt=config.get("graph_format", "auto")
        )

    def _init_encoder(self, rng):
        k_u, k_i = jax.random.split(rng)
        init = jax.nn.initializers.xavier_uniform()
        return {
            "user_emb": init(k_u, (self.n_users, self.emb_dim), jnp.float32),
            "item_emb": init(k_i, (self.n_items, self.emb_dim), jnp.float32),
        }

    def init_params(self, rng):
        k_on, k_pred = jax.random.split(rng)
        online = self._init_encoder(k_on)
        target = jax.tree_util.tree_map(jnp.copy, online)
        xavier = jax.nn.initializers.xavier_uniform()
        return {
            "online": online,
            "target": target,
            "pred_w": xavier(k_pred, (self.emb_dim, self.emb_dim), jnp.float32),
            "pred_b": jnp.zeros((self.emb_dim,), jnp.float32),
        }

    def _encode(self, enc_params):
        return propagate_mean(
            self.prop, enc_params["user_emb"], enc_params["item_emb"], self.n_layers
        )

    def post_update(self, params):
        """EMA the target encoder toward the online encoder (no gradients)."""
        m = self.momentum
        new_target = jax.tree_util.tree_map(
            lambda t, o: t * m + o * (1.0 - m), params["target"], params["online"]
        )
        return {**params, "target": new_target}

    def loss(self, params, batch, rng):
        users, items = batch["users"], batch["pos_items"]
        u_on_all, i_on_all = self._encode(params["online"])
        u_tg_all, i_tg_all = self._encode(
            jax.tree_util.tree_map(jax.lax.stop_gradient, params["target"])
        )
        pred = lambda x: x @ params["pred_w"] + params["pred_b"]
        u_on = pred(table_lookup(u_on_all, users))
        i_on = pred(table_lookup(i_on_all, items))
        u_tg = jax.lax.stop_gradient(u_tg_all[users])
        i_tg = jax.lax.stop_gradient(i_tg_all[items])
        norm = lambda v: v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        loss_ui = 2 - 2 * jnp.sum(norm(u_on) * norm(i_tg), axis=-1)
        loss_iu = 2 - 2 * jnp.sum(norm(i_on) * norm(u_tg), axis=-1)
        return jnp.mean(loss_ui + loss_iu)

    def _embeddings(self, params):
        u_on, i_on = self._encode(params["online"])
        pred = lambda x: x @ params["pred_w"] + params["pred_b"]
        return pred(u_on), u_on, pred(i_on), i_on

    def score_candidates(self, params, users, cand_items):
        u_pred, u_on, i_pred, i_on = self._embeddings(params)
        s_ui = jnp.einsum("ud,ucd->uc", u_pred[users], i_on[cand_items])
        s_iu = jnp.einsum("ud,ucd->uc", u_on[users], i_pred[cand_items])
        return s_ui + s_iu

    def score_all(self, params, users):
        u_pred, u_on, i_pred, i_on = self._embeddings(params)
        return u_pred[users] @ i_on.T + u_on[users] @ i_pred.T
