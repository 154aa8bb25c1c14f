"""MLP recommender: concat-embedding tower with halving hidden layers.

Reference parity: beta_rec/models/mlp.py:8-116 — per-side latent dim =
emb_dim * 2^n_layers / 2; concatenated (u, i) vector passes through n_layers
Linear+ReLU blocks halving the width down to emb_dim, then an affine + sigmoid.
Dropout precedes each Linear during training.
"""

import jax
import jax.numpy as jnp

from ..ops.attention import inverted_dropout
from ..ops.gather import table_lookup
from .base import RecModel
from .losses import bce_loss


def _dense_init(rng, n_in, n_out):
    k_w, _ = jax.random.split(rng)
    w = jax.nn.initializers.lecun_normal()(k_w, (n_in, n_out))
    return {"w": w, "b": jnp.zeros((n_out,), jnp.float32)}


class MLP(RecModel):
    batch_kind = "pointwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        mlp_cfg = config.get("mlp_config", {"n_layers": 3}) or {"n_layers": 3}
        self.n_layers = int(mlp_cfg.get("n_layers", 3))
        self.dropout = float(config.get("dropout", 0.0))
        self.stddev = float(config.get("stddev", 0.01))
        self.latent_dim = self.emb_dim * (2 ** self.n_layers) // 2

    def init_params(self, rng):
        keys = jax.random.split(rng, 3 + self.n_layers)
        params = {
            "user_emb": self._normal(keys[0], (self.n_users, self.latent_dim)),
            "item_emb": self._normal(keys[1], (self.n_items, self.latent_dim)),
        }
        layers = []
        for i in range(self.n_layers):
            n_in = self.emb_dim * (2 ** (self.n_layers - i))
            layers.append(_dense_init(keys[2 + i], n_in, n_in // 2))
        params["layers"] = layers
        params["affine"] = _dense_init(keys[-1], self.emb_dim, 1)
        return params

    def _tower(self, params, vector, rng=None):
        for layer in params["layers"]:
            if rng is not None and self.dropout > 0:
                rng, sub = jax.random.split(rng)
                vector = inverted_dropout(sub, vector, self.dropout)
            vector = jax.nn.relu(vector @ layer["w"] + layer["b"])
        affine = params["affine"]
        logits = vector @ affine["w"] + affine["b"]
        return logits[..., 0]

    def score_pairs(self, params, users, items, rng=None):
        vector = jnp.concatenate(
            [table_lookup(params["user_emb"], users), table_lookup(params["item_emb"], items)], axis=-1
        )
        return jax.nn.sigmoid(self._tower(params, vector, rng))

    def score_candidates(self, params, users, cand_items):
        users_b = jnp.broadcast_to(users[:, None], cand_items.shape)
        return self.score_pairs(params, users_b, cand_items)

    def loss(self, params, batch, rng):
        scores = self.score_pairs(params, batch["users"], batch["items"], rng=rng)
        return bce_loss(scores, batch["labels"])
