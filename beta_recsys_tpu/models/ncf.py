"""NeuMF (NCF): GMF + MLP dual-tower fusion, with optional pretraining.

Reference parity: beta_rec/models/ncf.py:12-193 — separate GMF and MLP
embedding tables; MLP tower halves widths; final affine over
concat(mlp_vector, gmf_vector); BCE loss. ``ncf_pre`` pretraining loads GMF and
MLP weights (examples/train_ncf.py:38-41) — here pretrained params are passed
via ``artifacts={"gmf_params": ..., "mlp_params": ...}``.
"""

import jax
import jax.numpy as jnp

from ..ops.attention import inverted_dropout
from ..ops.gather import grouped_table_lookup
from .base import RecModel
from .losses import bce_loss
from .mlp import _dense_init


class NeuMF(RecModel):
    batch_kind = "pointwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        mlp_cfg = config.get("mlp_config", {"n_layers": 3}) or {"n_layers": 3}
        self.n_layers = int(mlp_cfg.get("n_layers", 3))
        self.dropout = float(config.get("dropout", 0.0))
        self.stddev = float(config.get("stddev", 0.01))
        self.latent_dim_mlp = self.emb_dim * (2 ** self.n_layers) // 2
        self.latent_dim_gmf = self.emb_dim

    def init_params(self, rng):
        keys = jax.random.split(rng, 5 + self.n_layers)
        params = {
            "user_emb_mlp": self._normal(keys[0], (self.n_users, self.latent_dim_mlp)),
            "item_emb_mlp": self._normal(keys[1], (self.n_items, self.latent_dim_mlp)),
            "user_emb_gmf": self._normal(keys[2], (self.n_users, self.latent_dim_gmf)),
            "item_emb_gmf": self._normal(keys[3], (self.n_items, self.latent_dim_gmf)),
        }
        layers = []
        for i in range(self.n_layers):
            n_in = self.emb_dim * (2 ** (self.n_layers - i))
            layers.append(_dense_init(keys[4 + i], n_in, n_in // 2))
        params["layers"] = layers
        params["affine"] = _dense_init(keys[-1], self.emb_dim * 2, 1)

        # Optional warm start from pretrained towers (reference ncf_pre mode).
        gmf = self.artifacts.get("gmf_params")
        if gmf is not None:
            params["user_emb_gmf"] = gmf["user_emb"]
            params["item_emb_gmf"] = gmf["item_emb"]
        mlp = self.artifacts.get("mlp_params")
        if mlp is not None:
            params["user_emb_mlp"] = mlp["user_emb"]
            params["item_emb_mlp"] = mlp["item_emb"]
            params["layers"] = mlp["layers"]
        return params

    def _forward(self, params, users, items, rng=None):
        # grouped scatter-free lookups: the mlp+gmf tables of each id set
        # share one one-hot matmul in the backward (ops/gather.py)
        u_mlp, u_gmf = grouped_table_lookup(
            (params["user_emb_mlp"], params["user_emb_gmf"]), users)
        i_mlp, i_gmf = grouped_table_lookup(
            (params["item_emb_mlp"], params["item_emb_gmf"]), items)
        mlp_vec = jnp.concatenate([u_mlp, i_mlp], axis=-1)
        gmf_vec = u_gmf * i_gmf
        for layer in params["layers"]:
            if rng is not None and self.dropout > 0:
                rng, sub = jax.random.split(rng)
                mlp_vec = inverted_dropout(sub, mlp_vec, self.dropout)
            mlp_vec = jax.nn.relu(mlp_vec @ layer["w"] + layer["b"])
        fused = jnp.concatenate([mlp_vec, gmf_vec], axis=-1)
        logits = fused @ params["affine"]["w"] + params["affine"]["b"]
        return logits[..., 0]

    def score_pairs(self, params, users, items, rng=None):
        return jax.nn.sigmoid(self._forward(params, users, items, rng))

    def score_candidates(self, params, users, cand_items):
        users_b = jnp.broadcast_to(users[:, None], cand_items.shape)
        return self.score_pairs(params, users_b, cand_items)

    def loss(self, params, batch, rng):
        scores = self.score_pairs(params, batch["users"], batch["items"], rng=rng)
        return bce_loss(scores, batch["labels"])
