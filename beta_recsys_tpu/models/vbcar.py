"""VBCAR: variational Bayes context-aware grocery recommender.

Reference parity: beta_rec/models/vbcar.py:9-301 — variational user/item
encoders over auxiliary features (two-layer MLP to mu/logvar), embeddings =
concat(sampled latent, free embedding); Triple2vec-style skip-gram GEN loss
over basket triples with uniform negatives; total = (1-alpha)*GEN + alpha*KLD
with standard-normal KL over all six encoded distributions. Prediction uses
the posterior means.

Artifacts: {"user_fea": (n_users, F_u), "item_fea": (n_items, F_i)}
(GroceryData.user_item_features).
"""

import jax
import jax.numpy as jnp

from ..ops.gather import table_lookup
from .base import RecModel
from .mlp import _dense_init

_ACTS = {
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "lrelu": jax.nn.leaky_relu,
}


class VBCAR(RecModel):
    batch_kind = "triple"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.late_dim = int(config.get("late_dim", 128))
        self.n_neg = int(config.get("n_neg", 5))
        self.alpha = float(config.get("alpha", 0.05))
        self.act = _ACTS.get(config.get("activator", "tanh"), lambda x: x)
        self.user_fea = jnp.asarray(self.artifacts["user_fea"])
        self.item_fea = jnp.asarray(self.artifacts["item_fea"])

    def init_params(self, rng):
        keys = jax.random.split(rng, 6)
        init_range = 0.1 * self.emb_dim ** (-0.5)
        return {
            "user_emb": jax.random.uniform(
                keys[0], (self.n_users, self.emb_dim), jnp.float32, -init_range, init_range
            ),
            "item_emb": jax.random.uniform(
                keys[1], (self.n_items, self.emb_dim), jnp.float32, -init_range, init_range
            ),
            "fc_u_1": _dense_init(keys[2], self.user_fea.shape[1], self.late_dim),
            "fc_u_2": _dense_init(keys[3], self.late_dim, self.emb_dim * 2),
            "fc_i_1": _dense_init(keys[4], self.item_fea.shape[1], self.late_dim),
            "fc_i_2": _dense_init(keys[5], self.late_dim, self.emb_dim * 2),
        }

    def _encode(self, params, fea, idx, side):
        x = fea[idx]
        l1, l2 = params[f"fc_{side}_1"], params[f"fc_{side}_2"]
        h = self.act(x @ l1["w"] + l1["b"]) @ l2["w"] + l2["b"]
        return h[..., : self.emb_dim], h[..., self.emb_dim :]  # mu, logvar

    def user_encode(self, params, idx):
        return self._encode(params, self.user_fea, idx, "u")

    def item_encode(self, params, idx):
        return self._encode(params, self.item_fea, idx, "i")

    def _sample(self, rng, dist):
        mu, logvar = dist
        std = jnp.exp(0.5 * logvar)
        return mu + std * jax.random.normal(rng, mu.shape)

    @staticmethod
    def _kl_std_normal(dist):
        """Mean over batch of KL(N(mu, std) || N(0, 1)), summed over last dim."""
        mu, logvar = dist
        var = jnp.exp(logvar) + 1e-10
        kl = 0.5 * (-jnp.log(var) - 1 + var + mu**2)
        kl = jnp.sum(kl, axis=-1)
        if kl.ndim > 1:
            kl = jnp.sum(kl, axis=-1)
        return jnp.mean(kl)

    def loss(self, params, batch, rng):
        u, i1, i2 = batch["users"], batch["item1"], batch["item2"]
        nu = batch["neg_users"]
        ni1, ni2 = batch["neg_item1"], batch["neg_item2"]
        B = u.shape[0]
        keys = jax.random.split(rng, 6)

        u_dis = self.user_encode(params, u)
        i1_dis = self.item_encode(params, i1)
        i2_dis = self.item_encode(params, i2)
        nu_dis = self.user_encode(params, nu)
        ni1_dis = self.item_encode(params, ni1)
        ni2_dis = self.item_encode(params, ni2)

        cat = jnp.concatenate
        e_u = cat([self._sample(keys[0], u_dis), table_lookup(params["user_emb"], u)], -1)
        e_1 = cat([self._sample(keys[1], i1_dis), table_lookup(params["item_emb"], i1)], -1)
        e_2 = cat([self._sample(keys[2], i2_dis), table_lookup(params["item_emb"], i2)], -1)
        e_nu = cat([self._sample(keys[3], nu_dis), params["user_emb"][nu]], -1)
        e_n1 = cat([self._sample(keys[4], ni1_dis), params["item_emb"][ni1]], -1)
        e_n2 = cat([self._sample(keys[5], ni2_dis), params["item_emb"][ni2]], -1)

        def skipgram(center, context, neg):
            pos = jax.nn.log_sigmoid(jnp.sum(center * context, axis=-1))
            neg_dots = jnp.einsum("bnd,bd->bn", neg, center)
            return -(jnp.sum(pos) + jnp.sum(jax.nn.log_sigmoid(-neg_dots)))

        gen = (
            skipgram(e_u, e_1 + e_2, e_nu)
            + skipgram(e_1, e_u + e_2, e_n1)
            + skipgram(e_2, e_u + e_1, e_n2)
        ) / (3 * B)
        kld = (
            self._kl_std_normal(u_dis)
            + self._kl_std_normal(i1_dis)
            + self._kl_std_normal(i2_dis)
            + self._kl_std_normal(nu_dis)
            + self._kl_std_normal(ni1_dis)
            + self._kl_std_normal(ni2_dis)
        ) / 3
        return (1 - self.alpha) * gen + self.alpha * kld

    def user_item_embeddings(self, params):
        u_mu, _ = self.user_encode(params, jnp.arange(self.n_users))
        i_mu, _ = self.item_encode(params, jnp.arange(self.n_items))
        u_full = jnp.concatenate([u_mu, params["user_emb"]], axis=-1)
        i_full = jnp.concatenate([i_mu, params["item_emb"]], axis=-1)
        return u_full, i_full
