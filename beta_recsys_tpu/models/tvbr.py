"""TVBR: temporal variational Bayes recommender (time-conditioned VBCAR).

Reference parity: beta_rec/models/tvbr.py:11-571 — triples carry a time-bucket
index t (time-bucketed triple sampler, utils/triple_sampler.py:75-136);
user/item encoders condition on a one-hot time embedding concatenated with the
base variational features; the KL prior for time t is the same encoder
evaluated at time t-1 (temporal smoothing); GEN skip-gram loss as VBCAR.
Prediction conditions on the final time bucket.
"""

import jax
import jax.numpy as jnp

from ..ops.gather import table_lookup

from .mlp import _dense_init
from .vbcar import VBCAR


class TVBR(VBCAR):
    batch_kind = "triple"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.time_step = int(config.get("time_step", 4))
        self.time_dim = self.time_step + 1

    def init_params(self, rng):
        keys = jax.random.split(rng, 10)
        params = super().init_params(keys[0])
        # Base encoders output emb_dim*2 (mu, logvar); the temporal heads remap
        # [base_stat, one_hot(t), features] -> emb_dim per statistic.
        fu = self.user_fea.shape[1]
        fi = self.item_fea.shape[1]
        params["time2mean_u"] = _dense_init(keys[1], self.emb_dim + self.time_dim + fu, self.emb_dim)
        params["time2std_u"] = _dense_init(keys[2], self.emb_dim + self.time_dim + fu, self.emb_dim)
        params["time2mean_i"] = _dense_init(keys[3], self.emb_dim + self.time_dim + fi, self.emb_dim)
        params["time2std_i"] = _dense_init(keys[4], self.emb_dim + self.time_dim + fi, self.emb_dim)
        return params

    def _one_hot_time(self, t):
        return jax.nn.one_hot(t, self.time_dim, dtype=jnp.float32)

    def _encode_time(self, params, idx, t, side):
        """Time-conditioned (mu, logvar) at time t and at the prior time t-1."""
        fea = self.user_fea if side == "u" else self.item_fea
        base_mu, base_logvar = (
            self.user_encode(params, idx) if side == "u" else self.item_encode(params, idx)
        )
        x_fea = fea[idx]
        tl = self._one_hot_time(t)
        tl_pri = self._one_hot_time(jnp.maximum(t - 1, 0))
        if tl.ndim < base_mu.ndim:
            tl = jnp.broadcast_to(tl[..., None, :], base_mu.shape[:-1] + (self.time_dim,))
            tl_pri = jnp.broadcast_to(tl_pri[..., None, :], base_mu.shape[:-1] + (self.time_dim,))
        mean_head = params[f"time2mean_{side}"]
        std_head = params[f"time2std_{side}"]

        def head(stat, latent, p):
            return jnp.concatenate([stat, latent, x_fea], axis=-1) @ p["w"] + p["b"]

        cur = (head(base_mu, tl, mean_head), head(base_logvar, tl, std_head))
        pri = (head(base_mu, tl_pri, mean_head), head(base_logvar, tl_pri, std_head))
        return cur, pri

    @staticmethod
    def _kl_pair(post, prior):
        """Mean KL(post || prior) between diagonal Gaussians."""
        mu1, logvar1 = post
        mu2, logvar2 = prior
        var1 = jnp.exp(logvar1) + 1e-10
        var2 = jnp.exp(logvar2) + 1e-10
        kl = 0.5 * (jnp.log(var2 / var1) - 1 + var1 / var2 + (mu2 - mu1) ** 2 / var2)
        kl = jnp.sum(kl, axis=-1)
        if kl.ndim > 1:
            kl = jnp.sum(kl, axis=-1)
        return jnp.mean(kl)

    def loss(self, params, batch, rng):
        u, i1, i2, t = batch["users"], batch["item1"], batch["item2"], batch["t"]
        nu, ni1, ni2 = batch["neg_users"], batch["neg_item1"], batch["neg_item2"]
        B = u.shape[0]
        keys = jax.random.split(rng, 6)

        u_cur, u_pri = self._encode_time(params, u, t, "u")
        i1_cur, i1_pri = self._encode_time(params, i1, t, "i")
        i2_cur, i2_pri = self._encode_time(params, i2, t, "i")
        nu_cur, nu_pri = self._encode_time(params, nu, t, "u")
        ni1_cur, ni1_pri = self._encode_time(params, ni1, t, "i")
        ni2_cur, ni2_pri = self._encode_time(params, ni2, t, "i")

        cat = jnp.concatenate
        e_u = cat([self._sample(keys[0], u_cur), table_lookup(params["user_emb"], u)], -1)
        e_1 = cat([self._sample(keys[1], i1_cur), table_lookup(params["item_emb"], i1)], -1)
        e_2 = cat([self._sample(keys[2], i2_cur), table_lookup(params["item_emb"], i2)], -1)
        e_nu = cat([self._sample(keys[3], nu_cur), params["user_emb"][nu]], -1)
        e_n1 = cat([self._sample(keys[4], ni1_cur), params["item_emb"][ni1]], -1)
        e_n2 = cat([self._sample(keys[5], ni2_cur), params["item_emb"][ni2]], -1)

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
            self._kl_pair(u_cur, u_pri)
            + self._kl_pair(i1_cur, i1_pri)
            + self._kl_pair(i2_cur, i2_pri)
            + self._kl_pair(nu_cur, nu_pri)
            + self._kl_pair(ni1_cur, ni1_pri)
            + self._kl_pair(ni2_cur, ni2_pri)
        ) / 3
        return (1 - self.alpha) * gen + self.alpha * kld

    def user_item_embeddings(self, params):
        t_final = jnp.full((self.n_users,), self.time_step, jnp.int32)
        (u_mu, _), _ = self._encode_time(params, jnp.arange(self.n_users), t_final, "u")
        t_final_i = jnp.full((self.n_items,), self.time_step, jnp.int32)
        (i_mu, _), _ = self._encode_time(params, jnp.arange(self.n_items), t_final_i, "i")
        u_full = jnp.concatenate([u_mu, params["user_emb"]], axis=-1)
        i_full = jnp.concatenate([i_mu, params["item_emb"]], axis=-1)
        return u_full, i_full
