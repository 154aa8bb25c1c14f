"""Triple2vec: (user, item, item) basket-triple skip-gram with negatives.

Reference parity: beta_rec/models/triple2vec.py:8-171 — user embedding + two
item embedding tables (tied when use_bias), per-element skip-gram losses: for
each of (u | i1+i2), (i1 | u+i2), (i2 | u+i1): logsigmoid(positive dot + bias)
plus logsigmoid(-negative dots) over n_neg sampled negatives; total averaged
over 3 * batch. Prediction: u · (i1_emb + i2_emb)/2.
"""

import jax
import jax.numpy as jnp

from ..ops.gather import table_lookup
from .base import RecModel


class Triple2vec(RecModel):
    batch_kind = "triple"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.n_neg = int(config.get("n_neg", 5))
        self.tie_items = bool(config.get("use_bias", True))

    def init_params(self, rng):
        keys = jax.random.split(rng, 3)
        uni = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -0.01, 0.01)
        return {
            "user_emb": uni(keys[0], (self.n_users, self.emb_dim)),
            "item_emb1": uni(keys[1], (self.n_items, self.emb_dim)),
            "item_emb2": uni(keys[2], (self.n_items, self.emb_dim)),
            "user_bias": jnp.zeros((self.n_users,), jnp.float32),
            "item_bias": jnp.zeros((self.n_items,), jnp.float32),
        }

    def _item_tables(self, params):
        if self.tie_items:
            return params["item_emb1"], params["item_emb1"]
        return params["item_emb1"], params["item_emb2"]

    def loss(self, params, batch, rng):
        u, i1, i2 = batch["users"], batch["item1"], batch["item2"]
        nu, ni1, ni2 = batch["neg_users"], batch["neg_item1"], batch["neg_item2"]
        it1, it2 = self._item_tables(params)
        e_u = table_lookup(params["user_emb"], u)
        e_1 = table_lookup(it1, i1)
        e_2 = table_lookup(it2, i2)
        B = u.shape[0]

        def skipgram(center_emb, context, center_bias, neg_emb, neg_bias):
            pos = jax.nn.log_sigmoid(jnp.sum(center_emb * context, axis=-1) + center_bias)
            # HIGHEST precision on the skip-gram dots: the +-0.01-init
            # embeddings produce +-1e-4 products that the MXU's default bf16
            # operand passes round coarsely; this einsum is a tiny share of
            # the (already fast) triple epoch, unlike the global lookup VJP
            # where the same setting cost dense MF ~17% (reverted there).
            neg_dots = jnp.einsum(
                "bnd,bd->bn", neg_emb, center_emb,
                precision=jax.lax.Precision.HIGHEST,
            ) + neg_bias
            neg = jax.nn.log_sigmoid(-neg_dots)
            return -(jnp.sum(pos) + jnp.sum(neg))

        l_u = skipgram(
            e_u, e_1 + e_2, table_lookup(params["user_bias"], u),
            params["user_emb"][nu], params["user_bias"][nu],
        )
        l_1 = skipgram(
            e_1, e_u + e_2, table_lookup(params["item_bias"], i1),
            it1[ni1], params["item_bias"][ni1],
        )
        l_2 = skipgram(
            e_2, e_u + e_1, table_lookup(params["item_bias"], i2),
            it2[ni2], params["item_bias"][ni2],
        )
        return (l_u + l_1 + l_2) / (3 * B)

    def user_item_embeddings(self, params):
        it1, it2 = self._item_tables(params)
        return params["user_emb"], (it1 + it2) / 2
