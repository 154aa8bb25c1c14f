"""CMN: collaborative memory network with multi-hop neighborhood attention.

Reference parity: beta_rec/models/cmn.py:12-200 + vlml.py:7-124 — user/item
memories warm-started from PairwiseGMF embeddings; for a (u, i) pair the
memory module attends over the users who interacted with item i
(z = m_u + e_i; hop k: z = relu(W z + o) with o the attention-weighted user
*output* memories); score = v^T relu(W_d [m_u ⊙ e_i ; o] + b). BPR over
(pos, neg) + l2 on the hop/dense/output weights; grad-clip handled by the
optimizer chain.

TPU redesign: item->user neighborhoods are a fixed padded matrix
(artifacts "item_neighbors" (n_items, max_nb) int32, "item_nb_len" (n_items,))
so the whole batch is fixed-shape masked attention — no variable-length
slicing (vlml.py:93-99 slices to the batch max, a dynamic shape).
Batch kind is plain pairwise; neighborhoods are gathered inside the loss.
"""

import jax
import jax.numpy as jnp

from ..ops.gather import table_lookup
from .base import RecModel
from .losses import bpr_loss

NEG_INF = -1e30


class CMN(RecModel):
    batch_kind = "pairwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.hops = int(config.get("hops", 2))
        self.l2_lambda = float(config.get("training_l2_lambda", 0.1))
        self.item_neighbors = jnp.asarray(self.artifacts["item_neighbors"])
        self.item_nb_len = jnp.asarray(self.artifacts["item_nb_len"])
        self.pre_user = self.artifacts.get("user_embeddings")
        self.pre_item = self.artifacts.get("item_embeddings")

    def init_params(self, rng):
        keys = jax.random.split(rng, 6)
        trunc = jax.nn.initializers.truncated_normal(0.01)
        d = self.emb_dim
        params = {
            "user_memory": (
                jnp.asarray(self.pre_user)
                if self.pre_user is not None
                else trunc(keys[0], (self.n_users, d), jnp.float32)
            ),
            "item_memory": (
                jnp.asarray(self.pre_item)
                if self.pre_item is not None
                else trunc(keys[1], (self.n_items, d), jnp.float32)
            ),
            "user_output": trunc(keys[2], (self.n_users, d), jnp.float32),
            "hop_maps": [],
            "dense_w": jax.nn.initializers.he_normal()(keys[3], (2 * d, d), jnp.float32),
            "dense_b": jnp.ones((d,), jnp.float32),
            "out_w": jax.nn.initializers.xavier_uniform()(keys[4], (d, 1), jnp.float32),
        }
        hop_keys = jax.random.split(keys[5], max(self.hops - 1, 1))
        for h in range(self.hops - 1):
            params["hop_maps"].append(
                {
                    "w": jax.nn.initializers.he_normal()(hop_keys[h], (d, d), jnp.float32),
                    "b": jnp.ones((d,), jnp.float32),
                }
            )
        return params

    def _memory_attention(self, params, users, items):
        """Multi-hop attention over item i's interacting users -> (B, d)."""
        nb = self.item_neighbors[items]  # (B, M) user ids (0-padded)
        nb_len = self.item_nb_len[items]  # (B,)
        M = nb.shape[1]
        slot_valid = jnp.arange(M)[None, :] < nb_len[:, None]
        mem = params["user_memory"][nb]  # (B, M, d)
        out_mem = params["user_output"][nb]  # (B, M, d)

        z = table_lookup(params["user_memory"], users) + table_lookup(params["item_memory"], items)
        o = None
        for h in range(self.hops):
            if h > 0:
                hop = params["hop_maps"][h - 1]
                z = jax.nn.relu(z @ hop["w"] + hop["b"] + o)
            scores = jnp.einsum("bd,bmd->bm", z, mem)
            scores = jnp.where(slot_valid, scores, NEG_INF)
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bm,bmd->bd", attn, out_mem)
        return o

    def _score(self, params, users, items):
        pointwise = table_lookup(params["user_memory"], users) * table_lookup(params["item_memory"], items)
        neighbor = self._memory_attention(params, users, items)
        h = jax.nn.relu(
            jnp.concatenate([pointwise, neighbor], axis=-1) @ params["dense_w"]
            + params["dense_b"]
        )
        return (h @ params["out_w"])[..., 0]

    def score_pairs(self, params, users, items):
        return self._score(params, users, items)

    def score_candidates(self, params, users, cand_items):
        B, C = cand_items.shape
        users_b = jnp.broadcast_to(users[:, None], (B, C)).reshape(-1)
        flat = self._score(params, users_b, cand_items.reshape(-1))
        return flat.reshape(B, C)

    def loss(self, params, batch, rng):
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        pos_score = self._score(params, users, pos)
        neg_score = self._score(params, users, neg)
        loss = bpr_loss(pos_score, neg_score)
        reg = jnp.sqrt(jnp.sum(params["dense_w"] ** 2)) + jnp.sqrt(
            jnp.sum(params["out_w"] ** 2)
        )
        for hop in params["hop_maps"]:
            reg = reg + jnp.sqrt(jnp.sum(hop["w"] ** 2))
        return loss + self.l2_lambda * reg


def build_item_neighborhoods(train_csr, max_neighbors=None):
    """Padded item->users neighborhood arrays from the interaction CSR."""
    import numpy as np

    csc = train_csr.tocsc()
    n_items = csc.shape[1]
    lens = np.diff(csc.indptr)
    M = int(max_neighbors or max(lens.max(), 1))
    nb = np.zeros((n_items, M), dtype=np.int32)
    for i in range(n_items):
        users = csc.indices[csc.indptr[i] : csc.indptr[i + 1]][:M]
        nb[i, : len(users)] = users
    return nb, np.minimum(lens, M).astype(np.int32)
