"""TiSASRec: time-interval-aware self-attention for sequential recommendation.

Reference parity: beta_rec/models/tisasrec.py:47-424 — SASRec structure plus:
learned embeddings over clipped pairwise time intervals feed the attention as
additive K and V terms, and absolute-position K/V embeddings replace the
single position table. attn = (Q K^T + Q posK^T + <tmK, Q>) / sqrt(dh);
out = attn V + attn posV + <attn, tmV>. Loss identical to SASRec (masked BCE).

The reference's O(users * L^2) Python relation-matrix loops
(recommenders/tisasrec.py:108-156) are replaced by a vectorized outer
difference |t_i - t_j| clipped to time_span
(SequentialData.tisasrec_arrays).
"""

import jax
import jax.numpy as jnp

from ..ops.gather import table_lookup

from ..ops.attention import (
    init_ffn_params,
    init_ln_params,
    inverted_dropout,
    layer_norm,
    pointwise_ffn,
)
from .sasrec import SASRec

NEG_INF = -1e30


def _time_aware_mha(params_blk, q, k, time_k, time_v, pos_k, pos_v, n_heads):
    """Time-aware attention: q/k (B,T,D); time_k/v (B,T,T,D); pos_k/v (T,D)."""
    B, T, D = q.shape
    dh = D // n_heads

    def heads(x):
        return x.reshape(*x.shape[:-1], n_heads, dh)

    Q = heads(q @ params_blk["wq"])
    K = heads(k @ params_blk["wk"])
    V = heads(k @ params_blk["wv"])
    tK = heads(time_k)  # (B,T,T,h,dh)
    tV = heads(time_v)
    pK = heads(pos_k)  # (T,h,dh)
    pV = heads(pos_v)

    logits = jnp.einsum("bqhd,bkhd->bhqk", Q, K)
    logits += jnp.einsum("bqhd,khd->bhqk", Q, pK)
    logits += jnp.einsum("bqkhd,bqhd->bhqk", tK, Q)
    logits = logits / jnp.sqrt(dh).astype(q.dtype)
    causal = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(causal[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, V)
    out += jnp.einsum("bhqk,khd->bqhd", probs, pV)
    out += jnp.einsum("bhqk,bqkhd->bqhd", probs, tV)
    return out.reshape(B, T, D) @ params_blk["wo"]


class TiSASRec(SASRec):
    batch_kind = "sequence_time"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        # TiSASRec's conventional default is 50 (configs/tisasrec_default.json);
        # keep model and wrapper/engine defaults identical.
        self.maxlen = int(config.get("maxlen", 50))
        self.time_span = int(config.get("time_span", 256))
        tm = self.artifacts.get("ctx_time")
        self.ctx_time = jnp.asarray(tm) if tm is not None else None

    def with_context(self, ctx, ctx_time=None):
        clone = super().with_context(ctx)
        if ctx_time is not None:
            clone.ctx_time = jnp.asarray(ctx_time)
        return clone

    def init_params(self, rng):
        keys = jax.random.split(rng, 7 + 2 * self.num_blocks)
        d = self.emb_dim
        params = {
            "item_emb": self._normal(keys[0], (self.n_items + 1, d)),
            "abs_pos_k": self._normal(keys[1], (self.maxlen, d)),
            "abs_pos_v": self._normal(keys[2], (self.maxlen, d)),
            "time_k": self._normal(keys[3], (self.time_span + 1, d)),
            "time_v": self._normal(keys[4], (self.time_span + 1, d)),
            "blocks": [],
            "last_ln": init_ln_params(d),
        }
        params["item_emb"] = params["item_emb"].at[0].set(0.0)
        xavier = jax.nn.initializers.xavier_uniform()
        for i in range(self.num_blocks):
            k1, k2 = keys[5 + 2 * i], keys[6 + 2 * i]
            sub = jax.random.split(k1, 4)
            params["blocks"].append(
                {
                    "attn_ln": init_ln_params(d),
                    "attn": {
                        "wq": xavier(sub[0], (d, d), jnp.float32),
                        "wk": xavier(sub[1], (d, d), jnp.float32),
                        "wv": xavier(sub[2], (d, d), jnp.float32),
                        "wo": xavier(sub[3], (d, d), jnp.float32),
                    },
                    "ffn_ln": init_ln_params(d),
                    "ffn": init_ffn_params(k2, d),
                }
            )
        return params

    def seq2feats(self, params, log_seqs, time_matrices, rng=None):
        d = self.emb_dim
        T = log_seqs.shape[1]
        seqs = table_lookup(params["item_emb"], log_seqs) * jnp.sqrt(d).astype(jnp.float32)
        if rng is not None and self.dropout_rate > 0:
            rng, sub = jax.random.split(rng)
            seqs = inverted_dropout(sub, seqs, self.dropout_rate)
        tm = jnp.clip(time_matrices, 0, self.time_span)
        time_k = params["time_k"][tm]  # (B,T,T,D)
        time_v = params["time_v"][tm]
        pos_k = params["abs_pos_k"][self.maxlen - T :]
        pos_v = params["abs_pos_v"][self.maxlen - T :]
        timeline = (log_seqs != 0)[..., None].astype(seqs.dtype)
        seqs = seqs * timeline
        for blk in params["blocks"]:
            q = layer_norm(seqs, blk["attn_ln"]["scale"], blk["attn_ln"]["bias"])
            out = _time_aware_mha(
                blk["attn"], q, seqs, time_k, time_v, pos_k, pos_v, self.num_heads
            )
            seqs = q + out
            seqs = layer_norm(seqs, blk["ffn_ln"]["scale"], blk["ffn_ln"]["bias"])
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            seqs = pointwise_ffn(seqs, blk["ffn"], self.dropout_rate, sub)
            seqs = seqs * timeline
        return layer_norm(seqs, params["last_ln"]["scale"], params["last_ln"]["bias"])

    def loss(self, params, batch, rng):
        seq, pos, neg, tm = batch["seq"], batch["pos"], batch["neg"], batch["time_matrix"]
        feats = self.seq2feats(params, seq, tm, rng=rng)
        pos_logits = jnp.sum(feats * table_lookup(params["item_emb"], pos), axis=-1)
        neg_logits = jnp.sum(feats * table_lookup(params["item_emb"], neg), axis=-1)
        mask = (pos != 0).astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(mask), 1.0)
        loss = jnp.sum(
            (jax.nn.softplus(-pos_logits) + jax.nn.softplus(neg_logits)) * mask
        ) / n_valid
        if self.l2_emb > 0:
            loss = loss + self.l2_emb * jnp.sqrt(jnp.sum(params["item_emb"] ** 2))
        return loss

    def _final_feats(self, params, ctx_rows, ctx_time_rows):
        feats = self.seq2feats(params, ctx_rows, ctx_time_rows)
        return feats[:, -1, :]

    def score_candidates(self, params, users, cand_items):
        assert self.ctx is not None and self.ctx_time is not None
        final = self._final_feats(params, self.ctx[users], self.ctx_time[users])
        cand_emb = params["item_emb"][cand_items + 1]
        return jnp.einsum("ud,ucd->uc", final, cand_emb)

    def score_all(self, params, users):
        assert self.ctx is not None and self.ctx_time is not None
        final = self._final_feats(params, self.ctx[users], self.ctx_time[users])
        return final @ params["item_emb"][1:].T
