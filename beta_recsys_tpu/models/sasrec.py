"""SASRec: causal self-attention over item sequences.

Reference parity: beta_rec/models/sasrec.py:8-240 — item embedding table with
padding idx 0 (n_items+1 rows) scaled by sqrt(d), learned position embeddings,
num_blocks of [LN -> causal MHA (residual from normalized Q) -> LN -> pointwise
FFN] with timeline masking, final LN; training scores every position against
its next-item target and a sampled negative with BCE-with-logits masked where
pos != 0, plus l2_emb * ||item_emb||_F (Frobenius norm, not squared — matching
the reference's torch.norm at sasrec.py:220).

TPU redesign: the WarpSampler multiprocess queue (recommenders/sasrec.py:80-130)
is gone — (seq, pos) arrays are deterministic (data/sequential_data.py) and
negatives are drawn on device in the jitted step. Chronology is forward (see
SequentialData docstring for the reference's reversed-time quirk).

Candidate scoring uses each user's train-sequence context (artifacts["ctx"]),
dense 0-indexed candidate ids are shifted +1 internally.
"""

import copy

import jax
import jax.numpy as jnp

from ..ops.gather import table_lookup
from ..ops.attention import (
    causal_mha,
    init_ffn_params,
    init_ln_params,
    init_mha_params,
    inverted_dropout,
    layer_norm,
    pointwise_ffn,
)
from .base import RecModel


class SASRec(RecModel):
    batch_kind = "sequence"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.maxlen = int(config.get("maxlen", 200))
        self.num_blocks = int(config.get("num_blocks", 2))
        self.num_heads = int(config.get("num_heads", 2))
        self.dropout_rate = float(config.get("dropout_rate", 0.1))
        self.l2_emb = float(config.get("l2_emb", 0.0))
        # "auto" = Pallas flash-attention kernel on TPU, einsum elsewhere.
        self.fused_attention = config.get("fused_attention", "auto")
        # MXU guidance: attention/FFN matmuls in bfloat16 with fp32 params
        # ("compute_dtype": "bfloat16"); losses/logits stay fp32.
        self.compute_dtype = (
            jnp.bfloat16 if config.get("compute_dtype") == "bfloat16" else jnp.float32
        )
        ctx = self.artifacts.get("ctx")
        self.ctx = jnp.asarray(ctx) if ctx is not None else None

    def with_context(self, ctx):
        """Light copy scoring against a different per-user context matrix
        (e.g. train+valid for final test)."""
        clone = copy.copy(self)
        clone.ctx = jnp.asarray(ctx)
        return clone

    def init_params(self, rng):
        keys = jax.random.split(rng, 2 + 2 * self.num_blocks)
        d = self.emb_dim
        params = {
            "item_emb": self._normal(keys[0], (self.n_items + 1, d)),
            "pos_emb": self._normal(keys[1], (self.maxlen, d)),
            "blocks": [],
            "last_ln": init_ln_params(d),
        }
        # Zero the padding row so masked positions contribute nothing.
        params["item_emb"] = params["item_emb"].at[0].set(0.0)
        for i in range(self.num_blocks):
            params["blocks"].append(
                {
                    "attn_ln": init_ln_params(d),
                    "attn": init_mha_params(keys[2 + 2 * i], d),
                    "ffn_ln": init_ln_params(d),
                    "ffn": init_ffn_params(keys[3 + 2 * i], d),
                }
            )
        return params

    def log2feats(self, params, log_seqs, rng=None, seq_emb_raw=None):
        """Encode (B, T) item id sequences -> (B, T, D) features.

        ``seq_emb_raw`` (optional) skips the internal item-table lookup and
        uses pre-gathered unscaled rows — the loss shares ONE gather between
        the input sequence and its shifted next-item targets.
        """
        if self.compute_dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(self.compute_dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                params,
            )
        d = self.emb_dim
        raw = (seq_emb_raw.astype(self.compute_dtype) if seq_emb_raw is not None
               else table_lookup(params["item_emb"], log_seqs))
        seqs = raw * jnp.sqrt(d).astype(self.compute_dtype)
        T = log_seqs.shape[1]
        seqs = seqs + params["pos_emb"][None, self.maxlen - T :, :]
        if rng is not None and self.dropout_rate > 0:
            rng, sub = jax.random.split(rng)
            seqs = inverted_dropout(sub, seqs, self.dropout_rate)
        timeline = (log_seqs != 0)[..., None].astype(seqs.dtype)
        seqs = seqs * timeline
        for blk in params["blocks"]:
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            q = layer_norm(seqs, blk["attn_ln"]["scale"], blk["attn_ln"]["bias"])
            attn_out = causal_mha(
                q, seqs, seqs, self.num_heads,
                blk["attn"]["wq"], blk["attn"]["wk"], blk["attn"]["wv"], blk["attn"]["wo"],
                dropout_rate=self.dropout_rate, rng=sub,
                fused=self.fused_attention,
            )
            seqs = q + attn_out
            seqs = layer_norm(seqs, blk["ffn_ln"]["scale"], blk["ffn_ln"]["bias"])
            sub2 = None
            if rng is not None:
                rng, sub2 = jax.random.split(rng)
            seqs = pointwise_ffn(seqs, blk["ffn"], self.dropout_rate, sub2)
            seqs = seqs * timeline
        return layer_norm(seqs, params["last_ln"]["scale"], params["last_ln"]["bias"])

    def loss(self, params, batch, rng):
        """Masked BCE-with-logits over (pos, neg) at every sequence position.

        ``pos`` is ``seq`` shifted by one (data/sequential_data.py builds
        tgt = items[1:] against inp = items[:-1]), so ONE gather of the
        (B, T+1) extended sequence serves both the encoder input and the
        positive targets — a 1/3 cut of the lookup rows the r5 ablation
        found dominating the step (tools/prof_sasrec_ablation.py: 40.8%).
        The only positions where ext[:, 1:] differs from ``pos`` are pad
        slots (pos == 0), which the loss mask zeroes either way.
        """
        seq, pos, neg = batch["seq"], batch["pos"], batch["neg"]
        ext = jnp.concatenate([seq, pos[:, -1:]], axis=1)
        ext_emb = table_lookup(params["item_emb"], ext)
        feats = self.log2feats(params, seq, rng=rng, seq_emb_raw=ext_emb[:, :-1])
        pos_emb = jnp.where((pos != 0)[..., None], ext_emb[:, 1:], 0.0)
        neg_emb = table_lookup(params["item_emb"], neg)
        pos_logits = jnp.sum(feats * pos_emb, axis=-1)
        neg_logits = jnp.sum(feats * neg_emb, axis=-1)
        mask = (pos != 0).astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(mask), 1.0)
        # BCE(pos; 1) + BCE(neg; 0), stable logit form, masked mean.
        pos_ce = jax.nn.softplus(-pos_logits)
        neg_ce = jax.nn.softplus(neg_logits)
        loss = jnp.sum((pos_ce + neg_ce) * mask) / n_valid
        if self.l2_emb > 0:
            loss = loss + self.l2_emb * jnp.sqrt(jnp.sum(params["item_emb"] ** 2))
        return loss

    def _final_feats(self, params, ctx_rows):
        feats = self.log2feats(params, ctx_rows)
        return feats[:, -1, :]

    def score_candidates(self, params, users, cand_items):
        """(U,), (U, C) dense 0-indexed candidates -> (U, C) logits."""
        assert self.ctx is not None, "SASRec needs artifacts['ctx'] for scoring"
        final = self._final_feats(params, self.ctx[users])
        cand_emb = params["item_emb"][cand_items + 1]
        return jnp.einsum("ud,ucd->uc", final, cand_emb)

    def score_all(self, params, users):
        assert self.ctx is not None
        final = self._final_feats(params, self.ctx[users])
        return final @ params["item_emb"][1:].T

    def score_pairs(self, params, users, items):
        """Per-pair scores against each user's context (Recommender.predict)."""
        assert self.ctx is not None
        final = self._final_feats(params, self.ctx[users])
        return jnp.sum(final * params["item_emb"][items + 1], axis=-1)
