"""NARM: neural attentive session-based recommendation (GRU + attention).

Reference parity: beta_rec/models/narm.py:17-217 — item embedding (pad 0),
GRU encoder, global representation = last hidden state, local representation =
attention over hidden states (alpha = v^T sigmoid(A1 h_t + A2 h_T)), session
vector c = [c_local, c_global], scores = c @ B(item_embs)^T, CrossEntropy over
the catalog. The reference's pack_padded GRU becomes a masked lax.scan over a
left-padded fixed-length sequence (hidden carries through pad positions).

Training data: (prefix, target) expansions of user histories
(SequentialData.prefix_target_arrays), batch_kind "prefix".
"""

import jax
import jax.numpy as jnp

from ..ops.attention import inverted_dropout
from ..ops.gather import table_lookup
from .base import RecModel


def _gru_init(rng, in_dim, hidden):
    keys = jax.random.split(rng, 6)
    xavier = jax.nn.initializers.xavier_uniform()
    return {
        "wz": xavier(keys[0], (in_dim, hidden), jnp.float32),
        "uz": xavier(keys[1], (hidden, hidden), jnp.float32),
        "bz": jnp.zeros((hidden,), jnp.float32),
        "wr": xavier(keys[2], (in_dim, hidden), jnp.float32),
        "ur": xavier(keys[3], (hidden, hidden), jnp.float32),
        "br": jnp.zeros((hidden,), jnp.float32),
        "wn": xavier(keys[4], (in_dim, hidden), jnp.float32),
        "un": xavier(keys[5], (hidden, hidden), jnp.float32),
        "bn": jnp.zeros((hidden,), jnp.float32),
    }


def gru_scan(p, xs, mask, h0):
    """Masked GRU over time: xs (B, T, D), mask (B, T) -> outputs (B, T, H), h_T."""

    def step(h, inputs):
        x, m = inputs
        z = jax.nn.sigmoid(x @ p["wz"] + h @ p["uz"] + p["bz"])
        r = jax.nn.sigmoid(x @ p["wr"] + h @ p["ur"] + p["br"])
        n = jnp.tanh(x @ p["wn"] + r * (h @ p["un"]) + p["bn"])
        h_new = (1 - z) * n + z * h
        h = jnp.where(m[:, None], h_new, h)
        return h, h

    xs_t = jnp.swapaxes(xs, 0, 1)  # (T, B, D)
    mask_t = jnp.swapaxes(mask, 0, 1)
    h_final, outs = jax.lax.scan(step, h0, (xs_t, mask_t))
    return jnp.swapaxes(outs, 0, 1), h_final


class NARM(RecModel):
    batch_kind = "prefix"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.hidden_size = int(config.get("hidden_size", 100))
        self.embedding_dim = int(config.get("embedding_dim", config.get("emb_dim", 50)))
        self.dropout_input = float(config.get("dropout_input", 0.25))
        self.dropout_hidden = float(config.get("dropout_hidden", 0.5))
        ctx = self.artifacts.get("ctx")
        self.ctx = jnp.asarray(ctx) if ctx is not None else None

    def with_context(self, ctx):
        import copy

        clone = copy.copy(self)
        clone.ctx = jnp.asarray(ctx)
        return clone

    def init_params(self, rng):
        keys = jax.random.split(rng, 6)
        params = {
            "item_emb": self._normal(keys[0], (self.n_items + 1, self.embedding_dim)),
            "gru": _gru_init(keys[1], self.embedding_dim, self.hidden_size),
            "a1": jax.nn.initializers.xavier_uniform()(
                keys[2], (self.hidden_size, self.hidden_size), jnp.float32
            ),
            "a2": jax.nn.initializers.xavier_uniform()(
                keys[3], (self.hidden_size, self.hidden_size), jnp.float32
            ),
            "v": jax.nn.initializers.xavier_uniform()(
                keys[4], (self.hidden_size, 1), jnp.float32
            ),
            "b": jax.nn.initializers.xavier_uniform()(
                keys[5], (self.embedding_dim, 2 * self.hidden_size), jnp.float32
            ),
        }
        params["item_emb"] = params["item_emb"].at[0].set(0.0)
        return params

    def session_vector(self, params, seq, rng=None):
        """Encode (B, T) 1-indexed padded sequences into (B, 2H) session vectors."""
        mask = seq != 0
        embs = table_lookup(params["item_emb"], seq)
        if rng is not None and self.dropout_input > 0:
            rng, sub = jax.random.split(rng)
            embs = inverted_dropout(sub, embs, self.dropout_input)
        h0 = jnp.zeros((seq.shape[0], self.hidden_size), jnp.float32)
        gru_out, ht = gru_scan(params["gru"], embs, mask, h0)
        q1 = gru_out @ params["a1"]  # (B, T, H)
        q2 = (ht @ params["a2"])[:, None, :]  # (B, 1, H)
        q2_masked = jnp.where(mask[..., None], q2, 0.0)
        alpha = (jax.nn.sigmoid(q1 + q2_masked) @ params["v"])[..., 0]  # (B, T)
        c_local = jnp.sum(alpha[..., None] * gru_out * mask[..., None], axis=1)
        c = jnp.concatenate([c_local, ht], axis=1)
        if rng is not None and self.dropout_hidden > 0:
            rng, sub = jax.random.split(rng)
            c = inverted_dropout(sub, c, self.dropout_hidden)
        return c

    def _all_item_logits(self, params, c):
        item_proj = params["item_emb"] @ params["b"]  # (n_items+1, 2H)
        return c @ item_proj.T  # (B, n_items+1)

    def loss(self, params, batch, rng):
        """CrossEntropy over the catalog for each (prefix, target) example."""
        seq, target = batch["seq"], batch["target"]  # target 1-indexed
        c = self.session_vector(params, seq, rng=rng)
        logits = self._all_item_logits(params, c)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(log_probs, target[:, None], axis=1))

    def score_candidates(self, params, users, cand_items):
        assert self.ctx is not None, "NARM needs artifacts['ctx'] for scoring"
        c = self.session_vector(params, self.ctx[users])
        logits = self._all_item_logits(params, c)
        return jnp.take_along_axis(logits, cand_items + 1, axis=1)

    def score_all(self, params, users):
        assert self.ctx is not None
        c = self.session_vector(params, self.ctx[users])
        return self._all_item_logits(params, c)[:, 1:]
