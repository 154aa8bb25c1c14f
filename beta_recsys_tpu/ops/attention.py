"""Causal multi-head self-attention blocks for sequence recommenders.

Implements the SASRec transformer block structure (reference:
beta_rec/models/sasrec.py:92-136 — pre-LayerNorm on Q only, residual from the
normalized query, pointwise feed-forward with residual, timeline masking) as
fused jnp einsums. At recommender sequence lengths (maxlen <= ~1k,
SURVEY §5 long-context note) one fused attention matmul per block maps
straight onto the MXU; no flash/blockwise attention is needed.
"""

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def layer_norm(x, scale, bias, eps=1e-8):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def inverted_dropout(rng, x, rate):
    """Inverted dropout: identity when rng is None or rate <= 0."""
    if rng is None or rate <= 0:
        return x
    keep = jax.random.bernoulli(rng, 1 - rate, x.shape)
    return jnp.where(keep, x / (1 - rate), 0.0)


_dropout = inverted_dropout  # internal alias


def causal_mha(q, k, v, n_heads, wq, wk, wv, wo, dropout_rate=0.0, rng=None, fused="auto"):
    """Causal multi-head attention: (B, T, D) -> (B, T, D).

    Weights are (D, D); heads split the model dim. The causal mask permits
    attention to self and earlier positions only.

    `fused="auto"` routes the softmax(QK^T)V core through the Pallas
    flash-attention kernel on TPU (ops/pallas/flash_attention.py) — the QKV/
    output projections stay in XLA where the MXU already handles them — and
    keeps the einsum path elsewhere. Pass True/False to force either path.
    The Mosaic PRNG is stubbed off-TPU, so a dropout-active fused call falls
    back to einsum in interpret mode.
    """
    B, T, D = q.shape
    dh = D // n_heads
    if fused == "auto":
        fused = jax.default_backend() == "tpu"
    rate = dropout_rate if rng is not None else 0.0
    if fused and rate > 0 and jax.default_backend() != "tpu":
        fused = False
    if fused:
        from .pallas.flash_attention import flash_causal_attention

        def split_heads(x, w):
            h = (x @ w).reshape(B, T, n_heads, dh)
            return h.transpose(0, 2, 1, 3).reshape(B * n_heads, T, dh)

        qf = split_heads(q, wq)
        kf = split_heads(k, wk)
        vf = split_heads(v, wv)
        if rate > 0:
            seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        out = flash_causal_attention(qf, kf, vf, seed, rate)
        out = out.reshape(B, n_heads, T, dh).transpose(0, 2, 1, 3).reshape(B, T, D)
        return out.astype(q.dtype) @ wo

    def split(x, w):
        return (x @ w).reshape(B, T, n_heads, dh)

    qh, kh, vh = split(q, wq), split(k, wk), split(v, wv)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(dh).astype(q.dtype)
    causal = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(causal[None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = _dropout(rng, probs, dropout_rate)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, T, D)
    return out @ wo


def init_mha_params(rng, dim):
    keys = jax.random.split(rng, 4)
    xavier = jax.nn.initializers.xavier_uniform()
    return {
        "wq": xavier(keys[0], (dim, dim), jnp.float32),
        "wk": xavier(keys[1], (dim, dim), jnp.float32),
        "wv": xavier(keys[2], (dim, dim), jnp.float32),
        "wo": xavier(keys[3], (dim, dim), jnp.float32),
    }


def init_ffn_params(rng, dim):
    k1, k2 = jax.random.split(rng)
    xavier = jax.nn.initializers.xavier_uniform()
    return {
        "w1": xavier(k1, (dim, dim), jnp.float32),
        "b1": jnp.zeros((dim,), jnp.float32),
        "w2": xavier(k2, (dim, dim), jnp.float32),
        "b2": jnp.zeros((dim,), jnp.float32),
    }


def pointwise_ffn(x, p, dropout_rate=0.0, rng=None):
    """Conv1d(k=1) -> ReLU -> Conv1d(k=1) with residual (reference
    PointWiseFeedForward, sasrec.py:8-39)."""
    rng1 = rng2 = None
    if rng is not None:
        rng1, rng2 = jax.random.split(rng)
    h = _dropout(rng1, jax.nn.relu(x @ p["w1"] + p["b1"]), dropout_rate)
    h = _dropout(rng2, h @ p["w2"] + p["b2"], dropout_rate)
    return x + h


def init_ln_params(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}
