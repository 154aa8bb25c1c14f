"""Shared loss functions (BPR / BCE and friends).

Reference semantics: beta_rec/models/torch_engine.py:92-121 — BPR is
-mean(logsigmoid(pos - neg)); BCE is binary cross-entropy on probabilities.
The logit variants here are numerically stable fusions preferred on TPU.
"""

import jax
import jax.numpy as jnp


def bpr_loss(pos_scores, neg_scores):
    """Bayesian Personalized Ranking pairwise loss: -mean log sigma(pos - neg)."""
    return -jnp.mean(jax.nn.log_sigmoid(pos_scores - neg_scores))


def bce_loss(probs, labels, eps=1e-7):
    """Binary cross-entropy on probabilities (post-sigmoid scores)."""
    p = jnp.clip(probs, eps, 1 - eps)
    return -jnp.mean(labels * jnp.log(p) + (1 - labels) * jnp.log1p(-p))


def bce_with_logits(logits, labels):
    """Numerically stable BCE on raw logits (fused sigmoid + CE)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def softplus_bpr_loss(pos_scores, neg_scores):
    """Softplus form of BPR used by LightGCN: mean softplus(neg - pos)."""
    return jnp.mean(jax.nn.softplus(neg_scores - pos_scores))


def l2_reg(*tensors, batch_size=None):
    """Sum of squared entries, optionally normalized by batch size
    (matching reference models that divide the regularizer by batch size,
    e.g. beta_rec/models/mf.py:49-55)."""
    total = sum(jnp.sum(t**2) for t in tensors)
    if batch_size is not None:
        total = total / batch_size
    return total
