"""Fused causal attention (Pallas flash kernel) vs the einsum reference path.

Runs in Mosaic interpret mode on the CPU test backend; the dropout branch is
TPU-only (interpret mode stubs the Mosaic PRNG) and is covered by the fall-
back assertion here plus on-chip validation in benches.
"""

import jax
import jax.numpy as jnp
import numpy as np

from beta_recsys_tpu.ops.attention import causal_mha, init_mha_params
from beta_recsys_tpu.ops.pallas.flash_attention import flash_causal_attention

NEG_INF = -1e30


def _reference(q, k, v):
    T, dh = q.shape[1], q.shape[2]
    logits = jnp.einsum("nqd,nkd->nqk", q, k) / jnp.sqrt(dh)
    causal = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(causal[None], logits, NEG_INF)
    return jnp.einsum("nqk,nkd->nqd", jax.nn.softmax(logits, -1), v)


def _qkv(n=4, t=48, dh=32, key=0):
    ks = jax.random.split(jax.random.key(key), 3)
    return tuple(jax.random.normal(k, (n, t, dh), jnp.float32) for k in ks)


def test_flash_forward_matches_reference():
    q, k, v = _qkv()
    seed = jnp.zeros((1,), jnp.int32)
    out = flash_causal_attention(q, k, v, seed, 0.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_reference(q, k, v)), rtol=2e-5, atol=2e-5
    )


def test_flash_grads_match_reference():
    q, k, v = _qkv(key=3)
    seed = jnp.zeros((1,), jnp.int32)
    w = jax.random.normal(jax.random.key(9), q.shape)

    def loss_flash(q, k, v):
        return jnp.sum(flash_causal_attention(q, k, v, seed, 0.0) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5, err_msg=f"d{name}"
        )


def test_causal_mha_fused_matches_einsum():
    B, T, D, H = 3, 40, 64, 2
    x = jax.random.normal(jax.random.key(1), (B, T, D))
    p = init_mha_params(jax.random.key(2), D)
    out_fused = causal_mha(x, x, x, H, p["wq"], p["wk"], p["wv"], p["wo"], fused=True)
    out_ref = causal_mha(x, x, x, H, p["wq"], p["wk"], p["wv"], p["wo"], fused=False)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_causal_mha_fused_dropout_falls_back_off_tpu():
    # On the CPU backend the Mosaic PRNG is stubbed, so a fused call with
    # active dropout must route to the einsum path and match it exactly.
    B, T, D, H = 2, 16, 32, 2
    x = jax.random.normal(jax.random.key(4), (B, T, D))
    p = init_mha_params(jax.random.key(5), D)
    rng = jax.random.key(7)
    kw = dict(dropout_rate=0.5, rng=rng)
    out_fused = causal_mha(x, x, x, H, p["wq"], p["wk"], p["wv"], p["wo"], fused=True, **kw)
    out_ref = causal_mha(x, x, x, H, p["wq"], p["wk"], p["wv"], p["wo"], fused=False, **kw)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref), rtol=1e-6)


def test_flash_under_jit_and_vmap_free_shapes():
    # Non-tile-aligned T (e.g. SASRec maxlen 200) must work.
    q, k, v = _qkv(n=2, t=50, dh=16, key=11)
    seed = jnp.zeros((1,), jnp.int32)
    out = jax.jit(lambda a, b, c: flash_causal_attention(a, b, c, seed, 0.0))(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_reference(q, k, v)), rtol=2e-5, atol=2e-5
    )
