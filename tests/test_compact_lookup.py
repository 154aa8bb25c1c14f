"""Compact-scatter lookup VJP + SASRec shared seq/pos gather (r5)."""

import jax
import jax.numpy as jnp
import numpy as np

from beta_recsys_tpu.ops.gather import _compact_lookup_for, table_lookup


def test_compact_vjp_matches_native_gradient():
    rng = np.random.default_rng(0)
    n_rows, d, L = 50, 8, 400  # L >> n_rows: the compact regime
    table = jnp.asarray(rng.normal(size=(n_rows, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_rows, (20, 20)).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(20, 20, d)).astype(np.float32))

    fn = _compact_lookup_for((n_rows, d), "float32")
    g_compact = jax.grad(lambda t: jnp.sum(fn(t, ids) * cot))(table)
    g_native = jax.grad(lambda t: jnp.sum(t[ids] * cot))(table)
    np.testing.assert_allclose(np.asarray(g_compact), np.asarray(g_native),
                               rtol=1e-5, atol=1e-6)


def test_compact_vjp_1d_table():
    rng = np.random.default_rng(1)
    n_rows, L = 30, 200
    table = jnp.asarray(rng.normal(size=(n_rows,)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_rows, L).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(L,)).astype(np.float32))
    fn = _compact_lookup_for((n_rows,), "float32")
    g_c = jax.grad(lambda t: jnp.sum(fn(t, ids) * cot))(table)
    g_n = jax.grad(lambda t: jnp.sum(t[ids] * cot))(table)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_n), rtol=1e-5, atol=1e-6)


def test_table_lookup_routes_compact_for_tall_duplicated():
    # a table too tall for the one-hot path but heavily duplicated: forward
    # values must still be the plain gather
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(9000, 4)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 9000, (300, 100)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(table_lookup(table, ids)), np.asarray(table[ids]))


def test_sasrec_shared_gather_loss_matches_direct_formulation():
    """The ext-gather loss must equal the two-gather formulation exactly
    (pad positions are masked in both)."""
    from beta_recsys_tpu.models.sasrec import SASRec

    cfg = {"model": "SASRec", "emb_dim": 16, "maxlen": 12, "num_blocks": 1,
           "num_heads": 2, "dropout_rate": 0.0, "l2_emb": 0.0}
    model = SASRec(cfg, 30, 40)
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(3)
    B, T = 6, 12
    # build consistent (seq, pos): pos is seq shifted left + one new item,
    # with leading pad
    seq = np.zeros((B, T), np.int32)
    pos = np.zeros((B, T), np.int32)
    for b in range(B):
        ln = rng.integers(2, T)
        items = rng.integers(1, 41, ln + 1)
        seq[b, T - ln:] = items[:-1]
        pos[b, T - ln:] = items[1:]
    neg = rng.integers(1, 41, (B, T)).astype(np.int32)
    neg = np.where(pos != 0, neg, 0)
    batch = {"seq": jnp.asarray(seq), "pos": jnp.asarray(pos),
             "neg": jnp.asarray(neg)}

    def direct_loss(params):
        from beta_recsys_tpu.ops.gather import table_lookup as tl

        feats = model.log2feats(params, batch["seq"])
        pos_emb = tl(params["item_emb"], batch["pos"])
        neg_emb = tl(params["item_emb"], batch["neg"])
        pos_logits = jnp.sum(feats * pos_emb, axis=-1)
        neg_logits = jnp.sum(feats * neg_emb, axis=-1)
        mask = (batch["pos"] != 0).astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.sum((jax.nn.softplus(-pos_logits)
                        + jax.nn.softplus(neg_logits)) * mask) / n_valid

    l_new = float(model.loss(params, batch, None))
    l_old = float(direct_loss(params))
    assert abs(l_new - l_old) < 1e-6, (l_new, l_old)
    g_new = jax.grad(lambda p: model.loss(p, batch, None))(params)
    g_old = jax.grad(direct_loss)(params)
    for k in ("item_emb", "pos_emb"):
        np.testing.assert_allclose(np.asarray(g_new[k]), np.asarray(g_old[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
