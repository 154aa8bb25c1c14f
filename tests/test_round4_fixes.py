"""Round-4 regression tests: r3 advisor findings + VERDICT items."""

import jax
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from beta_recsys_tpu.core.eval_engine import FullCatalogEvaluator, TopKRetrievalEvaluator
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


def _toy_data(n_users=25, n_items=30, per_user=6, n_test=2, seed=0):
    rng = np.random.default_rng(seed)
    rows, t = [], 0
    for u in range(n_users):
        for it in rng.choice(n_items, size=per_user, replace=False):
            rows.append((u, int(it), 1.0, t))
            t += 1
    df = pd.DataFrame(rows, columns=[DEFAULT_USER_COL, DEFAULT_ITEM_COL,
                                     DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL])
    test_mask = df.groupby(DEFAULT_USER_COL).cumcount() >= per_user - n_test
    return BaseData((df[~test_mask].copy(), [], [df[test_mask].copy()]),
                    intersect=True)


@pytest.fixture(scope="module")
def toy():
    data = _toy_data()
    model = MF({"model": "MF", "emb_dim": 8, "loss": "bpr"},
               data.n_users, data.n_items)
    params = model.init_params(jax.random.key(0))
    users, rel_csr, train_csr = data.full_catalog_eval(data.test[0])
    return data, model, params, users, rel_csr, train_csr


def test_full_catalog_empty_users(toy):
    """r3 advisor (low): empty user set must not crash the constructor."""
    _, model, params, _, rel_csr, train_csr = toy
    ev = FullCatalogEvaluator(model, np.array([], dtype=np.int32),
                              rel_csr[:0], train_csr[:0], user_block=8)
    out = ev.evaluate(params)
    assert all(v == 0.0 for v in out.values())


def test_full_catalog_duplicate_csr_entries(toy):
    """r3 advisor (low): explicit duplicate CSR entries must SUM (todense
    semantics), not keep an arbitrary one."""
    _, model, params, users, rel_csr, train_csr = toy
    # non-canonical relevance CSR: every entry stored twice at half value
    # (COO->CSR conversion would sum, so build indices/indptr directly)
    indptr = rel_csr.indptr
    new_indptr = indptr * 2
    new_indices = np.empty(2 * len(rel_csr.indices), rel_csr.indices.dtype)
    new_data = np.empty(2 * len(rel_csr.data), rel_csr.data.dtype)
    for i in range(len(indptr) - 1):
        s, e = indptr[i], indptr[i + 1]
        seg_i = np.repeat(rel_csr.indices[s:e], 2)
        seg_d = np.repeat(rel_csr.data[s:e] / 2, 2)
        new_indices[2 * s : 2 * e] = seg_i
        new_data[2 * s : 2 * e] = seg_d
    dup = sp.csr_matrix((new_data, new_indices, new_indptr), shape=rel_csr.shape)
    assert dup.nnz == 2 * rel_csr.nnz  # explicit duplicates present
    base = FullCatalogEvaluator(model, users, rel_csr, train_csr, user_block=8)
    dupd = FullCatalogEvaluator(model, users, dup, train_csr, user_block=8)
    r0, r1 = base.evaluate(params), dupd.evaluate(params)
    for k, v in r0.items():
        assert r1[k] == pytest.approx(v, abs=1e-6), k


def test_topk_retrieval_single_compiled_shape(toy):
    """r3 advisor (medium): all blocks must share ONE jit signature — padded
    to uniform (user_block, max_nnz, max_R) shapes."""
    _, model, params, users, rel_csr, train_csr = toy
    ev = TopKRetrievalEvaluator(model, users, rel_csr, train_csr,
                                user_block=8, item_block=16)
    shapes = {
        (blk.shape, trn[0].shape, trn[1].shape, ri.shape, rv.shape)
        for blk, trn, ri, rv, _ in ev._blocks
    }
    assert len(shapes) == 1, shapes
    # and the padded evaluator still matches the dense one
    dense = FullCatalogEvaluator(model, users, rel_csr, train_csr, user_block=8)
    r_stream, r_dense = ev.evaluate(params), dense.evaluate(params)
    for k, v in r_dense.items():
        assert r_stream[k] == pytest.approx(v, abs=1e-4), k


# ---------------------------------------------------------------------------
# VERDICT r3 #7: the 20 verbatim reference configs parse through our Config
# and dispatch through DatasetBase.load_split (reference split names +
# download forwarding).
# ---------------------------------------------------------------------------

import glob
import json
import os

REFERENCE_CONFIG_DIR = "/root/reference/configs"


@pytest.mark.skipif(not os.path.isdir(REFERENCE_CONFIG_DIR),
                    reason="reference configs not present")
def test_reference_configs_parse_and_dispatch(tmp_path):
    from beta_recsys_tpu.config import Config
    from beta_recsys_tpu.datasets.synthetic import Synthetic

    paths = sorted(glob.glob(os.path.join(REFERENCE_CONFIG_DIR, "*.json")))
    assert len(paths) == 20
    ds = Synthetic(root_dir=str(tmp_path))
    calls = []
    # capture the dispatch target + kwargs without running the data pipeline
    for name in ("load_leave_one_out", "load_leave_one_basket",
                 "load_random_split", "load_random_basket_split",
                 "load_temporal_split", "load_temporal_basket_split"):
        def _capture(_name=name, **kwargs):
            calls.append((_name, kwargs))
            return "split"
        setattr(ds, name, _capture)

    for path in paths:
        cfg = Config(json.load(open(path)))
        # every reference config must survive our typed Config and the
        # dataset dispatch (VERDICT r3: "random_split" resolved to a
        # nonexistent loader and the download flag was dropped)
        out = ds.load_split(cfg)
        assert out == "split", path
        target, kwargs = calls[-1]
        split = cfg.dataset.get("data_split")
        expect = {
            "leave_one_out": "load_leave_one_out",
            "leave_one_basket": "load_leave_one_basket",
            "random_split": "load_random_split",
            "random_basket_split": "load_random_basket_split",
            "temporal": "load_temporal_split",
            "temporal_basket": "load_temporal_basket_split",
        }[split]
        assert target == expect, (path, split, target)
        assert kwargs["download"] == bool(cfg.dataset.get("download", False)), path
        assert kwargs["n_negative"] == cfg.dataset.get("n_negative", 100), path


def test_load_split_reference_names_end_to_end(tmp_path):
    """random_split by its reference name actually produces a split (the old
    mechanical name derivation raised AttributeError)."""
    from beta_recsys_tpu.datasets.synthetic import Synthetic

    ds = Synthetic(root_dir=str(tmp_path))
    train, valid, test = ds.load_split(
        {"dataset": {"data_split": "random_split", "n_test": 1,
                     "n_negative": 10, "test_rate": 0.2}}
    )
    assert len(train) > 0 and len(valid) == 1 and len(test) == 1


def test_load_split_full_negative_normalization(tmp_path):
    """n_negative < 0 collapses n_test to 1 (reference dataset_base.py:931)."""
    from beta_recsys_tpu.datasets.synthetic import Synthetic

    ds = Synthetic(root_dir=str(tmp_path))
    seen = {}
    ds.load_leave_one_out = lambda **kw: seen.update(kw) or "x"
    ds.load_split({"dataset": {"data_split": "leave_one_out",
                               "n_negative": -1, "n_test": 10}})
    assert seen["n_test"] == 1 and seen["n_negative"] == -1


def test_table_lookup_scatter_free_vjp_matches_gather():
    """ops/gather.table_lookup: identical forward, gradient equal to the
    native gather/scatter VJP up to float reassociation — incl. duplicate
    ids (their one-hot rows sum in the matmul) and 1-D bias tables."""
    import jax.numpy as jnp

    from beta_recsys_tpu.ops.gather import _mxu_lookup, table_lookup

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(50,)).astype(np.float32))
    ids = jnp.asarray([3, 7, 7, 0, 49, 7], dtype=jnp.int32)
    w = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(table_lookup(table, ids)), np.asarray(table[ids]))

    g_mxu = jax.grad(lambda t: jnp.sum(_mxu_lookup(t, ids) * w))(table)
    g_ref = jax.grad(lambda t: jnp.sum(t[ids] * w))(table)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)

    gb_mxu = jax.grad(lambda b: jnp.sum(_mxu_lookup(b, ids) ** 2))(bias)
    gb_ref = jax.grad(lambda b: jnp.sum(b[ids] ** 2))(bias)
    np.testing.assert_allclose(np.asarray(gb_mxu), np.asarray(gb_ref),
                               rtol=1e-6, atol=1e-6)

    # 2-D ids (candidate scoring shape)
    ids2 = jnp.asarray([[1, 2], [2, 2]], dtype=jnp.int32)
    w2 = jnp.ones((2, 2, 8))
    g2 = jax.grad(lambda t: jnp.sum(_mxu_lookup(t, ids2) * w2))(table)
    g2r = jax.grad(lambda t: jnp.sum(t[ids2] * w2))(table)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2r), rtol=1e-6, atol=1e-6)

    # large tables fall through to the native path (no one-hot blowup)
    big = jnp.zeros((10_000, 4))
    assert table_lookup(big, ids).shape == (6, 4)


def test_grouped_table_lookup_matches_per_table():
    """grouped_table_lookup: one shared one-hot backward for same-height
    tables == the per-table native gather/scatter gradients."""
    import jax.numpy as jnp

    from beta_recsys_tpu.ops.gather import grouped_table_lookup

    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(30, 8)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(30,)).astype(np.float32))
    ids = jnp.asarray([2, 9, 9, 0, 29], dtype=jnp.int32)
    w = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))

    e, b = grouped_table_lookup((emb, bias), ids)
    np.testing.assert_array_equal(np.asarray(e), np.asarray(emb[ids]))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(bias[ids]))

    def loss_grouped(emb, bias):
        e, b = grouped_table_lookup((emb, bias), ids)
        return jnp.sum(e * w) + jnp.sum(b ** 2)

    def loss_native(emb, bias):
        return jnp.sum(emb[ids] * w) + jnp.sum(bias[ids] ** 2)

    g1 = jax.grad(loss_grouped, argnums=(0, 1))(emb, bias)
    g2 = jax.grad(loss_native, argnums=(0, 1))(emb, bias)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-6, atol=1e-6)

    # tall tables fall through to native gathers
    tall = jnp.zeros((20_000, 4))
    tall_b = jnp.zeros((20_000,))
    out = grouped_table_lookup((tall, tall_b), ids)
    assert out[0].shape == (5, 4) and out[1].shape == (5,)
