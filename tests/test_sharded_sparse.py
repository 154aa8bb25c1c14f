"""Multi-chip sparse (lazy-Adam) training: row-sharded tables over "model",
batches over "data" — parity with the single-device sparse path on the
virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beta_recsys_tpu.core.sparse_optim import (
    init_sparse_state,
    make_sharded_sparse_epoch_fn,
    make_sparse_epoch_fn,
    pad_rows,
    shard_sparse_params,
)
from beta_recsys_tpu.core.train_engine import make_negative_sampler
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.datasets.data_split import feed_neg_sample, leave_one_out
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.parallel.mesh import make_mesh
from beta_recsys_tpu.utils.alias_table import AliasTable
from beta_recsys_tpu.utils.constants import DEFAULT_FLAG_COL, DEFAULT_ITEM_COL
from tests.test_train_mf import make_structured_interactions

import optax


@pytest.fixture(scope="module")
def setup():
    df = make_structured_interactions(n_users=60, n_items=40, per_user=8)
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    data = BaseData((train, [feed_neg_sample(valid, 20, sampler)], []))
    cfg = {"model": "MF", "emb_dim": 16, "loss": "bpr", "optimizer": "adam",
           "lr": 0.05, "reg": 0.0, "batch_size": 64}
    model = MF(cfg, data.n_users, data.n_items)
    return data, model


def _padded_params(model, mesh):
    """Init params with tables padded to the model-axis size (pad rows are
    never touched, so single-device training on them is unchanged)."""
    n_model = mesh.shape["model"]
    params = model.init_params(jax.random.key(0))
    return {
        k: (pad_rows(v, n_model) if k in model.row_tables() else v)
        for k, v in params.items()
    }


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1)])
def test_sharded_sparse_matches_single_device(setup, mesh_shape):
    data, model = setup
    mesh = make_mesh(n_data=mesh_shape[0], n_model=mesh_shape[1])
    table_names = list(model.row_tables())
    neg_sampler = make_negative_sampler(data, "bitmask")
    lr = 0.05
    batch = 64

    host_params = _padded_params(model, mesh)

    # single device on the padded tables
    ref_fn = make_sparse_epoch_fn(
        model, data.train_arrays(), batch, neg_sampler, lr=lr, donate=False
    )
    ref_state = (init_sparse_state(host_params, table_names),
                 optax.adam(lr).init({k: v for k, v in host_params.items()
                                      if k not in table_names}))
    p_ref, s_ref, _, loss_ref = ref_fn(host_params, ref_state, jax.random.key(7))

    # sharded
    sh_fn = make_sharded_sparse_epoch_fn(
        model, data.train_arrays(), batch, neg_sampler, lr=lr, mesh=mesh,
        donate=False,
    )
    sh_params = shard_sparse_params(host_params, table_names, mesh)
    sh_state = (init_sparse_state(sh_params, table_names),
                optax.adam(lr).init({k: v for k, v in sh_params.items()
                                     if k not in table_names}))
    p_sh, s_sh, _, loss_sh = sh_fn(sh_params, sh_state, jax.random.key(7))

    # Epoch-mean loss parity at 1e-4 pins trajectory equivalence; params get
    # a looser bar because lazy Adam's m/(sqrt(v)+eps) amplifies float
    # reassociation noise (psum-of-local-means vs one global mean) on
    # near-zero first-step gradients.
    assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-4)
    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(p_sh[k]), np.asarray(p_ref[k]), rtol=1e-2, atol=5e-4,
            err_msg=k,
        )
    # moments match too (the lazy-Adam state is genuinely sharded)
    for k in table_names:
        for got, want in zip(s_sh[0]["moments"][k], s_ref[0]["moments"][k]):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-2, atol=5e-4, err_msg=k
            )


@pytest.mark.parametrize(
    "lookup_strategy,grad_exchange",
    [("psum", "bucketed")],
    # The ("ring", *) variants are exercised by tests/test_ring_exchange.py's
    # direct kernel tests; running the interpret-mode ring inside even a
    # single sharded epoch step costs tens of minutes on the CPU mesh.
)
def test_sharded_sparse_strategies_match_default(setup, lookup_strategy, grad_exchange):
    """Every lookup/grad-exchange strategy reproduces the default (psum +
    all_gather) trajectory when bucket capacity covers all unique owned ids
    (here rows-per-shard < capacity, so no overflow is possible).

    Data is trimmed to ONE batch per epoch to keep CPU-mesh cost down."""
    data, model = setup
    mesh = make_mesh(n_data=4, n_model=2)
    table_names = list(model.row_tables())
    neg_sampler = make_negative_sampler(data, "bitmask")
    lr, batch = 0.05, 64

    host_params = _padded_params(model, mesh)
    arrays = data.train_arrays()
    from beta_recsys_tpu.data.base_data import TrainArrays

    one_batch = TrainArrays(
        users=np.asarray(arrays.users[:batch]),
        items=np.asarray(arrays.items[:batch]),
        ratings=np.asarray(arrays.ratings[:batch]),
    )

    def run(**kwargs):
        fn = make_sharded_sparse_epoch_fn(
            model, one_batch, batch, neg_sampler, lr=lr, mesh=mesh,
            donate=False, **kwargs,
        )
        params = shard_sparse_params(host_params, table_names, mesh)
        state = (init_sparse_state(params, table_names),
                 optax.adam(lr).init({k: v for k, v in params.items()
                                      if k not in table_names}))
        return fn(params, state, jax.random.key(7))

    p_ref, s_ref, _, loss_ref = run()
    p_got, s_got, _, loss_got = run(
        lookup_strategy=lookup_strategy, grad_exchange=grad_exchange,
        capacity_factor=2.0,
    )
    assert float(loss_got) == pytest.approx(float(loss_ref), rel=1e-4)
    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(p_got[k]), np.asarray(p_ref[k]), rtol=1e-2, atol=5e-4,
            err_msg=k,
        )


def test_sharded_sparse_multi_epoch_learns(setup):
    """Three sharded epochs reduce the loss (end-to-end sanity on the mesh)."""
    data, model = setup
    mesh = make_mesh(n_data=4, n_model=2)
    table_names = list(model.row_tables())
    neg_sampler = make_negative_sampler(data, "bitmask")
    fn = make_sharded_sparse_epoch_fn(
        model, data.train_arrays(), 64, neg_sampler, lr=0.05, mesh=mesh,
        donate=False,
    )
    params = shard_sparse_params(_padded_params(model, mesh), table_names, mesh)
    state = (init_sparse_state(params, table_names),
             optax.adam(0.05).init({k: v for k, v in params.items()
                                    if k not in table_names}))
    rng = jax.random.key(0)
    losses = []
    for _ in range(4):
        params, state, rng, loss = fn(params, state, rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.05, losses
    # tables stay row-sharded across epochs
    for k in table_names:
        sharding = params[k].sharding
        assert "model" in str(sharding.spec), (k, sharding)


def test_engine_sparse_optim_with_mesh_learns(setup, tmp_path):
    """TrainEngine wires the sharded sparse path from config and reaches the
    quality bar of the single-device learning tests."""
    from beta_recsys_tpu.config import Config
    from beta_recsys_tpu.core.train_engine import TrainEngine
    from beta_recsys_tpu.models import build_model

    data, _ = setup
    cfg = Config(
        {
            "system": {"root_dir": str(tmp_path), "metrics": ["ndcg"], "k": [10],
                       "valid_metric": "ndcg", "valid_k": 10, "seed": 11,
                       "mesh": {"data": 4, "model": 2}},
            "dataset": {"dataset": "synthetic"},
            "model": {"model": "MF", "loss": "bpr", "emb_dim": 16,
                      "batch_size": 128, "optimizer": "adam", "lr": 0.05,
                      "max_epoch": 30, "max_n_update": 30,
                      "sparse_optim": True},
        }
    )
    model = build_model(cfg.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    result = engine.train(verbose=False)
    assert result["valid_metric"] > 0.32, result
    for k in model.row_tables():
        assert "model" in str(engine.params[k].sharding.spec), k


def test_padded_tables_never_rank_pad_items(setup):
    """Retrieval surfaces trim pad rows (user_item_embeddings_trimmed): pad
    item ids must never appear in score_all or streaming top-k output."""
    from beta_recsys_tpu.ops.topk import streaming_topk

    data, model = setup
    mesh = make_mesh(n_data=4, n_model=2)
    params = _padded_params(model, mesh)  # item table padded 40 -> 40? force pad
    # force a visible pad: repad to a multiple of 16
    params = {k: (pad_rows(v, 16) if k in model.row_tables() else v)
              for k, v in params.items()}
    assert params["item_emb"].shape[0] > data.n_items
    u_emb, i_emb = model.user_item_embeddings_trimmed(params)
    assert i_emb.shape[0] == data.n_items and u_emb.shape[0] == data.n_users
    _, idx = streaming_topk(u_emb[:5], i_emb, 10, block=16)
    assert int(np.max(np.asarray(idx))) < data.n_items

    # full-catalog eval consumer slices pad columns away and matches the
    # unpadded-table metrics exactly (pad rows change nothing for real items)
    import scipy.sparse as sp

    from beta_recsys_tpu.core.eval_engine import FullCatalogEvaluator

    rng = np.random.default_rng(0)
    rel = sp.csr_matrix(
        (np.ones(data.n_users),
         (np.arange(data.n_users), rng.integers(0, data.n_items, data.n_users))),
        shape=(data.n_users, data.n_items),
    )
    plain = model.init_params(jax.random.key(0))
    base = FullCatalogEvaluator(
        model, np.arange(data.n_users), rel, data.user_item_csr(), user_block=16
    ).evaluate(plain)
    padded = FullCatalogEvaluator(
        model, np.arange(data.n_users), rel, data.user_item_csr(), user_block=16
    ).evaluate(params)
    for k in base:
        assert padded[k] == pytest.approx(base[k], rel=1e-5), k


def test_sharded_sparse_checkpoint_resume(setup, tmp_path):
    """Interrupt a sharded sparse run, resume, and confirm the restored
    tables are re-placed row-sharded and training continues."""
    from beta_recsys_tpu.config import Config
    from beta_recsys_tpu.core.train_engine import TrainEngine
    from beta_recsys_tpu.models import build_model

    data, _ = setup
    cfg = Config(
        {
            "system": {"root_dir": str(tmp_path), "metrics": ["ndcg"], "k": [10],
                       "valid_metric": "ndcg", "valid_k": 10, "seed": 5,
                       "mesh": {"data": 4, "model": 2}},
            "dataset": {"dataset": "synthetic"},
            "model": {"model": "MF", "loss": "bpr", "emb_dim": 16,
                      "batch_size": 128, "optimizer": "adam", "lr": 0.05,
                      "max_epoch": 4, "max_n_update": 10,
                      "sparse_optim": True},
        }
    )
    model = build_model(cfg.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    engine.train(verbose=False)

    engine2 = TrainEngine(cfg)
    engine2.build(model, data, data.eval_candidates(data.valid[0]), None)
    start = engine2.resume_training(engine.checkpoint_dir)
    assert start >= 1
    for k in model.row_tables():
        assert "model" in str(engine2.params[k].sharding.spec), k
    result = engine2.train(max_epoch=start + 2, verbose=False)
    assert np.isfinite(result["valid_metric"])


def test_engine_picks_bucketed_exchange_at_wide_model_axis(setup, tmp_path):
    """TrainEngine defaults grad_exchange to "bucketed" once n_model >= 4
    (the wire-optimal regime per the strategy comm model) and still learns;
    model config can override the strategy explicitly."""
    from beta_recsys_tpu.config import Config
    from beta_recsys_tpu.core.train_engine import TrainEngine
    from beta_recsys_tpu.models import build_model

    data, _ = setup
    cfg = Config(
        {
            "system": {"root_dir": str(tmp_path), "metrics": ["ndcg"], "k": [10],
                       "valid_metric": "ndcg", "valid_k": 10, "seed": 11,
                       "mesh": {"data": 2, "model": 4}},
            "dataset": {"dataset": "synthetic"},
            "model": {"model": "MF", "loss": "bpr", "emb_dim": 16,
                      "batch_size": 128, "optimizer": "adam", "lr": 0.05,
                      "max_epoch": 30, "max_n_update": 30,
                      "sparse_optim": True},
        }
    )
    model = build_model(cfg.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    result = engine.train(verbose=False)
    assert result["valid_metric"] > 0.32, result

    # explicit override also builds and trains
    cfg2 = cfg.replace(model={"grad_exchange": "allgather", "lookup_strategy": "psum"})
    model2 = build_model(cfg2.model, data.n_users, data.n_items)
    engine2 = TrainEngine(cfg2)
    engine2.build(model2, data, data.eval_candidates(data.valid[0]), None)
    r2 = engine2.train(verbose=False)
    assert r2["valid_metric"] > 0.32, r2


@pytest.mark.parametrize("capacity_factor,expect_drops", [(2.0, False), (0.25, True)])
def test_bucketed_overflow_counter(setup, capacity_factor, expect_drops):
    """The bucketed exchange counts dropped gradient rows (VERDICT r3 #5):
    zero at the default capacity_factor even on zipf-skewed ids (frequency-
    sorted ids concentrate unique ids on shard 0 — the worst case), nonzero
    and detected when deliberately under-provisioned."""
    data, model = setup
    mesh = make_mesh(n_data=4, n_model=2)
    table_names = list(model.row_tables())
    neg_sampler = make_negative_sampler(data, "bitmask")
    batch = 64

    # zipf-skewed, frequency-sorted item ids: low ids dominate, so shard 0
    # owns most unique ids in every batch
    rng = np.random.default_rng(0)
    n_rows = 256
    zipf_items = np.minimum(rng.zipf(1.3, size=n_rows) - 1, model.n_items - 1)
    from beta_recsys_tpu.data.base_data import TrainArrays

    skewed = TrainArrays(
        users=rng.integers(0, model.n_users, n_rows).astype(np.int32),
        items=zipf_items.astype(np.int32),
        ratings=np.ones(n_rows, np.float32),
    )
    fn = make_sharded_sparse_epoch_fn(
        model, skewed, batch, neg_sampler, lr=0.05, mesh=mesh, donate=False,
        grad_exchange="bucketed", capacity_factor=capacity_factor,
    )
    params = shard_sparse_params(_padded_params(model, mesh), table_names, mesh)
    state = (init_sparse_state(params, table_names),
             optax.adam(0.05).init({k: v for k, v in params.items()
                                    if k not in table_names}))
    params, state, _, _ = fn(params, state, jax.random.key(3))
    dropped = int(state[0]["dropped"])
    if expect_drops:
        assert dropped > 0
    else:
        assert dropped == 0
