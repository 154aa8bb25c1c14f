"""Mixed-precision (bfloat16 compute, float32 master params) training tests.

TPU-native feature with no reference analogue: the forward/backward runs in
the MXU's native bf16 input type while params, grads, and optimizer moments
stay float32 (core/train_engine._loss_with_dtype).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beta_recsys_tpu.config import Config
from beta_recsys_tpu.core.train_engine import (
    TrainEngine,
    _loss_with_dtype,
    make_epoch_fn,
    make_negative_sampler,
    make_optimizer,
)
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.datasets.data_split import feed_neg_sample, leave_one_out
from beta_recsys_tpu.models import build_model
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.utils.alias_table import AliasTable
from beta_recsys_tpu.utils.constants import DEFAULT_FLAG_COL, DEFAULT_ITEM_COL
from tests.test_train_mf import make_structured_interactions

THRESHOLD = 0.32  # random ~0.20 over 21 candidates; learned must beat this


@pytest.fixture(scope="module")
def data():
    df = make_structured_interactions(n_users=60, n_items=40, per_user=8)
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    return BaseData((train, [feed_neg_sample(valid, 20, sampler)], []))


def _mf(data):
    cfg = {"model": "MF", "emb_dim": 16, "loss": "bpr", "optimizer": "adam",
           "lr": 0.05, "reg": 0.0, "batch_size": 128}
    model = MF(cfg, data.n_users, data.n_items)
    return cfg, model


def test_bf16_grads_close_to_fp32(data):
    """The bf16 loss gradient must track the fp32 gradient (master-param VJP
    casts the cotangent back up, so dtypes match and values are close)."""
    cfg, model = _mf(data)
    params = model.init_params(jax.random.key(0))
    batch = {
        "users": jnp.arange(32, dtype=jnp.int32) % data.n_users,
        "pos_items": jnp.arange(32, dtype=jnp.int32) % data.n_items,
        "neg_items": (jnp.arange(32, dtype=jnp.int32) * 7 + 3) % data.n_items,
    }
    key = jax.random.key(1)
    g32 = jax.grad(_loss_with_dtype(model, None))(params, batch, key)
    g16 = jax.grad(_loss_with_dtype(model, "bfloat16"))(params, batch, key)
    for k in g32:
        assert g16[k].dtype == g32[k].dtype == jnp.float32, k
        denom = np.maximum(np.abs(np.asarray(g32[k])), 1e-2)
        rel = np.abs(np.asarray(g16[k]) - np.asarray(g32[k])) / denom
        assert rel.max() < 0.1, (k, rel.max())


def test_bf16_epoch_keeps_fp32_params(data):
    cfg, model = _mf(data)
    params = model.init_params(jax.random.key(0))
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    epoch_fn = make_epoch_fn(
        model, optimizer, data.train_arrays(), cfg["batch_size"],
        neg_sampler=make_negative_sampler(data, "bitmask"),
        donate=False, compute_dtype="bfloat16",
    )
    p, o, k, loss = epoch_fn(params, opt_state, jax.random.key(2))
    assert np.isfinite(float(loss))
    for name, leaf in p.items():
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, name


def test_mf_learns_in_bf16(data, tmp_path):
    """End-to-end engine run with model.compute_dtype=bfloat16 reaches the
    same quality bar as the fp32 learning tests."""
    cfg = Config(
        {
            "system": {"root_dir": str(tmp_path), "metrics": ["ndcg"], "k": [10],
                       "valid_metric": "ndcg", "valid_k": 10, "seed": 11},
            "dataset": {"dataset": "synthetic"},
            "model": {"model": "MF", "loss": "bpr", "emb_dim": 16,
                      "batch_size": 128, "optimizer": "adam", "lr": 0.05,
                      "max_epoch": 30, "max_n_update": 30,
                      "compute_dtype": "bfloat16"},
        }
    )
    model = build_model(cfg.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    result = engine.train(verbose=False)
    assert result["valid_metric"] > THRESHOLD, result
    for name, leaf in engine.params.items():
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, name


def test_sasrec_bf16_epoch(data):
    """Sequence-family builder honors compute_dtype (flash-attention path
    already runs bf16 internally on TPU; this exercises the generic hook)."""
    from beta_recsys_tpu.core.train_engine import make_sequence_epoch_fn
    from beta_recsys_tpu.data.sequential_data import SequentialData
    from beta_recsys_tpu.models.sasrec import SASRec

    seq_data = SequentialData((data.train, [], []), intersect=False)
    cfg = {"model": "SASRec", "emb_dim": 16, "maxlen": 8, "num_blocks": 1,
           "num_heads": 1, "dropout_rate": 0.0, "l2_emb": 0.0,
           "batch_size": 16, "optimizer": "adam", "lr": 0.001}
    model = SASRec(cfg, seq_data.n_users, seq_data.n_items)
    params = model.init_params(jax.random.key(0))
    optimizer = make_optimizer(cfg)
    epoch_fn = make_sequence_epoch_fn(
        model, optimizer, seq_data.train_seq_arrays(8), 16,
        make_negative_sampler(seq_data, "bitmask"),
        donate=False, compute_dtype="bfloat16",
    )
    p, o, k, loss = epoch_fn(params, optimizer.init(params), jax.random.key(3))
    assert np.isfinite(float(loss))


def test_sparse_optim_bf16_learns(data, tmp_path):
    """Lazy-Adam sparse path honors compute_dtype and reaches quality."""
    cfg = Config(
        {
            "system": {"root_dir": str(tmp_path), "metrics": ["ndcg"], "k": [10],
                       "valid_metric": "ndcg", "valid_k": 10, "seed": 11},
            "dataset": {"dataset": "synthetic"},
            "model": {"model": "MF", "loss": "bpr", "emb_dim": 16,
                      "batch_size": 128, "optimizer": "adam", "lr": 0.05,
                      "max_epoch": 30, "max_n_update": 30,
                      "sparse_optim": True, "compute_dtype": "bfloat16"},
        }
    )
    model = build_model(cfg.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg)
    engine.build(model, data, data.eval_candidates(data.valid[0]), None)
    result = engine.train(verbose=False)
    assert result["valid_metric"] > THRESHOLD, result
