"""Communication-model regression gate (VERDICT r4 #7).

Pins the per-step collective footprint of the north-star training programs on
the virtual 8-device mesh. The compiled HLO's collectives are identical on
real chips, so this catches a partitioner regression (e.g. the 4x
partial-gradient all-reduce that tools/predict_efficiency.py found in r4) or
a new collective sneaking into an epoch — before it reaches hardware.

Invariant for the pure data-parallel dense path (core/train_engine._make_grad_fn):
exactly ONE all-reduce per step whose bytes equal the float param bytes
(each gradient tensor crosses the ICI exactly once, via pmean).
"""

import jax
import numpy as np
import pytest

from beta_recsys_tpu.core.train_engine import (
    make_epoch_fn,
    make_negative_sampler,
    make_optimizer,
    make_sequence_epoch_fn,
)
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.parallel.comm_analysis import collective_bytes
from beta_recsys_tpu.parallel.mesh import make_mesh
from tests.test_train_mf import make_structured_interactions


@pytest.fixture(scope="module")
def data():
    return BaseData((make_structured_interactions(), [], []), intersect=False)


def _param_bytes(model):
    shapes = jax.eval_shape(model.init_params, jax.random.key(0))
    return sum(
        int(np.prod(s.shape)) * s.dtype.itemsize
        for s in jax.tree_util.tree_leaves(shapes)
        if jax.numpy.issubdtype(s.dtype, jax.numpy.floating)
    )


def _counts(model, optimizer, epoch_fn):
    params = jax.eval_shape(model.init_params, jax.random.key(0))
    opt_state = jax.eval_shape(optimizer.init, params)
    return collective_bytes(epoch_fn, params, opt_state, jax.random.key(1))


def _assert_single_grad_allreduce(counts, pbytes, allow_other_frac=0.15):
    assert "all_reduce" in counts, counts
    ar = counts["all_reduce"]
    assert ar["calls"] == 1, f"expected 1 grad all-reduce/step, got {counts}"
    # pmean moves exactly the float param bytes (+ the scalar loss)
    assert ar["bytes"] <= pbytes * 1.02 + 64, (ar, pbytes)
    assert ar["bytes"] >= pbytes * 0.98, (ar, pbytes)
    other = sum(v["bytes"] for k, v in counts.items() if k != "all_reduce")
    assert other <= pbytes * allow_other_frac, counts


def test_mf_dense_comm_footprint(data):
    from beta_recsys_tpu.models.mf import MF

    cfg = {"model": "MF", "emb_dim": 32, "loss": "bpr", "optimizer": "adam",
           "lr": 0.05, "reg": 0.0}
    model = MF(cfg, data.n_users, data.n_items)
    opt = make_optimizer(cfg)
    mesh = make_mesh(n_data=8, n_model=1)
    fn = make_epoch_fn(model, opt, data.train_arrays(), 512,
                       make_negative_sampler(data, "bitmask"),
                       donate=False, mesh=mesh)
    _assert_single_grad_allreduce(_counts(model, opt, fn), _param_bytes(model))


def test_lightgcn_dense_comm_footprint(data):
    from beta_recsys_tpu.models.lightgcn import LightGCN

    cfg = {"model": "LightGCN", "emb_dim": 32, "layer_size": [32, 32],
           "regs": [1e-5], "keep_pro": 1.0, "optimizer": "adam", "lr": 0.05}
    model = LightGCN(cfg, data.n_users, data.n_items,
                     artifacts={"adj": data.get_norm_adj("sym")})
    opt = make_optimizer(cfg)
    mesh = make_mesh(n_data=8, n_model=1)
    fn = make_epoch_fn(model, opt, data.train_arrays(), 512,
                       make_negative_sampler(data, "bitmask"),
                       donate=False, mesh=mesh)
    _assert_single_grad_allreduce(_counts(model, opt, fn), _param_bytes(model))


def test_ncf_dense_comm_footprint(data):
    from beta_recsys_tpu.models.ncf import NeuMF

    cfg = {"model": "NCF", "emb_dim": 8, "mlp_config": {"n_layers": 2},
           "num_negative": 2, "optimizer": "adam", "lr": 0.001}
    model = NeuMF(cfg, data.n_users, data.n_items)
    opt = make_optimizer(cfg)
    mesh = make_mesh(n_data=8, n_model=1)
    fn = make_epoch_fn(model, opt, data.train_arrays(), 512,
                       make_negative_sampler(data, "bitmask"), num_neg=2,
                       donate=False, mesh=mesh)
    _assert_single_grad_allreduce(_counts(model, opt, fn), _param_bytes(model))


def test_sasrec_dense_comm_footprint(data):
    from beta_recsys_tpu.data.sequential_data import SequentialData
    from beta_recsys_tpu.models.sasrec import SASRec

    seq = SequentialData((data.train, [], []), intersect=False)
    cfg = {"model": "SASRec", "emb_dim": 32, "maxlen": 20, "num_blocks": 1,
           "num_heads": 2, "dropout_rate": 0.0, "l2_emb": 0.0,
           "optimizer": "adam", "lr": 0.001}
    model = SASRec(cfg, seq.n_users, seq.n_items)
    opt = make_optimizer(cfg)
    mesh = make_mesh(n_data=8, n_model=1)
    fn = make_sequence_epoch_fn(model, opt, seq.train_seq_arrays(20), 64,
                                make_negative_sampler(seq, "bitmask"),
                                donate=False, mesh=mesh)
    _assert_single_grad_allreduce(_counts(model, opt, fn), _param_bytes(model))
