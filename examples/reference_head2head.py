"""Head-to-head vs the ACTUAL reference implementation (torch CPU).

VERDICT r3 task #1 — the last unproven north-star claim. Runs the reference's
own model engines (/root/reference/beta_rec/models/{mf,ncf,lightgcn,sasrec}.py)
on the SAME structured-synthetic leave-one-out split that
examples/parity_check.py trains our framework on, with the same eval protocol
(1 positive + 100 sampled negatives per user, ndcg/recall/precision/map @10
via beta_recsys_tpu.utils.evaluation — golden-pinned against the reference's
pandas metrics), same seeds, and the same patience-based early stopping
(valid ndcg@10, max_n_update=20, test-at-best-valid-epoch).

The reference code is driven VERBATIM — including its quirks:
- ``instance_bpr_loader`` fixes one negative per positive for the whole run
  (beta_rec/data/base_data.py:218-253), resampled only per seed;
- SASRec trains on time-reversed sequences (``get_train_seq`` sorts timestamp
  DESC, beta_rec/data/sequential_data.py:47-65) and ``seq_predict`` negates
  the logits before ranking (beta_rec/core/eval_engine.py:276-317) — we call
  the reference's unbound ``EvalEngine.seq_predict`` so whatever it produces
  is what gets scored.

Only glue is ours: a tensorboardX stub (the environment has no tensorboard),
frame copies per run (reference BaseData mutates its inputs in place), and
the metric computation (shared with our side so the comparison isolates the
learned model, not the metric code).

Usage (CPU-only, ~30-60 min for all 4 models x 3 seeds):

    python examples/reference_head2head.py --models MF,NCF,LightGCN,SASRec

Writes REFERENCE_H2H.json; examples/parity_check.py merges it into
PARITY_RESULTS.md as a "reference (torch/CPU)" column.
"""

import argparse
import copy
import json
import os
import random
import sys
import time
import types

sys.path.insert(0, ".")

import numpy as np
import pandas as pd


def _install_reference(reference_root="/root/reference"):
    """Make /root/reference importable under torch CPU (tensorboardX stub)."""
    if "tensorboardX" not in sys.modules:
        tb = types.ModuleType("tensorboardX")

        class _StubWriter:
            def __init__(self, *a, **k):
                pass

            def __getattr__(self, name):
                return lambda *a, **k: None

        tb.SummaryWriter = _StubWriter
        sys.modules["tensorboardX"] = tb
    if "munch" not in sys.modules:
        munch = types.ModuleType("munch")

        class _Munch(dict):
            __getattr__ = dict.__getitem__
            __setattr__ = dict.__setitem__

        munch.Munch = _Munch
        munch.munchify = lambda d: _Munch(d)
        sys.modules["munch"] = munch
    if "py7zr" not in sys.modules:
        p7 = types.ModuleType("py7zr")
        p7.unpack_7zarchive = lambda *a, **k: None
        sys.modules["py7zr"] = p7
    for name in ("aiohttp", "aiofiles"):  # onedrive async downloader imports
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                m = types.ModuleType(name)
                m.ClientSession = object
                sys.modules[name] = m
    if "GPUtil" not in sys.modules:
        gputil = types.ModuleType("GPUtil")
        gputil.getAvailable = lambda *a, **k: []
        gputil.getGPUs = lambda *a, **k: []
        sys.modules["GPUtil"] = gputil
    if "cpuinfo" not in sys.modules:
        cpuinfo = types.ModuleType("cpuinfo")
        cpuinfo.get_cpu_info = lambda: {"brand_raw": "stub"}
        sys.modules["cpuinfo"] = cpuinfo
    if "ray" not in sys.modules:
        ray = types.ModuleType("ray")
        tune_mod = types.ModuleType("ray.tune")
        tune_mod.report = lambda *a, **k: None
        tune_mod.grid_search = lambda x: x
        tune_mod.run = lambda *a, **k: None
        ray.tune = tune_mod
        sys.modules["ray"] = ray
        sys.modules["ray.tune"] = tune_mod
    # the reference predates scipy 1.14's removal of the .A property on
    # sparse matrices (vaecf.py uses u_batch.A / x_u.A); restore it
    import scipy.sparse as _sp

    for _cls in (_sp.csr_matrix, _sp.csc_matrix, _sp.coo_matrix, _sp.lil_matrix):
        if not hasattr(_cls, "A"):
            _cls.A = property(lambda self: self.toarray())
    # the reference predates numpy 1.24's removal of the scalar aliases
    # (beta_rec/utils/alias_table.py uses np.int); restore them in-process
    for alias, typ in [("int", int), ("float", float), ("bool", bool),
                       ("object", object)]:
        if not hasattr(np, alias):
            setattr(np, alias, typ)
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)


def _seed_everything(seed):
    import torch

    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)


def _metrics(candidates, preds, ks=(10,)):
    """Rank `preds` over the candidate frame with OUR metric functions.

    candidates: DataFrame[col_user, col_item, col_rating] (rating 1 = the
    held-out positive, 0 = sampled negative); preds: aligned score array.
    """
    from beta_recsys_tpu.utils.constants import DEFAULT_PREDICTION_COL
    from beta_recsys_tpu.utils import evaluation as ev

    pred_df = candidates[["col_user", "col_item"]].copy()
    pred_df[DEFAULT_PREDICTION_COL] = np.asarray(preds, dtype=np.float64)
    true_df = candidates[["col_user", "col_item", "col_rating"]]
    out = {}
    for k in ks:
        out[f"ndcg@{k}"] = ev.ndcg_at_k(true_df, pred_df, k=k)
        out[f"recall@{k}"] = ev.recall_at_k(true_df, pred_df, k=k)
        out[f"precision@{k}"] = ev.precision_at_k(true_df, pred_df, k=k)
        out[f"map@{k}"] = ev.map_at_k(true_df, pred_df, k=k)
    return out


def _predict_pointwise(model, df, chunk=50_000):
    """Chunked model.predict(users, items) -> np array (MF/NCF/LightGCN)."""
    users = df["col_user"].to_numpy()
    items = df["col_item"].to_numpy()
    preds = []
    for s in range(0, len(users), chunk):
        sc = model.predict(list(users[s : s + chunk]), list(items[s : s + chunk]))
        preds.append(np.asarray(sc).reshape(-1))
    return np.concatenate(preds)


def _train_with_early_stop(train_epoch_fn, predict_fn, data, max_epoch, patience):
    """Shared epoch loop: per-epoch valid eval, patience on valid ndcg@10,
    test metrics recorded every epoch so we can report test-at-best-valid."""
    curve, best = [], {"ndcg": -1.0, "epoch": -1, "test": None}
    n_no_update = 0
    for epoch in range(max_epoch):
        train_epoch_fn(epoch)
        valid_m = _metrics(data.valid[0], predict_fn(data.valid[0]))
        test_m = _metrics(data.test[0], predict_fn(data.test[0]))
        curve.append({"epoch": epoch, "ndcg@10": valid_m["ndcg@10"]})
        if valid_m["ndcg@10"] > best["ndcg"]:
            best = {"ndcg": valid_m["ndcg@10"], "epoch": epoch, "test": test_m}
            n_no_update = 0
        else:
            n_no_update += 1
        if n_no_update >= patience:
            break
    return {"curve": curve, "best_epoch": best["epoch"],
            "valid_best": best["ndcg"], "test": best["test"]}


def _base_config(model_cfg, run_dir):
    cfg = {"model": dict(model_cfg), "system": {"run_dir": run_dir}}
    cfg["model"]["device_str"] = "cpu"
    return cfg


def run_reference_mf(split, seed, run_dir, max_epoch=80, patience=20):
    from beta_rec.data.base_data import BaseData
    from beta_rec.models.mf import MFEngine

    _seed_everything(seed)
    data = BaseData(copy.deepcopy(split))
    cfg = _base_config(
        # mirrors configs/mf_default.json (emb_dim 64, adam, lr 0.05, bpr)
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 64,
         "batch_size": 400, "optimizer": "adam", "lr": 0.05, "loss": "bpr",
         "reg": 0.001},
        run_dir,
    )
    cfg["reg"] = 0.001  # MFEngine reads `config["model"]["reg"] if "reg" in config`
    engine = MFEngine(cfg)
    loader = data.instance_bpr_loader(batch_size=400, device="cpu")
    return _train_with_early_stop(
        lambda e: engine.train_an_epoch(loader, e),
        lambda df: _predict_pointwise(engine.model, df),
        data, max_epoch, patience,
    )


def run_reference_ncf(split, seed, run_dir, max_epoch=60, patience=20):
    from beta_rec.data.base_data import BaseData
    from beta_rec.models.ncf import NeuMFEngine

    _seed_everything(seed)
    data = BaseData(copy.deepcopy(split))
    cfg = _base_config(
        # mirrors configs/ncf_default.json (emb_dim 8, 3 MLP layers, bce, 4 neg)
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 8,
         "mlp_config": {"n_layers": 3}, "dropout": 0.0, "batch_size": 400,
         "optimizer": "adam", "lr": 0.001, "model": "ncf",
         "num_negative": 4},
        run_dir,
    )
    engine = NeuMFEngine(cfg)
    loader = data.instance_bce_loader(batch_size=400, device="cpu", num_negative=4)
    return _train_with_early_stop(
        lambda e: engine.train_an_epoch(loader, e),
        lambda df: _predict_pointwise(engine.model, df),
        data, max_epoch, patience,
    )


def run_reference_lightgcn(split, seed, run_dir, max_epoch=60, patience=20):
    import scipy.sparse as sp
    import torch
    from beta_rec.data.base_data import BaseData
    from beta_rec.models.lightgcn import LightGCNEngine
    from beta_rec.utils.common_util import normalized_adj_single

    _seed_everything(seed)
    data = BaseData(copy.deepcopy(split))

    # norm_adj exactly as deprecated_data_base.create_adj_mat builds it
    # (beta_rec/data/deprecated_data_base.py:287-356): bipartite A, then
    # D^-1 A with self-loop variant s_norm = norm(A + I).
    n_u, n_i = data.n_users, data.n_items
    rows = data.train["col_user"].to_numpy()
    cols = data.train["col_item"].to_numpy()
    R = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n_u, n_i)).tocsr()
    adj = sp.lil_matrix((n_u + n_i, n_u + n_i))
    adj[:n_u, n_u:] = R
    adj[n_u:, :n_u] = R.T
    adj = adj.tocsr()
    norm_adj = normalized_adj_single(adj + sp.eye(adj.shape[0])).tocoo()
    indices = torch.from_numpy(np.vstack((norm_adj.row, norm_adj.col)).astype(np.int64))
    values = torch.from_numpy(norm_adj.data.astype(np.float32))
    norm_adj_t = torch.sparse_coo_tensor(indices, values, torch.Size(norm_adj.shape))

    cfg = _base_config(
        # mirrors configs/lightgcn_default.json
        {"n_users": n_u, "n_items": n_i, "emb_dim": 64,
         "layer_size": [64, 64, 64], "keep_pro": 0.6, "batch_size": 1024,
         "optimizer": "adam", "lr": 0.05, "regs": [1e-5],
         "norm_adj": norm_adj_t},
        run_dir,
    )
    engine = LightGCNEngine(cfg)
    loader = data.instance_bpr_loader(batch_size=1024, device="cpu")
    return _train_with_early_stop(
        lambda e: engine.train_an_epoch(loader, e),
        lambda df: _predict_pointwise(engine.model, df, chunk=20_000),
        data, max_epoch, patience,
    )


def _seq_predict_batched(model, train_seq, df, maxlen, negate=True, batch=256):
    """Batched equivalent of the reference's EvalEngine.seq_predict
    (beta_rec/core/eval_engine.py:276-317): same seq construction (reversed
    train_seq fill from the right), same model.predict, same -1 negation —
    just U users per forward instead of one. Verified bit-close against the
    reference loop in the --selftest path."""
    import torch

    users = df["col_user"].to_numpy()
    items = df["col_item"].to_numpy()
    uniq, inv = np.unique(users, return_inverse=True)
    # candidate lists per user, in df order
    order = np.argsort(inv, kind="stable")
    counts = np.bincount(inv)
    assert counts.min() == counts.max(), "per-user candidate counts differ"
    n_cand = counts[0]
    item_mat = items[order].reshape(len(uniq), n_cand)

    seqs = np.zeros((len(uniq), maxlen), dtype=np.int64)
    for ui, u in enumerate(uniq):
        idx = maxlen - 1
        for i in reversed(train_seq[u]):
            seqs[ui, idx] = i
            idx -= 1
            if idx == -1:
                break

    preds_by_user = np.zeros((len(uniq), n_cand), dtype=np.float64)
    with torch.no_grad():
        for s in range(0, len(uniq), batch):
            logits = model.predict(uniq[s:s + batch], seqs[s:s + batch],
                                   item_mat[s:s + batch])
            preds_by_user[s:s + batch] = np.asarray(logits, dtype=np.float64)
    if negate:
        preds_by_user *= -1.0  # the reference's quirk, kept verbatim
    # scatter back to df row order
    out = np.empty(len(users), dtype=np.float64)
    out[order] = preds_by_user.reshape(-1)
    return out


def run_reference_sasrec(split, seed, run_dir, max_epoch=400, patience=40):
    from beta_rec.core.eval_engine import EvalEngine as RefEvalEngine
    from beta_rec.data.sequential_data import SequentialData
    from beta_rec.models.sasrec import SASRecEngine
    from beta_rec.recommenders.sasrec import sample_function

    _seed_everything(seed)
    data = SequentialData(copy.deepcopy(split))
    maxlen = 100  # parity_check MODEL_SPECS override (notebooks use <=200)
    cfg = _base_config(
        # mirrors configs/sasrec_default.json + parity_check overrides
        # (lr 0.001, l2_emb 0.0 — the notebooks' actual run settings)
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 64,
         "num_blocks": 2, "num_heads": 2, "maxlen": maxlen, "batch_size": 128,
         "dropout_rate": 0.1, "optimizer": "adam", "lr": 0.001, "l2_emb": 0.0},
        run_dir,
    )
    engine = SASRecEngine(cfg)
    train_seq = data.get_train_seq()

    # Single-process drive of the reference's sample_function (verbatim code,
    # just without the daemon Queue): put num_batch batches per epoch.
    import queue

    q = queue.Queue()

    class _OneShotQueue:
        def put(self, item):
            q.put(item)
            raise StopIteration  # escape the infinite `while True` per batch

    def draw_batches(n):
        out = []
        for _ in range(n):
            try:
                sample_function(train_seq, data.n_users, data.n_items, 128,
                                maxlen, _OneShotQueue(), np.random.randint(2**31))
            except (StopIteration, RuntimeError):
                pass
            out.append(q.get())
        return out

    def train_epoch(epoch):
        engine.model.train()
        for batch in draw_batches(engine.num_batch):
            u, seq, pos, neg = batch  # queue item is zip(*one_batch)
            engine.train_single_batch(
                (np.array(list(u)), np.array(list(seq)),
                 np.array(list(pos)), np.array(list(neg))))

    def predict_fn(df):
        engine.model.eval()
        return _seq_predict_batched(engine.model, train_seq, df, maxlen)

    # one-time equivalence check of the batched eval vs the reference's
    # per-user loop, on a 20-user slice of valid
    sample_users = data.valid[0]["col_user"].unique()[:20]
    sl = data.valid[0][data.valid[0]["col_user"].isin(sample_users)]
    engine.model.eval()
    ref_preds = RefEvalEngine.seq_predict(None, train_seq, sl, engine.model, maxlen)
    ours_preds = _seq_predict_batched(engine.model, train_seq, sl, maxlen)
    assert np.allclose(ref_preds, ours_preds, atol=1e-4), (
        np.abs(ref_preds - ours_preds).max())

    return _train_with_early_stop(train_epoch, predict_fn, data, max_epoch, patience)


def run_reference_sasrec_fixed(split, seed, run_dir, max_epoch=400, patience=40):
    """The reference SASRec with its two pipeline defects corrected — and
    NOTHING else changed: (1) train sequences in forward chronology (their
    get_train_seq sorts timestamps DESCENDING), (2) eval ranks by raw logits
    (their seq_predict multiplies by -1). Model, engine, sampler, and
    hyperparameters stay the reference's verbatim. This isolates whether the
    verbatim run's at-random result comes from the architecture or from the
    pipeline quirks."""
    from beta_recsys_tpu.utils.constants import (
        DEFAULT_ITEM_COL,
        DEFAULT_TIMESTAMP_COL,
        DEFAULT_USER_COL,
    )
    from beta_rec.data.sequential_data import SequentialData
    from beta_rec.models.sasrec import SASRecEngine
    from beta_rec.recommenders.sasrec import sample_function

    _seed_everything(seed)
    data = SequentialData(copy.deepcopy(split))
    maxlen = 100
    cfg = _base_config(
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 64,
         "num_blocks": 2, "num_heads": 2, "maxlen": maxlen, "batch_size": 128,
         "dropout_rate": 0.1, "optimizer": "adam", "lr": 0.001, "l2_emb": 0.0},
        run_dir,
    )
    engine = SASRecEngine(cfg)
    # fix (1): ascending chronology
    train_seq = (
        data.train.sort_values(by=[DEFAULT_TIMESTAMP_COL], ascending=True)
        .groupby([DEFAULT_USER_COL])[DEFAULT_ITEM_COL]
        .apply(list)
    )

    import queue

    q = queue.Queue()

    class _OneShotQueue:
        def put(self, item):
            q.put(item)
            raise StopIteration

    def draw_batches(n):
        out = []
        for _ in range(n):
            try:
                sample_function(train_seq, data.n_users, data.n_items, 128,
                                maxlen, _OneShotQueue(), np.random.randint(2**31))
            except (StopIteration, RuntimeError):
                pass
            out.append(q.get())
        return out

    def train_epoch(epoch):
        engine.model.train()
        for batch in draw_batches(engine.num_batch):
            u, seq, pos, neg = batch
            engine.train_single_batch(
                (np.array(list(u)), np.array(list(seq)),
                 np.array(list(pos)), np.array(list(neg))))

    def predict_fn(df):
        engine.model.eval()
        # fix (2): rank by raw logits (negate=False)
        return _seq_predict_batched(engine.model, train_seq, df, maxlen,
                                    negate=False)

    return _train_with_early_stop(train_epoch, predict_fn, data, max_epoch,
                                  patience)


def _norm_adj_torch(data):
    """norm_adj exactly as the reference's create_adj_mat builds it
    (beta_rec/data/base_data.py:337-360): bipartite A, normalized_adj_single
    (A + I), as a torch sparse tensor — shared by LightGCN and NGCF."""
    import scipy.sparse as sp
    import torch
    from beta_rec.utils.common_util import normalized_adj_single

    n_u, n_i = data.n_users, data.n_items
    rows = data.train["col_user"].to_numpy()
    cols = data.train["col_item"].to_numpy()
    R = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n_u, n_i)).tocsr()
    adj = sp.lil_matrix((n_u + n_i, n_u + n_i))
    adj[:n_u, n_u:] = R
    adj[n_u:, :n_u] = R.T
    adj = adj.tocsr()
    norm_adj = normalized_adj_single(adj + sp.eye(adj.shape[0])).tocoo()
    indices = torch.from_numpy(np.vstack((norm_adj.row, norm_adj.col)).astype(np.int64))
    values = torch.from_numpy(norm_adj.data.astype(np.float32))
    return torch.sparse_coo_tensor(indices, values, torch.Size(norm_adj.shape))


def run_reference_lightgcn_tuned(split, seed, run_dir, max_epoch=120, patience=20,
                                 lr=0.00025):
    """Corrected-LightGCN control (VERDICT r4 #5): the reference engine,
    verbatim, but with the best lr from the reference's OWN tunable range
    (configs/lightgcn_default.json: [0.1, 0.05, 0.0025, 0.0005, 0.00025]) —
    the shipped lr=0.05 peaks at epoch ~0; this row shows the reference at
    its tuned best, like the corrected-SASRec row."""
    import torch
    from beta_rec.data.base_data import BaseData
    from beta_rec.models.lightgcn import LightGCNEngine

    _seed_everything(seed)
    data = BaseData(copy.deepcopy(split))
    cfg = _base_config(
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 64,
         "layer_size": [64, 64, 64], "keep_pro": 0.6, "batch_size": 1024,
         "optimizer": "adam", "lr": lr, "regs": [1e-5],
         "norm_adj": _norm_adj_torch(data)},
        run_dir,
    )
    engine = LightGCNEngine(cfg)
    loader = data.instance_bpr_loader(batch_size=1024, device="cpu")
    return _train_with_early_stop(
        lambda e: engine.train_an_epoch(loader, e),
        lambda df: _predict_pointwise(engine.model, df, chunk=20_000),
        data, max_epoch, patience,
    )


def run_reference_gmf(split, seed, run_dir, max_epoch=60, patience=20):
    """GMF via GMFEngine (/root/reference/beta_rec/models/gmf.py:51) with the
    BCE loader — mirrors our configs/gmf_default.json (emb_dim 64, lr 0.001,
    4 negatives, B=400)."""
    from beta_rec.data.base_data import BaseData
    from beta_rec.models.gmf import GMFEngine

    _seed_everything(seed)
    data = BaseData(copy.deepcopy(split))
    cfg = _base_config(
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 64,
         "batch_size": 400, "optimizer": "adam", "lr": 0.001,
         "num_negative": 4},
        run_dir,
    )
    engine = GMFEngine(cfg)
    loader = data.instance_bce_loader(batch_size=400, device="cpu", num_negative=4)

    def train_epoch(e):
        engine.model.train()
        for batch in loader:
            u, it, r = batch[0], batch[1], batch[2].float()
            engine.train_single_batch(u, it, r)

    return _train_with_early_stop(
        train_epoch,
        lambda df: _predict_pointwise(engine.model, df),
        data, max_epoch, patience,
    )


def run_reference_mlp(split, seed, run_dir, max_epoch=60, patience=20):
    """MLP via MLPEngine (/root/reference/beta_rec/models/mlp.py:66) —
    mirrors our configs/mlp_default.json (emb_dim 8, 3 layers, lr 0.001)."""
    from beta_rec.data.base_data import BaseData
    from beta_rec.models.mlp import MLPEngine

    _seed_everything(seed)
    data = BaseData(copy.deepcopy(split))
    cfg = _base_config(
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 8,
         "mlp_config": {"n_layers": 3}, "dropout": 0.0, "batch_size": 400,
         "optimizer": "adam", "lr": 0.001, "num_negative": 4},
        run_dir,
    )
    engine = MLPEngine(cfg)
    loader = data.instance_bce_loader(batch_size=400, device="cpu", num_negative=4)

    def train_epoch(e):
        engine.model.train()
        for batch in loader:
            u, it, r = batch[0], batch[1], batch[2].float()
            engine.train_single_batch(u, it, r)

    return _train_with_early_stop(
        train_epoch,
        lambda df: _predict_pointwise(engine.model, df),
        data, max_epoch, patience,
    )


def run_reference_ngcf(split, seed, run_dir, max_epoch=60, patience=20):
    """NGCF via NGCFEngine (/root/reference/beta_rec/models/ngcf.py:101) with
    the reference's norm_adj construction — mirrors configs/ngcf_default.json."""
    from beta_rec.data.base_data import BaseData
    from beta_rec.models.ngcf import NGCFEngine

    _seed_everything(seed)
    data = BaseData(copy.deepcopy(split))
    cfg = _base_config(
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 64,
         "layer_size": [64, 64, 64], "mess_dropout": [0.1, 0.1, 0.1],
         "regs": [1e-5], "batch_size": 1024, "optimizer": "adam", "lr": 0.01,
         "norm_adj": _norm_adj_torch(data)},
        run_dir,
    )
    engine = NGCFEngine(cfg)
    loader = data.instance_bpr_loader(batch_size=1024, device="cpu")
    return _train_with_early_stop(
        lambda e: engine.train_an_epoch(loader, e),
        lambda df: _predict_pointwise(engine.model, df, chunk=20_000),
        data, max_epoch, patience,
    )


def run_reference_ultragcn(split, seed, run_dir, max_epoch=60, patience=20):
    """UltraGCN via UltraGCNEngine (/root/reference/beta_rec/models/ultragcn.py:175)
    with create_constraint_mat + the multi-negative loader, mirroring our
    configs/ultragcn_default.json (50 negatives, negative_weight 50, lr 1e-3)."""
    from beta_rec.data.base_data import BaseData
    from beta_rec.models.ultragcn import UltraGCNEngine

    _seed_everything(seed)
    data = BaseData(copy.deepcopy(split))
    train_mat, beta_uD, beta_iD = data.create_constraint_mat()
    cfg = _base_config(
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 64,
         "batch_size": 1024, "optimizer": "adam", "lr": 0.001,
         "w1": 1e-7, "w2": 1.0, "w3": 1e-7, "w4": 1.0,
         "negative_weight": 50, "gamma": 1e-4, "lambda": 1e-3,
         "ii_neighbor_num": 10, "regs": [1e-5],
         "train_mat": train_mat,
         "constraint_mat": {"beta_uD": beta_uD, "beta_iD": beta_iD}},
        run_dir,
    )
    engine = UltraGCNEngine(cfg)
    loader = data.instance_mul_neg_loader(batch_size=1024, device="cpu",
                                          num_negative=50)
    return _train_with_early_stop(
        lambda e: engine.train_an_epoch(loader, e),
        lambda df: _predict_pointwise(engine.model, df, chunk=20_000),
        data, max_epoch, patience,
    )


def _vaecf_predict(model, df, fixed, chunk=50_000):
    """VAECF predict. The reference's model.predict
    (/root/reference/beta_rec/models/vaecf.py:89-108) flattens the decoded
    (n_users, n_items) matrix and indexes it with ITEM ids only — every
    user's score is read from user 0's row. ``fixed=False`` drives that
    verbatim; ``fixed=True`` applies the evident intent (index
    [user * n_items + item]) and changes nothing else."""
    import torch
    from scipy.sparse import csr_matrix

    users = df["col_user"].to_numpy()
    items = df["col_item"].to_numpy()
    n_users, n_items = model.config["n_users"], model.config["n_items"]
    preds = []
    with torch.no_grad():
        for s in range(0, len(users), chunk):
            u, it = users[s:s + chunk], items[s:s + chunk]
            x_u = csr_matrix((np.ones(len(u)), (u, it)), shape=(n_users, n_items))
            z_u, _ = model.encode(torch.tensor(x_u.toarray(), dtype=torch.float32))
            flat = model.decode(z_u).data.flatten()
            idx = (u.astype(np.int64) * n_items + it) if fixed else it
            preds.append(np.asarray(flat[idx], dtype=np.float64))
    return np.concatenate(preds)


def _run_reference_vaecf_impl(split, seed, run_dir, fixed, max_epoch=60,
                              patience=20):
    from beta_rec.data.base_data import BaseData
    from beta_rec.models.vaecf import VAECFEngine

    _seed_everything(seed)
    data = BaseData(copy.deepcopy(split))
    cfg = _base_config(
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 64,
         "batch_size": 128, "optimizer": "adam", "lr": 0.001, "beta": 1.0,
         "weight_decay": 0.0, "activation": "tanh", "likelihood": "mult",
         "dropout": 0.0},
        run_dir,
    )
    engine = VAECFEngine(cfg)
    loader = data.instance_vae_loader(device="cpu")

    # sanity: on one chunk the verbatim path equals the reference's own
    # model.predict (proves _vaecf_predict(fixed=False) IS the verbatim path)
    sl = data.valid[0].head(200)
    ref = np.asarray(engine.model.predict(sl["col_user"].to_numpy(),
                                          sl["col_item"].to_numpy()),
                     dtype=np.float64)
    ours = _vaecf_predict(engine.model, sl, fixed=False)
    assert np.allclose(ref, ours, atol=1e-5), np.abs(ref - ours).max()

    return _train_with_early_stop(
        lambda e: engine.train_an_epoch(loader, e),
        lambda df: _vaecf_predict(engine.model, df, fixed=fixed),
        data, max_epoch, patience,
    )


def run_reference_vaecf(split, seed, run_dir, max_epoch=60, patience=20):
    return _run_reference_vaecf_impl(split, seed, run_dir, fixed=False,
                                     max_epoch=max_epoch, patience=patience)


def run_reference_vaecf_fixed(split, seed, run_dir, max_epoch=60, patience=20):
    return _run_reference_vaecf_impl(split, seed, run_dir, fixed=True,
                                     max_epoch=max_epoch, patience=patience)


def run_reference_triple2vec(split, seed, run_dir, max_epoch=40, patience=10):
    """Triple2vec via Triple2vecEngine
    (/root/reference/beta_rec/models/triple2vec.py:105) with the reference's
    basket triple Sampler (beta_rec/utils/triple_sampler.py) on deterministic
    synthetic baskets (5 consecutive interactions per user per basket, shared
    with our side via datasets.synthetic.add_synthetic_baskets)."""
    import torch
    from torch.utils.data import DataLoader as TorchDataLoader

    from beta_rec.data.base_data import BaseData
    from beta_rec.models.triple2vec import Triple2vecEngine
    from beta_rec.utils.triple_sampler import Sampler

    from beta_recsys_tpu.datasets.synthetic import add_synthetic_baskets

    _seed_everything(seed)
    train, valid, test = copy.deepcopy(split)
    data = BaseData((train, valid, test))
    basket_train = add_synthetic_baskets(data.train)
    cfg = _base_config(
        {"n_users": data.n_users, "n_items": data.n_items, "emb_dim": 64,
         "n_neg": 5, "n_sample": 100_000, "batch_size": 512,
         "optimizer": "adam", "lr": 0.001},
        run_dir,
    )
    engine = Triple2vecEngine(cfg)
    engine.data = data  # train_an_epoch draws user/item negatives from here
    sampler = Sampler(basket_train, os.path.join(run_dir, "ref_triples.csv"),
                      100_000, dump=False)
    triples = sampler.sample()
    loader = TorchDataLoader(
        torch.LongTensor(triples.to_numpy()), batch_size=512, shuffle=True
    )

    def predict_fn(df):
        engine.model.eval()
        return _predict_pointwise(engine.model, df)

    return _train_with_early_stop(
        lambda e: engine.train_an_epoch(loader, e),
        predict_fn, data, max_epoch, patience,
    )


RUNNERS = {"MF": run_reference_mf, "NCF": run_reference_ncf,
           "LightGCN": run_reference_lightgcn, "SASRec": run_reference_sasrec,
           "SASRec_fixed": run_reference_sasrec_fixed,
           "LightGCN_tuned": run_reference_lightgcn_tuned,
           "GMF": run_reference_gmf, "MLP": run_reference_mlp,
           "NGCF": run_reference_ngcf, "UltraGCN": run_reference_ultragcn,
           "VAECF": run_reference_vaecf, "VAECF_fixed": run_reference_vaecf_fixed,
           "Triple2vec": run_reference_triple2vec}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--models", default="MF,NCF,LightGCN,SASRec")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--out", default="REFERENCE_H2H.json")
    ap.add_argument("--root-dir", default="parity_runs")
    ap.add_argument("--n-test", type=int, default=1)
    ap.add_argument("--n-negative", type=int, default=100)
    ap.add_argument("--max-epoch", type=int, default=None, help="cap (smoke)")
    ap.add_argument("--reference-root", default="/root/reference")
    args = ap.parse_args()

    _install_reference(args.reference_root)

    # Same split as parity_check: structured synthetic, leave-one-out, cached
    # npz under root_dir (deterministic generator, seed 2020).
    from beta_recsys_tpu.datasets.data_load import DATASET_REGISTRY

    os.makedirs(args.root_dir, exist_ok=True)
    ds = DATASET_REGISTRY["synthetic_structured"](root_dir=args.root_dir)
    split = ds.load_leave_one_out(n_test=args.n_test, n_negative=args.n_negative)

    # merge with prior runs so per-model invocations accumulate
    results = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = json.load(f).get("results", {})
        except Exception:
            pass
    for model in [m.strip() for m in args.models.split(",") if m.strip()]:
        runs = []
        for seed in [int(s) for s in args.seeds.split(",")]:
            t0 = time.time()
            kwargs = {}
            if args.max_epoch is not None:
                kwargs["max_epoch"] = args.max_epoch
            r = RUNNERS[model](split, seed, run_dir=args.root_dir, **kwargs)
            r["seed"] = seed
            r["train_sec"] = time.time() - t0
            runs.append(r)
            print(f"[reference] {model} seed={seed}: best_epoch={r['best_epoch']} "
                  f"{json.dumps(r['test'])} ({r['train_sec']:.0f}s)", flush=True)
        agg = {
            k: (float(np.mean([r["test"][k] for r in runs])),
                float(np.std([r["test"][k] for r in runs])))
            for k in runs[0]["test"]
        }
        results[model] = {"aggregate": agg, "curve": runs[0]["curve"],
                          "best_epochs": [r["best_epoch"] for r in runs],
                          "train_sec": float(np.mean([r["train_sec"] for r in runs]))}
        with open(args.out, "w") as f:
            json.dump({"meta": {"backend": "torch-cpu", "seeds": args.seeds,
                                "n_negative": args.n_negative,
                                "generated": time.strftime("%Y-%m-%d %H:%M:%S")},
                       "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
