"""Round-3 fixes: processed-split downloads, load-then-test Experiment,
log-scaled tune ranges, per-user dump with padded mesh evaluators."""

import os

import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.config import Config
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.datasets.data_split import feed_neg_sample, leave_one_out
from beta_recsys_tpu.experiment.tune import expand_grid
from beta_recsys_tpu.utils.alias_table import AliasTable
from beta_recsys_tpu.utils.constants import (
    DEFAULT_FLAG_COL,
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)
from tests.test_train_mf import make_structured_interactions


# -- expand_grid: log-scaled ranges ---------------------------------------------


def test_expand_grid_log_scale_for_wide_positive_ranges():
    grid = expand_grid([{"name": "lr", "type": "range", "values": [1e-4, 1e-1], "n": 4}])
    values = [g["lr"] for g in grid]
    # geometric: each step multiplies by 10, not adds (hi-lo)/3
    ratios = [values[i + 1] / values[i] for i in range(3)]
    assert all(abs(r - 10.0) < 1e-6 for r in ratios), values


def test_expand_grid_linear_for_narrow_or_signed_ranges():
    grid = expand_grid([{"name": "a", "type": "range", "values": [0.0, 1.0], "n": 3}])
    assert [g["a"] for g in grid] == [0.0, 0.5, 1.0]
    # explicit override wins
    grid = expand_grid(
        [{"name": "a", "type": "range", "values": [1e-4, 1e-1], "n": 2, "scale": "linear"}]
    )
    assert [g["a"] for g in grid] == [1e-4, 1e-1]


def test_expand_grid_log_scale_rejects_nonpositive():
    with pytest.raises(ValueError):
        expand_grid(
            [{"name": "a", "type": "range", "values": [-1.0, 1.0], "scale": "log"}]
        )


# -- download=True: processed-split fetch via mocked OneDrive --------------------


def test_load_split_download_uses_processed_url(tmp_path, monkeypatch):
    """On cache miss with download=True the configured processed_*_url is
    fetched (reference dataset_base.py:502-907); local split building must NOT
    run when the download provides the files."""
    from beta_recsys_tpu.datasets import dataset_base as db
    from beta_recsys_tpu.utils.common import save_dataframe_as_npz

    def fake_download(self):
        # write a 2-user split directly into the destination dir
        fake_download.urls.append(self.url)
        os.makedirs(self.path, exist_ok=True)
        frame = pd.DataFrame(
            {
                DEFAULT_USER_COL: [0, 1],
                DEFAULT_ITEM_COL: [0, 1],
                DEFAULT_RATING_COL: [1.0, 1.0],
            }
        )
        save_dataframe_as_npz(frame, os.path.join(self.path, "train.npz"))
        save_dataframe_as_npz(frame, os.path.join(self.path, "valid_0.npz"))
        save_dataframe_as_npz(frame, os.path.join(self.path, "test_0.npz"))

    fake_download.urls = []
    monkeypatch.setattr("beta_recsys_tpu.utils.onedrive.OneDrive.download", fake_download)

    def boom(*a, **k):
        raise AssertionError("local split build ran despite successful download")

    ds = db.DatasetBase(
        "fake_ds",
        root_dir=str(tmp_path),
        processed_leave_one_out_url="https://1drv.ms/u/s!fake",
    )
    monkeypatch.setattr(ds, "_make_split", boom)
    train, valid, test = ds.load_leave_one_out(n_test=1, download=True)
    assert len(train) == 2 and len(valid) == 1 and len(test) == 1
    assert fake_download.urls == ["https://1drv.ms/u/s!fake"]


def test_load_split_download_failure_falls_back_to_local(tmp_path, monkeypatch):
    from beta_recsys_tpu.datasets import dataset_base as db

    def failing_download(self):
        raise OSError("no network")

    monkeypatch.setattr(
        "beta_recsys_tpu.utils.onedrive.OneDrive.download", failing_download
    )

    ds = db.DatasetBase(
        "fake_ds2",
        root_dir=str(tmp_path),
        processed_leave_one_out_url="https://1drv.ms/u/s!fake",
    )
    df = make_structured_interactions(n_users=20, n_items=40, per_user=6)
    monkeypatch.setattr(ds, "load_interaction", lambda: df)
    train, valid, test = ds.load_leave_one_out(n_test=1, n_negative=5, download=True)
    assert len(train) > 0 and len(valid[0]) > 0


def test_download_processed_split_without_url_is_noop(tmp_path):
    from beta_recsys_tpu.datasets import dataset_base as db

    ds = db.DatasetBase("fake_ds3", root_dir=str(tmp_path))
    assert ds.download_processed_split("leave_one_out", str(tmp_path / "dest")) is False


def test_flagship_adapters_carry_processed_urls():
    from beta_recsys_tpu.datasets.dunnhumby import Dunnhumby
    from beta_recsys_tpu.datasets.movielens import Movielens_100k
    from beta_recsys_tpu.datasets.tafeng import Tafeng

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        assert Movielens_100k(root_dir=d).processed_leave_one_out_url.startswith("https://1drv.ms")
        assert Dunnhumby(root_dir=d).processed_leave_one_basket_url.startswith("https://1drv.ms")
        assert Tafeng(root_dir=d).processed_temporal_split_url.startswith("https://1drv.ms")


# -- Experiment.load_pretrained_model: load then test, no training ---------------


def _small_data():
    df = make_structured_interactions()
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    test = flagged[flagged[DEFAULT_FLAG_COL] == "test"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    return BaseData(
        (train, [feed_neg_sample(valid, 20, sampler)], [feed_neg_sample(test, 20, sampler)])
    )


def _mf_cfg(tmp_path):
    return Config(
        {
            "system": {
                "root_dir": str(tmp_path),
                "metrics": ["ndcg", "recall"],
                "k": [10],
                "valid_metric": "ndcg",
                "valid_k": 10,
                "seed": 1,
            },
            "dataset": {"dataset": "synthetic", "data_split": "leave_one_out"},
            "model": {
                "model": "MF", "emb_dim": 16, "batch_size": 128, "loss": "bpr",
                "optimizer": "adam", "lr": 0.05, "max_epoch": 5, "max_n_update": 5,
            },
        }
    )


def test_load_pretrained_model_runs_no_training(tmp_path, monkeypatch):
    from beta_recsys_tpu.experiment.experiment import Experiment
    from beta_recsys_tpu.recommenders import MatrixFactorization

    data = _small_data()
    trained = MatrixFactorization(_mf_cfg(tmp_path))
    result = trained.train(data)
    model_dir = result["model_save_dir"]

    # fresh instances; any epoch run must fail the test
    from beta_recsys_tpu.core.train_engine import TrainEngine

    def no_train(self, *a, **k):
        raise AssertionError("TrainEngine.train ran inside load_pretrained_model")

    monkeypatch.setattr(TrainEngine, "train", no_train)
    exp = Experiment(datasets=[data], models=[MatrixFactorization(_mf_cfg(tmp_path))])
    rows = exp.load_pretrained_model(model_dir)
    assert len(rows) == 1
    mean_row = rows[0][0] if isinstance(rows[0], tuple) else rows[0]
    assert any(k.startswith("ndcg@") for k in mean_row)


# -- per-user dump with a mesh evaluator that padded users -----------------------


def test_per_user_dump_excludes_pad_rows(tmp_path):
    import jax

    from beta_recsys_tpu.core.eval_engine import RankingEvaluator, test_eval
    from beta_recsys_tpu.models.mf import MF
    from beta_recsys_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=2)
    n_users, n_items, n_cand = 11, 24, 6  # 11 users do not divide the 4-wide data axis
    cfg = {"model": "MF", "emb_dim": 8, "loss": "bpr", "lr": 0.05}
    model = MF(cfg, n_users, n_items)
    params = model.init_params(jax.random.key(0))

    rng = np.random.default_rng(0)

    class Cand:
        users = np.arange(n_users, dtype=np.int32)
        items = rng.integers(0, n_items, (n_users, n_cand)).astype(np.int32)
        relevance = np.eye(n_cand, dtype=np.float32)[rng.integers(0, n_cand, n_users)]
        mask = np.ones((n_users, n_cand), bool)

    ev = RankingEvaluator(model, Cand(), metrics=("ndcg",), ks=(5,), mesh=mesh)
    assert ev.users.shape[0] == 12  # padded to the data axis
    per_user_file = str(tmp_path / "per_user.csv")
    mean_row, _ = test_eval(
        [ev], params, save_mode="per_user", per_user_file=per_user_file
    )
    dump = pd.read_csv(per_user_file)
    # exactly the real users' candidate rows — no phantom pad rows
    assert len(dump) == n_users * n_cand
    counts = dump["col_user"].value_counts()
    assert set(counts.index) == set(range(n_users))
    assert (counts == n_cand).all()
    assert np.isfinite(mean_row["ndcg@5"])
