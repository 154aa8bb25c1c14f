"""Smoke-test the example CLIs end to end on the synthetic dataset."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, tmp, timeout=500):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # force the virtual-CPU test backend inside the subprocess
    env["BETA_RECSYS_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, *args], cwd=str(tmp), env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture()
def workdir(tmp_path):
    # examples resolve configs/ relative to cwd; link the repo configs in
    os.symlink(os.path.join(REPO, "configs"), tmp_path / "configs")
    os.symlink(os.path.join(REPO, "examples"), tmp_path / "examples")
    return tmp_path


def test_train_sasrec_cli(workdir):
    cfg = json.load(open(os.path.join(REPO, "configs", "sasrec_default.json")))
    cfg["system"]["root_dir"] = "./"
    cfg["dataset"].update({"dataset": "synthetic", "n_test": 1, "n_negative": 10})
    cfg["model"].update({"max_epoch": 2, "max_n_update": 2, "emb_dim": 16,
                         "maxlen": 10, "num_blocks": 1, "num_heads": 1,
                         "batch_size": 64})
    with open(workdir / "smoke_sasrec.json", "w") as f:
        json.dump(cfg, f)
    r = _run(["examples/train_sasrec.py", "--config_file", "smoke_sasrec.json"], workdir)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "test result:" in r.stdout


def test_train_mf_cli(workdir):
    cfg = json.load(open(os.path.join(REPO, "configs", "mf_default.json")))
    cfg["system"]["root_dir"] = "./"
    cfg["dataset"].update({"dataset": "synthetic", "n_test": 1, "n_negative": 10})
    cfg["model"].update({"max_epoch": 3, "max_n_update": 3, "emb_dim": 8, "batch_size": 256})
    with open(workdir / "smoke_mf.json", "w") as f:
        json.dump(cfg, f)
    r = _run(["examples/train_mf.py", "--config_file", "smoke_mf.json"], workdir)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "test result:" in r.stdout
    assert os.path.exists(workdir / "results" / "mf_result.csv")


def test_per_model_wrapper_cli(workdir):
    """The thin per-model scripts (train_ncf.py etc.) delegate to run_model."""
    cfg = json.load(open(os.path.join(REPO, "configs", "ncf_default.json")))
    cfg["system"]["root_dir"] = "./"
    cfg["dataset"].update({"dataset": "synthetic", "n_test": 1, "n_negative": 10})
    cfg["model"].update({"max_epoch": 2, "max_n_update": 2, "emb_dim": 8,
                         "layers": [16, 8], "batch_size": 256})
    with open(workdir / "smoke_ncf.json", "w") as f:
        json.dump(cfg, f)
    r = _run(["examples/train_ncf.py", "--config_file", "smoke_ncf.json"], workdir)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "test result:" in r.stdout


def test_all_per_model_wrappers_parse():
    """Every train_<model>.py resolves its model key and prints --help."""
    import glob

    for path in sorted(glob.glob(os.path.join(REPO, "examples", "train_*.py"))):
        name = os.path.basename(path)
        if name in ("train_model.py",):
            continue
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        r = subprocess.run(
            [sys.executable, path, "--help"], env=env,
            capture_output=True, text=True, timeout=120, cwd=REPO,
        )
        assert r.returncode == 0, f"{name}: {r.stderr[-500:]}"


def test_serve_topk_cli(workdir):
    """Serving surface: train briefly, emit top-k CSV (examples/serve_topk.py)."""
    r = _run(
        ["examples/serve_topk.py", "--dataset", "synthetic", "--k", "3",
         "--max_epoch", "2", "--users", "0,1", "--out", "topk.csv"],
        workdir,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(workdir / "topk.csv")
    import pandas as pd

    t = pd.read_csv(workdir / "topk.csv")
    assert set(t.columns) >= {"col_user", "col_item", "col_prediction", "rank"}
    assert len(t) == 6 and t["rank"].max() == 3
