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
    type the reference's configs use; ranges become an N-point grid. A range
    spanning >=1 decade with positive endpoints (the lr/reg case — Ray would
    sample it log-uniform) is expanded GEOMETRICALLY so small magnitudes are
    covered; set "scale": "linear"/"log" to override the heuristic.
    """
    axes = []
    for spec in tunable:
        name = spec["name"]
        if spec.get("type") == "choice":
            values = spec["values"]
        elif spec.get("type") == "range":
            lo, hi = spec["values"] if "values" in spec else (spec["min"], spec["max"])
            n = int(spec.get("n", 5))
            scale = spec.get("scale")
            if scale is None:
                scale = "log" if (lo > 0 and hi / lo >= 10) else "linear"
            if scale == "log":
                if lo <= 0:
                    raise ValueError(f"log-scale range needs positive endpoints: {spec}")
                ratio = hi / lo
                values = [lo * ratio ** (i / max(n - 1, 1)) for i in range(n)]
            else:
                values = [lo + (hi - lo) * i / max(n - 1, 1) for i in range(n)]
        else:
            raise ValueError(f"Unknown tunable type {spec}")
        axes.append([(name, v) for v in values])
    return [dict(combo) for combo in itertools.product(*axes)]


def _run_trial(spec):
    """Process-pool entry: rebuild the recommender in a fresh interpreter.

    A fresh process gives each trial its own device runtime — the moral
    equivalent of one Ray worker / one TPU slice per trial.
    """
    cls_module, cls_name, cfg_raw, data = spec
    import importlib

    from ..config import Config

    cls = getattr(importlib.import_module(cls_module), cls_name)
    rec = cls(Config(cfg_raw))
    result = rec.train(data)
    return {
        "valid_metric": result["valid_metric"],
        "model_save_dir": result["model_save_dir"],
    }


def tune(recommender_cls, config, data, tune_dir=None, processes=0):
    """Run the full grid; returns the best-trial dict and writes tune_result.csv.

    ``processes > 0`` launches trials in separate processes (fresh device
    runtime per trial); the default runs them sequentially in-process.
    """
    grid = expand_grid(config.tunable)
    if not grid:
        raise ValueError("Config has no tunable section to tune over")
    trial_cfgs = [config.replace(model={**ov, "tune": False}) for ov in grid]
    rows = []
    best = None
    if processes > 0:
        import concurrent.futures
        import multiprocessing as mp

        specs = [
            (recommender_cls.__module__, recommender_cls.__name__, cfg.to_dict(), data)
            for cfg in trial_cfgs
        ]
        ctx = mp.get_context("spawn")
        with concurrent.futures.ProcessPoolExecutor(processes, mp_context=ctx) as pool:
            results = list(pool.map(_run_trial, specs))
    else:
        results = []
        for cfg in trial_cfgs:
            rec = recommender_cls(cfg)
            r = rec.train(data)
            results.append(
                {"valid_metric": r["valid_metric"], "model_save_dir": r["model_save_dir"]}
            )
    for i, (overrides, result) in enumerate(zip(grid, results)):
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
