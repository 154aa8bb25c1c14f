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


_WORKER_PLACEMENT = None


def _init_worker(placement_queue):
    """Pool initializer: claim THIS worker's placement and pin its devices
    before the jax backend initializes (each live worker holds a unique
    placement — env vars for the multi-slice recipe, platform/device-count
    for CPU-mesh partitioning)."""
    global _WORKER_PLACEMENT
    try:
        # a respawned worker (e.g. under max_tasks_per_child) would find the
        # queue empty — fall back to no placement instead of hanging the pool
        placement = placement_queue.get(timeout=30)
    except Exception:
        placement = None
    _WORKER_PLACEMENT = placement
    if placement:
        for k, v in placement.get("env", {}).items():
            os.environ[k] = str(v)
        import jax

        # config updates must land before any jax.devices() call in this
        # process (the backend is lazily initialized; see tests/conftest.py)
        if placement.get("platform"):
            jax.config.update("jax_platforms", placement["platform"])
        if placement.get("num_cpu_devices"):
            jax.config.update("jax_num_cpu_devices", int(placement["num_cpu_devices"]))


def _run_trial(spec):
    """Process-pool entry: rebuild the recommender in a fresh interpreter.

    A fresh process gives each trial its own device runtime — the moral
    equivalent of one Ray worker / one TPU slice per trial; the worker's
    device placement was pinned by _init_worker.
    """
    cls_module, cls_name, cfg_raw, data = spec
    import importlib

    from ..config import Config

    cls = getattr(importlib.import_module(cls_module), cls_name)
    rec = cls(Config(cfg_raw))
    result = rec.train(data)
    import jax

    return {
        "valid_metric": result["valid_metric"],
        "model_save_dir": result["model_save_dir"],
        "worker": {
            "pid": os.getpid(),
            "partition_index": (_WORKER_PLACEMENT or {}).get("partition_index"),
            "n_devices": jax.local_device_count(),
            "platform": jax.default_backend(),
        },
    }


def _worker_placements(processes, worker_env):
    """Per-worker device placement (SURVEY §2.8 P3 "one trial per TPU slice").

    - ``worker_env`` given (a list of >= ``processes`` env dicts): the
      multi-slice recipe — each worker process gets its env (e.g.
      {"TPU_VISIBLE_CHIPS": "0"} / per-slice coordinator vars) before its
      jax backend initializes, so trials land on disjoint slices.
    - CPU backend: the virtual device pool is partitioned — worker i runs
      with num_cpu_devices = total // processes, so two workers never
      oversubscribe the host the way `processes` single-chip TPU workers
      would oversubscribe the chip.
    - single-chip TPU backend without worker_env: returns None, which makes
      ``tune`` serialize trials with a warning (libtpu is single-client; N
      workers would fight over the one chip).
    """
    import jax

    if worker_env is not None:
        if len(worker_env) < processes:
            raise ValueError(
                f"worker_env has {len(worker_env)} entries for {processes} workers"
            )
        return [{"env": dict(worker_env[i]), "partition_index": i}
                for i in range(processes)]
    if jax.default_backend() == "cpu":
        per = max(jax.local_device_count() // processes, 1)
        return [{"platform": "cpu", "num_cpu_devices": per, "partition_index": i}
                for i in range(processes)]
    return None


def tune(recommender_cls, config, data, tune_dir=None, processes=0, worker_env=None):
    """Run the full grid; returns the best-trial dict and writes tune_result.csv.

    ``processes > 0`` launches trials in separate processes (fresh device
    runtime per trial) with per-worker device placement (_worker_placements);
    on a single-chip TPU without ``worker_env`` this falls back to sequential
    in-process trials with a warning. ``worker_env`` is the multi-slice
    recipe: a list of per-worker env dicts (one per slice).
    """
    grid = expand_grid(config.tunable)
    if not grid:
        raise ValueError("Config has no tunable section to tune over")
    trial_cfgs = [config.replace(model={**ov, "tune": False}) for ov in grid]
    rows = []
    best = None
    placements = _worker_placements(processes, worker_env) if processes > 0 else None
    if processes > 0 and placements is None:
        print(
            "WARNING: tune(processes>0) on a single-chip TPU backend without "
            "worker_env — libtpu is single-client, so parallel workers would "
            "contend for the one chip; running trials sequentially instead. "
            "For multi-slice sweeps pass worker_env=[{...per-slice env...}]."
        )
        processes = 0
    if processes > 0:
        import concurrent.futures
        import multiprocessing as mp

        specs = [
            (recommender_cls.__module__, recommender_cls.__name__, cfg.to_dict(), data)
            for cfg in trial_cfgs
        ]
        ctx = mp.get_context("spawn")
        # a Manager queue hands each worker process exactly one placement
        # (initializer runs once per worker)
        manager = ctx.Manager()
        try:
            q = manager.Queue()
            for p in placements:
                q.put(p)
            with concurrent.futures.ProcessPoolExecutor(
                processes, mp_context=ctx, initializer=_init_worker, initargs=(q,)
            ) as pool:
                results = list(pool.map(_run_trial, specs))
        finally:
            manager.shutdown()
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
        for k, v in result.get("worker", {}).items():
            row[f"worker_{k}"] = v
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
