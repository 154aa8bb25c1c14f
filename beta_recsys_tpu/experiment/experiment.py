"""Experiment: run a datasets x models matrix and collate a results table.

Reference parity: beta_rec/experiment/experiment.py:30-119 — metric/k/result
file overrides are applied to every model config, each (dataset, model) pair is
trained and tested, and the results collate into one table. Because configs are
immutable here, overrides produce new wrapper instances via Config.replace.
"""

import pandas as pd


class Experiment:
    """Train/test every model on every dataset; collect one results table."""

    def __init__(self, datasets, models, metrics=None, eval_scopes=None, result_file=None, save_dir=None):
        self.datasets = datasets
        self.models = models
        self.metrics = metrics
        self.eval_scopes = eval_scopes
        self.result_file = result_file
        self.save_dir = save_dir
        self._update_configs()

    def _update_configs(self):
        overrides = {}
        if self.metrics is not None:
            overrides["metrics"] = list(self.metrics)
        if self.eval_scopes is not None:
            overrides["k"] = list(self.eval_scopes)
        if self.save_dir is not None:
            overrides["result_dir"] = self.save_dir
        for idx, model in enumerate(self.models):
            per_model = dict(overrides)
            if self.result_file is not None:
                name = model.config.model.get("model", f"model_{idx}")
                per_model["result_file"] = f"model_{idx}_{name}_{self.result_file}"
            if per_model:
                model.config = model.config.replace(system=per_model)

    def load_pretrained_model(self, model_dir):
        """Load each model from a saved checkpoint dir and score the test sets
        — no training runs (reference experiment.py:89-96 semantics: load then
        test). Recommender.load rebuilds the engine cold from checkpoint
        metadata; ``data`` is passed so artifact-needing models can build
        their adjacency/contexts."""
        rows = []
        for data in self.datasets:
            for model in self.models:
                model.load(model_dir, data=data)
                rows.append(model.test())
        return rows

    def run(self):
        """Train + test the full matrix; returns a tidy results DataFrame."""
        rows = []
        for data in self.datasets:
            for model in self.models:
                train_result = model.train(data)
                test_result = model.test()
                rows.append(
                    {
                        "model": model.config.model.get("model"),
                        "dataset": model.config.dataset.get("dataset"),
                        "valid_metric": train_result.get("valid_metric"),
                        **test_result,
                    }
                )
        self.results = pd.DataFrame(rows)
        print(self.results.to_string(index=False))
        return self.results
