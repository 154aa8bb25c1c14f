"""Experiment API example: compare several models on one dataset.

Usage:
    python examples/run_experiment.py --dataset ml_100k
"""

import argparse
import sys

sys.path.insert(0, ".")

from beta_recsys_tpu.config import load_config
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.datasets import load_split_dataset
from beta_recsys_tpu.experiment import Experiment
from beta_recsys_tpu.recommenders import LightGCN, MatrixFactorization, NeuCF


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="ml_100k")
    args = parser.parse_args()

    mf_cfg = load_config("configs/mf_default.json", {"dataset": args.dataset})
    ncf_cfg = load_config("configs/ncf_default.json", {"dataset": args.dataset})
    gcn_cfg = load_config("configs/lightgcn_default.json", {"dataset": args.dataset})

    split = load_split_dataset(mf_cfg.to_dict())
    data = BaseData(split)

    experiment = Experiment(
        datasets=[data],
        models=[MatrixFactorization(mf_cfg), NeuCF(ncf_cfg), LightGCN(gcn_cfg)],
        metrics=["ndcg", "recall", "precision", "map"],
        eval_scopes=[5, 10, 20],
    )
    results = experiment.run()
    print(results)


if __name__ == "__main__":
    main()
