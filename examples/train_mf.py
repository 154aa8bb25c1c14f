"""Train MF end to end from the command line.

Usage:
    python examples/train_mf.py --dataset ml_100k --lr 0.05 --loss bpr

Mirrors the reference example CLIs (reference: examples/train_mf.py) on the
TPU-native engine: config JSON + flag overrides, dataset build/split, training
with early stop, final test written to the results CSV.
"""

import argparse
import sys

sys.path.insert(0, ".")

from beta_recsys_tpu.config import load_config
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.datasets import load_split_dataset
from beta_recsys_tpu.recommenders import MatrixFactorization
from beta_recsys_tpu.utils.common import str2bool


def parse_args():
    parser = argparse.ArgumentParser(description="Run MF on TPU.")
    parser.add_argument("--config_file", default="configs/mf_default.json")
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--data_split", type=str, default=None)
    parser.add_argument("--root_dir", type=str, default=None)
    parser.add_argument("--n_test", type=int, default=None)
    parser.add_argument("--n_negative", type=int, default=None)
    parser.add_argument("--emb_dim", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--loss", type=str, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--reg", type=float, default=None)
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--tune", type=str2bool, default=None)
    return parser.parse_args()


def main():
    args = vars(parse_args())
    config = load_config(args.pop("config_file"), overrides=args)
    split = load_split_dataset(config.to_dict())
    data = BaseData(split)
    model = MatrixFactorization(config)
    result = model.train(data)
    print("train result:", result)
    print("test result:", model.test())


if __name__ == "__main__":
    main()
