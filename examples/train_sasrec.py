"""Train SASRec from the command line (sequential family example).

Usage:
    python examples/train_sasrec.py --dataset ml_100k --maxlen 50
"""

import argparse
import sys

sys.path.insert(0, ".")

from beta_recsys_tpu.config import load_config
from beta_recsys_tpu.data.sequential_data import SequentialData
from beta_recsys_tpu.datasets import load_split_dataset
from beta_recsys_tpu.recommenders import SASRec


def parse_args():
    parser = argparse.ArgumentParser(description="Run SASRec on TPU.")
    parser.add_argument("--config_file", default="configs/sasrec_default.json")
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--root_dir", type=str, default=None)
    parser.add_argument("--maxlen", type=int, default=None)
    parser.add_argument("--emb_dim", type=int, default=None)
    parser.add_argument("--num_blocks", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--max_epoch", type=int, default=None)
    return parser.parse_args()


def main():
    args = vars(parse_args())
    config = load_config(args.pop("config_file"), overrides=args)
    split = load_split_dataset(config.to_dict())
    data = SequentialData(split)
    model = SASRec(config)
    result = model.train(data)
    print("train result:", result)
    print("test result:", model.test())


if __name__ == "__main__":
    main()
