"""Serving example: train (or load) a recommender, emit top-k per user.

The retrieval surface the reference lacks (its `predict` only scores
explicit pairs, beta_rec/core/recommender.py:58-62): `Recommender.recommend`
runs on-device streaming top-k over the full catalog, excludes train items,
and serves the best validation checkpoint. Output is a CSV of
(user, item, prediction, rank) rows.

    # train then serve
    python examples/serve_topk.py --dataset synthetic_structured --k 10

    # serve a previously trained run (no training)
    python examples/serve_topk.py --load <model_save_dir> --k 10
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dataset", default="synthetic_structured")
    ap.add_argument("--config", default="configs/mf_default.json")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--max_epoch", type=int, default=10)
    ap.add_argument("--users", default=None,
                    help="comma-separated user ids (default: all)")
    ap.add_argument("--load", default=None,
                    help="model_save_dir of a trained run (skips training)")
    ap.add_argument("--root_dir", default="serve_runs")
    ap.add_argument("--out", default="topk.csv")
    args = ap.parse_args()

    from beta_recsys_tpu.config import load_config
    from beta_recsys_tpu.data.base_data import BaseData
    from beta_recsys_tpu.datasets.data_load import DATASET_REGISTRY
    from beta_recsys_tpu.recommenders import MatrixFactorization

    split = DATASET_REGISTRY[args.dataset](root_dir=args.root_dir).load_leave_one_out(
        n_test=1, n_negative=100
    )
    data = BaseData(split)
    cfg = load_config(args.config, overrides={
        "root_dir": args.root_dir, "dataset": args.dataset,
        "max_epoch": args.max_epoch, "n_test": 1,
    })
    rec = MatrixFactorization(cfg)
    if args.load:
        rec.load(args.load, data=data)
    else:
        rec.train(data)

    users = None
    if args.users:
        users = [int(u) for u in args.users.split(",")]
    table = rec.recommend(users=users, k=args.k)
    table.to_csv(args.out, index=False)
    print(f"wrote {len(table)} rows ({table['col_user'].nunique()} users x "
          f"top-{args.k}) to {args.out}")
    print(table.head(args.k).to_string(index=False))


if __name__ == "__main__":
    main()
