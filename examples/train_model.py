"""Generic training CLI: run any registered recommender from its config.

Usage:
    python examples/train_model.py --model lightgcn --dataset ml_100k
    python examples/train_model.py --model vaecf --config_file configs/vaecf_default.json
    python examples/train_model.py --model mf --tune true

Covers the reference's per-model train_*.py scripts (examples/train_ncf.py etc.)
with one entry point; model-specific wrappers pick the right data class and
artifacts automatically.
"""

import argparse
import sys

sys.path.insert(0, ".")

from beta_recsys_tpu import recommenders as rec
from beta_recsys_tpu.config import load_config
from beta_recsys_tpu.datasets import load_split_dataset
from beta_recsys_tpu.utils.common import str2bool

WRAPPERS = {
    "mf": (rec.MatrixFactorization, "configs/mf_default.json"),
    "gmf": (rec.GMFRecommender, "configs/gmf_default.json"),
    "mlp": (rec.MLPRecommender, "configs/mlp_default.json"),
    "ncf": (rec.NeuCF, "configs/ncf_default.json"),
    "pairwise_gmf": (rec.PairwiseGMFRecommender, "configs/pairwise_gmf_default.json"),
    "lightgcn": (rec.LightGCN, "configs/lightgcn_default.json"),
    "ngcf": (rec.NGCF, "configs/ngcf_default.json"),
    "ultragcn": (rec.UltraGCN, "configs/ultragcn_default.json"),
    "sgl": (rec.SGL, "configs/sgl_default.json"),
    "simgcl": (rec.SimGCL, "configs/simgcl_default.json"),
    "mixgcf": (rec.MixGCF, "configs/mixgcf_default.json"),
    "buir": (rec.BUIR, "configs/buir_default.json"),
    "lcfn": (rec.LCFN, "configs/lcfn_default.json"),
    "vaecf": (rec.VAECF, "configs/vaecf_default.json"),
    "cmn": (rec.CMN, "configs/cmn_default.json"),
    "sasrec": (rec.SASRec, "configs/sasrec_default.json"),
    "tisasrec": (rec.TiSASRec, "configs/tisasrec_default.json"),
    "narm": (rec.NARM, "configs/narm_default.json"),
    "triple2vec": (rec.Triple2vec, "configs/triple2vec_default.json"),
    "vbcar": (rec.VBCAR, "configs/vbcar_default.json"),
    "tvbr": (rec.TVBR, "configs/tvbr_default.json"),
    "userknn": (rec.UserKNNRecommender, "configs/userKNN_default.json"),
    "itemknn": (rec.ItemKNNRecommender, "configs/itemKNN_default.json"),
}


def parse_args(fixed_model=None):
    parser = argparse.ArgumentParser(description="Train any recommender on TPU.")
    if fixed_model is None:
        parser.add_argument("--model", type=str, required=True, choices=sorted(WRAPPERS))
    parser.add_argument("--config_file", default=None)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--data_split", type=str, default=None)
    parser.add_argument("--root_dir", type=str, default=None)
    parser.add_argument("--n_test", type=int, default=None)
    parser.add_argument("--n_negative", type=int, default=None)
    parser.add_argument("--emb_dim", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--tune", type=str2bool, default=None)
    return parser.parse_args()


def run_model(fixed_model=None):
    """Train one recommender end-to-end; ``fixed_model`` pins the model key.

    The per-model wrappers in this directory (train_ncf.py, train_lightgcn.py,
    ...) mirror the reference's per-model CLIs (reference examples/train_*.py,
    e.g. examples/train_ncf.py:20-74) by calling this with their model key.
    """
    args = vars(parse_args(fixed_model))
    wrapper_cls, default_cfg = WRAPPERS[fixed_model or args.pop("model")]
    config_file = args.pop("config_file") or default_cfg
    config = load_config(config_file, overrides=args)
    split = load_split_dataset(config.to_dict())
    data = wrapper_cls.data_class(split)
    model = wrapper_cls(config)
    print("train result:", model.train(data))
    print("test result:", model.test())


def main():
    run_model()


if __name__ == "__main__":
    main()
