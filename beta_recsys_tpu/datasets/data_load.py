"""Dataset registry: string name -> adapter class, plus config-driven loading.

Reference parity: beta_rec/datasets/data_load.py:19-136 — ``load_split_dataset``
instantiates the named adapter and loads the configured split;
``load_item_fea_dic``/``load_user_fea_dic`` read per-item/user feature CSVs
(format: "id fea1 fea2 ..." per line).
"""

import os

import numpy as np

from .amazon import AMAZON_CATEGORIES, AmazonDataset  # noqa: F401 (re-export)
from .dunnhumby import Dunnhumby
from .hetrec import Delicious_2k, LastFM_2k, MovieLens_2k
from .instacart import Instacart, Instacart_25
from .movielens import Movielens_1m, Movielens_10m, Movielens_25m, Movielens_100k
from .simple_adapters import (
    AliMobile,
    CiteULikeA,
    CiteULikeT,
    Diginetica,
    Epinions,
    Gowalla,
    LastFM,
    RetailRocket,
    Taobao,
    Yelp,
    YooChoose,
)
from .synthetic import Synthetic, SyntheticStructured
from .tafeng import Tafeng

DATASET_REGISTRY = {
    "synthetic": Synthetic,
    "synthetic_structured": SyntheticStructured,
    "random": Synthetic,
    "ml_100k": Movielens_100k,
    "ml_1m": Movielens_1m,
    "ml_10m": Movielens_10m,
    "ml_25m": Movielens_25m,
    "dunnhumby": Dunnhumby,
    "tafeng": Tafeng,
    "instacart": Instacart,
    "instacart_25": Instacart_25,
    "epinions": Epinions,
    "last_fm": LastFM,
    "yelp": Yelp,
    "gowalla": Gowalla,
    "taobao": Taobao,
    "ali_mobile": AliMobile,
    "retailrocket": RetailRocket,
    "yoochoose": YooChoose,
    "diginetica": Diginetica,
    "citeulike-a": CiteULikeA,
    "citeulike-t": CiteULikeT,
    "movielens_2k": MovieLens_2k,
    "delicious-2k": Delicious_2k,
    "lastfm-2k": LastFM_2k,
}

# Amazon categories register under their snake-ish names too.
import sys

_amazon_mod = sys.modules["beta_recsys_tpu.datasets.amazon"]
for _cls_name, _cat in AMAZON_CATEGORIES.items():
    DATASET_REGISTRY[f"amazon_{_cat.lower()}"] = getattr(_amazon_mod, _cls_name)


def build_dataset(config):
    """Instantiate the adapter named in config['dataset']['dataset']."""
    ds_cfg = config["dataset"] if isinstance(config.get("dataset"), dict) else config
    name = ds_cfg["dataset"]
    if name not in DATASET_REGISTRY:
        raise KeyError(f"Unknown dataset {name!r}; known: {sorted(DATASET_REGISTRY)}")
    kwargs = {}
    if "root_dir" in ds_cfg:
        kwargs["root_dir"] = ds_cfg["root_dir"]
    for key in ("min_u_c", "min_i_c", "min_o_c"):
        if key in ds_cfg:
            kwargs[key] = ds_cfg[key]
    return DATASET_REGISTRY[name](**kwargs)


def load_split_dataset(config):
    """Load the configured dataset + split: returns (train, valid[s], test[s])."""
    dataset = build_dataset(config)
    cfg = config if isinstance(config.get("dataset"), dict) else {"dataset": config}
    return dataset.load_split(cfg)


def _load_fea_dic(file_path):
    """Parse 'id v1 v2 ...' lines into {id: np.array}."""
    fea_dic = {}
    with open(file_path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            fea_dic[int(parts[0])] = np.asarray([float(x) for x in parts[1:]], dtype=np.float32)
    return fea_dic


def load_item_fea_dic(config, fea_type):
    """Load item features of a given type (one_hot/word2vec/bert/cate CSVs under
    datasets/<name>/raw/item_fea/). Reference data_load.py:32-78."""
    ds_cfg = config["dataset"] if isinstance(config.get("dataset"), dict) else config
    root = ds_cfg.get("root_dir", ".")
    name = ds_cfg["dataset"]
    path = os.path.join(root, "datasets", name, "raw", "item_fea", f"{fea_type}.csv")
    return _load_fea_dic(path)


def load_user_fea_dic(config, fea_type):
    """User-side analogue of load_item_fea_dic."""
    ds_cfg = config["dataset"] if isinstance(config.get("dataset"), dict) else config
    root = ds_cfg.get("root_dir", ".")
    name = ds_cfg["dataset"]
    path = os.path.join(root, "datasets", name, "raw", "user_fea", f"{fea_type}.csv")
    return _load_fea_dic(path)


def load_user_item_feature(config):
    """Load (user_feat, item_feat) matrices from the processed fea_vec npz."""
    ds_cfg = config["dataset"] if isinstance(config.get("dataset"), dict) else config
    root = ds_cfg.get("root_dir", ".")
    name = ds_cfg["dataset"]
    path = os.path.join(root, "datasets", name, "processed", f"{name}_fea_vec.npz")
    data = np.load(path)
    return data["user_feat"], data["item_feat"]
