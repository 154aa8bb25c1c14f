"""Grocery (basket) data: BaseData + triple sampling + auxiliary features.

Reference parity: beta_rec/data/grocery_data.py:13-125 — basket triple samples
with an on-disk CSV cache (utils/triple_sampler), optionally time-bucketed for
TVBR, plus user/item auxiliary features (data/auxiliary_data.py) for VBCAR.
"""

import os

import numpy as np

from ..utils.triple_sampler import Sampler
from .base_data import BaseData


class GroceryData(BaseData):
    """BaseData + (user, item, item) basket triples for Triple2vec/VBCAR/TVBR."""

    def __init__(self, split_dataset, config=None, intersect=True, binarize=True, bin_thld=0.0, normalize=False):
        super().__init__(split_dataset, intersect=intersect, binarize=binarize, bin_thld=bin_thld, normalize=normalize)
        self.config = config

    def sample_triples(self, n_sample, time_step=0, sample_dir=None, dump=False, load_save=False, seed=None):
        """Draw basket triples; returns device-ready arrays.

        {"users", "item1", "item2"} int32 arrays (+ "t" when time_step > 0).
        """
        sample_file = os.path.join(
            sample_dir or ".", f"triple_{n_sample}_{time_step}.csv"
        )
        sampler = Sampler(
            self.train, sample_file, n_sample, dump=dump, load_save=load_save, seed=seed
        )
        df = sampler.sample() if time_step == 0 else sampler.sample_by_time(time_step)
        out = {
            "users": df["UID"].to_numpy(np.int32),
            "item1": df["PID1"].to_numpy(np.int32),
            "item2": df["PID2"].to_numpy(np.int32),
        }
        if "T" in df.columns:
            out["t"] = df["T"].to_numpy(np.int32)
        return out

    def user_item_features(self, fea_type="random", emb_dim=64, item_fea_dic=None, seed=0):
        """Auxiliary feature matrices for VBCAR/TVBR.

        fea_type="random": Gaussian features (reference Auxiliary default,
        data/auxiliary_data.py:27-60); other types concatenate loaded item
        feature CSVs (one_hot / word2vec / bert / cate) passed via item_fea_dic.
        """
        rng = np.random.default_rng(seed)
        user_fea = rng.normal(0, 1, (self.n_users, emb_dim)).astype(np.float32)
        if fea_type == "random" or item_fea_dic is None:
            item_fea = rng.normal(0, 1, (self.n_items, emb_dim)).astype(np.float32)
        else:
            parts = []
            for key in sorted(item_fea_dic):
                mat = np.asarray(item_fea_dic[key], dtype=np.float32)
                parts.append(mat)
            item_fea = np.concatenate(parts, axis=1)
        return user_fea, item_fea
