"""MovieLens dataset adapters (100k / 1m / 10m / 25m).

Reference parity: beta_rec/datasets/movielens.py:40-170 — tab/::-separated
rating files -> canonical interaction npz; ml-100k additionally builds
one-hot user features (age bucket, gender, occupation) and 19-genre item
features (make_fea_vec).
"""

import os

import numpy as np
import pandas as pd

from ..utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)
from .dataset_base import DatasetBase

ML_100K_URL = "http://files.grouplens.org/datasets/movielens/ml-100k.zip"
ML_1M_URL = "http://files.grouplens.org/datasets/movielens/ml-1m.zip"
ML_10M_URL = "http://files.grouplens.org/datasets/movielens/ml-10m.zip"
ML_25M_URL = "http://files.grouplens.org/datasets/movielens/ml-25m.zip"

# Team-published processed-split archives (reference movielens.py:17-33);
# used by load_*(download=True) via DatasetBase.download_processed_split.
ML_100K_LEAVE_ONE_OUT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugU-siALoN5y9eaCq?e=jsgoOB"
ML_100K_RANDOM_URL = "https://1drv.ms/u/s!AjMahLyQeZqugVD4bv1iR6KgZn63?e=89eToa"
ML_100K_TEMPORAL_URL = "https://1drv.ms/u/s!AjMahLyQeZqugVG_vS_DggoFaySY?e=HpcD9b"
ML_1M_LEAVE_ONE_OUT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugVMZ5TK2sTGBUSr0?e=32CmFJ"
ML_1M_RANDOM_URL = "https://1drv.ms/u/s!AjMahLyQeZqugVW2Bl1A1kORNuTY?e=iEabat"
ML_1M_TEMPORAL_URL = "https://1drv.ms/u/s!AjMahLyQeZqugVf8PRlo82hSnblP?e=VpZa0L"

_COLS = [DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL]


class Movielens_100k(DatasetBase):
    """MovieLens-100k: u.data tab-separated (user, item, rating, timestamp)."""

    def __init__(self, dataset_name="ml_100k", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(
            dataset_name=dataset_name,
            min_u_c=min_u_c,
            min_i_c=min_i_c,
            root_dir=root_dir,
            url=ML_100K_URL,
            processed_leave_one_out_url=ML_100K_LEAVE_ONE_OUT_URL,
            processed_random_split_url=ML_100K_RANDOM_URL,
            processed_temporal_split_url=ML_100K_TEMPORAL_URL,
        )

    def preprocess(self):
        file_name = os.path.join(self.raw_path, self.dataset_name, "u.data")
        if not os.path.exists(file_name):
            alt = os.path.join(self.raw_path, "ml-100k", "u.data")
            if os.path.exists(alt):
                file_name = alt
            else:
                self.download()
                if os.path.exists(alt):
                    file_name = alt
        data = pd.read_table(file_name, header=None, sep="\t", names=_COLS)
        self.save_dataframe_as_npz(data, self.interaction_file())

    def make_fea_vec(self):
        """One-hot user features (8 age buckets, gender, occupation) + 19-genre
        item features; first column is the raw id (reference movielens.py:82-170)."""
        base = os.path.join(self.raw_path, self.dataset_name)
        if not os.path.isdir(base):
            base = os.path.join(self.raw_path, "ml-100k")
        item_raw = pd.read_table(os.path.join(base, "u.item"), header=None, sep="|", encoding="latin-1")
        item_feat = item_raw[[0] + list(range(5, 24))].to_numpy()

        user_raw = pd.read_table(os.path.join(base, "u.user"), header=None, sep="|")
        ages = np.minimum(user_raw[1].to_numpy() // 10, 7)
        age_oh = np.eye(8)[ages]
        gender_oh = np.eye(2)[(user_raw[2] == "M").to_numpy().astype(int)]
        occupations = pd.Categorical(user_raw[3]).codes
        occ_oh = np.eye(occupations.max() + 1)[occupations]
        user_feat = np.concatenate(
            [user_raw[[0]].to_numpy(), age_oh, gender_oh, occ_oh], axis=1
        )
        np.savez_compressed(
            os.path.join(self.processed_path, f"{self.dataset_name}_fea_vec.npz"),
            user_feat=user_feat,
            item_feat=item_feat,
        )
        return user_feat, item_feat


class Movielens_1m(DatasetBase):
    """MovieLens-1M: ratings.dat '::'-separated."""

    def __init__(self, dataset_name="ml_1m", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(
            dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c,
            root_dir=root_dir, url=ML_1M_URL,
            processed_leave_one_out_url=ML_1M_LEAVE_ONE_OUT_URL,
            processed_random_split_url=ML_1M_RANDOM_URL,
            processed_temporal_split_url=ML_1M_TEMPORAL_URL,
        )

    def preprocess(self):
        for sub in (self.dataset_name, "ml-1m"):
            file_name = os.path.join(self.raw_path, sub, "ratings.dat")
            if os.path.exists(file_name):
                break
        else:
            self.download()
            file_name = os.path.join(self.raw_path, "ml-1m", "ratings.dat")
        data = pd.read_table(file_name, header=None, sep="::", names=_COLS, engine="python")
        self.save_dataframe_as_npz(data, self.interaction_file())


class Movielens_10m(Movielens_1m):
    def __init__(self, dataset_name="ml_10m", min_u_c=0, min_i_c=3, root_dir=None):
        DatasetBase.__init__(
            self, dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c,
            root_dir=root_dir, url=ML_10M_URL,
        )

    def preprocess(self):
        for sub in (self.dataset_name, "ml-10M100K", "ml-10m"):
            file_name = os.path.join(self.raw_path, sub, "ratings.dat")
            if os.path.exists(file_name):
                break
        else:
            self.download()
            file_name = os.path.join(self.raw_path, "ml-10M100K", "ratings.dat")
        data = pd.read_table(file_name, header=None, sep="::", names=_COLS, engine="python")
        self.save_dataframe_as_npz(data, self.interaction_file())


class Movielens_25m(DatasetBase):
    """MovieLens-25M: ratings.csv with header."""

    def __init__(self, dataset_name="ml_25m", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(
            dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c,
            root_dir=root_dir, url=ML_25M_URL,
        )

    def preprocess(self):
        for sub in (self.dataset_name, "ml-25m"):
            file_name = os.path.join(self.raw_path, sub, "ratings.csv")
            if os.path.exists(file_name):
                break
        else:
            self.download()
            file_name = os.path.join(self.raw_path, "ml-25m", "ratings.csv")
        data = pd.read_csv(file_name, header=0, names=_COLS)
        self.save_dataframe_as_npz(data, self.interaction_file())
