"""HetRec 2011 dataset adapters: MovieLens-2k, Delicious-2k, LastFM-2k.

Reference parity: beta_rec/datasets/hetrec.py — grouplens hetrec2011 archives;
MovieLens-2k uses user_ratedmovies(.dat with timestamps); Delicious-2k uses
user_taggedbookmarks (tag-stamps as baskets); LastFM-2k uses user_artists
weights plus user_taggedartists timestamps when present.
"""

import os

import numpy as np
import pandas as pd

from ..utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_ORDER_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)
from .dataset_base import DatasetBase

ML_2K_URL = "http://files.grouplens.org/datasets/hetrec2011/hetrec2011-movielens-2k-v2.zip"
DL_2K_URL = "http://files.grouplens.org/datasets/hetrec2011/hetrec2011-delicious-2k.zip"
LF_2K_URL = "http://files.grouplens.org/datasets/hetrec2011/hetrec2011-lastfm-2k.zip"


class MovieLens_2k(DatasetBase):
    def __init__(self, dataset_name="movielens_2k", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir, url=ML_2K_URL)

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "user_ratedmovies-timestamps.dat")
        if not os.path.exists(file_name):
            self.download()
        data = pd.read_table(
            file_name, header=0, sep="\t",
            names=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL],
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class Delicious_2k(DatasetBase):
    def __init__(self, dataset_name="delicious-2k", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir, url=DL_2K_URL)

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "user_taggedbookmarks-timestamps.dat")
        if not os.path.exists(file_name):
            self.download()
        raw = pd.read_table(file_name, header=0, sep="\t")
        # columns: userID, bookmarkID, tagID, timestamp; bookmark = item
        data = pd.DataFrame(
            {
                DEFAULT_USER_COL: raw.iloc[:, 0],
                DEFAULT_ITEM_COL: raw.iloc[:, 1],
                DEFAULT_RATING_COL: 1.0,
                DEFAULT_TIMESTAMP_COL: raw.iloc[:, 3],
                DEFAULT_ORDER_COL: raw.iloc[:, 3],  # tag events as baskets
            }
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class LastFM_2k(DatasetBase):
    def __init__(self, dataset_name="lastfm-2k", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir, url=LF_2K_URL)

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "user_artists.dat")
        if not os.path.exists(file_name):
            self.download()
        data = pd.read_table(
            file_name, header=0, sep="\t",
            names=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL],
        )
        data[DEFAULT_TIMESTAMP_COL] = np.arange(len(data))
        self.save_dataframe_as_npz(data, self.interaction_file())
