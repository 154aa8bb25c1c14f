"""Single-file interaction dataset adapters: epinions, last.fm, gowalla,
taobao, ali_mobile, retailrocket, yoochoose, diginetica, yelp, citeulike.

Each mirrors its reference counterpart's raw parsing
(beta_rec/datasets/<name>.py); implicit datasets get rating 1 and a zero or
derived timestamp.
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

EPINIONS_URL = "http://www.trustlet.org/datasets/downloaded_epinions/ratings_data.txt.bz2"
LAST_FM_URL = "http://files.grouplens.org/datasets/hetrec2011/hetrec2011-lastfm-2k.zip"
GOWALLA_URL = "https://snap.stanford.edu/data/loc-gowalla_totalCheckins.txt.gz"
TAOBAO_URL = "https://tianchi.aliyun.com/dataset/dataDetail?dataId=649"
ALIMOBILE_URL = "https://tianchi.aliyun.com/dataset/dataDetail?dataId=46"
RETAIL_ROCKET_URL = "https://www.kaggle.com/retailrocket/ecommerce-dataset/download"
YOOCHOOSE_URL = "https://s3-eu-west-1.amazonaws.com/yc-rdata/yoochoose-data.7z"
DIGINETICA_URL = "https://cikm2016.cs.iupui.edu/cikm-cup/"
YELP_URL = "https://www.yelp.com/dataset"
CULA_URL = "https://github.com/js05212/citeulike-a"
CULT_URL = "https://github.com/js05212/citeulike-t"


class Epinions(DatasetBase):
    """ratings_data.txt: space-separated (user, item, rating)."""

    def __init__(self, dataset_name="epinions", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir, url=EPINIONS_URL)

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "ratings_data.txt")
        if not os.path.exists(file_name):
            self.download()
        data = pd.read_table(
            file_name, header=None, sep=" ",
            names=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL],
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class LastFM(DatasetBase):
    """hetrec2011-lastfm user_artists.dat: (user, artist, weight)."""

    def __init__(self, dataset_name="last_fm", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir, url=LAST_FM_URL)

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "user_artists.dat")
        if not os.path.exists(file_name):
            self.download()
        data = pd.read_table(
            file_name, header=0, sep="\t",
            names=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL],
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class Gowalla(DatasetBase):
    """loc-gowalla_totalCheckins.txt: tab-separated (user, time, lat, lon, loc)."""

    def __init__(self, dataset_name="gowalla", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir, url=GOWALLA_URL)

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "loc-gowalla_totalCheckins.txt")
        if not os.path.exists(file_name):
            self.download()
        data = pd.read_table(
            file_name, header=None, sep="\t", usecols=[0, 1, 4],
            names=[DEFAULT_USER_COL, DEFAULT_TIMESTAMP_COL, DEFAULT_ITEM_COL],
        )
        data[DEFAULT_RATING_COL] = 1.0
        data[DEFAULT_TIMESTAMP_COL] = (
            pd.to_datetime(data[DEFAULT_TIMESTAMP_COL]).astype(np.int64) // 10**9
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class Taobao(DatasetBase):
    """UserBehavior.csv: (user, item, category, behavior, timestamp)."""

    def __init__(self, dataset_name="taobao", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(
            dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir,
            url=TAOBAO_URL, tips="Taobao UserBehavior.csv requires manual download (tianchi).",
        )

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "UserBehavior.csv")
        if not os.path.exists(file_name):
            raise RuntimeError(self.tips)
        data = pd.read_csv(
            file_name, header=None, usecols=[0, 1, 4],
            names=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_TIMESTAMP_COL],
        )
        data[DEFAULT_RATING_COL] = 1.0
        self.save_dataframe_as_npz(data, self.interaction_file())


class AliMobile(DatasetBase):
    """tianchi_mobile_recommend_train_user.csv: (user, item, ..., time)."""

    def __init__(self, dataset_name="ali_mobile", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(
            dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir,
            url=ALIMOBILE_URL, tips="Ali-Mobile requires manual download (tianchi).",
        )

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "tianchi_mobile_recommend_train_user.csv")
        if not os.path.exists(file_name):
            raise RuntimeError(self.tips)
        data = pd.read_csv(
            file_name, header=0, usecols=[0, 1, 5],
            names=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_TIMESTAMP_COL],
        )
        data[DEFAULT_RATING_COL] = 1.0
        data[DEFAULT_TIMESTAMP_COL] = (
            pd.to_datetime(data[DEFAULT_TIMESTAMP_COL]).astype(np.int64) // 10**9
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class RetailRocket(DatasetBase):
    """events.csv: (timestamp, visitorid, event, itemid, transactionid)."""

    def __init__(self, dataset_name="retailrocket", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(
            dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir,
            url=RETAIL_ROCKET_URL, tips="RetailRocket events.csv requires manual download (kaggle).",
        )

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "events.csv")
        if not os.path.exists(file_name):
            raise RuntimeError(self.tips)
        data = pd.read_csv(
            file_name, header=0, usecols=[0, 1, 3],
            names=[DEFAULT_TIMESTAMP_COL, DEFAULT_USER_COL, DEFAULT_ITEM_COL],
        )
        data[DEFAULT_RATING_COL] = 1.0
        self.save_dataframe_as_npz(data, self.interaction_file())


class YooChoose(DatasetBase):
    """yoochoose-clicks.dat: (session, timestamp, item, category); sessions act
    as users for this session dataset."""

    def __init__(self, dataset_name="yoochoose", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir, url=YOOCHOOSE_URL)

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "yoochoose-clicks.dat")
        if not os.path.exists(file_name):
            self.download()
        data = pd.read_table(
            file_name, header=None, sep=",", usecols=[0, 1, 2],
            names=[DEFAULT_USER_COL, DEFAULT_TIMESTAMP_COL, DEFAULT_ITEM_COL],
        )
        data[DEFAULT_RATING_COL] = 1.0
        data[DEFAULT_TIMESTAMP_COL] = (
            pd.to_datetime(data[DEFAULT_TIMESTAMP_COL]).astype(np.int64) // 10**9
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class Diginetica(DatasetBase):
    """train-item-views.csv (;-separated): (session, user, item, eventdate)."""

    def __init__(self, dataset_name="diginetica", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(
            dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir,
            url=DIGINETICA_URL, tips="Diginetica requires manual download (CIKM Cup 2016).",
        )

    def preprocess(self):
        file_name = os.path.join(self.raw_path, "train-item-views.csv")
        if not os.path.exists(file_name):
            raise RuntimeError(self.tips)
        data = pd.read_csv(
            file_name, header=0, sep=";", usecols=[0, 2, 4],
            names=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_TIMESTAMP_COL],
        )
        data[DEFAULT_RATING_COL] = 1.0
        data[DEFAULT_TIMESTAMP_COL] = (
            pd.to_datetime(data[DEFAULT_TIMESTAMP_COL]).astype(np.int64) // 10**9
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class Yelp(DatasetBase):
    """yelp_academic_dataset_review.json: stream-parsed (user, business, stars, date)."""

    def __init__(self, dataset_name="yelp", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(
            dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir,
            url=YELP_URL, tips="Yelp requires manual download of the academic dataset.",
        )

    def preprocess(self):
        import json

        file_name = os.path.join(self.raw_path, "yelp_academic_dataset_review.json")
        if not os.path.exists(file_name):
            raise RuntimeError(self.tips)
        rows = []
        with open(file_name) as f:
            for line in f:
                r = json.loads(line)
                rows.append((r["user_id"], r["business_id"], float(r["stars"]), r["date"]))
        data = pd.DataFrame(
            rows, columns=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL]
        )
        data[DEFAULT_TIMESTAMP_COL] = (
            pd.to_datetime(data[DEFAULT_TIMESTAMP_COL]).astype(np.int64) // 10**9
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class _CiteULikeBase(DatasetBase):
    """citeulike users.dat: line i = space-separated article ids of user i."""

    raw_file = "users.dat"

    def preprocess(self):
        file_name = os.path.join(self.raw_path, self.raw_file)
        if not os.path.exists(file_name):
            self.download()
        users, items = [], []
        with open(file_name) as f:
            for u, line in enumerate(f):
                ids = line.split()
                # first token may be the count; the remaining are item ids
                arts = ids[1:] if len(ids) > 1 else ids
                users.extend([u] * len(arts))
                items.extend(int(a) for a in arts)
        data = pd.DataFrame(
            {
                DEFAULT_USER_COL: users,
                DEFAULT_ITEM_COL: items,
                DEFAULT_RATING_COL: 1.0,
                DEFAULT_TIMESTAMP_COL: 0,
            }
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class CiteULikeA(_CiteULikeBase):
    def __init__(self, dataset_name="citeulike-a", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir, url=CULA_URL)


class CiteULikeT(_CiteULikeBase):
    def __init__(self, dataset_name="citeulike-t", min_u_c=0, min_i_c=3, root_dir=None):
        super().__init__(dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c, root_dir=root_dir, url=CULT_URL)
