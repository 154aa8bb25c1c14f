"""Hermetic preprocess tests for the dataset adapters.

Each test fabricates the adapter's raw file format in a tmp dir and drives
``load_interaction()`` (preprocess-on-miss), asserting the canonical
interaction columns come out right — the reference only exercises these paths
in network-gated scripts (SURVEY §4 Tier 2); here they run in CI.
"""

import gzip
import json
import os

import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_ORDER_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)

CANON = [DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL]


def _raw(ds):
    os.makedirs(ds.raw_path, exist_ok=True)
    return ds.raw_path


def _check(ds, n_rows, with_ts=True, with_order=False):
    inter = ds.load_interaction()
    for col in CANON:
        assert col in inter.columns, col
    if with_ts:
        assert DEFAULT_TIMESTAMP_COL in inter.columns
    if with_order:
        assert DEFAULT_ORDER_COL in inter.columns
    assert len(inter) == n_rows, (len(inter), n_rows)
    # cached npz reload must round-trip
    inter2 = ds.load_interaction()
    assert len(inter2) == n_rows
    return inter


def test_movielens_100k(tmp_path):
    from beta_recsys_tpu.datasets.movielens import Movielens_100k

    ds = Movielens_100k(min_i_c=0, root_dir=str(tmp_path))
    base = os.path.join(_raw(ds), "ml_100k")
    os.makedirs(base)
    rows = [(u, i, 5.0, 100 + u) for u in range(4) for i in range(3)]
    pd.DataFrame(rows).to_csv(os.path.join(base, "u.data"), sep="\t", header=False, index=False)
    inter = _check(ds, 12)
    assert set(inter[DEFAULT_RATING_COL]) == {5.0}

    # feature vectors: u.item (24 cols: id, meta x4, 19 genres), u.user
    item_rows = [[i, f"t{i}", "1995", "", "url"] + [int(j % 2) for j in range(19)] for i in range(3)]
    with open(os.path.join(base, "u.item"), "w", encoding="latin-1") as f:
        for r in item_rows:
            f.write("|".join(str(x) for x in r) + "\n")
    user_rows = [[u, 20 + u * 15, "M" if u % 2 else "F", "writer", "00000"] for u in range(4)]
    with open(os.path.join(base, "u.user"), "w") as f:
        for r in user_rows:
            f.write("|".join(str(x) for x in r) + "\n")
    user_feat, item_feat = ds.make_fea_vec()
    assert user_feat.shape[0] == 4 and item_feat.shape == (3, 20)
    assert os.path.exists(os.path.join(ds.processed_path, "ml_100k_fea_vec.npz"))


def test_movielens_1m(tmp_path):
    from beta_recsys_tpu.datasets.movielens import Movielens_1m

    ds = Movielens_1m(min_i_c=0, root_dir=str(tmp_path))
    base = os.path.join(_raw(ds), "ml_1m")
    os.makedirs(base)
    with open(os.path.join(base, "ratings.dat"), "w") as f:
        for u in range(3):
            for i in range(2):
                f.write(f"{u}::{i}::4::{978300760 + u}\n")
    _check(ds, 6)


def test_tafeng(tmp_path):
    from beta_recsys_tpu.datasets.tafeng import Tafeng

    ds = Tafeng(min_i_c=0, root_dir=str(tmp_path))
    with open(os.path.join(_raw(ds), "train.txt"), "w") as f:
        # order_id \t item... \t user_id \t date
        f.write("o1\ti1\ti2\tu1\t2001-01-01\n")
        f.write("o2\ti3\tu2\t2001-01-02\n")
    inter = _check(ds, 3, with_order=True)
    assert list(inter[DEFAULT_ITEM_COL]) == ["i1", "i2", "i3"]


def test_dunnhumby(tmp_path):
    from beta_recsys_tpu.datasets.dunnhumby import Dunnhumby

    ds = Dunnhumby(min_i_c=0, root_dir=str(tmp_path))
    pd.DataFrame(
        {
            "BASKET_ID": [1, 1, 2],
            "household_key": [10, 10, 11],
            "PRODUCT_ID": [100, 101, 100],
            "DAY": [1, 1, 2],
            "TRANS_TIME": [1200, 1200, 900],
        }
    ).to_csv(os.path.join(_raw(ds), "transaction_data.csv"), index=False)
    _check(ds, 3, with_order=True)


def test_amazon_json_gz(tmp_path):
    from beta_recsys_tpu.datasets.amazon import AmazonDataset

    class AmazonTest(AmazonDataset):
        category = "Test"

    ds = AmazonTest(dataset_name="amazon_test", min_i_c=0, root_dir=str(tmp_path))
    path = os.path.join(_raw(ds), "reviews_Test.json.gz")
    with gzip.open(path, "wt") as f:
        for k in range(5):
            f.write(json.dumps({"reviewerID": f"u{k % 2}", "asin": f"a{k}", "overall": 3.0, "unixReviewTime": k}) + "\n")
    _check(ds, 5)


def test_epinions_and_lastfm(tmp_path):
    from beta_recsys_tpu.datasets.simple_adapters import Epinions, LastFM

    ds = Epinions(min_i_c=0, root_dir=str(tmp_path / "e"))
    with open(os.path.join(_raw(ds), "ratings_data.txt"), "w") as f:
        f.write("1 2 5\n3 4 1\n")
    _check(ds, 2, with_ts=False)

    ds = LastFM(min_i_c=0, root_dir=str(tmp_path / "l"))
    with open(os.path.join(_raw(ds), "user_artists.dat"), "w") as f:
        f.write("userID\tartistID\tweight\n1\t7\t300\n2\t8\t20\n")
    _check(ds, 2, with_ts=False)


def test_gowalla_taobao_alimobile(tmp_path):
    from beta_recsys_tpu.datasets.simple_adapters import AliMobile, Gowalla, Taobao

    ds = Gowalla(min_i_c=0, root_dir=str(tmp_path / "g"))
    with open(os.path.join(_raw(ds), "loc-gowalla_totalCheckins.txt"), "w") as f:
        f.write("0\t2010-10-19T23:55:27Z\t30.2\t-97.7\t22847\n")
        f.write("1\t2010-10-18T22:17:43Z\t30.3\t-97.8\t420315\n")
    _check(ds, 2)

    ds = Taobao(min_i_c=0, root_dir=str(tmp_path / "t"))
    pd.DataFrame([[1, 7, 9, "pv", 1511544070], [2, 8, 9, "buy", 1511561733]]).to_csv(
        os.path.join(_raw(ds), "UserBehavior.csv"), header=False, index=False
    )
    _check(ds, 2)

    ds = AliMobile(min_i_c=0, root_dir=str(tmp_path / "a"))
    pd.DataFrame(
        {
            "user_id": [1, 2],
            "item_id": [7, 8],
            "behavior_type": [1, 1],
            "user_geohash": ["", ""],
            "item_category": [5, 6],
            "time": ["2014-12-06 02", "2014-12-06 03"],
        }
    ).to_csv(os.path.join(_raw(ds), "tianchi_mobile_recommend_train_user.csv"), index=False)
    _check(ds, 2)


def test_sessions_retailrocket_yoochoose_diginetica(tmp_path):
    from beta_recsys_tpu.datasets.simple_adapters import Diginetica, RetailRocket, YooChoose

    ds = RetailRocket(min_i_c=0, root_dir=str(tmp_path / "r"))
    pd.DataFrame(
        {"timestamp": [1433221332, 1433221333], "visitorid": [1, 2], "event": ["view", "view"], "itemid": [7, 8], "transactionid": ["", ""]}
    ).to_csv(os.path.join(_raw(ds), "events.csv"), index=False)
    _check(ds, 2)

    ds = YooChoose(min_i_c=0, root_dir=str(tmp_path / "y"))
    with open(os.path.join(_raw(ds), "yoochoose-clicks.dat"), "w") as f:
        f.write("1,2014-04-07T10:51:09.277Z,214536502,0\n")
        f.write("2,2014-04-07T13:56:37.614Z,214662742,0\n")
    _check(ds, 2)

    ds = Diginetica(min_i_c=0, root_dir=str(tmp_path / "d"))
    pd.DataFrame(
        {
            "sessionId": [1, 2],
            "userId": ["", ""],
            "itemId": [81766, 31331],
            "timeframe": [526309, 1031018],
            "eventdate": ["2016-05-09", "2016-05-10"],
        }
    ).to_csv(os.path.join(_raw(ds), "train-item-views.csv"), sep=";", index=False)
    _check(ds, 2)


def test_yelp_and_citeulike(tmp_path):
    from beta_recsys_tpu.datasets.simple_adapters import CiteULikeA, Yelp

    ds = Yelp(min_i_c=0, root_dir=str(tmp_path / "y"))
    with open(os.path.join(_raw(ds), "yelp_academic_dataset_review.json"), "w") as f:
        for k in range(3):
            f.write(json.dumps({"user_id": f"u{k}", "business_id": f"b{k}", "stars": 4.0, "date": "2018-07-07 22:09:11"}) + "\n")
    _check(ds, 3)

    ds = CiteULikeA(min_i_c=0, root_dir=str(tmp_path / "c"))
    with open(os.path.join(_raw(ds), "users.dat"), "w") as f:
        f.write("3 10 11 12\n2 10 13\n")
    inter = _check(ds, 5)
    assert list(inter[DEFAULT_USER_COL].unique()) == [0, 1]


def test_hetrec(tmp_path):
    from beta_recsys_tpu.datasets.hetrec import Delicious_2k, LastFM_2k, MovieLens_2k

    ds = MovieLens_2k(min_i_c=0, root_dir=str(tmp_path / "m"))
    with open(os.path.join(_raw(ds), "user_ratedmovies-timestamps.dat"), "w") as f:
        f.write("userID\tmovieID\trating\ttimestamp\n75\t3\t1\t1162160236000\n75\t32\t4.5\t1162160624000\n")
    _check(ds, 2)

    ds = Delicious_2k(min_i_c=0, root_dir=str(tmp_path / "d"))
    with open(os.path.join(_raw(ds), "user_taggedbookmarks-timestamps.dat"), "w") as f:
        f.write("userID\tbookmarkID\ttagID\ttimestamp\n8\t1\t1\t1289255362000\n8\t2\t1\t1289255159000\n")
    _check(ds, 2, with_order=True)

    ds = LastFM_2k(min_i_c=0, root_dir=str(tmp_path / "l"))
    with open(os.path.join(_raw(ds), "user_artists.dat"), "w") as f:
        f.write("userID\tartistID\tweight\n2\t51\t13883\n2\t52\t11690\n")
    _check(ds, 2)


def test_instacart(tmp_path):
    from beta_recsys_tpu.datasets.instacart import Instacart

    ds = Instacart(min_i_c=0, root_dir=str(tmp_path))
    raw = _raw(ds)
    pd.DataFrame({"order_id": [1, 1], "product_id": [10, 11], "add_to_cart_order": [1, 2]}).to_csv(
        os.path.join(raw, "order_products__prior.csv"), index=False
    )
    pd.DataFrame({"order_id": [2], "product_id": [10], "add_to_cart_order": [1]}).to_csv(
        os.path.join(raw, "order_products__train.csv"), index=False
    )
    pd.DataFrame({"user_id": [5, 6], "order_id": [1, 2], "order_number": [1, 1]}).to_csv(
        os.path.join(raw, "orders.csv"), index=False
    )
    _check(ds, 3, with_order=True)


def test_split_after_preprocess(tmp_path):
    """Adapter -> k-core -> leave-one-out end to end on fabricated raw data."""
    from beta_recsys_tpu.datasets.movielens import Movielens_100k

    ds = Movielens_100k(min_i_c=0, root_dir=str(tmp_path))
    base = os.path.join(_raw(ds), "ml_100k")
    os.makedirs(base)
    rng = np.random.default_rng(0)
    rows = [
        (u, int(i), 5.0, int(rng.integers(0, 10000)))
        for u in range(20)
        for i in rng.choice(30, size=8, replace=False)
    ]
    pd.DataFrame(rows).to_csv(os.path.join(base, "u.data"), sep="\t", header=False, index=False)
    train, valid_li, test_li = ds.load_leave_one_out(n_negative=5, n_test=1)
    assert len(train) > 0 and len(valid_li) == 1 and len(test_li) == 1
    users_in_test = set(test_li[0][test_li[0][DEFAULT_RATING_COL] > 0][DEFAULT_USER_COL])
    assert users_in_test <= set(train[DEFAULT_USER_COL].unique())
