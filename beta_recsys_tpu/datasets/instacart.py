"""Instacart market-basket dataset adapter (+25% sample variant).

Reference parity: beta_rec/datasets/instacart.py — joins order_products
(prior + train) with orders to obtain (user, order, item, add_to_cart_order);
order_number serves as the temporal key; implicit rating 1.
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

INSTACART_URL = "https://www.kaggle.com/c/instacart-market-basket-analysis/data"

# Team-published processed splits (reference instacart.py:19-30).
INSTACART_LEAVE_ONE_OUT_URL = "https://1drv.ms/u/s!AjMahLyQeZquggLQynzcCWfNUdIg?e=HDhUjL"
INSTACART_RANDOM_SPLIT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugX4W4zLO6Jkx8P-W?e=oKymnV"
INSTACART_TEMPORAL_SPLIT_URL = "https://1drv.ms/u/s!AjMahLyQeZquggAblxVFSYeu3nzh?e=pzBaAa"


class Instacart(DatasetBase):
    sample_rate = 1.0

    def __init__(self, dataset_name="instacart", min_u_c=0, min_i_c=3, min_o_c=0, root_dir=None):
        super().__init__(
            dataset_name=dataset_name,
            min_u_c=min_u_c,
            min_i_c=min_i_c,
            min_o_c=min_o_c,
            root_dir=root_dir,
            url=INSTACART_URL,
            processed_leave_one_out_url=INSTACART_LEAVE_ONE_OUT_URL,
            processed_random_split_url=INSTACART_RANDOM_SPLIT_URL,
            processed_temporal_split_url=INSTACART_TEMPORAL_SPLIT_URL,
            tips=(
                "Instacart requires manual download (kaggle instacart-market-basket-analysis); "
                "place order_products__prior.csv, order_products__train.csv, orders.csv in raw/."
            ),
        )

    def preprocess(self):
        raw = self.raw_path
        if not os.path.exists(os.path.join(raw, "orders.csv")):
            alt = os.path.join(raw, "instacart")
            if os.path.exists(os.path.join(alt, "orders.csv")):
                raw = alt
            else:
                raise RuntimeError(self.tips)
        prior = pd.read_csv(
            os.path.join(raw, "order_products__prior.csv"),
            usecols=["order_id", "product_id", "add_to_cart_order"],
        )
        train = pd.read_csv(
            os.path.join(raw, "order_products__train.csv"),
            usecols=["order_id", "product_id", "add_to_cart_order"],
        )
        products = pd.concat([prior, train], ignore_index=True)
        orders = pd.read_csv(
            os.path.join(raw, "orders.csv"),
            usecols=["user_id", "order_id", "order_number"],
        )
        merged = products.merge(orders, on="order_id")
        if self.sample_rate < 1.0:
            users = merged["user_id"].unique()
            keep = np.random.default_rng(0).choice(
                users, size=int(len(users) * self.sample_rate), replace=False
            )
            merged = merged[merged["user_id"].isin(set(keep.tolist()))]
        data = pd.DataFrame(
            {
                DEFAULT_USER_COL: merged["user_id"],
                DEFAULT_ORDER_COL: merged["order_id"],
                DEFAULT_ITEM_COL: merged["product_id"],
                DEFAULT_RATING_COL: 1.0,
                DEFAULT_TIMESTAMP_COL: merged["order_number"],
            }
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


class Instacart_25(Instacart):
    """25% user sample of Instacart (reference Instacart_25)."""

    sample_rate = 0.25

    def __init__(self, dataset_name="instacart_25", min_u_c=0, min_i_c=3, min_o_c=0, root_dir=None):
        super().__init__(
            dataset_name=dataset_name, min_u_c=min_u_c, min_i_c=min_i_c,
            min_o_c=min_o_c, root_dir=root_dir,
            processed_random_split_url=INSTACART_RANDOM_SPLIT_URL,
            processed_temporal_split_url=INSTACART_TEMPORAL_SPLIT_URL,
        )
