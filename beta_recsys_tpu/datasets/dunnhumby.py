"""Dunnhumby 'The Complete Journey' grocery dataset adapter.

Reference parity: beta_rec/datasets/dunnhumby.py — transaction_data.csv with
basket/household/product/day/time columns; timestamp = int(DAY + TRANS_TIME);
implicit rating 1; basket ids become the order column.
"""

import os

import pandas as pd

from ..utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_ORDER_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)
from .dataset_base import DatasetBase

DUNNHUMBY_URL = "https://www.dunnhumby.com/source-files/"

# Team-published processed splits (reference dunnhumby.py:20-46), fetched by
# load_*(download=True) via DatasetBase.download_processed_split.
DUNNHUMBY_LEAVE_ONE_BASKET_URL = "https://1drv.ms/u/s!AjMahLyQeZqugXCn99mGZw4uHaSg?e=GhmyCa"
DUNNHUMBY_LEAVE_ONE_OUT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugXK8xN12i0O4K-dd?e=OG0Dl3"
DUNNHUMBY_RANDOM_SPLIT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugXRLlZbQnYJbjY1d?e=aQ9LrF"
DUNNHUMBY_RANDOM_BASKET_SPLIT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugXYbw7U3_M363CpM?e=DuyT3a"
DUNNHUMBY_TEMPORAL_SPLIT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugXgd1VE2sX089Udc?e=S2eM7Q"
DUNNHUMBY_TEMPORAL_BASKET_SPLIT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugXrmhlEvrEzYiX42?e=1RNidC"


class Dunnhumby(DatasetBase):
    def __init__(self, dataset_name="dunnhumby", min_u_c=0, min_i_c=3, min_o_c=0, root_dir=None):
        super().__init__(
            dataset_name=dataset_name,
            min_u_c=min_u_c,
            min_i_c=min_i_c,
            min_o_c=min_o_c,
            root_dir=root_dir,
            url=DUNNHUMBY_URL,
            processed_leave_one_basket_url=DUNNHUMBY_LEAVE_ONE_BASKET_URL,
            processed_leave_one_out_url=DUNNHUMBY_LEAVE_ONE_OUT_URL,
            processed_random_split_url=DUNNHUMBY_RANDOM_SPLIT_URL,
            processed_random_basket_split_url=DUNNHUMBY_RANDOM_BASKET_SPLIT_URL,
            processed_temporal_split_url=DUNNHUMBY_TEMPORAL_SPLIT_URL,
            processed_temporal_basket_split_url=DUNNHUMBY_TEMPORAL_BASKET_SPLIT_URL,
            tips=(
                "Dunnhumby requires manual download: place transaction_data.csv "
                "(from 'The Complete Journey') under the raw directory."
            ),
        )

    def preprocess(self):
        candidates = [
            os.path.join(self.raw_path, "transaction_data.csv"),
            os.path.join(self.raw_path, "unzip", "transaction_data.csv"),
        ]
        for file_name in candidates:
            if os.path.exists(file_name):
                break
        else:
            raise RuntimeError(self.tips)
        tx = pd.read_csv(
            file_name,
            usecols=["BASKET_ID", "household_key", "PRODUCT_ID", "DAY", "TRANS_TIME"],
        )
        time = (tx["DAY"].astype(str) + tx["TRANS_TIME"].astype(str)).astype(int)
        data = pd.DataFrame(
            {
                DEFAULT_ORDER_COL: tx["BASKET_ID"],
                DEFAULT_USER_COL: tx["household_key"],
                DEFAULT_ITEM_COL: tx["PRODUCT_ID"],
                DEFAULT_RATING_COL: 1.0,
                DEFAULT_TIMESTAMP_COL: time,
            }
        )
        self.save_dataframe_as_npz(data, self.interaction_file())
