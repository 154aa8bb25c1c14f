"""Ta-Feng grocery dataset adapter.

Reference parity: beta_rec/datasets/tafeng.py — train.txt/test.txt lines of
``order_id<TAB>item...<TAB>user_id<TAB>date<TAB>`` expanded into per-item
implicit interactions with the date (digits only) as timestamp.
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

TAFENG_URL = "https://www.kaggle.com/chiranjivdas09/ta-feng-grocery-dataset"

# Team-published processed splits (reference tafeng.py:15-21).
TAFENG_LEAVE_ONE_OUT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugWw1iWQHgI2NNbuM?e=LwEbEc"
TAFENG_RANDOM_SPLIT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugWbXQ__YWqF9v_7x?e=NjX5VQ"
TAFENG_TEMPORAL_SPLIT_URL = "https://1drv.ms/u/s!AjMahLyQeZqugWp1Y1JefMXZr0ng?e=OoAgwD"


class Tafeng(DatasetBase):
    def __init__(self, dataset_name="tafeng", min_u_c=0, min_i_c=3, min_o_c=0, root_dir=None):
        super().__init__(
            dataset_name=dataset_name,
            min_u_c=min_u_c,
            min_i_c=min_i_c,
            min_o_c=min_o_c,
            root_dir=root_dir,
            url=TAFENG_URL,
            processed_leave_one_out_url=TAFENG_LEAVE_ONE_OUT_URL,
            processed_random_split_url=TAFENG_RANDOM_SPLIT_URL,
            processed_temporal_split_url=TAFENG_TEMPORAL_SPLIT_URL,
            tips="Ta-Feng requires manual download (kaggle); place train.txt/test.txt in raw/.",
        )

    @staticmethod
    def _parse(file_name):
        rows = []
        with open(file_name) as f:
            for line in f:
                parts = line.replace("\n", "\t").split("\t")
                order_id = parts[0]
                item_ids = parts[1:-3]
                user_id = parts[-3]
                time_order = parts[-2].replace("-", "")
                for item_id in item_ids:
                    rows.append((order_id, user_id, item_id, 1.0, time_order))
        return rows

    def preprocess(self):
        train_file = os.path.join(self.raw_path, "train.txt")
        if not os.path.exists(train_file):
            self.download()
        rows = self._parse(train_file)
        test_file = os.path.join(self.raw_path, "test.txt")
        if os.path.exists(test_file):
            rows += self._parse(test_file)
        arr = np.array(rows, dtype=object)
        data = pd.DataFrame(
            {
                DEFAULT_ORDER_COL: arr[:, 0],
                DEFAULT_USER_COL: arr[:, 1],
                DEFAULT_ITEM_COL: arr[:, 2],
                DEFAULT_RATING_COL: arr[:, 3].astype(np.float32),
                DEFAULT_TIMESTAMP_COL: arr[:, 4].astype(np.int64),
            }
        )
        self.save_dataframe_as_npz(data, self.interaction_file())
