"""Host-side utility helpers: npz DataFrame codec, seeding, timing, CSV results.

The npz codec is byte-compatible with the reference cache format
(reference: beta_rec/utils/common_util.py:98-147) so split caches can be diffed
against the reference framework.
"""

import json
import os
import random
import time
import zipfile
from functools import wraps

import numpy as np
import pandas as pd

from .constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_ORDER_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


def ensure_dir(path):
    """Create the directory of ``path`` (itself a directory) if missing."""
    if path and not os.path.exists(path):
        os.makedirs(path, exist_ok=True)


# Reference-compatible alias.
ensureDir = ensure_dir


def set_seed(seed):
    """Seed python/numpy RNGs (JAX uses explicit keys; see jax.random.key)."""
    random.seed(seed)
    np.random.seed(seed)


def save_dataframe_as_npz(data, data_file):
    """Save an interaction DataFrame to compressed npz.

    Cache-format compatible with reference beta_rec/utils/common_util.py:98-122.
    """
    def storable(arr, prefer_int=False):
        # Raw ids may be strings (amazon asin, yelp business ids, tafeng order
        # ids); store them as fixed-width unicode so np.load needs no pickle.
        if arr.dtype == object:
            if prefer_int:
                try:
                    return arr.astype(np.int64)
                except (ValueError, TypeError, OverflowError):
                    pass
            return arr.astype(str)
        return arr.astype(np.int64) if prefer_int else arr

    data_dic = {
        "user_ids": storable(data[DEFAULT_USER_COL].to_numpy()),
        "item_ids": storable(data[DEFAULT_ITEM_COL].to_numpy()),
        "ratings": data[DEFAULT_RATING_COL].to_numpy(dtype=np.float32),
    }
    if DEFAULT_ORDER_COL in data.columns:
        data_dic["order_ids"] = storable(data[DEFAULT_ORDER_COL].to_numpy(), prefer_int=True)
    if DEFAULT_TIMESTAMP_COL in data.columns:
        data_dic["timestamps"] = storable(
            data[DEFAULT_TIMESTAMP_COL].to_numpy(), prefer_int=True
        )
    else:
        data_dic["timestamps"] = np.zeros_like(data_dic["ratings"])
    ensure_dir(os.path.dirname(data_file))
    np.savez_compressed(data_file, **data_dic)


def get_dataframe_from_npz(data_file):
    """Load an interaction DataFrame from an npz cache file.

    Inverse of :func:`save_dataframe_as_npz`
    (reference: beta_rec/utils/common_util.py:125-147).
    """
    np_data = np.load(data_file)
    data_dic = {
        DEFAULT_USER_COL: np_data["user_ids"],
        DEFAULT_ITEM_COL: np_data["item_ids"],
        DEFAULT_RATING_COL: np_data["ratings"],
    }
    if "timestamps" in np_data:
        data_dic[DEFAULT_TIMESTAMP_COL] = np_data["timestamps"]
    if "order_ids" in np_data:
        data_dic[DEFAULT_ORDER_COL] = np_data["order_ids"]
    return pd.DataFrame(data_dic)


def update_args(config, args):
    """Override config dict entries from a flat dict of CLI args.

    A flag overrides the matching key in any section it appears in
    (reference semantics: beta_rec/utils/common_util.py:54-67).
    """
    for k, v in args.items():
        if v is None:
            continue
        for section in config:
            if isinstance(config[section], dict) and k in config[section]:
                config[section][k] = v


def print_dict_as_table(dic, tag=None, columns=("keys", "values")):
    """Pretty-print a dict as a two-column table; returns the string."""
    rows = [f"{k!s:>24} | {v!s}" for k, v in sorted(dic.items(), key=lambda x: str(x[0]))]
    header = f"{columns[0]:>24} | {columns[1]}"
    out = "\n".join(([tag] if tag else []) + [header, "-" * 48] + rows)
    print(out)
    return out


def save_to_csv(result_df, result_file):
    """Append a result row DataFrame to a CSV, creating it with header if absent.

    Reference semantics: beta_rec/utils/common_util.py:248-263.
    """
    ensure_dir(os.path.dirname(result_file))
    if os.path.exists(result_file):
        prior = pd.read_csv(result_file)
        result_df = pd.concat([prior, result_df], ignore_index=True, sort=False)
    result_df.to_csv(result_file, index=False)


def timeit(method):
    """Decorator printing wall-clock time of each call (ms)."""

    @wraps(method)
    def wrapper(*args, **kw):
        t0 = time.time()
        result = method(*args, **kw)
        t1 = time.time()
        print(f"Execute [{method.__name__}] method costing {(t1 - t0) * 1000:2.2f} ms")
        return result

    return wrapper


def str2bool(v):
    """Parse a human bool string."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError(f"Boolean value expected, got {v!r}.")


class DictToObject:
    """Wrap a dict so keys are attribute-accessible (recursively)."""

    def __init__(self, dictionary):
        for key, val in dictionary.items():
            if isinstance(val, dict):
                val = DictToObject(val)
            setattr(self, key, val)


def un_zip(file_name, target_dir=None):
    """Unzip a zip archive into target_dir (defaults to its directory)."""
    if target_dir is None:
        target_dir = os.path.dirname(file_name)
    with zipfile.ZipFile(file_name) as zf:
        zf.extractall(target_dir)


def normalized_adj_single(adj):
    """Row-normalize a scipy sparse matrix: D^-1 A."""
    import scipy.sparse as sp

    rowsum = np.array(adj.sum(1)).flatten()
    d_inv = np.where(rowsum > 0, 1.0 / np.maximum(rowsum, 1e-12), 0.0)
    d_mat_inv = sp.diags(d_inv)
    return d_mat_inv.dot(adj).tocoo()


def write_json(obj, path):
    ensure_dir(os.path.dirname(path))
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=str)
