"""On-disk dataset lifecycle: download -> preprocess -> split -> cache.

Reference parity: beta_rec/datasets/dataset_base.py:34-980 — every dataset
lives under ``<root>/datasets/<name>/{raw,processed}``; ``preprocess`` (per
adapter) turns raw files into a canonical interaction npz; ``make_*`` builds
each of the six splits (+negative-sampled eval copies); ``load_*`` returns
cached splits, building on miss; ``load_split`` dispatches from a config.
Download is best-effort (some environments have no network; the reference's
OneDrive processed-split downloads are preserved as URLs but optional).
"""

import os

from ..utils.common import ensure_dir, get_dataframe_from_npz, save_dataframe_as_npz
from ..utils.constants import DEFAULT_ORDER_COL
from .data_split import (
    filter_user_item,
    filter_user_item_order,
    generate_parameterized_path,
    load_split_data,
    split_data,
)

default_root_dir = os.path.abspath(".")

# split_type -> constructor attribute holding the team-published archive URL
# (reference beta_rec/datasets/dataset_base.py:502-907: each load_* may fetch a
# pre-built split from OneDrive before falling back to building locally).
_PROCESSED_URL_ATTRS = {
    "leave_one_out": "processed_leave_one_out_url",
    "leave_one_basket": "processed_leave_one_basket_url",
    "random": "processed_random_split_url",
    "random_basket": "processed_random_basket_split_url",
    "temporal": "processed_temporal_split_url",
    "temporal_basket": "processed_temporal_basket_split_url",
}


class DatasetBase:
    """Base class for dataset adapters."""

    def __init__(
        self,
        dataset_name,
        min_u_c=0,
        min_i_c=3,
        min_o_c=0,
        url=None,
        root_dir=None,
        manual_download_url=None,
        processed_leave_one_out_url="",
        processed_leave_one_basket_url="",
        processed_random_split_url="",
        processed_random_basket_split_url="",
        processed_temporal_split_url="",
        processed_temporal_basket_split_url="",
        tips=None,
    ):
        self.dataset_name = dataset_name
        self.min_u_c = min_u_c
        self.min_i_c = min_i_c
        self.min_o_c = min_o_c
        self.url = url
        self.manual_download_url = manual_download_url or url
        self.processed_leave_one_out_url = processed_leave_one_out_url
        self.processed_leave_one_basket_url = processed_leave_one_basket_url
        self.processed_random_split_url = processed_random_split_url
        self.processed_random_basket_split_url = processed_random_basket_split_url
        self.processed_temporal_split_url = processed_temporal_split_url
        self.processed_temporal_basket_split_url = processed_temporal_basket_split_url

        root_dir = root_dir or default_root_dir
        self.dataset_dir = os.path.join(root_dir, "datasets", dataset_name)
        self.raw_path = os.path.join(self.dataset_dir, "raw")
        self.processed_path = os.path.join(self.dataset_dir, "processed")
        ensure_dir(self.raw_path)
        ensure_dir(self.processed_path)
        self.save_dataframe_as_npz = save_dataframe_as_npz
        self.tips = tips or (
            f"please download the dataset yourself via {self.manual_download_url}, "
            f"rename to {self.dataset_name} and put it into {self.raw_path} after decompression"
        )

    # -- raw data -----------------------------------------------------------------

    def download(self):
        """Download + unpack the raw archive (best effort; may need manual copy)."""
        if not self.url:
            raise RuntimeError(self.tips)
        from ..utils.download import download_file, unpack_archive

        archive = os.path.join(self.raw_path, os.path.basename(self.url))
        if not os.path.exists(archive):
            try:
                download_file(self.url, archive)
            except Exception as e:
                raise RuntimeError(f"Download failed ({e}). {self.tips}") from e
        try:
            unpack_archive(archive, self.raw_path)
        except ValueError:
            pass  # plain file, no unpacking needed

    def preprocess(self):
        """Convert raw files into the canonical interaction npz (per adapter)."""
        raise NotImplementedError

    def interaction_file(self):
        return os.path.join(self.processed_path, f"{self.dataset_name}_interaction.npz")

    def load_interaction(self):
        """Load (preprocessing on miss) the interaction frame, k-core filtered.

        A corrupted cache npz is rebuilt once by re-running preprocess
        (reference dataset_base.py:193-202 re-downloads on corruption).
        """
        f = self.interaction_file()
        if not os.path.exists(f):
            self.preprocess()
        try:
            data = get_dataframe_from_npz(f)
        except Exception:
            print(f"[warn] corrupted interaction cache {f}; rebuilding")
            os.remove(f)
            self.preprocess()
            data = get_dataframe_from_npz(f)
        if DEFAULT_ORDER_COL in data.columns and self.min_o_c > 0:
            data = filter_user_item_order(data, self.min_u_c, self.min_i_c, self.min_o_c)
        elif self.min_u_c > 0 or self.min_i_c > 0:
            data = filter_user_item(data, self.min_u_c, self.min_i_c)
        return data

    # -- split lifecycle ----------------------------------------------------------

    def _make_split(self, split_type, data=None, test_rate=0.1, random=False, n_negative=100, by_user=False, n_test=10):
        if data is None:
            data = self.load_interaction()
        split_data(
            data,
            split_type=split_type,
            test_rate=test_rate,
            random=random,
            n_negative=n_negative,
            save_dir=self.processed_path,
            by_user=by_user,
            n_test=n_test,
        )

    def _load_split(self, split_type, test_rate=0.1, random=False, n_negative=100, by_user=False, n_test=10, download=False):
        if n_negative < 0:
            n_test = 1  # all-negatives mode writes a single valid/test copy
        param_dir = generate_parameterized_path(
            test_rate=test_rate, random=random, n_negative=n_negative, by_user=by_user
        )
        path = os.path.join(self.processed_path, split_type, param_dir)
        if download and not os.path.exists(os.path.join(path, "train.npz")):
            self.download_processed_split(split_type, path)
        if not os.path.exists(os.path.join(path, "train.npz")):
            self._make_split(
                split_type,
                test_rate=test_rate,
                random=random,
                n_negative=n_negative,
                by_user=by_user,
                n_test=n_test,
            )
        return load_split_data(path, n_test=n_test)

    def download_processed_split(self, split_type, dest_dir):
        """Fetch the team-published pre-built split archive for ``split_type``.

        Reference parity: beta_rec/datasets/dataset_base.py:502-907 — every
        ``load_*(download=True)`` first tries the adapter's
        ``processed_*_url`` (a OneDrive share link) before building the split
        locally. Failures (no network, no URL, bad archive) are treated as
        cache misses. Returns True iff ``dest_dir/train.npz`` exists after.
        """
        url = getattr(self, _PROCESSED_URL_ATTRS[split_type], "")
        if not url:
            return False
        from ..utils.onedrive import OneDrive

        ensure_dir(dest_dir)
        try:
            OneDrive(url=url, path=dest_dir).download()
        except Exception as e:
            print(f"[warn] processed-split download failed ({e}); building locally")
            return False
        target = os.path.join(dest_dir, "train.npz")
        if not os.path.exists(target):
            # archives may nest the split files one folder deep; flatten
            for sub in sorted(os.listdir(dest_dir)):
                nested = os.path.join(dest_dir, sub)
                if os.path.isdir(nested) and os.path.exists(os.path.join(nested, "train.npz")):
                    for f in os.listdir(nested):
                        os.replace(os.path.join(nested, f), os.path.join(dest_dir, f))
                    break
        return os.path.exists(target)

    def make_leave_one_out(self, data=None, random=False, n_negative=100, n_test=10):
        self._make_split("leave_one_out", data, 0, random, n_negative, False, n_test)

    def make_leave_one_basket(self, data=None, random=False, n_negative=100, n_test=10):
        self._make_split("leave_one_basket", data, 0, random, n_negative, False, n_test)

    def make_random_split(self, data=None, test_rate=0.1, by_user=False, n_negative=100, n_test=10):
        self._make_split("random", data, test_rate, False, n_negative, by_user, n_test)

    def make_random_basket_split(self, data=None, test_rate=0.1, by_user=False, n_negative=100, n_test=10):
        self._make_split("random_basket", data, test_rate, False, n_negative, by_user, n_test)

    def make_temporal_split(self, data=None, test_rate=0.1, by_user=False, n_negative=100, n_test=10):
        self._make_split("temporal", data, test_rate, False, n_negative, by_user, n_test)

    def make_temporal_basket_split(self, data=None, test_rate=0.1, by_user=False, n_negative=100, n_test=10):
        self._make_split("temporal_basket", data, test_rate, False, n_negative, by_user, n_test)

    def load_leave_one_out(self, random=False, n_negative=100, n_test=10, download=False):
        return self._load_split("leave_one_out", 0, random, n_negative, False, n_test, download)

    def load_leave_one_basket(self, random=False, n_negative=100, n_test=10, download=False):
        return self._load_split("leave_one_basket", 0, random, n_negative, False, n_test, download)

    def load_random_split(self, test_rate=0.1, by_user=False, n_negative=100, n_test=10, download=False):
        return self._load_split("random", test_rate, False, n_negative, by_user, n_test, download)

    def load_random_basket_split(self, test_rate=0.1, by_user=False, n_negative=100, n_test=10, download=False):
        return self._load_split("random_basket", test_rate, False, n_negative, by_user, n_test, download)

    def load_temporal_split(self, test_rate=0.1, by_user=False, n_negative=100, n_test=10, download=False):
        return self._load_split("temporal", test_rate, False, n_negative, by_user, n_test, download)

    def load_temporal_basket_split(self, test_rate=0.1, by_user=False, n_negative=100, n_test=10, download=False):
        return self._load_split("temporal_basket", test_rate, False, n_negative, by_user, n_test, download)

    def load_split(self, config):
        """Config-driven split dispatch (reference dataset_base.py:909-980).

        Accepts every split name the reference's mapping does
        ("random_split", "random_basket_split", "temporal", "temporal_basket",
        "leave_one_out", "leave_one_basket") plus this repo's canonical short
        names, forwards the config's ``download`` flag, and applies the
        reference's n_negative<0 -> n_test=1 normalization (full-negative
        eval sets come as a single copy).
        """
        # accept a full Config/dict (use its dataset section) or a bare
        # dataset-section mapping
        if hasattr(config, "dataset") and not isinstance(config, dict):
            ds = config.dataset
        elif isinstance(config, dict) and isinstance(config.get("dataset"), dict):
            ds = config["dataset"]
        else:
            ds = config
        split = ds.get("data_split", "leave_one_out")
        aliases = {
            "random": "random_split",
            "random_basket": "random_basket_split",
            "temporal": "temporal_split",
            "temporal_basket": "temporal_basket_split",
            "random_split": "random_split",
            "random_basket_split": "random_basket_split",
            "temporal_split": "temporal_split",
            "temporal_basket_split": "temporal_basket_split",
            "leave_one_out": "leave_one_out",
            "leave_one_basket": "leave_one_basket",
        }
        if split not in aliases:
            raise KeyError(
                f"Unknown data_split {split!r}; accepted: {sorted(set(aliases))}"
            )
        canonical = aliases[split]
        n_test = int(ds.get("n_test", 10))
        n_negative = int(ds.get("n_negative", 100))
        if n_negative < 0 and n_test > 1:
            n_test = 1
        kwargs = dict(
            n_negative=n_negative,
            n_test=n_test,
            download=bool(ds.get("download", False)),
        )
        if canonical in ("leave_one_out", "leave_one_basket"):
            kwargs["random"] = ds.get("random", False)
        else:
            kwargs["test_rate"] = ds.get("test_rate", 0.1)
            kwargs["by_user"] = ds.get("by_user", False)
        return getattr(self, f"load_{canonical}")(**kwargs)
