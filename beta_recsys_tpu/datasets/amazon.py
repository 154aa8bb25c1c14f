"""Amazon review dataset adapters (SNAP per-category review dumps).

Reference parity: beta_rec/datasets/amazon.py:113-679 — each category is a
json.gz of reviews; interactions are (reviewerID, asin, overall, unixReviewTime).
One parametrized base class + generated subclasses for all 20 categories.
"""

import gzip
import json
import os

import pandas as pd

from ..utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)
from .dataset_base import DatasetBase

_SNAP = "http://snap.stanford.edu/data/amazon/productGraph/categoryFiles"

# category key -> (dataset_name, raw file category string)
AMAZON_CATEGORIES = {
    "AmazonInstantVideo": "Amazon_Instant_Video",
    "AmazonMusicalInstruments": "Musical_Instruments",
    "AmazonDigitalMusic": "Digital_Music",
    "AmazonBaby": "Baby",
    "AmazonPatioLawnGarden": "Patio_Lawn_and_Garden",
    "AmazonGroceryGourmetFood": "Grocery_and_Gourmet_Food",
    "AmazonAutomotive": "Automotive",
    "AmazonPetSupplies": "Pet_Supplies",
    "AmazonCellPhonesAndAccessories": "Cell_Phones_and_Accessories",
    "AmazonHealthAndPersonalCare": "Health_and_Personal_Care",
    "AmazonToysAndGames": "Toys_and_Games",
    "AmazonVideoGames": "Video_Games",
    "AmazonToolsAndHomeImprovement": "Tools_and_Home_Improvement",
    "AmazonBeauty": "Beauty",
    "AmazonAppsForAndroid": "Apps_for_Android",
    "AmazonOfficeProducts": "Office_Products",
    "AmazonBooks": "Books",
    "AmazonElectronics": "Electronics",
    "AmazonMoviesAndTV": "Movies_and_TV",
    "AmazonCDsAndVinyl": "CDs_and_Vinyl",
    "AmazonClothingShoesAndJewelry": "Clothing_Shoes_and_Jewelry",
    "AmazonHomeAndKitchen": "Home_and_Kitchen",
    "AmazonKindleStore": "Kindle_Store",
    "AmazonSportsAndOutdoors": "Sports_and_Outdoors",
}


class AmazonDataset(DatasetBase):
    """Base Amazon adapter: parses reviews_<Category>.json.gz."""

    category = None  # e.g. "Digital_Music"

    def __init__(self, dataset_name=None, min_u_c=0, min_i_c=3, root_dir=None):
        category = self.category
        name = dataset_name or f"amazon_{category.lower()}"
        super().__init__(
            dataset_name=name,
            min_u_c=min_u_c,
            min_i_c=min_i_c,
            root_dir=root_dir,
            url=f"{_SNAP}/reviews_{category}.json.gz",
        )

    def preprocess(self):
        file_name = os.path.join(self.raw_path, f"reviews_{self.category}.json.gz")
        if not os.path.exists(file_name):
            self.download()
            file_name = os.path.join(self.raw_path, os.path.basename(self.url))
        rows = []
        opener = gzip.open if file_name.endswith(".gz") else open
        with opener(file_name, "rt") as f:
            for line in f:
                r = json.loads(line)
                rows.append(
                    (
                        r["reviewerID"],
                        r["asin"],
                        float(r["overall"]),
                        int(r.get("unixReviewTime", 0)),
                    )
                )
        data = pd.DataFrame(
            rows,
            columns=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL],
        )
        self.save_dataframe_as_npz(data, self.interaction_file())


def _make_category_class(class_name, category):
    cls = type(class_name, (AmazonDataset,), {"category": category, "__doc__": f"Amazon {category} reviews."})
    return cls


_this = globals()
for _name, _cat in AMAZON_CATEGORIES.items():
    _this[_name] = _make_category_class(_name, _cat)

__all__ = ["AmazonDataset"] + list(AMAZON_CATEGORIES)
