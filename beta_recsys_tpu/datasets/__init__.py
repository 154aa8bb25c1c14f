"""On-disk dataset layer: download, preprocess, split, cache."""

from .data_split import (  # noqa: F401
    feed_neg_sample,
    filter_user_item,
    filter_user_item_order,
    generate_parameterized_path,
    generate_random_data,
    leave_one_basket,
    leave_one_out,
    load_split_data,
    random_basket_split,
    random_split,
    save_split_data,
    split_data,
    temporal_basket_split,
    temporal_split,
)
