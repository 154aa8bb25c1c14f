"""Synthetic dataset adapter: offline random interactions for demos/tests.

Registered as "synthetic" — gives every example CLI and CI environment a
dataset that needs no network (the reference's closest analogue is the
``generate_random_data`` test fixture, data_split.py:730-750, which this
wraps with the full DatasetBase lifecycle).
"""

from .data_split import generate_random_data
from .dataset_base import DatasetBase


class Synthetic(DatasetBase):
    """Random implicit-feedback interactions with basket structure."""

    def __init__(self, dataset_name="synthetic", min_u_c=0, min_i_c=0, root_dir=None,
                 n_interactions=20_000, n_users=300, n_items=400, seed=42):
        super().__init__(
            dataset_name=dataset_name,
            min_u_c=min_u_c,
            min_i_c=min_i_c,
            root_dir=root_dir,
            url=None,
            tips="synthetic dataset generates itself; no download needed",
        )
        self.n_interactions = n_interactions
        self.n_users = n_users
        self.n_items = n_items
        self.seed = seed

    def download(self):
        pass  # nothing to download

    def preprocess(self):
        data = generate_random_data(
            self.n_interactions, self.n_users, self.n_items, seed=self.seed
        )
        self.save_dataframe_as_npz(data, self.interaction_file())
