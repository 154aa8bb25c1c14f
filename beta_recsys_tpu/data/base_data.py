"""In-memory data layer: dense re-indexing and device-ready array production.

TPU-first redesign of the reference BaseData (beta_rec/data/base_data.py:18-532).
Where the reference builds torch DataLoaders with host-side per-row negative
sampling, this class produces *fixed-shape numpy arrays* that are moved to device
once; batching, shuffling, and negative sampling all happen inside jitted code
(see beta_recsys_tpu.core.train_engine and beta_recsys_tpu.ops.sampling).

Graph artifacts (NGCF/LightGCN adjacency, UltraGCN constraint vectors, SGL
augmented adjacencies) are built with vectorized scipy/numpy (the reference uses
dok-matrix double loops, base_data.py:337-360) and returned as COO edge arrays
ready for on-device segment-sum propagation.
"""

import os
from typing import NamedTuple

import numpy as np
import pandas as pd
import scipy.sparse as sp

from ..utils.alias_table import AliasTable
from ..utils.constants import (
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_USER_COL,
)


class EvalCandidates(NamedTuple):
    """Padded per-user candidate sets for on-device ranked evaluation.

    users:     (U,)  int32 — dense user ids with >=1 relevant candidate.
    items:     (U, C) int32 — candidate item ids, padded with 0.
    relevance: (U, C) float32 — 1.0 where the candidate is a positive.
    ratings:   (U, C) float32 — raw ratings (for rating metrics).
    mask:      (U, C) bool — valid candidate slots.
    """

    users: np.ndarray
    items: np.ndarray
    relevance: np.ndarray
    ratings: np.ndarray
    mask: np.ndarray


class TrainArrays(NamedTuple):
    """Flat (user, item, rating) training interactions as device-ready arrays."""

    users: np.ndarray
    items: np.ndarray
    ratings: np.ndarray


class BaseData:
    """Re-index users/items to dense ids and expose device-ready arrays."""

    def __init__(self, split_dataset, intersect=True, binarize=True, bin_thld=0.0, normalize=False):
        self.train, self.valid, self.test = split_dataset
        if isinstance(self.valid, pd.DataFrame):
            self.valid = [self.valid]
        if isinstance(self.test, pd.DataFrame):
            self.test = [self.test]
        # COPY the input frames: _re_index/_binarize write in place, and a
        # caller reusing one split across several runs (parity_check's seed
        # loop) must not see run N's id mapping applied to run N+1's frames.
        # (Found r5: Triple2vec's basket path copies only train, so shared
        # valid/test frames got re-mapped while train kept raw ids —
        # misaligned eval collapsed every run after the first. The reference
        # mutates in place, beta_rec/data/base_data.py:44-75 — a quirk, not
        # a contract.)
        self.train = self.train.copy()
        self.valid = [df.copy() for df in self.valid]
        self.test = [df.copy() for df in self.test]

        self.user_pool = self.train[DEFAULT_USER_COL].unique()
        self.item_pool = self.train[DEFAULT_ITEM_COL].unique()
        self.n_users = len(self.user_pool)
        self.n_items = len(self.item_pool)

        if intersect:
            self._intersect()
        if binarize:
            self._binarize(bin_thld)
        if normalize:
            self._normalize()
        self._re_index()

        self.item_sampler = AliasTable(self.train[DEFAULT_ITEM_COL].value_counts().to_dict())
        self.user_sampler = AliasTable(self.train[DEFAULT_USER_COL].value_counts().to_dict())
        self._pos_csr_cache = None

    # -- pandas-side preprocessing -------------------------------------------------

    def _intersect(self):
        """Drop valid/test rows whose user or item is unseen in train."""
        user_set = set(self.user_pool.tolist())
        item_set = set(self.item_pool.tolist())
        for li in (self.valid, self.test):
            for i, df in enumerate(li):
                li[i] = df[
                    df[DEFAULT_USER_COL].isin(user_set) & df[DEFAULT_ITEM_COL].isin(item_set)
                ].reset_index(drop=True)

    def _binarize(self, bin_thld):
        """Clamp ratings above the threshold to 1 (implicit feedback)."""
        for df in [self.train, *self.valid, *self.test]:
            col = df[DEFAULT_RATING_COL]
            df.loc[col > bin_thld, DEFAULT_RATING_COL] = 1.0

    def _normalize(self):
        """Scale ratings into [0, 1] by the max train rating (explicit feedback)."""
        max_rating = self.train[DEFAULT_RATING_COL].max()
        assert max_rating > 0, "All ratings may be <= 0."
        for df in [self.train, *self.valid, *self.test]:
            df[DEFAULT_RATING_COL] = df[DEFAULT_RATING_COL] / max_rating

    def _re_index(self):
        """Map raw user/item ids to dense [0, n) ids across all frames."""
        self.user2id = {u: i for i, u in enumerate(self.user_pool)}
        self.id2user = {i: u for u, i in self.user2id.items()}
        self.item2id = {it: i for i, it in enumerate(self.item_pool)}
        self.id2item = {i: it for it, i in self.item2id.items()}
        for df in [self.train, *self.valid, *self.test]:
            df[DEFAULT_USER_COL] = df[DEFAULT_USER_COL].map(self.user2id)
            df[DEFAULT_ITEM_COL] = df[DEFAULT_ITEM_COL].map(self.item2id)

    # -- device-array producers ----------------------------------------------------

    def train_arrays(self):
        """Training interactions as flat arrays (moved to device by the engine)."""
        return TrainArrays(
            users=self.train[DEFAULT_USER_COL].to_numpy(dtype=np.int32),
            items=self.train[DEFAULT_ITEM_COL].to_numpy(dtype=np.int32),
            ratings=self.train[DEFAULT_RATING_COL].to_numpy(dtype=np.float32),
        )

    def pos_csr(self):
        """Per-user sorted positive item lists as CSR (indptr, items).

        Feeds the on-device rejection sampler
        (beta_recsys_tpu.ops.sampling.make_membership_test).
        """
        if self._pos_csr_cache is None:
            users = self.train[DEFAULT_USER_COL].to_numpy(dtype=np.int64)
            items = self.train[DEFAULT_ITEM_COL].to_numpy(dtype=np.int64)
            order = np.lexsort((items, users))
            su, si = users[order], items[order]
            counts = np.bincount(su, minlength=self.n_users)
            indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
            self._pos_csr_cache = (indptr, si.astype(np.int32))
        return self._pos_csr_cache

    def pos_bitmask(self):
        """Dense (n_users, n_items) bool positive mask (small catalogs only)."""
        mask = np.zeros((self.n_users, self.n_items), dtype=bool)
        mask[
            self.train[DEFAULT_USER_COL].to_numpy(dtype=np.int64),
            self.train[DEFAULT_ITEM_COL].to_numpy(dtype=np.int64),
        ] = True
        return mask

    def user_item_csr(self):
        """Binarized user x item interaction matrix as scipy CSR."""
        return sp.csr_matrix(
            (
                self.train[DEFAULT_RATING_COL].to_numpy(dtype=np.float32),
                (
                    self.train[DEFAULT_USER_COL].to_numpy(dtype=np.int64),
                    self.train[DEFAULT_ITEM_COL].to_numpy(dtype=np.int64),
                ),
            ),
            shape=(self.n_users, self.n_items),
        )

    def eval_candidates(self, eval_df, pad_to=None):
        """Build padded candidate arrays from an evaluation DataFrame.

        Only users with at least one relevant (rating >= 1) candidate are kept,
        matching merge_ranking_true_pred's common-user semantics.
        """
        df = eval_df
        users_with_pos = df.loc[df[DEFAULT_RATING_COL] >= 1, DEFAULT_USER_COL].unique()
        df = df[df[DEFAULT_USER_COL].isin(set(users_with_pos.tolist()))]

        uniq_users, user_idx = np.unique(df[DEFAULT_USER_COL].to_numpy(), return_inverse=True)
        n_u = len(uniq_users)
        # Stable within-user slot assignment preserves candidate order (tie-break).
        order = np.argsort(user_idx, kind="stable")
        slot = np.empty(len(df), dtype=np.int64)
        counts = np.bincount(user_idx, minlength=n_u)
        slot[order] = np.concatenate([np.arange(c) for c in counts]) if n_u else []
        C = pad_to or int(counts.max())

        items = np.zeros((n_u, C), dtype=np.int32)
        ratings = np.zeros((n_u, C), dtype=np.float32)
        mask = np.zeros((n_u, C), dtype=bool)
        items[user_idx, slot] = df[DEFAULT_ITEM_COL].to_numpy(dtype=np.int32)
        ratings[user_idx, slot] = df[DEFAULT_RATING_COL].to_numpy(dtype=np.float32)
        mask[user_idx, slot] = True
        relevance = (ratings >= 1).astype(np.float32) * mask
        return EvalCandidates(
            users=uniq_users.astype(np.int32),
            items=items,
            relevance=relevance,
            ratings=ratings,
            mask=mask,
        )

    def full_catalog_eval(self, eval_df):
        """Arrays for full-catalog evaluation: per-user relevant items + train mask.

        Returns (users, relevance_csr, train_mask_csr) where csr are scipy
        matrices over (user, item); the eval engine shards users and densifies
        per block on device.
        """
        df = eval_df[eval_df[DEFAULT_RATING_COL] >= 1]
        users = df[DEFAULT_USER_COL].unique().astype(np.int32)
        rel = sp.csr_matrix(
            (
                np.ones(len(df), dtype=np.float32),
                (df[DEFAULT_USER_COL].to_numpy(np.int64), df[DEFAULT_ITEM_COL].to_numpy(np.int64)),
            ),
            shape=(self.n_users, self.n_items),
        )
        return users, rel, self.user_item_csr()

    # -- graph artifacts (vectorized host-side construction) ----------------------

    def create_adj_mat(self):
        """(adj, D^-1(A+I)A-normalized, D^-1 A) over the (users+items) node graph.

        Vectorized replacement for the reference's dok double loop
        (beta_rec/data/base_data.py:337-360). Returns scipy CSR matrices.
        """
        n = self.n_users + self.n_items
        u = self.train[DEFAULT_USER_COL].to_numpy(np.int64)
        i = self.train[DEFAULT_ITEM_COL].to_numpy(np.int64) + self.n_users
        ones = np.ones(len(u), dtype=np.float32)
        upper = sp.csr_matrix((ones, (u, i)), shape=(n, n))
        # Duplicate (u, i) pairs sum; binarize to match R[u, i] = 1 semantics.
        upper.data[:] = 1.0
        adj = upper + upper.T
        norm_adj = _row_normalize(adj + sp.eye(n, dtype=np.float32))
        mean_adj = _row_normalize(adj)
        return adj.tocsr(), norm_adj.tocsr(), mean_adj.tocsr()

    def get_adj_mat(self, config=None, cache_dir=None):
        """Disk-cached (adj, norm_adj, mean_adj) triple — reference name.

        Mirrors the reference's get_adj_mat (beta_rec/data/base_data.py:291-360
        and data/deprecated_data_base.py:287-356), which caches the NGCF
        adjacency triple under the processed-data dir. Cache key follows the
        reference's ``ngcf_<dataset>_<split>`` convention when a config is
        given; without config/cache_dir the triple is built in memory.
        """
        path = None
        if cache_dir is not None or config is not None:
            if cache_dir is None:
                cache_dir = (
                    config.get("system", {}).get("process_dir")
                    or config.get("dataset", {}).get("data_dir")
                    or "."
                )
            ds = (config or {}).get("dataset", {})
            tag = f"ngcf_{ds.get('dataset', 'data')}_{ds.get('data_split', 'split')}"
            path = os.path.join(cache_dir, tag + "_adj.npz")
        if path is not None and os.path.exists(path):
            with np.load(path, allow_pickle=False) as z:
                n = self.n_users + self.n_items

                def _load(prefix):
                    return sp.csr_matrix(
                        (z[prefix + "_data"], z[prefix + "_indices"], z[prefix + "_indptr"]),
                        shape=(n, n),
                    )

                return _load("adj"), _load("norm"), _load("mean")
        adj, norm_adj, mean_adj = self.create_adj_mat()
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            np.savez(
                path,
                adj_data=adj.data, adj_indices=adj.indices, adj_indptr=adj.indptr,
                norm_data=norm_adj.data, norm_indices=norm_adj.indices, norm_indptr=norm_adj.indptr,
                mean_data=mean_adj.data, mean_indices=mean_adj.indices, mean_indptr=mean_adj.indptr,
            )
        return adj, norm_adj, mean_adj

    def get_constraint_mat(self):
        """Reference-name alias for :meth:`create_constraint_mat`.

        (beta_rec/data/base_data.py:362-431.)
        """
        return self.create_constraint_mat()

    def evaluate_data(self, eval_df=None, n_negative=99, rng=None):
        """Pointwise eval DataFrame: each test positive + n sampled negatives.

        Vectorized replacement for the deprecated DataLoaderBase.evaluate_data
        property (beta_rec/data/deprecated_data_base.py:261-285): rating 1 for
        held-out positives, 0 for per-user sampled negatives never seen in
        train or in the eval positives.
        """
        rng = rng or np.random.default_rng(0)
        if eval_df is None:
            eval_df = self.test[0] if self.test else self.valid[0]
        pos = eval_df[eval_df[DEFAULT_RATING_COL] >= 1]
        users = pos[DEFAULT_USER_COL].to_numpy(np.int64)
        items = pos[DEFAULT_ITEM_COL].to_numpy(np.int64)
        # Exclusion set = train positives ∪ eval positives, per user.
        excl = self.user_item_csr().tolil(copy=True)
        excl[users, items] = 1.0
        excl = excl.tocsr()
        neg_users = np.repeat(users, n_negative)
        neg_items = rng.integers(0, self.n_items, size=len(neg_users))
        # Rejection resample collisions with the exclusion set (vectorized rounds).
        for _ in range(64):
            bad = np.asarray(excl[neg_users, neg_items]).flatten() > 0
            if not bad.any():
                break
            neg_items[bad] = rng.integers(0, self.n_items, size=int(bad.sum()))
        return pd.DataFrame(
            {
                DEFAULT_USER_COL: np.concatenate([users, neg_users]),
                DEFAULT_ITEM_COL: np.concatenate([items, neg_items]),
                DEFAULT_RATING_COL: np.concatenate(
                    [np.ones(len(users), np.float32), np.zeros(len(neg_users), np.float32)]
                ),
            }
        )

    def get_norm_adj(self, variant="sym"):
        """Normalized bipartite adjacency as COO arrays for device propagation.

        variant='sym': D^-1/2 A D^-1/2 (LightGCN paper); variant='row':
        D^-1 A; variant='row_selfloop': D^-1 (A+I) with degrees of (A+I) —
        exactly the reference's norm_adj (beta_rec/utils/common_util.py:24
        normalized_adj_single over adj + eye, used by its LightGCN via
        deprecated_data_base.get_adj_mat). Returns (rows, cols, vals)
        int32/int32/float32 over n_users+n_items nodes.
        """
        n = self.n_users + self.n_items
        u = self.train[DEFAULT_USER_COL].to_numpy(np.int64)
        i = self.train[DEFAULT_ITEM_COL].to_numpy(np.int64) + self.n_users
        ones = np.ones(len(u), dtype=np.float32)
        upper = sp.csr_matrix((ones, (u, i)), shape=(n, n))
        upper.data[:] = 1.0
        bip = upper + upper.T
        if variant == "row_selfloop":
            bip = (bip + sp.eye(n, dtype=np.float32, format="csr")).tocsr()
        adj = bip.tocoo()
        deg = np.asarray(adj.sum(axis=1)).flatten()
        if variant == "sym":
            d_inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
            vals = d_inv_sqrt[adj.row] * adj.data * d_inv_sqrt[adj.col]
        elif variant in ("row", "row_selfloop"):
            d_inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1e-12), 0.0)
            vals = d_inv[adj.row] * adj.data
        else:
            raise ValueError(f"Unknown variant {variant}")
        return (
            adj.row.astype(np.int32),
            adj.col.astype(np.int32),
            vals.astype(np.float32),
        )

    def create_constraint_mat(self):
        """UltraGCN constraint vectors (train_mat, beta_uD, beta_iD).

        beta_uD = sqrt(d_u + 1) / d_u, beta_iD = 1 / sqrt(d_i + 1)
        (reference: beta_rec/data/base_data.py:411-431, vectorized).
        """
        train_mat = self.user_item_csr()
        train_mat.data[:] = 1.0
        items_d = np.asarray(train_mat.sum(axis=0)).flatten()
        users_d = np.asarray(train_mat.sum(axis=1)).flatten()
        with np.errstate(divide="ignore", invalid="ignore"):
            beta_uD = np.sqrt(users_d + 1) / users_d
        beta_uD[~np.isfinite(beta_uD)] = 0.0
        beta_iD = 1.0 / np.sqrt(items_d + 1)
        return train_mat, beta_uD.astype(np.float32), beta_iD.astype(np.float32)

    def create_sgl_mat(self, aug_type=1, ssl_ratio=0.1, is_subgraph=True, rng=None):
        """SGL augmented normalized adjacency (node/edge dropout or random walk).

        aug_type 0: node dropout; 1/2: edge dropout / random walk (identical
        per-layer here, the model redraws per layer for random walk).
        Returns sym-normalized (rows, cols, vals) COO arrays.
        Reference: beta_rec/data/base_data.py:433-496.
        """
        rng = rng or np.random.default_rng()
        n = self.n_users + self.n_items
        user_np = self.train[DEFAULT_USER_COL].to_numpy(np.int64)
        item_np = self.train[DEFAULT_ITEM_COL].to_numpy(np.int64)
        if is_subgraph and aug_type in (0, 1, 2) and ssl_ratio > 0:
            if aug_type == 0:
                keep_user = np.ones(self.n_users, dtype=bool)
                keep_item = np.ones(self.n_items, dtype=bool)
                keep_user[
                    rng.choice(self.n_users, size=int(self.n_users * ssl_ratio), replace=False)
                ] = False
                keep_item[
                    rng.choice(self.n_items, size=int(self.n_items * ssl_ratio), replace=False)
                ] = False
                keep = keep_user[user_np] & keep_item[item_np]
                u_keep, i_keep = user_np[keep], item_np[keep]
            else:
                keep_idx = rng.choice(
                    len(user_np), size=int(len(user_np) * (1 - ssl_ratio)), replace=False
                )
                u_keep, i_keep = user_np[keep_idx], item_np[keep_idx]
        else:
            u_keep, i_keep = user_np, item_np
        ones = np.ones(len(u_keep), dtype=np.float32)
        upper = sp.csr_matrix((ones, (u_keep, i_keep + self.n_users)), shape=(n, n))
        adj = (upper + upper.T).tocoo()
        deg = np.asarray(adj.sum(axis=1)).flatten()
        d_inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
        vals = d_inv_sqrt[adj.row] * adj.data * d_inv_sqrt[adj.col]
        return adj.row.astype(np.int32), adj.col.astype(np.int32), vals.astype(np.float32)


    def get_graph_embeddings(self, cut_off=0.2, tol=1e-5):
        """Hypergraph-Laplacian eigenvectors for LCFN's low-pass filters.

        L_u = I - D_n^-1/2 H_u D_e^-1 H_u^T D_n^-1/2 over the user hypergraph
        (items as hyperedges) and symmetrically for items; smallest
        ceil(cut_off * n) eigenvectors via scipy eigsh (host-side one-off
        preprocessing — reference data/deprecated_data_base.py:411-467,
        vectorized construction).
        """
        from scipy.sparse.linalg import eigsh

        eps = 1e-10
        H = self.user_item_csr()
        H.data[:] = 1.0
        d_u = np.asarray(H.sum(axis=1)).flatten()  # user degrees
        d_v = np.asarray(H.sum(axis=0)).flatten()  # item degrees

        dn_u = sp.diags(1.0 / np.maximum(np.sqrt(d_u), eps))
        de_v = sp.diags(1.0 / np.maximum(d_v, eps))
        L_u = sp.eye(self.n_users) - dn_u @ H @ de_v @ H.T @ dn_u

        dn_v = sp.diags(1.0 / np.maximum(np.sqrt(d_v), eps))
        de_u = sp.diags(1.0 / np.maximum(d_u, eps))
        L_v = sp.eye(self.n_items) - dn_v @ H.T @ de_u @ H @ dn_v

        k_u = max(int(cut_off * self.n_users), 1)
        k_v = max(int(cut_off * self.n_items), 1)
        _, P = eigsh(L_u.tocsc(), k=k_u, which="SM", tol=tol)
        _, Q = eigsh(L_v.tocsc(), k=k_v, which="SM", tol=tol)
        return P.astype(np.float32), Q.astype(np.float32)


# D^-1 A row normalization shared with the host utils.
from ..utils.common import normalized_adj_single as _row_normalize  # noqa: E402
