"""Host-side UltraGCN item-item constraint matrix (vectorized, blocked).

Replaces the reference's per-row torch.topk loop over a dense item x item
similarity (beta_rec/models/ultragcn.py:9-33) with blocked numpy argpartition —
O(n_items * n_items / block) memory instead of a Python loop per item.
"""

import numpy as np


def get_ii_constraint_mat(train_mat, num_neighbors, ii_diagonal_zero=False, block=2048):
    """Top-K weighted co-occurrence neighbors for every item.

    Args:
        train_mat: scipy CSR (n_users, n_items) binarized interactions.
        num_neighbors: K.
    Returns:
        (ii_neighbor_mat (n_items, K) int64, ii_constraint_mat (n_items, K) f32)
    """
    A = (train_mat.T @ train_mat).tocsr()  # item x item co-occurrence
    n_items = A.shape[0]
    if ii_diagonal_zero:
        A.setdiag(0)
        A.eliminate_zeros()
    items_D = np.asarray(A.sum(axis=0)).flatten()
    users_D = np.asarray(A.sum(axis=1)).flatten()
    with np.errstate(divide="ignore", invalid="ignore"):
        beta_uD = np.sqrt(users_D + 1) / users_D
    beta_uD[~np.isfinite(beta_uD)] = 0.0
    beta_iD = 1.0 / np.sqrt(items_D + 1)

    K = min(num_neighbors, n_items)
    res_idx = np.zeros((n_items, K), dtype=np.int64)
    res_sim = np.zeros((n_items, K), dtype=np.float32)
    for start in range(0, n_items, block):
        end = min(start + block, n_items)
        dense = np.asarray(A[start:end].todense(), dtype=np.float32)
        weighted = beta_uD[start:end, None] * dense * beta_iD[None, :]
        # top-K per row, sorted descending
        part = np.argpartition(-weighted, K - 1, axis=1)[:, :K]
        part_vals = np.take_along_axis(weighted, part, axis=1)
        order = np.argsort(-part_vals, axis=1, kind="stable")
        res_idx[start:end] = np.take_along_axis(part, order, axis=1)
        res_sim[start:end] = np.take_along_axis(part_vals, order, axis=1)
    return res_idx, res_sim
