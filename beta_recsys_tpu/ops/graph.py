"""On-device sparse graph propagation (COO segment-sum SpMM) and edge dropout.

TPU has no native SpMM; the reference's ``torch.sparse.mm`` propagation
(beta_rec/models/lightgcn.py:73) becomes gather + segment-sum: for each edge
(r, c, w), accumulate w * emb[c] into out[r]. XLA lowers segment_sum to sorted
scatter-adds; rows should be pre-sorted (scipy COO order) for locality. A
dense-blocked Pallas kernel is the planned upgrade for large graphs
(SURVEY §2.9 "Graph ops").
"""

import jax
import jax.numpy as jnp


def spmm_coo(rows, cols, vals, dense):
    """Sparse (n x n, COO) @ dense (n x d) -> (n x d)."""
    gathered = dense[cols] * vals[:, None]
    return jax.ops.segment_sum(gathered, rows, num_segments=dense.shape[0])


def edge_dropout(rng, vals, keep_prob):
    """Drop edges with prob (1 - keep_prob), rescaling kept weights by 1/keep_prob.

    Matches the reference's sparse dropout semantics
    (beta_rec/models/lightgcn.py:27-38): mask = int(rand + keep_prob).
    """
    keep = jax.random.uniform(rng, vals.shape) < keep_prob
    return jnp.where(keep, vals / keep_prob, 0.0)


def lightgcn_propagate(rows, cols, vals, user_emb, item_emb, n_layers):
    """Layer-averaged LightGCN propagation over the joint (users+items) graph.

    Returns (user_final, item_final): mean over layer outputs 0..n_layers
    (reference: beta_rec/models/lightgcn.py:55-78).
    """
    n_users = user_emb.shape[0]
    all_emb = jnp.concatenate([user_emb, item_emb], axis=0)
    acc = all_emb
    emb = all_emb
    for _ in range(n_layers):
        emb = spmm_coo(rows, cols, vals, emb)
        acc = acc + emb
    final = acc / (n_layers + 1)
    return final[:n_users], final[n_users:]
