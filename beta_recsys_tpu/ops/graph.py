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


def sgl_augment(rng, rows, cols, n_nodes, aug_type=1, ssl_ratio=0.1):
    """On-device SGL graph augmentation: returns re-normalized edge values.

    aug_type 0 (node dropout): drop a node subset; edges touching dropped nodes
    vanish. aug_type 1/2 (edge dropout / random walk): drop edges independently.
    The surviving subgraph is sym-renormalized D^-1/2 A D^-1/2 on device
    (the reference rebuilds scipy matrices per epoch host-side,
    beta_rec/data/base_data.py:433-496; here a fresh view is drawn per loss
    call with no host round-trip).
    """
    if aug_type == 0:
        k1, k2 = jax.random.split(rng)
        node_keep = jax.random.uniform(k1, (n_nodes,)) >= ssl_ratio
        keep = node_keep[rows] & node_keep[cols]
    else:
        # Undirected dropout: both directions of an interaction edge share the
        # same draw (keyed on the canonical pair), keeping A symmetric like the
        # reference's host-side edge subsampling.
        lo = jnp.minimum(rows, cols).astype(jnp.uint32)
        hi = jnp.maximum(rows, cols).astype(jnp.uint32)
        pair_id = lo * jnp.uint32(n_nodes) + hi
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(pair_id)
        u = jax.vmap(lambda k: jax.random.uniform(k))(keys)
        keep = u >= ssl_ratio
    ones = jnp.where(keep, 1.0, 0.0)
    deg = jax.ops.segment_sum(ones, rows, num_segments=n_nodes)
    d_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return ones * d_inv_sqrt[rows] * d_inv_sqrt[cols]


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
