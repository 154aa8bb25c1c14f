"""Full-catalog top-k retrieval.

Two paths (SURVEY §7's "full-catalog top-k at scale" hard part):

``retrieval_topk`` — the fast path (round-5 redesign, measured on v5e in
tools/prof_retrieval*.py): score a user chunk against the whole catalog in
one MXU matmul with bfloat16 scores, reduce with ``lax.approx_max_k`` (the
TPU PartialReduce unit — 3.3x faster than exact ``top_k`` on a 162k-item
row), and handle exclusions by POST-FILTER: retrieve ``k + T`` candidates,
knock out each user's <=T excluded items with a tiny compare, re-top-k.
10240 users x 162k items: 700k users/s (15.3x the r4 streaming path; 97.3%
exact-top-10 recall at recall_target=0.95; ``mode="exact"`` gives the exact
result at 56k users/s). bf16 scores are the one measured surface where bf16
pays >1.2x (1.67x vs fp32 scores — the reduce reads the materialized score
matrix, so score bytes are the lever).

``streaming_topk`` — the memory-bounded fallback: scans the item table in
blocks inside one jit merged into a running (batch, k) buffer, so HBM usage
is O(batch * (block + k)) at ANY catalog size. Use when batch x n_items
scores cannot be materialized even for one user chunk. For multi-chip, shard
the item axis over "model" and merge per-shard results with one small
all-gather.
"""

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(
    jax.jit,
    static_argnames=("k", "mode", "score_dtype", "user_chunk", "recall_target"),
)
def retrieval_topk(user_emb, item_table, k, exclude_list=None, mode="approx",
                   score_dtype="bfloat16", user_chunk=None, recall_target=0.95):
    """Top-k items per user over the full catalog (serving fast path).

    Args:
        user_emb: (B, d) user representations.
        item_table: (n_items, d) item representations (dot-product scoring).
        k: results per user.
        exclude_list: optional (B, T) int32 per-user excluded item ids, padded
            with -1. Exclusion is exact: ``k + T`` candidates are retrieved,
            so the valid top-k always survives the post-filter.
        mode: "approx" (lax.approx_max_k, TPU PartialReduce; recall vs exact
            ~0.97 at the default target) or "exact" (lax.top_k).
        score_dtype: dtype for the score matrix ("bfloat16" default — halves
            the reduce's HBM traffic; matmul still accumulates fp32 on MXU).
            None/"float32" keeps fp32 scores.
        user_chunk: process users in chunks of this size inside a scan
            (bounds the score buffer to chunk x n_items; B must divide).
        recall_target: approx_max_k quality knob.

    Returns:
        (values (B, k) float32, indices (B, k) int32) sorted descending.
    """
    B, d = user_emb.shape
    dt = jnp.dtype(score_dtype) if score_dtype is not None else jnp.float32
    items = item_table.astype(dt)
    T = 0 if exclude_list is None else exclude_list.shape[1]
    kbuf = min(k + T, item_table.shape[0])

    def one(u_blk, ex):
        s = u_blk.astype(dt) @ items.T
        if mode == "approx":
            val, idx = jax.lax.approx_max_k(s, kbuf, recall_target=recall_target)
        else:
            val, idx = jax.lax.top_k(s, kbuf)
        if ex is not None:
            hit = (idx[:, :, None] == ex[:, None, :]).any(-1)
            val = jnp.where(hit, jnp.asarray(NEG_INF, val.dtype), val)
        gv, gi = jax.lax.top_k(val.astype(jnp.float32), k)
        return gv, jnp.take_along_axis(idx, gi, axis=1)

    if user_chunk is None or user_chunk >= B:
        return one(user_emb, exclude_list)

    if B % user_chunk:
        raise ValueError(f"user_chunk {user_chunk} must divide batch {B}")

    def blk(carry, i):
        ub = jax.lax.dynamic_slice(user_emb, (i * user_chunk, 0), (user_chunk, d))
        ex = None
        if exclude_list is not None:
            ex = jax.lax.dynamic_slice(
                exclude_list, (i * user_chunk, 0), (user_chunk, T)
            )
        return carry, one(ub, ex)

    _, (v, ix) = jax.lax.scan(blk, 0, jnp.arange(B // user_chunk))
    return v.reshape(B, k), ix.reshape(B, k)


def exclusion_lists(csr, n_rows=None, pad=-1):
    """Per-row padded exclusion id lists from a scipy CSR (train positives).

    Returns (n_rows, T_max) int32 with ``pad`` fill — the ``exclude_list``
    input to ``retrieval_topk``. T_max is the max row degree.
    """
    import numpy as np

    n_rows = n_rows if n_rows is not None else csr.shape[0]
    degrees = np.diff(csr.indptr[: n_rows + 1])
    t_max = max(int(degrees.max()) if len(degrees) else 0, 1)
    out = np.full((n_rows, t_max), pad, np.int32)
    for r in range(n_rows):
        row = csr.indices[csr.indptr[r]:csr.indptr[r + 1]]
        out[r, : len(row)] = row
    return out


@functools.partial(jax.jit, static_argnames=("k", "block"))
def streaming_topk(user_emb, item_table, k, block=8192, exclude_mask=None):
    """Top-k items per user without materializing all scores.

    Args:
        user_emb: (B, d) user representations.
        item_table: (n_items, d) item representations (dot-product scoring).
        k: results per user.
        block: item-block size per scan step (multiple of 128 for the MXU).
        exclude_mask: optional (B, n_items) bool — True entries are excluded
            (e.g. train positives).

    Returns:
        (values (B, k), indices (B, k)) sorted by score descending.
    """
    B, d = user_emb.shape
    n_items = item_table.shape[0]
    n_blocks = -(-n_items // block)
    padded = n_blocks * block
    if padded != n_items:
        item_table = jnp.concatenate(
            [item_table, jnp.zeros((padded - n_items, d), item_table.dtype)], axis=0
        )
        if exclude_mask is not None:
            exclude_mask = jnp.concatenate(
                [exclude_mask, jnp.ones((B, padded - n_items), bool)], axis=1
            )

    init_v = jnp.full((B, k), NEG_INF, user_emb.dtype)
    init_i = jnp.zeros((B, k), jnp.int32)

    def step(carry, blk):
        top_v, top_i = carry
        start = blk * block
        v_blk = jax.lax.dynamic_slice(item_table, (start, 0), (block, d))
        scores = user_emb @ v_blk.T  # (B, block) — one MXU matmul
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (B, block), 1)
        valid = ids < n_items
        if exclude_mask is not None:
            keep = ~jax.lax.dynamic_slice(exclude_mask, (0, start), (B, block))
            valid = valid & keep
        scores = jnp.where(valid, scores, NEG_INF)
        cand_v = jnp.concatenate([top_v, scores], axis=1)
        cand_i = jnp.concatenate([top_i, ids], axis=1)
        new_v, sel = jax.lax.top_k(cand_v, k)
        new_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return (new_v, new_i), None

    (top_v, top_i), _ = jax.lax.scan(step, (init_v, init_i), jnp.arange(n_blocks))
    return top_v, top_i
