"""Embedding lookup whose BACKWARD dodges the v5e scatter floor.

Round-4 profiling (tools/prof_epoch_ablation.py, prof_scatter_flags.py)
measured XLA's scatter-add at a hard ~83 ns/row on v5e regardless of width
or lowering hints — it dominates dense training epochs (71% of the MF
unified-sparse epoch; the dense MF backward is the same scatter). For SMALL
tables there is a scatter-free alternative: the gather's VJP is
one_hot(ids)^T @ g — an MXU matmul plus a streamed (B, N) one-hot, costing
~8N bytes of HBM traffic per batch row instead of 83 ns of scatter time.
Break-even: 8N / 819 GB/s = 83 ns  =>  N ~ 8.5k rows. ml-100k-class tables
(hundreds to thousands of rows) win 5-15x; production 1M-row tables keep
the scatter (the sparse lazy-Adam trainer owns that regime).

``table_lookup`` keeps the forward as a plain take (gathers are cheap — the
floor is the scatter in the backward) and swaps only the VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np

# above this many rows the (B, N) one-hot's HBM traffic exceeds the
# scatter's ~83 ns/row cost (see module docstring)
MXU_LOOKUP_MAX_ROWS = 8192


import functools


@functools.lru_cache(maxsize=None)
def _mxu_lookup_for(shape, dtype_name):
    """custom_vjp lookup specialized to a (static) table shape/dtype —
    residuals may only carry JAX values, so the statics close over."""
    n_rows = shape[0]

    @jax.custom_vjp
    def lookup(table, ids):
        return table[ids]

    def fwd(table, ids):
        return table[ids], ids

    def bwd(ids, g):
        flat_ids = ids.reshape(-1)
        onehot = jax.nn.one_hot(flat_ids, n_rows, dtype=g.dtype)  # (B, N)
        # default MXU precision: the one-hot operand is exact 0/1 (bf16
        # representable), so the bf16 passes only round the cotangent g —
        # the same rounding the forward compute already sees. (An r5
        # HIGHEST-precision experiment cost the dense MF epoch ~17% and was
        # unnecessary: the Triple2vec instability it chased was the BaseData
        # input-mutation bug, verified stable post-fix at default precision.)
        if len(shape) == 1:
            g_table = jnp.einsum("bn,b->n", onehot, g.reshape(-1))
        else:
            # arbitrary trailing dims (e.g. (N, H, d) hop tensors): flatten
            # features for the matmul, reshape back
            feat = int(np.prod(shape[1:]))
            g_table = jnp.einsum(
                "bn,bf->nf", onehot, g.reshape(-1, feat)
            ).reshape(shape)
        return (g_table.astype(dtype_name),
                np.zeros(ids.shape, dtype=jax.dtypes.float0))

    lookup.defvjp(fwd, bwd)
    return lookup


def _mxu_lookup(table, ids):
    return _mxu_lookup_for(tuple(table.shape), str(table.dtype))(table, ids)


# cap on the materialized (B, N) one-hot: past this the backward's scratch
# memory outweighs the scatter win (e.g. B=131072 x N=8192 would be 4.3 GB)
MXU_LOOKUP_MAX_ONEHOT_BYTES = 1 << 29  # 512 MB


# the compact (sort + segment-sum) backward is OPT-IN: measured on the
# SASRec production shape (102k lookups into a 20k-row table, dup ~5x) the
# two 100k-element argsorts cost MORE than the scatter rows they save
# (2.39 s/epoch vs 2.04 s; tools/prof_sasrec_ablation.py follow-up) — the
# native gather-VJP scatter does not run at the isolated 83 ns/row floor in
# this fused context. Set a finite threshold to enable where a workload
# proves it pays.
COMPACT_LOOKUP_MIN_DUP = None  # None = disabled (opt-in)


@functools.lru_cache(maxsize=None)
def _compact_lookup_for(shape, dtype_name):
    """custom_vjp lookup whose backward scatters AT MOST n_rows indices.

    XLA's native gather-VJP scatter costs ~83 ns per INDEX on v5e regardless
    of duplicates (r4 measurement). When a batch looks up far more ids than
    the table has rows (SASRec: 3 x B x T = 307k lookups into a 20k-row item
    table), almost every scatter index is a duplicate. This backward sorts
    the flat ids once, segment-sums duplicate cotangents, and scatter-adds
    only the <= n_rows unique rows — EXACT (capacity = table height can
    never overflow), identical to the native gradient up to float
    reassociation. MEASURED NEGATIVE on its target shape (see
    COMPACT_LOOKUP_MIN_DUP): kept as a tested opt-in for workloads with far
    higher duplication.
    """
    n_rows = shape[0]
    feat = int(np.prod(shape[1:])) if len(shape) > 1 else 1

    @jax.custom_vjp
    def lookup(table, ids):
        return table[ids]

    def fwd(table, ids):
        return table[ids], ids

    def bwd(ids, g):
        flat_ids = ids.reshape(-1)
        gf = g.reshape(-1, feat)
        order = jnp.argsort(flat_ids)
        ids_s = flat_ids[order]
        g_s = gf[order]
        first = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
        segid = jnp.cumsum(first) - 1  # 0..n_unique-1
        summed = jax.ops.segment_sum(g_s, segid, num_segments=n_rows)
        # row index of each segment; empty segments get an out-of-range
        # marker so their (zero) rows drop in the scatter
        seg_rows = jnp.full((n_rows,), n_rows, ids_s.dtype).at[segid].set(
            ids_s, mode="drop"
        )
        g_table = (
            jnp.zeros((n_rows, feat), summed.dtype)
            .at[seg_rows]
            .add(summed, mode="drop")
        )
        g_table = g_table[:, 0] if len(shape) == 1 else g_table.reshape(shape)
        return (g_table.astype(dtype_name),
                np.zeros(ids.shape, dtype=jax.dtypes.float0))

    lookup.defvjp(fwd, bwd)
    return lookup


def table_lookup(table, ids, max_mxu_rows=MXU_LOOKUP_MAX_ROWS):
    """``table[ids]`` with a backward that dodges the v5e scatter floor.

    Three regimes (identical forward values; gradients agree up to float
    reassociation):
      - small tables: one-hot-matmul VJP (scatter-free; module docstring);
      - tall tables looked up >= COMPACT_LOOKUP_MIN_DUP x their height:
        compact sort/segment-sum VJP (scatter <= n_rows indices — exact);
      - otherwise: the native gather/scatter pair.
    """
    n_ids = 1
    for d in ids.shape:
        n_ids *= int(d)
    onehot_bytes = n_ids * int(table.shape[0]) * 4
    if table.shape[0] <= max_mxu_rows and onehot_bytes <= MXU_LOOKUP_MAX_ONEHOT_BYTES:
        return _mxu_lookup(table, ids)
    if (COMPACT_LOOKUP_MIN_DUP is not None
            and n_ids >= COMPACT_LOOKUP_MIN_DUP * int(table.shape[0])):
        return _compact_lookup_for(tuple(table.shape), str(table.dtype))(table, ids)
    return table[ids]


@functools.lru_cache(maxsize=None)
def _grouped_lookup_for(shapes, dtype_names):
    """Grouped custom_vjp lookup: several tables OF THE SAME HEIGHT gathered
    with the SAME ids share ONE one-hot matmul in the backward (cotangents
    concatenate along features). Measured perf-neutral vs per-table
    _mxu_lookup on the ml-100k shapes (XLA already CSEs/fuses the shared
    one-hot); kept because it halves the backward op count for multi-table
    models (MF emb+bias, NCF mlp+gmf) — fewer ops to schedule, same math."""
    n_rows = shapes[0][0]
    widths = [1 if len(s) == 1 else int(np.prod(s[1:])) for s in shapes]
    offsets = np.concatenate([[0], np.cumsum(widths)])

    @jax.custom_vjp
    def lookup(tables, ids):
        return tuple(t[ids] for t in tables)

    def fwd(tables, ids):
        return lookup(tables, ids), ids

    def bwd(ids, gs):
        flat_ids = ids.reshape(-1)
        onehot = jax.nn.one_hot(flat_ids, n_rows, dtype=jnp.float32)
        gcat = jnp.concatenate(
            [g.reshape(len(flat_ids), w) for g, w in zip(gs, widths)], axis=1
        )
        gt = jnp.einsum("bn,bf->nf", onehot, gcat)  # (N, sum_w): ONE matmul
        grads = []
        for shape, dtype_name, w, off in zip(shapes, dtype_names, widths, offsets):
            piece = gt[:, off : off + w]
            piece = piece[:, 0] if len(shape) == 1 else piece.reshape(shape)
            grads.append(piece.astype(dtype_name))
        return (tuple(grads), np.zeros(ids.shape, dtype=jax.dtypes.float0))

    lookup.defvjp(fwd, bwd)
    return lookup


def grouped_table_lookup(tables, ids, max_mxu_rows=MXU_LOOKUP_MAX_ROWS):
    """Gather the same ``ids`` from several same-height tables with one shared
    scatter-free backward. Falls back to independent native gathers when the
    tables are tall or the one-hot would blow the scratch cap."""
    tables = tuple(tables)
    n_rows = tables[0].shape[0]
    assert all(t.shape[0] == n_rows for t in tables), "heights must match"
    n_ids = 1
    for d in ids.shape:
        n_ids *= int(d)
    if (n_rows <= max_mxu_rows
            and n_ids * n_rows * 4 <= MXU_LOOKUP_MAX_ONEHOT_BYTES):
        fn = _grouped_lookup_for(
            tuple(tuple(t.shape) for t in tables),
            tuple(str(t.dtype) for t in tables),
        )
        return fn(tables, ids)
    return tuple(t[ids] for t in tables)
