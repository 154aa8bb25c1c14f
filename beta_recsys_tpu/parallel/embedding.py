"""Row-sharded embedding tables with explicit collective lookup (shard_map).

The framework's "model parallelism" (BASELINE.json north star): user/item
embedding tables too large for one chip are row-sharded across the "model"
mesh axis. Two lookup strategies:

1. ``psum_gather`` — ids replicated over "model": each shard gathers the rows
   it owns (others contribute zeros), then one psum over "model" combines.
   Communication: O(B * d) all-reduce. Simple and optimal when B*d is small
   relative to table shards.

2. ``all_to_all_gather`` — ids sharded over "data": each data shard sends its
   ids to every model shard, receives owned rows back. Lower bandwidth when
   tables dwarf activations. (Pallas remote-DMA variant planned; the jax
   collective version here is the correctness baseline.)

The backward pass of both is derived by autodiff: the transpose of
gather+psum is a local scatter-add of the incoming gradient rows — exactly the
sharded embedding-update we want, no parameter all-reduce for table rows.
"""

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .mesh import MODEL_AXIS


def _local_rows(n_rows, axis_size):
    """Rows per shard (tables are padded to a multiple of the axis size)."""
    return -(-n_rows // axis_size)


def pad_table(table, axis_size):
    """Pad a (N, d) table so N divides the model-axis size."""
    n, d = table.shape
    target = _local_rows(n, axis_size) * axis_size
    if target == n:
        return table
    return jnp.concatenate([table, jnp.zeros((target - n, d), table.dtype)], axis=0)


def local_psum_gather(local_table, ids, axis=MODEL_AXIS):
    """Inside-shard_map primitive: complete the rows of global ``ids`` from
    this device's table shard with ONE psum over ``axis``.

    The single implementation behind psum_gather, psum_gather_sharded_batch,
    and the sharded sparse trainer's lookup (core/sparse_optim, VERDICT r3 #9
    consolidation). ``local_table`` is this shard's (rows_per, d) or
    (rows_per,) slice; rows owned elsewhere contribute zeros before the psum.
    """
    shard_idx = jax.lax.axis_index(axis)
    rows_per_shard = local_table.shape[0]
    local_ids = ids - shard_idx * rows_per_shard
    in_range = (local_ids >= 0) & (local_ids < rows_per_shard)
    rows = local_table[jnp.clip(local_ids, 0, rows_per_shard - 1)]
    mask = in_range[..., None] if rows.ndim > in_range.ndim else in_range
    return jax.lax.psum(jnp.where(mask, rows, 0.0), axis)


def bucket_positions(ids, n_model, capacity, rows_per_shard):
    """Owner-bucketed routing table for a batch of global row ids.

    Returns (n_model, capacity) int32 ``positions``: positions[s, c] is the
    batch index whose row model-shard ``s`` must serve in bucket slot ``c``,
    or len(ids) for empty/overflow slots. Shared by every bucketed exchange
    (bucketed_psum_gather, rdma_bucketed_gather, the sharded sparse ring
    lookup) so capacity/overflow semantics cannot drift apart.
    """
    b = ids.shape[0]
    owner = ids // rows_per_shard
    one_hot = jax.nn.one_hot(owner, n_model, dtype=jnp.int32)
    slot = jnp.cumsum(one_hot, axis=0)[jnp.arange(b), owner] - 1
    write_slot = jnp.where(slot < capacity, slot, capacity)
    positions = jnp.full((n_model, capacity), b, jnp.int32)
    return positions.at[owner, write_slot].set(
        jnp.arange(b, dtype=jnp.int32), mode="drop"
    )


def local_ring_gather(local_table, ids, n_model, capacity, collective_id, axis=MODEL_AXIS):
    """Inside-shard_map primitive: bucketed lookup whose response leg is the
    Pallas ring all-gather (ops/pallas/ring_exchange.py).

    Each shard serves only the rows it owns (bucket of ``capacity``), buckets
    ride the ring — each byte crossing each ICI link once — and every shard
    scatters the n_model buckets back to batch positions. Overflow ids yield
    zero rows. The single implementation behind rdma_bucketed_gather and the
    sharded sparse trainer's "ring" lookup.
    """
    from ..ops.pallas.ring_exchange import ring_allgather

    b = ids.shape[0]
    rows_per_shard = local_table.shape[0]
    d = local_table.shape[1]
    positions = bucket_positions(ids, n_model, capacity, rows_per_shard)
    shard_idx = jax.lax.axis_index(axis)
    my_pos = positions[shard_idx]
    req_valid = my_pos < b
    safe_pos = jnp.where(req_valid, my_pos, 0)
    local = ids[safe_pos] - shard_idx * rows_per_shard
    ok = (local >= 0) & (local < rows_per_shard) & req_valid
    rows = local_table[jnp.clip(local, 0, rows_per_shard - 1)]
    rows = jnp.where(ok[:, None], rows, 0.0)  # (capacity, d)

    all_rows = ring_allgather(rows, axis, collective_id)
    flat_pos = positions.reshape(-1)
    flat_rows = all_rows.reshape(n_model * capacity, d)
    # Empty slots carry flat_pos == b -> dropped by out-of-bounds mode.
    return jnp.zeros((b, d), flat_rows.dtype).at[flat_pos].add(
        flat_rows, mode="drop"
    )


def psum_gather(table, ids, mesh):
    """Sharded-table lookup: table row-sharded over "model", ids replicated.

    Args:
        table: (N_padded, d) array sharded P("model", None).
        ids:   (...,) int32 global row ids, replicated over "model".

    Returns:
        (..., d) embeddings, replicated over "model".
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
    )
    def lookup(local_table, ids_rep):
        return local_psum_gather(local_table, ids_rep)

    return lookup(table, ids)


def psum_gather_sharded_batch(table, ids, mesh):
    """Sharded-table lookup with the id batch sharded over "data".

    table: (N_padded, d) sharded P("model", None); ids: (B,) sharded P("data").
    Each (data, model) device looks up its batch shard's hits in its table
    shard; one psum over "model" completes the rows. Communication per device:
    O(B/n_data * d) — n_data times less than the replicated-ids path, the
    right choice once batches are data-parallel.
    """
    from .mesh import DATA_AXIS

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS, None),
    )
    def lookup(local_table, local_ids):
        return local_psum_gather(local_table, local_ids)

    return lookup(table, ids)


def bucketed_psum_gather(table, ids, mesh, capacity_factor=2.0):
    """Bucketed sharded-table lookup: ids sharded over "data", table over "model".

    Each data shard buckets its local ids by owning model shard (fixed
    capacity C = ceil(local_B / n_model) * capacity_factor; overflowing ids
    return zero rows — raise the factor for skewed id distributions). Every
    model shard gathers ONLY its own bucket's rows (C lookups instead of
    local_B as in psum_gather_sharded_batch), scatters them to the requesting
    positions, and one psum over "model" assembles the batch. With ids
    replicated over the model axis (the data-parallel layout here), this is
    the correct specialization of the DLRM all-to-all exchange: the request
    leg is free (ids already everywhere) and only the response leg (the psum)
    moves rows. A Pallas remote-DMA response leg is the planned upgrade.

    Autodiff: the transpose psums cotangents and scatter-adds each shard's
    bucket rows into its local table shard — table gradients stay sharded.
    """
    n_model = mesh.shape[MODEL_AXIS]
    rows_per_shard = table.shape[0] // n_model

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P("data")),
        out_specs=P("data", None),
    )
    def lookup(local_table, local_ids):
        local_b = local_ids.shape[0]
        capacity = max(int(-(-local_b // n_model) * capacity_factor), 1)
        positions = bucket_positions(local_ids, n_model, capacity, rows_per_shard)

        shard_idx = jax.lax.axis_index(MODEL_AXIS)
        my_positions = positions[shard_idx]  # (capacity,)
        req_valid = my_positions < local_b
        safe_pos = jnp.where(req_valid, my_positions, 0)
        req_ids = local_ids[safe_pos]
        local = req_ids - shard_idx * rows_per_shard
        in_range = (local >= 0) & (local < rows_per_shard) & req_valid
        gathered = local_table[jnp.clip(local, 0, rows_per_shard - 1)]
        gathered = jnp.where(in_range[:, None], gathered, 0.0)  # (capacity, d)

        out = jnp.zeros((local_b, table.shape[1]), local_table.dtype)
        out = out.at[safe_pos].add(jnp.where(req_valid[:, None], gathered, 0.0))
        return jax.lax.psum(out, MODEL_AXIS)

    return lookup(table, ids)


def rdma_bucketed_gather(table, ids, mesh, capacity_factor=2.0, collective_id=1):
    """Bucketed sharded-table lookup whose response leg is a Pallas ring
    all-gather over ICI (ops/pallas/ring_exchange.py) instead of a psum.

    Same contract as ``psum_gather``: table (N_padded, d) sharded
    P("model", None), ids (B,) replicated, output (B, d) replicated. Each
    model shard gathers only the rows it owns into a fixed-capacity bucket
    (C = ceil(B / n_model) * capacity_factor, 8-aligned; overflow ids yield
    zero rows), the buckets ride the ring — each byte crossing each ICI link
    once, vs twice for the all-reduce — and every shard scatters the n_model
    buckets back to batch positions locally. Gradients: the ring's VJP
    reduce-scatters cotangent buckets, then local scatter-add into the table
    shard (tables never leave their shard).
    """
    n_model = mesh.shape[MODEL_AXIS]
    b = ids.shape[0]
    capacity = max(int(-(-b // n_model) * capacity_factor), 1)
    capacity = -(-capacity // 8) * 8  # sublane alignment for the ring blocks

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    def lookup(local_table, ids_rep):
        return local_ring_gather(local_table, ids_rep, n_model, capacity, collective_id)

    return lookup(table, ids)
