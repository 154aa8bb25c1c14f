"""Pallas TPU kernels: embedding gather (HBM -> VMEM DMA) with scatter-add VJP.

The hot path of every recommender here is embedding lookup/update
(SURVEY §2.9 "Embedding lookup/update"). XLA's default gather materializes
index arithmetic through HBM-bound dynamic-slices; this kernel instead
scalar-prefetches the id batch (ids available before the kernel body runs)
and issues row-granular async DMAs from the HBM-resident table into the VMEM
output block, double-buffered so row r+1's copy overlaps row r's wait.

The backward pass is a scatter-add of the incoming cotangent rows into a
zero-initialized table gradient — run as a single sequential grid program to
make duplicate-id accumulation race-free (grid programs would race on shared
rows).

On non-TPU backends the kernels run in Pallas interpret mode, so the same code
path is exercised by the CPU test mesh.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


DEFAULT_BLOCK_B = 512


# Row DMAs are small (D*4 bytes) and latency-bound; keeping N_SLOTS copies in
# flight hides HBM latency. 8 slots beats XLA's native gather by ~20% at
# (100k x 128, B=4096) on v5e; 2 slots is ~2x slower than XLA.
N_SLOTS = 8


def _gather_kernel(ids_ref, table_ref, out_ref, scratch, sems):
    """One grid step: DMA BLOCK_B rows of the table into the output block.

    ids_ref: scalar-prefetched (B,) int32 in SMEM; table_ref: (N, D) in ANY/HBM;
    out_ref: (BLOCK_B, D) VMEM block; scratch: (N_SLOTS, 1, D) VMEM ring buffer.
    """
    i = pl.program_id(0)
    block_b = out_ref.shape[0]

    def get_dma(slot, row):
        row_id = ids_ref[i * block_b + row]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row_id, 1), :],
            scratch.at[slot],
            sems.at[slot],
        )

    for s in range(N_SLOTS):
        get_dma(s, s).start()

    def body(row, _):
        slot = row % N_SLOTS
        get_dma(slot, row).wait()
        out_ref[pl.ds(row, 1), :] = scratch[slot]

        @pl.when(row + N_SLOTS < block_b)
        def _():
            get_dma(slot, row + N_SLOTS).start()

        return 0

    jax.lax.fori_loop(0, block_b, body, 0)


def _pad_to(x, multiple):
    n = x.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    return jnp.concatenate([x, jnp.zeros((target - n,), x.dtype)]), n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def embedding_gather(table, ids, block_b=DEFAULT_BLOCK_B):
    """table (N, D) f32, ids (B,) int32 -> (B, D) embeddings via Pallas DMA."""
    return _gather_forward(table, ids, block_b)


def _gather_forward(table, ids, block_b):
    ids_padded, n_real = _pad_to(ids.astype(jnp.int32), block_b)
    B = ids_padded.shape[0]
    D = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block_b, D), lambda i, ids_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, 1, D), jnp.float32),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
        ],
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((B, D), table.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(ids_padded, table)
    return out[:n_real]


def _scatter_add_kernel(ids_ref, grad_ref, out_ref):
    """Sequential scatter-add: out[ids[b]] += grad[b] for all b (race-free)."""
    out_ref[...] = jnp.zeros_like(out_ref)
    B = grad_ref.shape[0]

    def body(b, _):
        row = ids_ref[b]
        out_ref[pl.ds(row, 1), :] = out_ref[pl.ds(row, 1), :] + grad_ref[pl.ds(b, 1), :]
        return 0

    jax.lax.fori_loop(0, B, body, 0)


# The whole-table-in-VMEM scatter kernel only fits tables < ~16MB; above that
# the backward uses XLA's scatter-add (sorted one-pass on TPU, already good).
_SCATTER_VMEM_ROWS_LIMIT = 16 * 1024 * 1024 // (4 * 128)


def embedding_scatter_add(n_rows, ids, grads):
    """Accumulate grad rows into a zero (n_rows, D) table: the gather transpose."""
    D = grads.shape[1]
    if n_rows * D * 4 > 12 * 1024 * 1024:  # leave headroom under the 16MB VMEM
        return jnp.zeros((n_rows, D), grads.dtype).at[ids].add(grads)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _scatter_add_kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, D), grads.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(ids.astype(jnp.int32), grads)


def _gather_fwd(table, ids, block_b):
    return _gather_forward(table, ids, block_b), (table.shape[0], ids)


def _gather_bwd(block_b, residuals, g):
    n_rows, ids = residuals
    dtable = embedding_scatter_add(n_rows, ids, g)
    return dtable, None


embedding_gather.defvjp(_gather_fwd, _gather_bwd)
