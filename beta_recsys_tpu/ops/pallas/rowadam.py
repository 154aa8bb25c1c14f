"""Pallas TPU kernel: fused lazy-Adam row update (gather + moments + scatter).

Why this kernel exists (round-3 profiling, real v5e via value-fetch timing —
block_until_ready does not block on this tunnel):

  one XLA scatter-add of 16,384 x 64 rows into a 1M x 64 table costs ~1.2 ms
  (~60x off the 648 GB/s HBM roofline), regardless of indices_are_sorted /
  unique_indices. The lazy-Adam row update does THREE of those (table, m, v)
  plus two moment gathers per table — ~4.1 ms per table per step, the entire
  cost of the production sparse trainer (core/sparse_optim.py).

This kernel replaces gathers + elementwise + 3 scatters with one pass of
row-granular DMAs: for each batch row, read (table, m, v, grad) rows
HBM->VMEM (N_SLOTS-deep pipelined, same recipe as embedding_lookup.py),
compute the Adam update on the VPU, and DMA the three updated rows back,
write-pipelined with a per-slot in-flight handshake. Traffic:
B * 7 rows * d * 4B (~50 MB at B=16k, d=128) ≈ 80 us of HBM time, vs ~4 ms
for the XLA op sequence.

Mosaic constraint: HBM row slices need a 128-aligned minor dimension, so
``d % 128 == 0`` is required — callers pad tables (zero pad columns stay
zero through Adam: zero grads give zero deltas). core.sparse_optim pads and
unpads around the epoch scan.

Contract (matches core.sparse_optim.sparse_adam_row_update semantics):
- ``ids`` are sorted and deduplicated in the segment sense: duplicate
  occurrences carry all-zero grad rows (sparse_optim._segment_dedup output).
- all-zero grad rows are skipped entirely (no moment decay, no write) —
  exactly the `touched` mask of the XLA path. This also makes the kernel
  race-free: only the first occurrence of an id ever writes.
- bias correction factors are precomputed by the caller:
  bc = [1/(1-b1^step), 1/(1-b2^step)].

Reference analogue: torch.optim.Adam on nn.Embedding (dense, full-table);
SURVEY §2.9 "Embedding lookup/update" names this the north-star kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


N_SLOTS = 8


def _rowadam_kernel(
    ids_ref, bc_ref, table_ref, m_ref, v_ref, g_ref,
    out_t, out_m, out_v,
    rt, rm, rv, rg, wt, wm, wv, flags, read_sems, write_sems,
    *, lr, b1, b2, eps, n_rows,
):
    bc1 = bc_ref[0]
    bc2 = bc_ref[1]

    def read_dmas(slot, r):
        row_id = ids_ref[r]
        return (
            pltpu.make_async_copy(
                table_ref.at[pl.ds(row_id, 1), :], rt.at[slot], read_sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                m_ref.at[pl.ds(row_id, 1), :], rm.at[slot], read_sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                v_ref.at[pl.ds(row_id, 1), :], rv.at[slot], read_sems.at[slot, 2]
            ),
            pltpu.make_async_copy(
                g_ref.at[pl.ds(r, 1), :], rg.at[slot], read_sems.at[slot, 3]
            ),
        )

    def start_reads(slot, r):
        for dma in read_dmas(slot, r):
            dma.start()

    for s in range(min(N_SLOTS, n_rows)):
        start_reads(s, s)
        flags[s] = 0

    def body(r, _):
        slot = r % N_SLOTS

        # reclaim the write scratch: row r-N_SLOTS's writebacks must land
        @pl.when(flags[slot] == 1)
        def _():
            pltpu.make_async_copy(wt.at[slot], wt.at[slot], write_sems.at[slot, 0]).wait()
            pltpu.make_async_copy(wm.at[slot], wm.at[slot], write_sems.at[slot, 1]).wait()
            pltpu.make_async_copy(wv.at[slot], wv.at[slot], write_sems.at[slot, 2]).wait()

        # wait for this row's reads
        for dma in read_dmas(slot, r):
            dma.wait()

        row_id = ids_ref[r]
        g = rg[slot]
        touched = jnp.any(g != 0.0)

        m_new = b1 * rm[slot] + (1.0 - b1) * g
        v_new = b2 * rv[slot] + (1.0 - b2) * g * g
        delta = -lr * (m_new * bc1) / (jnp.sqrt(v_new * bc2) + eps)
        t_new = rt[slot] + delta

        # pipeline: next row's reads can start now (read scratch consumed)
        @pl.when(r + N_SLOTS < n_rows)
        def _():
            start_reads(slot, r + N_SLOTS)

        @pl.when(touched)
        def _():
            wt[slot] = t_new
            wm[slot] = m_new
            wv[slot] = v_new
            pltpu.make_async_copy(
                wt.at[slot], out_t.at[pl.ds(row_id, 1), :], write_sems.at[slot, 0]
            ).start()
            pltpu.make_async_copy(
                wm.at[slot], out_m.at[pl.ds(row_id, 1), :], write_sems.at[slot, 1]
            ).start()
            pltpu.make_async_copy(
                wv.at[slot], out_v.at[pl.ds(row_id, 1), :], write_sems.at[slot, 2]
            ).start()
            flags[slot] = 1

        @pl.when(jnp.logical_not(touched))
        def _():
            flags[slot] = 0

        return 0

    jax.lax.fori_loop(0, n_rows, body, 0)

    # drain outstanding writebacks
    for s in range(min(N_SLOTS, n_rows)):
        @pl.when(flags[s] == 1)
        def _():
            pltpu.make_async_copy(wt.at[s], wt.at[s], write_sems.at[s, 0]).wait()
            pltpu.make_async_copy(wm.at[s], wm.at[s], write_sems.at[s, 1]).wait()
            pltpu.make_async_copy(wv.at[s], wv.at[s], write_sems.at[s, 2]).wait()


def fused_rowadam(table, m, v, ids, grads, bc, lr, b1=0.9, b2=0.999, eps=1e-8):
    """In-place lazy-Adam update of ``ids`` rows of (table, m, v).

    Args:
        table, m, v: (N, d) f32, d % 128 == 0 — updated IN PLACE (buffers are
            donated via input_output_aliases; callers must treat the inputs
            as consumed).
        ids: (B,) int32, sorted; duplicates carry zero grad rows.
        grads: (B, d) f32 summed-per-unique-id gradient rows.
        bc: (2,) f32 = [1/(1-b1^step), 1/(1-b2^step)].
        lr/b1/b2/eps: python floats (static).

    Returns (table, m, v) updated.
    """
    n_rows = ids.shape[0]
    d = table.shape[1]
    if d % 128 != 0 and not _interpret():
        raise ValueError(
            f"fused_rowadam needs a 128-aligned row width on TPU, got d={d}; "
            "pad the table (core.sparse_optim does this automatically)"
        )
    kernel = functools.partial(
        _rowadam_kernel, lr=float(lr), b1=float(b1), b2=float(b2),
        eps=float(eps), n_rows=n_rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ids, bc
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # table
            pl.BlockSpec(memory_space=pl.ANY),  # m
            pl.BlockSpec(memory_space=pl.ANY),  # v
            pl.BlockSpec(memory_space=pl.ANY),  # grads
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, 1, d), jnp.float32),  # rt
            pltpu.VMEM((N_SLOTS, 1, d), jnp.float32),  # rm
            pltpu.VMEM((N_SLOTS, 1, d), jnp.float32),  # rv
            pltpu.VMEM((N_SLOTS, 1, d), jnp.float32),  # rg
            pltpu.VMEM((N_SLOTS, 1, d), jnp.float32),  # wt
            pltpu.VMEM((N_SLOTS, 1, d), jnp.float32),  # wm
            pltpu.VMEM((N_SLOTS, 1, d), jnp.float32),  # wv
            pltpu.SMEM((N_SLOTS,), jnp.int32),         # flags
            pltpu.SemaphoreType.DMA((N_SLOTS, 4)),     # read sems
            pltpu.SemaphoreType.DMA((N_SLOTS, 3)),     # write sems
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(table.shape, table.dtype),
            jax.ShapeDtypeStruct(m.shape, m.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid_spec=grid_spec,
        input_output_aliases={2: 0, 3: 1, 4: 2},  # table/m/v in-place
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(ids.astype(jnp.int32), bc.astype(jnp.float32), table, m, v, grads)
