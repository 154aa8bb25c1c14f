"""Pallas ring all-gather over ICI: the RDMA response leg of the sharded
embedding exchange.

The collective (shard_map + psum) versions of the sharded-table lookup
(parallel/embedding.py) move every batch row through an all-reduce, which
doubles bytes on the wire (reduce + broadcast legs) and adds the additive
reduction even though each output row has exactly one producer. This kernel
replaces the response leg with a bandwidth-optimal ring all-gather written
directly against the inter-chip interconnect: each model shard contributes its
(capacity, d) bucket of gathered embedding rows, and after n-1 ring steps every
shard holds all n buckets, each byte crossing each ICI link exactly once.

Pattern follows the ring-collective recipe in the Pallas TPU guide: a
2-slot communication buffer, per-step `make_async_remote_copy` to the right
neighbor, and a neighbor barrier before the first remote write so no shard
scribbles into a peer that has not yet entered the kernel.

Reference analogue: none — the reference is single-device (SURVEY §2.8);
this is the "row-sharded embedding + all-to-all exchange" north star
(BASELINE.json) built TPU-natively.

Autodiff: the transpose of all-gather is a reduce-scatter; the custom VJP
runs it as `psum` + slice (XLA collective) — the forward is the hot,
latency-critical leg in serving and training lookups.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams()


def _ring_allgather_kernel(x_ref, out_ref, comm_ref, send_sem, recv_sem, ack_sem, *, axis):
    num_dev = jax.lax.axis_size(axis)  # static: mesh shape
    my_id = jax.lax.axis_index(axis)
    right = jax.lax.rem(my_id + 1, num_dev)
    left = jax.lax.rem(my_id - 1 + num_dev, num_dev)

    # Neighbor addressing MUST be mesh-relative ({axis: idx} + MESH type):
    # a bare LOGICAL id is the flattened global device number, so on any mesh
    # with a second axis (e.g. ("data", "model")) it addresses device 0/1 of
    # the whole mesh instead of the ring neighbor inside this group —
    # every data row's ring then RDMAs into data row 0 and deadlocks
    # (round-3 bug: dryrun hung on a (4, 2) mesh while (1, 8) passed).
    # Neighbor barrier: don't RDMA into a peer before it enters the kernel.
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(
        barrier, inc=1, device_id={axis: left},
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    pltpu.semaphore_signal(
        barrier, inc=1, device_id={axis: right},
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    pltpu.semaphore_wait(barrier, 2)

    out_ref[my_id] = x_ref[:]
    comm_ref[0] = x_ref[:]

    n_steps = num_dev - 1
    for i in range(n_steps):
        send_slot = i % 2
        recv_slot = (i + 1) % 2
        # Slot-reuse handshake. My step-i RDMA overwrites right's
        # comm[recv_slot], which right still reads at its step i-1 (the
        # forwarding send out of that slot) and copied to out at step i-2 —
        # so wait for right's ACK that its step i-1 send completed. Without
        # it, a sender one step ahead races the slow consumer (both the
        # out-copy read and the in-flight forwarding send were caught by the
        # interpret-mode race detector).
        if i >= 1:
            pltpu.semaphore_wait(ack_sem, 1)
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[send_slot],
            dst_ref=comm_ref.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id={axis: right},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rdma.start()
        rdma.wait()
        # Send from comm[send_slot] is complete (and its content was copied
        # to out last step): the slot is reusable — ACK the left neighbor.
        pltpu.semaphore_signal(
            ack_sem, inc=1, device_id={axis: left},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        # After step i we hold the block originated by (my_id - i - 1) % n.
        src_dev = jax.lax.rem(my_id - i - 1 + num_dev, num_dev)
        out_ref[src_dev] = comm_ref[recv_slot]
    # Drain the final unconsumed ACK so the scratch semaphore is zero on exit.
    pltpu.semaphore_wait(ack_sem, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def ring_allgather(x, axis, collective_id=1):
    """All-gather (C, d) blocks over mesh axis `axis` via ring RDMA.

    Must be called inside shard_map. Returns (n_axis, C, d); block i is the
    contribution of shard i. Equivalent to (but cheaper than)
    `jax.lax.all_gather(x, axis)`.
    """
    return _ring_allgather_fwd(x, axis, collective_id)[0]


def _ring_allgather_call(x, axis, collective_id):
    n = jax.lax.axis_size(axis)
    c, d = x.shape
    return pl.pallas_call(
        functools.partial(_ring_allgather_kernel, axis=axis),
        out_shape=jax.ShapeDtypeStruct((n, c, d), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, c, d), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=_interpret(),
    )(x)


def _ring_allgather_fwd(x, axis, collective_id):
    n = jax.lax.axis_size(axis)
    if n == 1:
        return x[None], None
    return _ring_allgather_call(x, axis, collective_id), None


def _ring_allgather_bwd(axis, collective_id, _, g):
    # Transpose of all-gather = reduce-scatter: psum the (n, C, d) cotangent
    # over the axis, keep my block.
    n = jax.lax.axis_size(axis)
    if n == 1:
        return (g[0],)
    summed = jax.lax.psum(g, axis)
    return (summed[jax.lax.axis_index(axis)],)


ring_allgather.defvjp(_ring_allgather_fwd, _ring_allgather_bwd)
