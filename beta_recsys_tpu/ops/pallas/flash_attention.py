"""Pallas TPU fused causal attention (flash-style) for sequence recommenders.

The reference computes attention via torch.nn.MultiheadAttention
(beta_rec/models/sasrec.py:60-66,106-112), which materializes the full
(B, H, T, T) probability tensor in device memory. At SASRec scale
(B=128, T=200, H=2) that is ~40 MB of HBM traffic per block per direction.
This kernel fuses logits -> causal mask -> softmax -> [dropout] -> @V into a
single VMEM-resident pass per (batch, head) program, so the (T, T) matrix
never touches HBM, and ships a custom VJP whose backward kernel recomputes the
probabilities from the saved log-sum-exp (classic flash-attention recompute)
instead of storing them.

Design notes (TPU):
- Grid is (B*H,): one program owns one head of one sequence. T<=~1k and
  dh<=128 keep q/k/v plus one (T, T) f32 scratch well under the 16 MB VMEM
  budget (T=256: ~0.3 MB), so no inner K-blocking is needed at recommender
  sequence lengths (SURVEY §5: no long-context in this domain).
- Attention-probability dropout runs *inside* the kernel with the Mosaic
  PRNG (`pltpu.prng_random_bits`), seeded per program as seed + program_id;
  the backward kernel reseeds identically and regenerates the same mask, so
  nothing but (out, lse) is saved between passes.
- The Mosaic PRNG is stubbed (all-zero bits) in interpret mode, so the
  dropout path is TPU-only; callers fall back to the einsum implementation
  for dropout on CPU (see ops.attention.causal_mha).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret():
    if jax.default_backend() == "tpu":
        return False
    # Mosaic interpret mode emulates SMEM/semaphore semantics on CPU.
    return pltpu.InterpretParams()


def _causal_mask(T):
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    return col <= row


def _dropout_keep(shape, rate):
    """Regenerable keep-mask from the already-seeded Mosaic PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * float(2**32)), 2**32 - 1))
    return bits >= threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, out_ref, lse_ref, *, rate):
    T, dh = q_ref.shape[1], q_ref.shape[2]
    if rate > 0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (1.0 / (dh**0.5))
    scores = jnp.where(_causal_mask(T), scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    lse_ref[0] = m + jnp.log(s)  # (T, 1) column
    probs = e / s
    if rate > 0:
        keep = _dropout_keep(probs.shape, rate)
        probs = jnp.where(keep, probs * (1.0 / (1.0 - rate)), 0.0)
    out_ref[0] = jnp.dot(
        probs, v_ref[0].astype(jnp.float32), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, lse_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, rate
):
    T, dh = q_ref.shape[1], q_ref.shape[2]
    if rate > 0:
        # Identical seeding to the forward program regenerates the same mask.
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    scale = 1.0 / (dh**0.5)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(_causal_mask(T), scores, NEG_INF)
    probs = jnp.exp(scores - lse_ref[0])  # exact softmax via saved (T, 1) lse

    if rate > 0:
        keep = _dropout_keep(probs.shape, rate)
        inv = 1.0 / (1.0 - rate)
        probs_kept = jnp.where(keep, probs * inv, 0.0)
    else:
        keep, inv, probs_kept = None, 1.0, probs

    # out = probs_kept @ v
    dv_ref[0] = jax.lax.dot_general(
        probs_kept, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if rate > 0:
        dp = jnp.where(keep, dp * inv, 0.0)
    # Softmax backward: dS = P * (dP - rowsum(dP * P))
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq_ref[0] = (
        jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)
    dk_ref[0] = (
        jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
    ).astype(dk_ref.dtype)


def _per_program_specs(n, T, dh):
    spec = pl.BlockSpec((1, T, dh), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    return spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_causal_attention(q, k, v, seed, dropout_rate=0.0):
    """softmax(QK^T/sqrt(dh) + causal) [dropout] @ V, fused on TPU.

    q, k, v: (N, T, dh) with N = batch*heads flattened. `seed` is a (1,)
    int32 array (may be traced, e.g. drawn from the step PRNG key);
    `dropout_rate` is static. The same (seed, rate) pair yields the same
    dropout mask in forward and backward, so no mask is materialized.
    """
    out, _ = _flash_fwd(q, k, v, seed, dropout_rate)
    return out


def _flash_call(q, k, v, rate, seed):
    N, T, dh = q.shape
    spec = _per_program_specs(N, T, dh)
    # (N, T, 1) keeps the per-program lse block equal to the array's
    # trailing dims (Mosaic tiling requirement for unaligned T).
    lse_spec = pl.BlockSpec((1, T, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, lse_spec],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, T, dh), q.dtype),
            jax.ShapeDtypeStruct((N, T, 1), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * T * T * dh, bytes_accessed=4 * N * T * dh * 4,
            transcendentals=N * T * T,
        ),
    )(seed.astype(jnp.int32), q, k, v)
    return out, lse


def _flash_fwd(q, k, v, seed, rate):
    out, lse = _flash_call(q, k, v, rate, seed)
    return out, (q, k, v, seed, lse)


def _flash_bwd(rate, res, do):
    import numpy as np

    q, k, v, seed, lse = res
    N, T, dh = q.shape
    spec = _per_program_specs(N, T, dh)
    lse_spec = pl.BlockSpec((1, T, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[spec, spec, spec, lse_spec, spec],
        out_specs=[spec, spec, spec],
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, T, dh), q.dtype)] * 3,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=11 * N * T * T * dh, bytes_accessed=7 * N * T * dh * 4,
            transcendentals=N * T * T,
        ),
    )(seed.astype(jnp.int32), q, k, v, lse, do)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


flash_causal_attention.defvjp(_flash_fwd, _flash_bwd)
