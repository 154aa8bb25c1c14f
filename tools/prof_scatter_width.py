"""Scatter/gather cost vs row width + op count — is packing (table,m,v)
into one wide row a win?

Hypothesis: TPU scatter cost is alpha*rows-dominated (serial per update row),
so ONE scatter of (B, 3d) rows beats THREE scatters of (B, d) rows ~3x, and
packing user [emb|bias] pairs halves op count again.

Timing by VALUE FETCH (block_until_ready does not block on the axon tunnel);
the scan runs STEPS iterations so per-step cost >> the one fetch RTT.
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

N, B, STEPS = 1_000_000, 8192, 50
key = jax.random.key(0)
ids_all = jax.random.randint(key, (STEPS, B), 0, N)


def bench(name, make_carry, step_fn):
    @jax.jit
    def run(carry, ids_all):
        def body(c, ids):
            return step_fn(c, ids), ()
        c, _ = jax.lax.scan(body, carry, ids_all)
        return c

    c = run(make_carry(), ids_all)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x[0])), c)  # fetch
    t0 = time.time()
    c = run(c, ids_all)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x[0])), c)
    print(f"{name:58s} {(time.time()-t0)/STEPS*1e6:8.0f} us/step")


def rows_like(d):
    return jax.random.normal(jax.random.key(1), (B, d)) * 0.01


for d in (64, 128, 192, 256, 384, 768):
    r = rows_like(d)
    bench(
        f"1x scatter-add (B,{d}) into (1M,{d})",
        lambda d=d: jax.random.normal(jax.random.key(2), (N, d)),
        lambda t, ids, r=r: t.at[ids].add(r),
    )

# 3 separate tables of d=64 (current layout: table, m, v)
r64 = rows_like(64)
bench(
    "3x scatter-add (B,64) into 3 tables (current layout)",
    lambda: tuple(jax.random.normal(jax.random.key(i), (N, 64)) for i in range(3)),
    lambda ts, ids: tuple(t.at[ids].add(r64) for t in ts),
)

# packed: one (1M, 192) table, one scatter
r192 = rows_like(192)
bench(
    "1x scatter-add (B,192) into packed (1M,192)",
    lambda: jax.random.normal(jax.random.key(5), (N, 192)),
    lambda t, ids: t.at[ids].add(r192),
)

# gather side
for d in (64, 192):
    bench(
        f"1x gather (B,{d}) from (1M,{d}) (sum to keep live)",
        lambda d=d: (jax.random.normal(jax.random.key(6), (N, d)),
                     jnp.zeros((B, d))),
        lambda c, ids: (c[0], c[1] + c[0][ids]),
    )

# full lazy-Adam step, current layout vs packed
from beta_recsys_tpu.core.sparse_optim import sparse_adam_row_update

bench(
    "lazy-Adam row update, 3-table layout (current)",
    lambda: (jax.random.normal(jax.random.key(7), (N, 64)),
             jnp.zeros((N, 64)), jnp.zeros((N, 64))),
    lambda c, ids: sparse_adam_row_update(c[0], c[1], c[2], ids, r64, 0.01, 3.0),
)


def packed_adam(packed, ids, grad_rows, lr=0.01, b1=0.9, b2=0.999, eps=1e-8, step=3.0):
    """(N, 3, d) packed [table|m|v]: ONE gather + ONE scatter-add."""
    from beta_recsys_tpu.core.sparse_optim import _segment_dedup

    ids, grad_rows = _segment_dedup(ids, grad_rows)
    rows = packed[ids]  # (B, 3, d)
    t_r, m_r, v_r = rows[:, 0], rows[:, 1], rows[:, 2]
    m_new = b1 * m_r + (1 - b1) * grad_rows
    v_new = b2 * v_r + (1 - b2) * grad_rows**2
    m_hat = m_new / (1 - b1**step)
    v_hat = v_new / (1 - b2**step)
    delta = -lr * m_hat / (jnp.sqrt(v_hat) + eps)
    touched = jnp.any(grad_rows != 0, axis=1, keepdims=True)
    upd = jnp.stack(
        [jnp.where(touched, delta, 0.0),
         jnp.where(touched, m_new - m_r, 0.0),
         jnp.where(touched, v_new - v_r, 0.0)], axis=1)
    return packed.at[ids].add(upd)


bench(
    "lazy-Adam row update, packed (N,3,64) layout",
    lambda: jnp.zeros((N, 3, 64)).at[:, 0].set(
        jax.random.normal(jax.random.key(8), (N, 64))),
    lambda p, ids: packed_adam(p, ids, r64),
)
