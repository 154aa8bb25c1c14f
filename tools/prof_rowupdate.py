"""Decompose the in-scan lazy-Adam row-update cost (1M x 64 table, B=8192)."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.core.sparse_optim import _segment_dedup, sparse_adam_row_update

N, B, D, STEPS = 1_000_000, 8192, 64, 100
key = jax.random.key(0)
ids_all = jax.random.randint(key, (STEPS, B), 0, N)
rows_all = jax.random.normal(jax.random.key(1), (STEPS, B, D)) * 0.01


def bench(name, step_fn, carries):
    @jax.jit
    def run(carries, ids_all, rows_all):
        def body(c, x):
            return step_fn(c, *x), ()
        c, _ = jax.lax.scan(body, carries, (ids_all, rows_all))
        return c

    c = run(carries, ids_all, rows_all)
    jax.block_until_ready(c)
    t0 = time.time()
    c = run(c, ids_all, rows_all)
    jax.block_until_ready(c)
    dt = (time.time() - t0) / STEPS
    print(f"{name:42s} {dt*1e6:8.0f} us/step")
    return c


table = jax.random.normal(jax.random.key(2), (N, D))
m = jnp.zeros((N, D))
v = jnp.zeros((N, D))

bench("scatter-add only", lambda t, ids, rows: t.at[ids].add(rows), table)

bench(
    "3x scatter-add (t,m,v) no gathers",
    lambda c, ids, rows: (
        c[0].at[ids].add(rows), c[1].at[ids].add(rows), c[2].at[ids].add(rows)
    ),
    (table, m, v),
)


def momentful(c, ids, rows):
    t, m, v = c
    m_rows = 0.9 * m[ids] + 0.1 * rows
    v_rows = 0.999 * v[ids] + 0.001 * rows**2
    delta = -0.01 * m_rows / (jnp.sqrt(v_rows) + 1e-8)
    return (
        t.at[ids].add(delta),
        m.at[ids].add(m_rows - m[ids]),
        v.at[ids].add(v_rows - v[ids]),
    )


bench("moment gathers + 3 scatters (no dedup)", momentful, (table, m, v))

bench("argsort only (carry table untouched)",
      lambda t, ids, rows: t.at[ids[jnp.argsort(ids)][:1]].add(rows[:1]), table)

bench("segment_dedup + scatter",
      lambda t, ids, rows: t.at[_segment_dedup(ids, rows)[0]].add(_segment_dedup(ids, rows)[1]),
      table)


def full(c, ids, rows):
    t, m, v = c
    return sparse_adam_row_update(t, m, v, ids, rows, 0.01, 2.0)


bench("full sparse_adam_row_update", full, (table, m, v))
