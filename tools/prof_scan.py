"""Is scatter-add in-place inside lax.scan, or does XLA copy the table?"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

N, D, B, STEPS = 1_000_000, 64, 8192, 245
key = jax.random.key(0)
table = jax.random.normal(key, (N, D))
ids = jax.random.randint(key, (STEPS, B), 0, N)
rows = jax.random.normal(key, (STEPS, B, D))


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"{name:50s} {dt/STEPS*1e6:8.0f} us/step")


@jax.jit
def scan_scatter(table, ids, rows):
    def step(t, x):
        i, r = x
        return t.at[i].add(r), ()
    t, _ = jax.lax.scan(step, table, (ids, rows))
    return t


@jax.jit
def scan_gather_scatter(table, ids, rows):
    def step(t, x):
        i, r = x
        g = t[i]
        return t.at[i].add(r * 0.1 + g * 0.0), ()
    t, _ = jax.lax.scan(step, table, (ids, rows))
    return t


@jax.jit
def scan_3tables(table, ids, rows):
    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)
    def step(carry, x):
        t, m, v = carry
        i, r = x
        from beta_recsys_tpu.core.sparse_optim import sparse_adam_row_update
        t, m, v = sparse_adam_row_update(t, m, v, i, r, 0.01, 1.0)
        return (t, m, v), ()
    (t, m, v), _ = jax.lax.scan(step, (table, m, v), (ids, rows))
    return t


bench("scan scatter-add only", scan_scatter, table, ids, rows)
bench("scan gather+scatter-add", scan_gather_scatter, table, ids, rows)
bench("scan full lazy-adam row_update (t,m,v)", scan_3tables, table, ids, rows)
