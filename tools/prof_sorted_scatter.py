"""Does indices_are_sorted=True remove the TPU scatter's internal sort?
Value-fetch timing with scan-length slopes (block_until_ready lies here)."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

N, B, D = 1_000_000, 16384, 64
k1, k2 = jax.random.split(jax.random.key(0))
ids_a = jax.random.randint(k1, (60, B), 0, N)
ids_sorted = jnp.sort(ids_a, axis=1)
rows = 0.001 * jax.random.normal(k2, (60, B, D))
table = jax.random.normal(jax.random.key(3), (N, D))


def slope(name, step_fn, xs_ids):
    def chain(steps):
        @jax.jit
        def fn(t, ids, rows):
            def body(c, x):
                return step_fn(c, *x), ()
            c, _ = jax.lax.scan(body, t, (ids[:steps], rows[:steps]))
            return c[0, 0]
        return fn

    f_small, f_big = chain(10), chain(60)
    float(f_small(table, xs_ids, rows)); float(f_big(table, xs_ids, rows))
    def tmin(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.time(); float(f(table, xs_ids, rows)); ts.append(time.time() - t0)
        return min(ts)
    per = (tmin(f_big) - tmin(f_small)) / 50
    print(f"{name:58s} {per*1e6:8.0f} us/step", flush=True)


slope("scatter-add random ids", lambda t, i, r: t.at[i].add(r), ids_a)
slope("scatter-add sorted ids (no flag)", lambda t, i, r: t.at[i].add(r), ids_sorted)
slope(
    "scatter-add sorted ids + indices_are_sorted",
    lambda t, i, r: t.at[i].add(r, indices_are_sorted=True),
    ids_sorted,
)
slope(
    "scatter-add sorted + sorted&unique flags",
    lambda t, i, r: t.at[i].add(r, indices_are_sorted=True, unique_indices=True),
    ids_sorted,
)
slope("gather random ids (t[i] summed in)", lambda t, i, r: t.at[i].add(t[i] * -1e-4), ids_a)
slope(
    "gather+scatter sorted + flags",
    lambda t, i, r: t.at[i].add(
        t.at[i].get(indices_are_sorted=True) * -1e-4, indices_are_sorted=True
    ),
    ids_sorted,
)

from beta_recsys_tpu.core.sparse_optim import sparse_adam_row_update

m = jnp.zeros((N, D))
v = jnp.zeros((N, D))


def slope3(name, step_fn):
    def chain(steps):
        @jax.jit
        def fn(c, ids, rows):
            def body(c, x):
                return step_fn(c, *x), ()
            c, _ = jax.lax.scan(body, c, (ids[:steps], rows[:steps]))
            return c[0][0, 0]
        return fn

    f_small, f_big = chain(10), chain(60)
    c0 = (table, m, v)
    float(f_small(c0, ids_a, rows)); float(f_big(c0, ids_a, rows))
    def tmin(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.time(); float(f(c0, ids_a, rows)); ts.append(time.time() - t0)
        return min(ts)
    per = (tmin(f_big) - tmin(f_small)) / 50
    print(f"{name:58s} {per*1e6:8.0f} us/step", flush=True)


slope3(
    "full sparse_adam_row_update (current)",
    lambda c, i, r: sparse_adam_row_update(c[0], c[1], c[2], i, r, 0.01, 2.0),
)
