"""Does TPU scatter-add cost scale with table size? Do sorted/unique flags help?"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

B, D = 8192, 64
key = jax.random.key(0)


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:55s} {(time.time()-t0)/iters*1e6:9.0f} us")


for N in [100_000, 1_000_000, 4_000_000]:
    table = jax.random.normal(key, (N, D))
    ids = jax.random.randint(key, (B,), 0, N)
    ids_sorted = jnp.sort(ids)
    rows = jax.random.normal(key, (B, D))

    plain = jax.jit(lambda t, i, r: t.at[i].add(r))
    sorted_f = jax.jit(lambda t, i, r: t.at[i].add(r, indices_are_sorted=True))
    uniq = jax.jit(lambda t, i, r: t.at[i].add(r, indices_are_sorted=True, unique_indices=True))
    donated = jax.jit(lambda t, i, r: t.at[i].add(r), donate_argnums=0)

    bench(f"N={N:8d} scatter-add plain", plain, table, ids, rows)
    bench(f"N={N:8d} scatter-add sorted", sorted_f, table, ids_sorted, rows)
    bench(f"N={N:8d} scatter-add sorted+unique", uniq, table, ids_sorted, rows)
    t2 = jnp.array(table)
    bench(f"N={N:8d} scatter-add plain donated", donated, t2, ids, rows)
    # gather for reference
    g = jax.jit(lambda t, i: t[i].sum())
    bench(f"N={N:8d} gather", g, table, ids)
