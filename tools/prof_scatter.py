"""Scatter-add cost vs row width, inside a scan with real data dependence."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

N, B, STEPS = 1_000_000, 8192, 100
key = jax.random.key(0)
ids = jax.random.randint(key, (STEPS, B), 0, N)


def bench(C, n_scatter):
    table = jax.random.normal(key, (N, C))

    @jax.jit
    def run(table, ids):
        def step(t, i):
            g = t[i]                      # gather depends on carry
            for _ in range(n_scatter):
                t = t.at[i].add(g * 0.001)  # scatter depends on gather
            return t, g.sum()
        t, s = jax.lax.scan(step, table, ids)
        return t, s.sum()

    t, s = run(table, ids)
    jax.block_until_ready(s)
    t0 = time.time()
    t, s = run(table, ids)
    jax.block_until_ready(s)
    dt = (time.time() - t0) / STEPS
    print(f"C={C:4d} x{n_scatter} scatter: {dt*1e6:8.0f} us/step")


for C, ns in [(64, 1), (64, 3), (65, 1), (195, 1), (256, 1), (1, 1), (1, 3)]:
    bench(C, ns)

# and gather-only for reference
table = jax.random.normal(key, (N, 64))
@jax.jit
def g_only(table, ids):
    def step(c, i):
        return c + table[i].sum(), ()
    c, _ = jax.lax.scan(step, 0.0, ids)
    return c
c = g_only(table, ids); jax.block_until_ready(c)
t0 = time.time(); c = g_only(table, ids); jax.block_until_ready(c)
print(f"gather-only C=64:       {(time.time()-t0)/STEPS*1e6:8.0f} us/step")
