"""Scatter/gather cost vs #rows and sortedness: alpha + beta*rows split.

Determines whether bigger batches amortize the per-op cost (alpha-dominated)
or cost scales with rows (beta-dominated), and what sorted ids buy.
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

N, D, STEPS = 1_000_000, 64, 50


def bench(name, make_carry, step_fn, xs):
    @jax.jit
    def run(carry, xs):
        def body(c, x):
            return step_fn(c, x), ()
        c, _ = jax.lax.scan(body, carry, xs)
        return c

    c = run(make_carry(), xs)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x[0])), c)
    t0 = time.time()
    c = run(c, xs)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x[0])), c)
    print(f"{name:58s} {(time.time()-t0)/STEPS*1e6:8.0f} us/step")


for B in (2048, 8192, 32768, 131072):
    ids = jax.random.randint(jax.random.key(0), (STEPS, B), 0, N)
    r = jax.random.normal(jax.random.key(1), (B, D)) * 0.01
    bench(
        f"scatter-add B={B:6d} random ids",
        lambda: jax.random.normal(jax.random.key(2), (N, D)),
        lambda t, ids, r=r: t.at[ids].add(r),
        ids,
    )
    ids_s = jnp.sort(ids, axis=1)
    bench(
        f"scatter-add B={B:6d} SORTED ids",
        lambda: jax.random.normal(jax.random.key(2), (N, D)),
        lambda t, ids, r=r: t.at[ids].add(r, indices_are_sorted=True),
        ids_s,
    )
    bench(
        f"gather     B={B:6d} random ids",
        lambda: (jax.random.normal(jax.random.key(3), (N, D)), jnp.zeros((B, D))),
        lambda c, ids: (c[0], c[1] + c[0][ids]),
        ids,
    )
