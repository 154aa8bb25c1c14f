"""Bisect the in-scan batch-formation cost: rng splits, id gathers, neg sampling."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.ops.sampling import uniform_negatives

N_INTER, B, STEPS = 2_000_000, 8192, 245
rng = np.random.default_rng(0)
users = jnp.asarray(rng.integers(0, 1_000_000, N_INTER).astype(np.int32))
items = jnp.asarray(rng.integers(0, 100_000, N_INTER).astype(np.int32))
order = jnp.asarray(rng.integers(0, N_INTER, (STEPS, B)).astype(np.int32))


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.time()-t0)/STEPS*1e6:9.0f} us/step")


@jax.jit
def splits_only(key, order):
    def step(key, batch_order):
        key, k1, k2 = jax.random.split(key, 3)
        return key, jax.random.fold_in(k1, 0)[None]
    return jax.lax.scan(step, key, order)


@jax.jit
def gathers_only(key, order):
    def step(c, batch_order):
        u = users[batch_order]
        pos = items[batch_order]
        return c, u.sum() + pos.sum()
    return jax.lax.scan(step, 0, order)


@jax.jit
def neg_only(key, order):
    def step(key, batch_order):
        key, k_neg = jax.random.split(key)
        neg = uniform_negatives(k_neg, (B,), 100_000)
        return key, neg.sum()
    return jax.lax.scan(step, key, order)


@jax.jit
def all3(key, order):
    def step(key, batch_order):
        key, k_neg, k_loss = jax.random.split(key, 3)
        u = users[batch_order]
        pos = items[batch_order]
        neg = uniform_negatives(k_neg, (B,), 100_000)
        return key, u.sum() + pos.sum() + neg.sum()
    return jax.lax.scan(step, key, order)


key = jax.random.key(0)
bench("rng splits only", splits_only, key, order)
bench("id gathers only", gathers_only, key, order)
bench("neg sampling only", neg_only, key, order)
bench("all three", all3, key, order)

# permutation once (epoch-level, amortized)
@jax.jit
def perm_only(key):
    return jax.random.permutation(key, N_INTER)
out = perm_only(key); jax.block_until_ready(out)
t0 = time.time(); out = perm_only(key); jax.block_until_ready(out)
print(f"{'epoch permutation (once)':40s} {(time.time()-t0)*1e6:9.0f} us total")
