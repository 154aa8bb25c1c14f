"""Time the whole-epoch xs-formation pieces at n=2M on the TPU."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.ops.sampling import uniform_negatives

N = 2_000_000
B = 8192
NB = -(-N // B)
PAD = NB * B
users = jax.random.randint(jax.random.key(0), (N,), 0, 1_000_000)


def t(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.time()-t0)/reps*1e3:9.2f} ms", flush=True)


t("jax.random.permutation(2M)", jax.jit(lambda k: jax.random.permutation(k, N)), jax.random.key(1))
perm = jax.random.permutation(jax.random.key(1), N)
t("users[perm] (2M gather)", jax.jit(lambda p: users[p]), perm)
t("uniform_negatives (2M)", jax.jit(lambda k: uniform_negatives(k, (PAD,), 100_000)), jax.random.key(2))
t("split(k, 245)", jax.jit(lambda k: jax.random.split(k, NB)), jax.random.key(3))


# affine pseudo-permutation: order[i] = (a*i + b) mod n, gcd(a, n) == 1
def affine(key, n, pad):
    ka, kb = jax.random.split(key)
    a = jax.random.randint(ka, (), 1, n) * 2 + 1  # odd -> coprime with 2^k; use search-free odd
    b = jax.random.randint(kb, (), 0, n)
    i = jnp.arange(pad, dtype=jnp.uint32)
    return ((a.astype(jnp.uint32) * i + b.astype(jnp.uint32)) % jnp.uint32(n)).astype(jnp.int32)


t("affine pseudo-permutation (2M)", jax.jit(lambda k: affine(k, N, PAD)), jax.random.key(4))

# everything fused, as in the epoch fn
@jax.jit
def form(key):
    k1, k2 = jax.random.split(key)
    order = jax.random.permutation(k1, N)
    order = jnp.concatenate([order, order[: PAD - N]])
    u = users[order].reshape(NB, B)
    neg = uniform_negatives(k2, (PAD,), 100_000).reshape(NB, B)
    return u, neg

t("full xs formation (perm+2 gathers+neg)", form, jax.random.key(5))
