"""Calibrate: known-traffic scan steps vs measured time; device info."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

d = jax.devices()[0]
print("device:", d.platform, getattr(d, "device_kind", "?"), flush=True)

N, B, D, STEPS = 1_000_000, 8192, 64, 100
key = jax.random.key(0)
ids_all = jax.random.randint(key, (STEPS, B), 0, N)
big = jax.random.normal(jax.random.key(1), (N, D))  # 256MB


def bench(name, run, *args):
    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = run(*args)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"{name:52s} {dt*1e3:9.2f} ms total  {dt/STEPS*1e6:8.1f} us/step", flush=True)


# A: elementwise over the full 256MB table each step (forced by carry chain)
@jax.jit
def full_elementwise(t):
    def body(c, _):
        return c * 1.0000001, ()
    c, _ = jax.lax.scan(body, t, jnp.arange(STEPS))
    return c

bench("A: full-table elementwise (512MB/step)", full_elementwise, big)


# B: gather 8192 rows, sum into a (D,) carry (real 2MB read/step)
@jax.jit
def gather_sum(t, ids_all):
    def body(c, ids):
        return c + t[ids].sum(0), ()
    c, _ = jax.lax.scan(body, jnp.zeros((D,)), ids_all)
    return c

bench("B: gather 8192 rows + reduce (2MB/step)", gather_sum, big, ids_all)


# C: gather + scatter-add on carried table (6MB/step r/w)
@jax.jit
def gather_scatter(t, ids_all):
    def body(c, ids):
        return c.at[ids].add(c[ids] * -0.001), ()
    c, _ = jax.lax.scan(body, t, ids_all)
    return c

bench("C: gather+scatter 8192 rows (6MB/step)", gather_scatter, big, ids_all)

# D: verify C actually changed values (work not elided)
out = gather_scatter(big, ids_all)
print("D: table changed?", bool(jnp.any(out != big)), flush=True)

# E: matmul calibration: 100 x (8192x1024 @ 1024x1024) = 1.7 TFLOP total
a = jax.random.normal(key, (8192, 1024))
w = jax.random.normal(key, (1024, 1024))

@jax.jit
def mm(a, w):
    def body(c, _):
        return jnp.tanh(c @ w), ()
    c, _ = jax.lax.scan(body, a, jnp.arange(STEPS))
    return c

bench("E: 8192x1024x1024 matmul chain (17 GFLOP/step)", mm, a, w)
