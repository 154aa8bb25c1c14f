"""fused_rowadam vs XLA row update on the real TPU (value-fetch timing)."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.core.sparse_optim import _segment_dedup, sparse_adam_row_update
from beta_recsys_tpu.ops.pallas.rowadam import fused_rowadam

N, B, D = 1_000_000, 16384, 128
ids_all = jax.random.randint(jax.random.key(0), (60, B), 0, N)
rows_all = 0.001 * jax.random.normal(jax.random.key(1), (60, B, D))
table = jax.random.normal(jax.random.key(2), (N, D))
m = jnp.zeros((N, D))
v = jnp.zeros((N, D))


def slope(name, step_fn):
    def chain(steps):
        @jax.jit
        def fn(c, ids, rows):
            def body(c, x):
                t, m, v, s = c
                s = s + 1
                t, m, v = step_fn(t, m, v, x[0], x[1], s)
                return (t, m, v, s), ()
            c, _ = jax.lax.scan(body, c, (ids[:steps], rows[:steps]))
            return c[0][0, 0]
        return fn

    c0 = (table, m, v, jnp.float32(0.0))
    f_small, f_big = chain(10), chain(60)
    float(f_small(c0, ids_all, rows_all)); float(f_big(c0, ids_all, rows_all))
    def tmin(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.time(); float(f(c0, ids_all, rows_all)); ts.append(time.time() - t0)
        return min(ts)
    per = (tmin(f_big) - tmin(f_small)) / 50
    print(f"{name:46s} {per*1e6:8.0f} us/step", flush=True)


def xla_update(t, m, v, ids, rows, s):
    return sparse_adam_row_update(t, m, v, ids, rows, 0.01, s)


def kernel_update(t, m, v, ids, rows, s):
    ids_s, rows_d = _segment_dedup(ids, rows)
    bc = jnp.stack([1.0 / (1 - 0.9**s), 1.0 / (1 - 0.999**s)])
    return fused_rowadam(t, m, v, ids_s, rows_d, bc, 0.01)


def kernel_nodedup(t, m, v, ids, rows, s):
    # ids presorted offline would let dedup go away; measures kernel alone
    bc = jnp.stack([1.0 / (1 - 0.9**s), 1.0 / (1 - 0.999**s)])
    return fused_rowadam(t, m, v, ids, rows, bc, 0.01)


slope("XLA sparse_adam_row_update", xla_update)
slope("fused_rowadam + segment_dedup", kernel_update)
slope("fused_rowadam alone (no dedup, unsafe dups)", kernel_nodedup)
