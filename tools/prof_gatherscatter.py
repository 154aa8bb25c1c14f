"""Is gather->grad->scatter on the SAME carried table forcing full-table copies?"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.core.sparse_optim import sparse_adam_row_update

N, B, D, STEPS = 1_000_000, 8192, 64, 100
key = jax.random.key(0)
ids_all = jax.random.randint(key, (STEPS, B), 0, N)
rows_all = jax.random.normal(jax.random.key(1), (STEPS, B, D)) * 0.01


def bench(name, step_fn, carries, xs):
    @jax.jit
    def run(carries, xs):
        def body(c, x):
            return step_fn(c, *x), ()
        c, _ = jax.lax.scan(body, carries, xs)
        return c

    c = run(carries, xs)
    jax.block_until_ready(c)
    t0 = time.time()
    c = run(c, xs)
    jax.block_until_ready(c)
    print(f"{name:52s} {(time.time()-t0)/STEPS*1e6:8.0f} us/step")


table = jax.random.normal(jax.random.key(2), (N, D))
m = jnp.zeros((N, D))
v = jnp.zeros((N, D))

# 1) update rows = gathered rows from the SAME table (no autodiff)
bench(
    "gather->scatter same table (no grad)",
    lambda t, ids: t.at[ids].add(-0.01 * t[ids]),
    table, (ids_all,),
)

# 2) gather -> value_and_grad of a loss of the rows -> scatter
def gvs(t, ids):
    rows = t[ids]
    def loss_fn(r):
        return jnp.sum(jnp.log1p(jnp.exp(-jnp.sum(r * r, axis=1)))) / B
    g = jax.grad(loss_fn)(rows)
    return t.at[ids].add(-0.01 * g)

bench("gather->grad->scatter same table", gvs, table, (ids_all,))

# 3) same but with full lazy-Adam row update
def gvs_adam(c, ids):
    t, m, v = c
    rows = t[ids]
    def loss_fn(r):
        return jnp.sum(jnp.log1p(jnp.exp(-jnp.sum(r * r, axis=1)))) / B
    g = jax.grad(loss_fn)(rows)
    return sparse_adam_row_update(t, m, v, ids, g, 0.01, 2.0)

bench("gather->grad->lazy-adam same table", gvs_adam, (table, m, v), (ids_all,))

# 4) control: grads computed from xs rows (no gather from carried table)
def xs_adam(c, ids, rows):
    t, m, v = c
    def loss_fn(r):
        return jnp.sum(jnp.log1p(jnp.exp(-jnp.sum(r * r, axis=1)))) / B
    g = jax.grad(loss_fn)(rows)
    return sparse_adam_row_update(t, m, v, ids, g, 0.01, 2.0)

bench("xs-rows->grad->lazy-adam (control)", xs_adam, (table, m, v), (ids_all, rows_all))

# 5) gather with stop_gradient barrier trick: optimizer input decoupled via
#    donate-style copy of the gathered rows
def gvs_adam_lax(c, ids):
    t, m, v = c
    rows = jax.lax.optimization_barrier(t[ids])
    def loss_fn(r):
        return jnp.sum(jnp.log1p(jnp.exp(-jnp.sum(r * r, axis=1)))) / B
    g = jax.grad(loss_fn)(rows)
    return sparse_adam_row_update(t, m, v, ids, g, 0.01, 2.0)

bench("gather(opt-barrier)->grad->lazy-adam", gvs_adam_lax, (table, m, v), (ids_all,))
