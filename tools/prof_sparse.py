"""Microprofile the sparse lazy-Adam step components on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

B = 8192
D = 64
N_USERS = 1_000_000
N_ITEMS = 100_000

key = jax.random.key(0)
ids_u = jax.random.randint(key, (B,), 0, N_USERS)
ids_i = jax.random.randint(key, (2 * B,), 0, N_ITEMS)
rows_u = jax.random.normal(key, (B, D))
rows_i = jax.random.normal(key, (2 * B, D))
table_u = jax.random.normal(key, (N_USERS, D))
table_i = jax.random.normal(key, (N_ITEMS, D))
m_u = jnp.zeros_like(table_u); v_u = jnp.zeros_like(table_u)


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.time()-t0)/n*1e6:10.1f} us")
    return out


from beta_recsys_tpu.core.sparse_optim import _segment_dedup, sparse_adam_row_update

timeit("argsort B=8192", jax.jit(lambda x: jnp.argsort(x)), ids_u)
timeit("argsort B=16384", jax.jit(lambda x: jnp.argsort(x)), ids_i)
timeit("segment_dedup u (B=8192)", jax.jit(_segment_dedup), ids_u, rows_u)
timeit("segment_dedup i (B=16384)", jax.jit(_segment_dedup), ids_i, rows_i)
timeit("gather u (1M x 64)", jax.jit(lambda t, i: t[i]), table_u, ids_u)
timeit("scatter-add u (1M x 64)", jax.jit(lambda t, i, r: t.at[i].add(r)), table_u, ids_u, rows_u)
timeit(
    "full row_update u (table,m,v)",
    jax.jit(lambda t, m, v, i, g: sparse_adam_row_update(t, m, v, i, g, 0.01, 1.0)),
    table_u, m_u, v_u, ids_u, rows_u,
)

# one full MF sparse step, isolated
from beta_recsys_tpu.core.sparse_optim import init_sparse_state, make_sparse_epoch_fn
from beta_recsys_tpu.data.base_data import TrainArrays
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.ops.sampling import uniform_negatives
import optax

rng = np.random.default_rng(0)
N_INTER = 2_000_000
arrays = TrainArrays(
    users=rng.integers(0, N_USERS, N_INTER).astype(np.int32),
    items=rng.integers(0, N_ITEMS, N_INTER).astype(np.int32),
    ratings=np.ones(N_INTER, np.float32),
)
cfg = {"model": "MF", "emb_dim": D, "loss": "bpr", "lr": 0.01,
       "optimizer": "adam", "reg": 0.0, "batch_size": B}
model = MF(cfg, N_USERS, N_ITEMS)
params = model.init_params(jax.random.key(0))
sampler = lambda k, u, shape: uniform_negatives(k, shape, N_ITEMS)
epoch_fn = make_sparse_epoch_fn(model, arrays, B, sampler, lr=0.01, donate=False)
table_names = list(model.row_tables())
state = (init_sparse_state(params, table_names),
         optax.adam(0.01).init({k: v for k, v in params.items() if k not in table_names}))
p, s, k2, loss = epoch_fn(params, state, jax.random.key(1))
jax.block_until_ready(loss)
t0 = time.time()
p, s, k2, loss = epoch_fn(p, s, k2)
jax.block_until_ready(loss)
dt = time.time() - t0
steps = -(-N_INTER // B)
print(f"{'full epoch':40s} {dt:10.3f} s  ({steps} steps, {dt/steps*1e6:.0f} us/step, {N_INTER/dt/1e6:.2f}M ex/s)")
