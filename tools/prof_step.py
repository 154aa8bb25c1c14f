"""Time the real sparse step standalone (jit, donated) vs inside lax.scan."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.core import sparse_optim
from beta_recsys_tpu.core.sparse_optim import init_sparse_state
from beta_recsys_tpu.data.base_data import TrainArrays
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.ops.sampling import uniform_negatives

N_USERS, N_ITEMS, N_INTER, B, D = 1_000_000, 100_000, 2_000_000, 8192, 64
rng = np.random.default_rng(0)
users_np = rng.integers(0, N_USERS, N_INTER).astype(np.int32)
items_np = rng.integers(0, N_ITEMS, N_INTER).astype(np.int32)
cfg = {"model": "MF", "emb_dim": D, "loss": "bpr", "lr": 0.01,
       "optimizer": "adam", "reg": 0.0, "batch_size": B}
model = MF(cfg, N_USERS, N_ITEMS)
table_roles = model.row_tables()
table_names = list(table_roles)
dense_opt = optax.adam(0.01)


def step_fn(params, sparse_state, dense_state, u, pos, neg, k_loss):
    batch = {"users": u, "pos_items": pos, "neg_items": neg}
    role_ids = {"users": u, "items_cat": jnp.concatenate([pos, neg])}
    rows = {name: params[name][role_ids[table_roles[name]]] for name in table_names}
    dense_params = {k: v for k, v in params.items() if k not in table_names}
    loss, (g_rows, g_dense) = jax.value_and_grad(model.row_loss, argnums=(0, 1))(
        rows, dense_params, batch, k_loss
    )
    new_step = sparse_state["step"] + 1
    moments = dict(sparse_state["moments"])
    for name in table_names:
        m, v = moments[name]
        tbl, m, v = sparse_optim.sparse_adam_row_update(
            params[name], m, v, role_ids[table_roles[name]], g_rows[name],
            0.01, new_step.astype(jnp.float32),
        )
        params = {**params, name: tbl}
        moments[name] = (m, v)
    sparse_state = {"moments": moments, "step": new_step}
    updates, dense_state = dense_opt.update(g_dense, dense_state, dense_params)
    params = {**params, **optax.apply_updates(dense_params, updates)}
    return params, sparse_state, dense_state, loss


params = model.init_params(jax.random.key(0))
state = init_sparse_state(params, table_names)
dstate = dense_opt.init({k: v for k, v in params.items() if k not in table_names})

key = jax.random.key(1)
u = jnp.asarray(users_np[:B]); pos = jnp.asarray(items_np[:B])
neg = uniform_negatives(key, (B,), N_ITEMS)

jit_step = jax.jit(step_fn, donate_argnums=(0, 1, 2))
p, s, d, loss = jit_step(params, state, dstate, u, pos, neg, key)
jax.block_until_ready(loss)
t0 = time.time()
ITERS = 50
for _ in range(ITERS):
    p, s, d, loss = jit_step(p, s, d, u, pos, neg, key)
jax.block_until_ready(loss)
print(f"standalone donated step: {(time.time()-t0)/ITERS*1e6:9.0f} us/step")

# same step inside a scan over 50 batches
us50 = jnp.tile(u, (50, 1)); pos50 = jnp.tile(pos, (50, 1)); neg50 = jnp.tile(neg, (50, 1))

@jax.jit
def scan_fn(params, sparse_state, dense_state, us, poss, negs, key):
    def body(carry, x):
        params, sparse_state, dense_state = carry
        u, pos, neg = x
        params, sparse_state, dense_state, loss = step_fn(
            params, sparse_state, dense_state, u, pos, neg, key)
        return (params, sparse_state, dense_state), loss
    (params, sparse_state, dense_state), losses = jax.lax.scan(
        body, (params, sparse_state, dense_state), (us, poss, negs))
    return params, sparse_state, dense_state, losses.mean()

p2, s2, d2, loss = scan_fn(p, s, d, us50, pos50, neg50, key)
jax.block_until_ready(loss)
t0 = time.time()
p2, s2, d2, loss = scan_fn(p2, s2, d2, us50, pos50, neg50, key)
jax.block_until_ready(loss)
print(f"in-scan step:            {(time.time()-t0)/50*1e6:9.0f} us/step")
