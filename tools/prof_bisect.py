"""Bisect the sparse-epoch step cost by ablating pieces of the step."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.core import sparse_optim
from beta_recsys_tpu.core.sparse_optim import init_sparse_state
from beta_recsys_tpu.core.train_engine import _padded_order
from beta_recsys_tpu.data.base_data import TrainArrays
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.ops.sampling import uniform_negatives

N_USERS, N_ITEMS, N_INTER, B, D = 1_000_000, 100_000, 2_000_000, 8192, 64
rng = np.random.default_rng(0)
users_np = rng.integers(0, N_USERS, N_INTER).astype(np.int32)
items_np = rng.integers(0, N_ITEMS, N_INTER).astype(np.int32)
arrays = TrainArrays(users=users_np, items=items_np, ratings=np.ones(N_INTER, np.float32))
cfg = {"model": "MF", "emb_dim": D, "loss": "bpr", "lr": 0.01,
       "optimizer": "adam", "reg": 0.0, "batch_size": B}
model = MF(cfg, N_USERS, N_ITEMS)
sampler = lambda k, u, shape: uniform_negatives(k, shape, N_ITEMS)
table_names = list(model.row_tables())
table_roles = model.row_tables()

users = jnp.asarray(users_np)
items = jnp.asarray(items_np)
n = N_INTER
num_batches = -(-n // B)
padded = num_batches * B


def build(mode):
    def epoch_fn(params, opt_state, rng):
        sparse_state, dense_state = opt_state
        rng, perm_key = jax.random.split(rng)
        order = _padded_order(jax.random.permutation(perm_key, n), padded)
        order = order.reshape(num_batches, B)

        def step(carry, batch_order):
            params, sparse_state, dense_state, rng = carry
            rng, k_neg, k_loss = jax.random.split(rng, 3)
            u = users[batch_order]
            pos = items[batch_order]
            neg = sampler(k_neg, u, (B,))
            batch = {"users": u, "pos_items": pos, "neg_items": neg}
            role_ids = {"users": u, "items_cat": jnp.concatenate([pos, neg])}
            rows = {name: params[name][role_ids[table_roles[name]]] for name in table_names}
            dense_params = {k: v for k, v in params.items() if k not in table_names}

            if mode == "fwd_only":
                loss = model.row_loss(rows, dense_params, batch, k_loss)
                return (params, sparse_state, dense_state, rng), loss

            loss, (g_rows, g_dense) = jax.value_and_grad(model.row_loss, argnums=(0, 1))(
                rows, dense_params, batch, k_loss
            )
            if mode == "grad_only":
                return (params, sparse_state, dense_state, rng), loss

            new_step = sparse_state["step"] + 1
            moments = dict(sparse_state["moments"])
            names = table_names
            if mode == "user_emb_only":
                names = ["user_emb"]
            for name in names:
                m, v = moments[name]
                ids = role_ids[table_roles[name]]
                g = g_rows[name]
                if mode == "no_dedup":
                    tbl, mm, vv = params[name], m, v
                    one_d = tbl.ndim == 1
                    if one_d:
                        tbl, mm, vv, g2 = tbl[:, None], mm[:, None], vv[:, None], g[:, None]
                    else:
                        g2 = g
                    m_rows = 0.9 * mm[ids] + 0.1 * g2
                    v_rows = 0.999 * vv[ids] + 0.001 * g2 ** 2
                    delta = -0.01 * m_rows / (jnp.sqrt(v_rows) + 1e-8)
                    tbl = tbl.at[ids].add(delta)
                    mm = mm.at[ids].add(m_rows - mm[ids])
                    vv = vv.at[ids].add(v_rows - vv[ids])
                    if one_d:
                        tbl, mm, vv = tbl[:, 0], mm[:, 0], vv[:, 0]
                    params = {**params, name: tbl}
                    moments[name] = (mm, vv)
                else:
                    tbl, mm, vv = sparse_optim.sparse_adam_row_update(
                        params[name], m, v, ids, g, 0.01, new_step.astype(jnp.float32)
                    )
                    params = {**params, name: tbl}
                    moments[name] = (mm, vv)
            sparse_state = {"moments": moments, "step": new_step}
            return (params, sparse_state, dense_state, rng), loss

        (params, sparse_state, dense_state, rng), losses = jax.lax.scan(
            step, (params, sparse_state, dense_state, rng), order
        )
        return params, (sparse_state, dense_state), rng, jnp.mean(losses)

    return jax.jit(epoch_fn)


for mode in ["fwd_only", "grad_only", "user_emb_only", "no_dedup", "full"]:
    params = model.init_params(jax.random.key(0))
    state = (init_sparse_state(params, table_names),
             optax.adam(0.01).init({k: v for k, v in params.items() if k not in table_names}))
    fn = build(mode)
    p, s, k2, loss = fn(params, state, jax.random.key(1))
    jax.block_until_ready(loss)
    t0 = time.time()
    p, s, k2, loss = fn(p, s, k2)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    print(f"{mode:15s} {dt:7.3f} s/epoch  {dt/num_batches*1e6:7.0f} us/step")
