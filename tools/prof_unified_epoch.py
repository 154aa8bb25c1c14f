"""Prototype: unified-entity sparse MF epoch — ONE (n_users+n_items, 3, 65)
array holds [emb|bias] x [param, m, v] for every entity; each step does
ONE full-row gather, ONE dedup, ONE scatter instead of the per-table path's
~24 row ops. End-to-end A/B against the current xla path at (1M x 64, B=8192).
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.core.sparse_optim import _segment_dedup
from beta_recsys_tpu.core.train_engine import _padded_order
from beta_recsys_tpu.models.losses import bpr_loss

N_USERS, N_ITEMS, N_INTER, B, D = 1_000_000, 100_000, 2_000_000, 8192, 64
W = D + 1  # emb + bias column
N = N_USERS + N_ITEMS
LR = 0.01


def make_unified_epoch(users, items, batch_size, lr=LR, b1=0.9, b2=0.999, eps=1e-8):
    n = users.shape[0]
    num_batches = -(-n // batch_size)
    padded = num_batches * batch_size

    def epoch(packed, gbias, step0, rng):
        rng, k_perm, k_neg, k_ep = jax.random.split(rng, 4)
        order = _padded_order(jax.random.permutation(k_perm, n), padded)
        u_all = users[order]
        pos_all = items[order] + N_USERS
        neg_all = jax.random.randint(k_neg, (padded,), 0, N_ITEMS) + N_USERS
        xs = (
            u_all.reshape(num_batches, batch_size),
            pos_all.reshape(num_batches, batch_size),
            neg_all.reshape(num_batches, batch_size),
            jnp.arange(num_batches),
        )

        def step(carry, x):
            packed, gbias, stp = carry
            u, pos, neg, _ = x
            ids = jnp.concatenate([u, pos, neg])  # (3B,)

            rows_full = packed[ids]  # (3B, 3, W): ONE gather, params+m+v
            prow = rows_full[:, 0, :]  # (3B, W)

            def loss_fn(prow, gbias):
                ue, ub = prow[:B, :D], prow[:B, D]
                pe, pb = prow[B:2*B, :D], prow[B:2*B, D]
                ne, nb = prow[2*B:, :D], prow[2*B:, D]
                pos_s = jax.nn.sigmoid(jnp.sum(ue * pe, axis=-1) + ub + pb + gbias)
                neg_s = jax.nn.sigmoid(jnp.sum(ue * ne, axis=-1) + ub + nb + gbias)
                return bpr_loss(pos_s, neg_s)

            loss, (g_rows, g_g) = jax.value_and_grad(loss_fn, argnums=(0, 1))(prow, gbias)

            new_step = stp + 1.0
            ids_s, g_d = _segment_dedup(ids, g_rows)  # ONE dedup (3B sort)
            order2 = jnp.argsort(ids)
            rows_s = rows_full[order2]  # permute gathered buffer (small operand)
            m_r, v_r = rows_s[:, 1, :], rows_s[:, 2, :]
            m_new = b1 * m_r + (1 - b1) * g_d
            v_new = b2 * v_r + (1 - b2) * g_d**2
            m_hat = m_new / (1 - b1**new_step)
            v_hat = v_new / (1 - b2**new_step)
            delta = -lr * m_hat / (jnp.sqrt(v_hat) + eps)
            touched = jnp.any(g_d != 0, axis=1, keepdims=True)
            upd = jnp.stack(
                [jnp.where(touched, delta, 0.0),
                 jnp.where(touched, m_new - m_r, 0.0),
                 jnp.where(touched, v_new - v_r, 0.0)], axis=1)  # (3B, 3, W)
            packed = packed.at[ids_s].add(upd)  # ONE scatter
            gbias = gbias - lr * g_g  # plain SGD on the scalar (demo)
            return (packed, gbias, new_step), loss

        (packed, gbias, stp), losses = jax.lax.scan(step, (packed, gbias, step0), xs)
        return packed, gbias, stp, rng, jnp.mean(losses)

    return jax.jit(epoch, donate_argnums=(0,))


def main():
    rng = np.random.default_rng(0)
    users = jnp.asarray(rng.integers(0, N_USERS, N_INTER).astype(np.int32))
    items = jnp.asarray(rng.integers(0, N_ITEMS, N_INTER).astype(np.int32))

    packed = jnp.zeros((N, 3, W), jnp.float32)
    packed = packed.at[:, 0, :D].set(
        0.1 * jax.random.normal(jax.random.key(0), (N, D))
    )
    gbias = jnp.zeros((), jnp.float32)

    epoch = make_unified_epoch(users, items, B)
    packed, gbias, stp, key, loss = epoch(packed, gbias, jnp.zeros(()), jax.random.key(1))
    print("first loss", float(loss), flush=True)

    t0 = time.time()
    for _ in range(2):
        packed, gbias, stp, key, loss = epoch(packed, gbias, stp, key)
    float(loss)
    dt = (time.time() - t0) / 2
    print(f"unified epoch: {N_INTER/dt:,.0f} examples/s  {dt:.3f} s/epoch "
          f"(xla baseline 1.46M ex/s, 1.38 s)", flush=True)


if __name__ == "__main__":
    main()
