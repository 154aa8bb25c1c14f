"""Sparse (lazy) Adam for embedding-dominated models.

Production-scale embedding tables make dense optimizers the bottleneck: a
standard optax.adam step reads/writes EVERY row of every table (m, v, params —
~6 full-table HBM passes per step), so epoch cost scales with
O(steps * n_rows * dim) regardless of batch size. For a 1M x 64 MF table at
10M interactions/epoch that is ~2 TB of optimizer traffic per epoch.

This module trains such models with per-row updates: gradients are taken with
respect to the *gathered rows* (a (B, d) tensor), and Adam moments/params are
updated only at the touched ids via scatter. Cost per step becomes
O(batch * dim) — independent of table height.

Semantics are TF-style "lazy Adam": the bias-correction step count is global,
and duplicate ids inside one batch have their gradient rows summed (segment
semantics) before a single moment update per unique-row occurrence, which is
the standard approximation (exact Adam would serialize duplicates).

Models opt in by implementing ``row_loss(row_values, aux_params, batch, rng)``
and ``row_tables()`` (see models/mf.py MF.row_tables); the generic trainer
handles everything else. Enable with model config ``"sparse_optim": true``.
"""

import jax
import jax.numpy as jnp
import optax


def _segment_dedup(ids, rows):
    """Sum gradient rows of duplicate ids: returns (ids, summed_rows).

    Keeps the original (static) length; duplicate occurrences beyond the first
    carry zero rows, so their scatter contributions are no-ops.
    """
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    sorted_rows = rows[order]
    first = jnp.concatenate([jnp.array([True]), sorted_ids[1:] != sorted_ids[:-1]])
    seg = jnp.cumsum(first) - 1
    summed = jax.ops.segment_sum(sorted_rows, seg, num_segments=ids.shape[0])
    # place sums at the first occurrence; others become zero rows
    dedup_rows = jnp.where(first[:, None], summed[seg], 0.0)
    return sorted_ids, dedup_rows


def sparse_adam_row_update(table, m, v, ids, grad_rows, lr, step, b1=0.9, b2=0.999, eps=1e-8):
    """Apply one lazy-Adam update to the rows ``ids`` of (table, m, v).

    1-D tables (bias vectors) are handled as single-column matrices.
    """
    one_d = table.ndim == 1
    if one_d:
        table, m, v = table[:, None], m[:, None], v[:, None]
        grad_rows = grad_rows[:, None]
    ids, grad_rows = _segment_dedup(ids, grad_rows)
    m_rows = b1 * m[ids] + (1 - b1) * grad_rows
    v_rows = b2 * v[ids] + (1 - b2) * grad_rows**2
    m_hat = m_rows / (1 - b1**step)
    v_hat = v_rows / (1 - b2**step)
    delta = -lr * m_hat / (jnp.sqrt(v_hat) + eps)
    # Zero grad rows (duplicate occurrences) produce pure-momentum deltas;
    # mask them out so each unique row updates exactly once.
    touched = jnp.any(grad_rows != 0, axis=1, keepdims=True)
    delta = jnp.where(touched, delta, 0.0)
    # All writes are scatter-ADDs of deltas: duplicate ids contribute zero
    # deltas beyond the first occurrence, so write order cannot matter
    # (scatter .set with duplicate indices is nondeterministic).
    m_delta = jnp.where(touched, m_rows - m[ids], 0.0)
    v_delta = jnp.where(touched, v_rows - v[ids], 0.0)
    table = table.at[ids].add(delta)
    m = m.at[ids].add(m_delta)
    v = v.at[ids].add(v_delta)
    if one_d:
        return table[:, 0], m[:, 0], v[:, 0]
    return table, m, v


def init_sparse_state(params, table_names):
    """Adam moments for the sparse tables + an optax state for the rest."""
    moments = {
        name: (jnp.zeros_like(params[name]), jnp.zeros_like(params[name]))
        for name in table_names
    }
    return {"moments": moments, "step": jnp.zeros((), jnp.int32)}


def make_sparse_epoch_fn(model, train_arrays, batch_size, neg_sampler, lr, dense_optimizer=None, donate=True, compute_dtype=None):
    """Whole-epoch trainer with lazy-Adam row updates for embedding tables.

    The model must provide:
      row_tables() -> {"table_name": "batch_role"} mapping each sparse table to
        the batch ids that index it ("users" / "items_cat" = pos+neg concat)
      row_loss(rows, dense_params, batch, rng) -> scalar, where ``rows`` maps
        table_name -> the gathered (B, d) rows.
    Non-table params ("dense") update with ``dense_optimizer`` (default: adam).
    """
    users = jnp.asarray(train_arrays.users)
    items = jnp.asarray(train_arrays.items)
    n = users.shape[0]
    batch_size = min(batch_size, n)
    num_batches = -(-n // batch_size)
    padded_size = num_batches * batch_size
    table_roles = model.row_tables()
    table_names = list(table_roles)
    dense_optimizer = dense_optimizer or optax.adam(lr)

    def epoch_fn(params, opt_state, rng):
        from .train_engine import _padded_order

        sparse_state, dense_state = opt_state
        rng, perm_key = jax.random.split(rng)
        order = _padded_order(jax.random.permutation(perm_key, n), padded_size)
        order = order.reshape(num_batches, batch_size)

        def step(carry, batch_order):
            params, sparse_state, dense_state, rng = carry
            rng, k_neg, k_loss = jax.random.split(rng, 3)
            u = users[batch_order]
            pos = items[batch_order]
            neg = neg_sampler(k_neg, u, (batch_size,))
            batch = {"users": u, "pos_items": pos, "neg_items": neg}
            role_ids = {
                "users": u,
                "items_cat": jnp.concatenate([pos, neg]),
            }

            rows = {name: params[name][role_ids[table_roles[name]]] for name in table_names}
            dense_params = {k: v for k, v in params.items() if k not in table_names}

            def loss_fn(rows, dense_params):
                if compute_dtype is not None:
                    # Mixed precision: gathered rows + dense params compute in
                    # bf16; grads come back fp32 through astype's VJP, so the
                    # fp32 lazy-Adam moments are untouched.
                    dt = jnp.dtype(compute_dtype)
                    cast = lambda t: jax.tree_util.tree_map(
                        lambda x: x.astype(dt)
                        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                        else x,
                        t,
                    )
                    return model.row_loss(cast(rows), cast(dense_params), batch, k_loss).astype(jnp.float32)
                return model.row_loss(rows, dense_params, batch, k_loss)

            loss, (g_rows, g_dense) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                rows, dense_params
            )

            new_step = sparse_state["step"] + 1
            moments = dict(sparse_state["moments"])
            for name in table_names:
                m, v = moments[name]
                table, m, v = sparse_adam_row_update(
                    params[name], m, v, role_ids[table_roles[name]], g_rows[name],
                    lr, new_step.astype(jnp.float32),
                )
                params = {**params, name: table}
                moments[name] = (m, v)
            sparse_state = {"moments": moments, "step": new_step}

            updates, dense_state = dense_optimizer.update(
                g_dense, dense_state, dense_params
            )
            dense_params = optax.apply_updates(dense_params, updates)
            params = {**params, **dense_params}
            return (params, sparse_state, dense_state, rng), loss

        (params, sparse_state, dense_state, rng), losses = jax.lax.scan(
            step, (params, sparse_state, dense_state, rng), order
        )
        return params, (sparse_state, dense_state), rng, jnp.mean(losses)

    return jax.jit(epoch_fn, donate_argnums=(0, 1) if donate else ())
