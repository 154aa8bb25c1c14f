"""fused_rowadam Pallas kernel vs the XLA lazy-Adam row update (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beta_recsys_tpu.core.sparse_optim import _segment_dedup, sparse_adam_row_update
from beta_recsys_tpu.ops.pallas.rowadam import fused_rowadam


def _bc(step, b1=0.9, b2=0.999):
    return jnp.array([1.0 / (1 - b1**step), 1.0 / (1 - b2**step)], jnp.float32)


@pytest.mark.parametrize("n,b,d,step", [(64, 32, 16, 1.0), (128, 48, 8, 7.0)])
def test_fused_rowadam_matches_xla(n, b, d, step):
    key = jax.random.key(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    table = jax.random.normal(k1, (n, d))
    m = 0.1 * jax.random.normal(k2, (n, d))
    v = jnp.abs(0.1 * jax.random.normal(k3, (n, d)))
    ids = jax.random.randint(k4, (b,), 0, n)  # duplicates likely
    rows = jax.random.normal(k5, (b, d))
    lr = 0.05

    want_t, want_m, want_v = sparse_adam_row_update(table, m, v, ids, rows, lr, step)

    ids_s, rows_d = _segment_dedup(ids, rows)
    got_t, got_m, got_v = fused_rowadam(
        table.copy(), m.copy(), v.copy(), ids_s, rows_d, _bc(step), lr
    )
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-6)


def test_fused_rowadam_skips_untouched_rows():
    """Zero grad rows (dedup duplicates) must leave table AND moments alone."""
    n, d = 32, 8
    table = jnp.ones((n, d))
    m = jnp.full((n, d), 0.5)
    v = jnp.full((n, d), 0.25)
    ids = jnp.array([3, 3, 3, 7], jnp.int32)
    rows = jnp.zeros((4, d)).at[0].set(1.0).at[3].set(2.0)  # dups of 3 are zero
    got_t, got_m, got_v = fused_rowadam(
        table.copy(), m.copy(), v.copy(), ids, rows, _bc(1.0), 0.1
    )
    touched = {3, 7}
    for r in range(n):
        if r in touched:
            assert not np.allclose(np.asarray(got_t[r]), 1.0)
        else:
            np.testing.assert_array_equal(np.asarray(got_t[r]), np.ones(d))
            np.testing.assert_array_equal(np.asarray(got_m[r]), np.full(d, 0.5))
            np.testing.assert_array_equal(np.asarray(got_v[r]), np.full(d, 0.25))


def test_fused_rowadam_inside_scan():
    """The production context: the kernel runs in a lax.scan over batches with
    the tables as carries."""
    n, b, d, steps = 64, 24, 8, 5
    key = jax.random.key(1)
    table = jax.random.normal(key, (n, d))
    m = jnp.zeros((n, d))
    v = jnp.zeros((n, d))
    ids_all = jax.random.randint(jax.random.key(2), (steps, b), 0, n)
    rows_all = 0.01 * jax.random.normal(jax.random.key(3), (steps, b, d))

    def run(update):
        def body(c, x):
            t, m, v, step = c
            ids, rows = x
            step = step + 1
            if update == "kernel":
                ids_s, rows_d = _segment_dedup(ids, rows)
                t, m, v = fused_rowadam(t, m, v, ids_s, rows_d, _bc(step), 0.05)
            else:
                t, m, v = sparse_adam_row_update(t, m, v, ids, rows, 0.05, step)
            return (t, m, v, step), ()

        (t, m2, v2, _), _ = jax.lax.scan(
            body, (table, m, v, jnp.float32(0.0)), (ids_all, rows_all)
        )
        return t, m2, v2

    t_k, m_k, v_k = jax.jit(lambda: run("kernel"))()
    t_x, m_x, v_x = jax.jit(lambda: run("xla"))()
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_x), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_x), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_x), rtol=1e-4, atol=1e-6)
